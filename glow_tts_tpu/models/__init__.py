"""Model components: encoder, flow decoder, conditioning encoders, top model."""

from glow_tts_tpu.models.decoder import FlowDecoder
from glow_tts_tpu.models.encoder import TextEncoder
from glow_tts_tpu.models.glow_tts import GlowTTS

__all__ = ['GlowTTS', 'TextEncoder', 'FlowDecoder']
