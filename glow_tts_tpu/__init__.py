"""glow_tts_tpu — a TPU-native Glow-TTS framework (JAX / XLA / Pallas).

Re-designed from scratch with the capabilities of the PyTorch reference
(CODEJIN/Glow_TTS): multispeaker Glow-TTS with four conditioning modes
(Vanilla / SE / PE / GR), on-device monotonic alignment search, jit-compiled
DSP, and pjit data-parallel training over a ``jax.sharding.Mesh``.
"""

from glow_tts_tpu.config import Config, load_config

__version__ = '0.1.0'

__all__ = ['Config', 'load_config', 'GlowTTS', 'Inferencer', 'Trainer',
           '__version__']


def __getattr__(name):
    # heavy imports stay lazy so `import glow_tts_tpu` is cheap
    if name == 'GlowTTS':
        from glow_tts_tpu.models.glow_tts import GlowTTS
        return GlowTTS
    if name == 'Inferencer':
        from glow_tts_tpu.inference import Inferencer
        return Inferencer
    if name == 'Trainer':
        from glow_tts_tpu.training.trainer import Trainer
        return Trainer
    raise AttributeError(name)
