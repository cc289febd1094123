"""Conditioning encoders: LUT / GE2E speaker embeddings, GST prosody
encoder, adversarial speaker classifier, pitch interpolation.

Reference surfaces:
* LUT: embedding table, uniform(-1, 1) init (``Modules.py:23-28``)
* GE2E d-vector encoder: 3-stack LSTM-256 over 80-mel slices → linear →
  L2-normalised 256-d embedding, frozen at train time.  The reference pulls
  this from a git submodule that is not vendored (``.gitmodules:1-3``,
  called at ``Modules.py:29-35,75-77``); reimplemented here from the call
  contract and hyper-parameters (``Hyper_Parameters.yaml:58-66``) with the
  LSTM as a ``lax.scan``
* GST prosody encoder: 6× strided Conv2d reference encoder → GRU → final
  valid state → multi-head attention over tanh'd learned style tokens
  (``Modules.py:312-385``)
* speaker classifier behind gradient reversal (``Modules.py:407-435``)
* per-sample linear pitch interpolation to predicted mel lengths
  (``Modules.py:387-405``), implemented as a fractional gather instead of a
  Python loop over samples
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from glow_tts_tpu.config import Config
from glow_tts_tpu.models.layers import RelativePositionMultiHeadAttention
from glow_tts_tpu.ops.grl import gradient_reversal


class SpeakerLUT(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, speaker_ids):
        cfg = self.config.speaker_embedding
        return nn.Embed(
            cfg.num_speakers, cfg.embedding_size,
            embedding_init=lambda rng, shape, dtype=jnp.float32:
                jax.random.uniform(rng, shape, dtype, -1.0, 1.0),
            name='lut')(speaker_ids)


def ge2e_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalise embeddings (the reference's ``GE2E_Normalize``,
    imported at ``Modules.py:7`` and applied at ``Modules.py:77,156``)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class GE2ESpeakerEncoder(nn.Module):
    """Frozen d-vector encoder.

    Input [B·S, T_slice, mel] (the collater slices each utterance into S
    overlapping windows, ``Datasets.py:41-65``); output [B·S, E] per-slice
    embeddings.  :meth:`embed_utterances` averages over slices and
    re-normalises — standard GE2E inference pooling.
    """
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, mel_slices):
        cfg = self.config.speaker_embedding
        x = mel_slices
        for i in range(cfg.ge2e.lstm.stacks):
            x = nn.RNN(nn.OptimizedLSTMCell(cfg.ge2e.lstm.sizes,
                                            dtype=self.dtype,
                                            name=f'lstm_cell_{i}'))(x)
        x = x[:, -1]                                        # final time step
        x = nn.Dense(cfg.embedding_size, dtype=self.dtype,
                     name='projection')(x)
        return ge2e_normalize(x)

    def embed_utterances(self, mel_slices):
        """[B·S, T_slice, mel] → [B, E] pooled over the S slices."""
        samples = self.config.speaker_embedding.ge2e.inference.samples
        per_slice = self(mel_slices)                         # [B·S, E]
        pooled = per_slice.reshape(-1, samples,
                                   per_slice.shape[-1]).mean(axis=1)
        return ge2e_normalize(pooled)


class GSTProsodyEncoder(nn.Module):
    """Global-style-token prosody encoder over a reference mel."""
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, mels, mel_lengths, deterministic: bool = True):
        """mels [B, T, M]; mel_lengths [B] → prosody [B, P]."""
        cfg = self.config.prosody_encoder
        ref = cfg.reference_encoder
        x = mels[..., None]                                 # NHWC [B,T,M,1]
        for i, (k, ch, s) in enumerate(zip(ref.conv.kernel_size,
                                           ref.conv.channels,
                                           ref.conv.strides)):
            pad = (k - 1) // 2
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((pad, pad), (pad, pad)),   # torch-style
                        use_bias=False,
                        kernel_init=nn.initializers.kaiming_uniform(),
                        dtype=self.dtype, name=f'conv_{i}')(x)
            x = nn.relu(x)
        b, t, f, c = x.shape
        # channel-major flatten of (freq, chan), matching the reference's
        # [B, C·H, T'] view (``Modules.py:370``)
        x = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)

        for i in range(ref.gru.stacks):
            x = nn.RNN(nn.GRUCell(ref.gru.size, dtype=self.dtype,
                                  name=f'gru_cell_{i}'))(x)

        # last valid compressed step: ceil(len / prod(strides)) - 1
        total_stride = int(math.prod(ref.conv.strides))
        last = jnp.ceil(mel_lengths / total_stride).astype(jnp.int32) - 1
        last = jnp.clip(last, 0, t - 1)
        summary = jnp.take_along_axis(
            x, last[:, None, None].repeat(x.shape[-1], axis=2), axis=1
        )[:, 0]                                              # [B, gru]

        tokens = self.param(
            'style_tokens', nn.initializers.normal(stddev=0.5),
            (cfg.style_token.num_tokens, cfg.style_token.size))
        keys = jnp.broadcast_to(jnp.tanh(tokens)[None],
                                (b,) + tokens.shape)
        out, _ = RelativePositionMultiHeadAttention(
            calc_channels=cfg.size, out_channels=cfg.size,
            num_heads=cfg.style_token.attention_head,
            dtype=self.dtype, name='attention',
        )(summary[:, None, :], keys=keys, deterministic=deterministic)
        return out[:, 0]                                     # [B, P]


class SpeakerClassifier(nn.Module):
    """Adversarial speaker classifier on the prosody vector (GR mode)."""
    config: Config

    @nn.compact
    def __call__(self, prosody):
        x = gradient_reversal(
            prosody, self.config.train.adversarial_speaker_weight)
        for i, ch in enumerate(self.config.speaker_classifier_gr.channels):
            x = nn.Dense(ch, kernel_init=nn.initializers.kaiming_uniform(),
                         name=f'hidden_{i}')(x)
            x = nn.relu(x)
        return nn.Dense(self.config.speaker_embedding.num_speakers,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name='output')(x)


def interpolate_pitch(pitches: jax.Array,
                      base_lengths: jax.Array,
                      new_lengths: jax.Array,
                      max_new_length: int) -> jax.Array:
    """Linearly resample each pitch track from its base length to its new
    (predicted) length, align_corners=True; zero beyond the new length.

    pitches [B, T_base], lengths [B] → [B, max_new_length].
    """
    b, t_base = pitches.shape
    out_pos = jnp.arange(max_new_length)[None, :]            # [1, T_new]
    denom = jnp.maximum(new_lengths[:, None] - 1, 1)
    src = out_pos * (base_lengths[:, None] - 1) / denom      # fractional idx
    src = jnp.clip(src, 0, t_base - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_base - 1)
    frac = (src - lo).astype(pitches.dtype)
    gathered = (jnp.take_along_axis(pitches, lo, axis=1) * (1 - frac)
                + jnp.take_along_axis(pitches, hi, axis=1) * frac)
    valid = out_pos < new_lengths[:, None]
    return jnp.where(valid, gathered, 0.0)
