"""Text encoder: prenet → RPR transformer → prior projection + duration
predictor.

Behaviour surface of the reference ``Modules.py:232-648``:

* token embedding scaled by √C (``Modules.py:267``), init N(0, C^-1/2)
* Prenet: ``stacks``× (conv k5 → LayerNorm(1e-4) → ReLU → Dropout 0.5)
  then a 1×1 conv with a residual connection around the whole stack, masked
  (``Modules.py:438-489``)
* Transformer: ``stacks``× pre-masked blocks of
  RPR self-attention → dropout → add&LN → conv k3 (C→calc) → ReLU → dropout
  → conv k3 (calc→C) → dropout → add&LN, post-LN style with eps 1e-4
  (``Modules.py:509-573``)
* projection to (mean, log_std) over 2×mel_dim channels, masked
  (``Modules.py:255-275``)
* duration predictor on **detached** encoder features, with the
  speaker/prosody conditioning vector broadcast over time and concatenated
  (``Modules.py:576-648``); conditioning vectors are also detached
  (``Modules.py:277-282``)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from glow_tts_tpu.config import Config
from glow_tts_tpu.models.layers import (
    Conv1d, FastDropout, LayerNorm, RelativePositionMultiHeadAttention,
    masked)


class Prenet(nn.Module):
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        cfg = self.config.encoder
        residual = x
        for i in range(cfg.prenet.stacks):
            x = Conv1d(cfg.channels, cfg.prenet.kernel_size,
                       dtype=self.dtype, name=f'conv_{i}')(masked(x, mask))
            x = LayerNorm(dtype=self.dtype, name=f'norm_{i}')(x)
            x = nn.relu(x)
            x = FastDropout(cfg.prenet.dropout_rate)(
                x, deterministic=deterministic)
        x = Conv1d(cfg.channels, 1, dtype=self.dtype,
                   name='proj')(x) + residual
        return masked(x, mask)


class TransformerBlock(nn.Module):
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, attn_mask, deterministic: bool = True):
        cfg = self.config.encoder.transformer
        x = masked(x, mask)
        residual = x
        x, _ = RelativePositionMultiHeadAttention(
            calc_channels=self.config.encoder.channels,
            out_channels=self.config.encoder.channels,
            num_heads=cfg.attention.heads,
            window_size=cfg.attention.window_size,
            dropout_rate=cfg.dropout_rate,
            dtype=self.dtype, name='attention',
        )(x, mask=attn_mask, deterministic=deterministic)
        x = FastDropout(cfg.dropout_rate)(x, deterministic=deterministic)
        x = LayerNorm(dtype=self.dtype, name='norm_0')(x + residual)

        residual = x
        x = Conv1d(cfg.conv.calc_channels, cfg.conv.kernel_size,
                   dtype=self.dtype, name='conv_0')(masked(x, mask))
        x = nn.relu(x)
        x = FastDropout(cfg.dropout_rate, time_major_bits=True)(
            x, deterministic=deterministic)
        x = Conv1d(self.config.encoder.channels, cfg.conv.kernel_size,
                   dtype=self.dtype, name='conv_1')(masked(x, mask))
        x = FastDropout(cfg.dropout_rate)(x, deterministic=deterministic)
        x = LayerNorm(dtype=self.dtype, name='norm_1')(masked(x, mask) + residual)
        return x


class DurationPredictor(nn.Module):
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, condition=None, deterministic: bool = True):
        """x [B, T, C] (already stop-gradiented); condition [B, E] or None."""
        cfg = self.config.encoder.duration_predictor
        if condition is not None:
            cond = jnp.broadcast_to(
                condition[:, None, :],
                (x.shape[0], x.shape[1], condition.shape[-1]))
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        for i in range(cfg.stacks):
            x = Conv1d(cfg.channels, cfg.kernel_size, dtype=self.dtype,
                       name=f'conv_{i}')(masked(x, mask))
            x = nn.relu(x)
            x = FastDropout(cfg.dropout_rate, time_major_bits=True)(
                x, deterministic=deterministic)
        x = Conv1d(1, 1, dtype=self.dtype, name='proj')(masked(x, mask))
        return masked(x, mask)                              # [B, T, 1]


class TextEncoder(nn.Module):
    """Token ids → per-token Gaussian prior (mean, log_std) + log-duration."""
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens, mask, condition=None,
                 deterministic: bool = True):
        """tokens [B, T] int32; mask [B, T, 1]; condition [B, E] or None.

        Returns (mean [B, T, M], log_std [B, T, M], log_durations [B, T, 1]).
        """
        cfg = self.config.encoder
        embed = nn.Embed(
            cfg.embedding_tokens, cfg.channels,
            embedding_init=nn.initializers.normal(cfg.channels ** -0.5),
            dtype=self.dtype, name='embedding')
        x = embed(tokens) * jnp.sqrt(cfg.channels).astype(
            self.dtype or jnp.float32)

        x = Prenet(self.config, self.dtype, name='prenet')(
            x, mask, deterministic)

        m = mask[..., 0]                                     # [B, T]
        attn_mask = m[:, None, :, None] * m[:, None, None, :]  # [B,1,T,T]
        for i in range(cfg.transformer.stacks):
            x = TransformerBlock(self.config, self.dtype, name=f'block_{i}')(
                x, mask, attn_mask, deterministic)
        x = masked(x, mask)

        stats = masked(Conv1d(2 * self.config.sound.mel_dim, 1,
                              kernel_init=nn.initializers.xavier_uniform(),
                              dtype=self.dtype, name='project')(x), mask)
        mean, log_std = jnp.split(stats, 2, axis=-1)

        # Duration predictor sees detached features and conditioning
        # (reference Modules.py:277-282).
        log_durations = DurationPredictor(
            self.config, self.dtype, name='duration_predictor')(
            jax.lax.stop_gradient(x), mask,
            None if condition is None else jax.lax.stop_gradient(condition),
            deterministic)

        return mean, log_std, log_durations
