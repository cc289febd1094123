"""Relative-position index shuffles for Shaw-style attention.

Pure-gather reindexing tricks (Music-Transformer style) used by the RPR
attention (reference ``RPR_MHA.py:131-165``).  On TPU these pad/reshape
sequences compile to cheap layout ops — no gather scatter needed.

Conventions (channels-last): scores/alignments are [B, H, T_q, *].  The
relative axis has length ``2T-1`` indexing offsets ``-(T-1) … +(T-1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def relative_to_absolute(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] rel-indexed → [B, H, T, T] abs-indexed.

    out[..., i, j] = x[..., i, (j - i) + T - 1].
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))          # [.., T, 2T]
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))              # [.., 2T²+T-1]
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1:]


def absolute_to_relative(x: jax.Array) -> jax.Array:
    """[B, H, T, T] abs-indexed → [B, H, T, 2T-1] rel-indexed.

    out[..., i, r] = x[..., i, i + r - (T - 1)] (0 outside range).
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))      # [.., T, 2T-1]
    x = x.reshape(b, h, t * (2 * t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))                  # [.., 2T²]
    x = x.reshape(b, h, t, 2 * t)
    return x[:, :, :, 1:]


_skew_cache = {}


def _skewed_table_fn(length: int):
    """Build (and cache) the per-length skew gather with a scatter-free VJP."""
    cached = _skew_cache.get(length)
    if cached is not None:
        return cached
    # numpy (not jnp): the first call may run under an active trace, and a
    # jnp constant built there would leak that trace's tracer into the cache
    idx = (np.arange(length)[None, :] - np.arange(length)[:, None]
           + length - 1).astype(np.int32)                      # [L, L]

    @jax.custom_vjp
    def skew(rel):
        return jnp.take(rel, idx, axis=1)

    def skew_fwd(rel):
        return skew(rel), None

    def skew_bwd(_, g):
        # grad_rel[n, r, d] = sum_i g[n, i, i + r - (L-1), d]: a diagonal
        # sum, computed with the abs→rel shuffle on the SMALL [n, d, L, L]
        # cotangent instead of an XLA scatter (serialised on TPU).
        gt = g.transpose(0, 3, 1, 2)                           # [n, d, L, L]
        rel_w = absolute_to_relative(gt)                       # [n, d, L, 2L-1]
        return (rel_w.sum(axis=2).transpose(0, 2, 1),)

    skew.defvjp(skew_fwd, skew_bwd)
    _skew_cache[length] = skew
    return skew


def skewed_relative_table(rel: jax.Array, length: int) -> jax.Array:
    """Per-offset table → per-(query, key) table, out[n,i,j] = rel[n, j-i+L-1].

    rel: [N, 2L-1, D] (offsets -(L-1)…(L-1)) → [N, L, L, D].

    With this table the Shaw/Music-Transformer relative attention terms
    become plain einsums — ``scores_rel = einsum('bhid,nijd->bhij', q, T_k)``
    and ``out_rel = einsum('bhij,nijd->bhid', align, T_v)`` — replacing the
    pad/reshape/slice rel↔abs shuffles on [B, H, L, 2L-1] activations
    (reference ``RPR_MHA.py:131-165``) with one small gather per table.
    On TPU the shuffles are physical relayouts (~0.8 ms/step of the v5e
    train profile, round 5); the gather output is batch-independent
    ([N, L, L, D]) and the einsums are MXU-friendly batched GEMMs at HALF
    the FLOPs of the [.., 2L-1] rel einsums they replace.  The gather's
    backward is a diagonal sum done with the abs→rel shuffle on the small
    table cotangent — no scatter.
    """
    return _skewed_table_fn(length)(rel)


def clip_relative_embedding(embedding: jax.Array, length: int) -> jax.Array:
    """Window-clipped relative embedding table → per-offset table.

    embedding: [H_or_1, 2W+1, D] learned for offsets -W…W.
    Returns [H_or_1, 2L-1, D] for offsets -(L-1)…(L-1): zero-padded beyond
    the window, center-sliced when L-1 < W (reference ``RPR_MHA.py:131-140``).
    """
    window = (embedding.shape[1] - 1) // 2
    pad = max(length - 1 - window, 0)
    padded = jnp.pad(embedding, ((0, 0), (pad, pad), (0, 0)))
    start = max(window - (length - 1), 0)
    return jax.lax.dynamic_slice_in_dim(padded, start, 2 * length - 1, axis=1)


def proximal_bias(length: int, dtype=jnp.float32) -> jax.Array:
    """-log1p(|i-j|) self-attention bias (reference ``RPR_MHA.py:152-155``).
    Present for parity; unused by the shipped configs."""
    seq = jnp.arange(length, dtype=dtype)
    diff = seq[None, :] - seq[:, None]
    return -jnp.log1p(jnp.abs(diff))[None, None]
