"""Core neural layers, channels-last ([B, T, C]) for TPU.

The reference keeps PyTorch's channels-first [B, C, T] layout and pays for a
transpose around every LayerNorm (``Modules.py:485,562``).  Here the channel
axis is last — the TPU lane dimension — so LayerNorm, matmuls and (1×1)
convs hit the VPU/MXU without layout churn, and masks broadcast as
[B, T, 1].
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from glow_tts_tpu.ops import attention as attn_ops

Dtype = jnp.dtype


def masked(x: jax.Array, mask: jax.Array) -> jax.Array:
    """``x * mask`` without dtype promotion: the float32 mask would
    otherwise promote bf16 activations to f32 through every masked op
    (profiled as doubled HBM traffic on the whole flow path).  The mask
    is 0/1 — exact in any dtype — so casting it is lossless."""
    return x * mask.astype(x.dtype)


def sequence_mask(lengths: jax.Array, max_length: int,
                  dtype=jnp.float32) -> jax.Array:
    """[B] lengths → [B, T, 1] float mask (cf. ``Modules.py:206-211``,
    which returns [B, 1, T] for the channels-first layout)."""
    mask = jnp.arange(max_length)[None, :] < lengths[:, None]
    return mask[..., None].astype(dtype)


class _DenseParams(nn.Module):
    """Declares the exact parameter tree of an ``nn.Dense`` (same scope
    name, param names, shapes and initialisers) and returns the raw values
    instead of applying them — used by the fused-coupling path to hand
    effective kernels to the Pallas kernel while staying checkpoint- and
    init-compatible with the flax path."""
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param('kernel', self.kernel_init,
                            (in_features, self.features))
        bias = (self.param('bias', nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class Conv1d(nn.Module):
    """1-D convolution over the time axis with explicit SAME padding.

    kernel_size 1 lowers to a Dense (pure MXU matmul).  With
    ``return_params=True`` (1×1 only) returns the raw ``(kernel, bias)``
    instead of applying — identical parameter tree either way.
    """
    features: int
    kernel_size: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        if return_params:
            assert self.kernel_size == 1, 'return_params is 1×1-only'
            return _DenseParams(self.features, self.use_bias,
                                self.kernel_init, name='dense')(x.shape[-1])
        if self.kernel_size == 1:
            return nn.Dense(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                kernel_init=self.kernel_init, name='dense')(x)
        return nn.Conv(
            self.features, (self.kernel_size,), padding='SAME',
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=self.kernel_init, name='conv')(x)


class WNConv1d(nn.Module):
    """Weight-normalised conv (torch ``weight_norm`` dim-0 semantics: one
    magnitude per output channel, direction normalised over (k, in)).

    Used throughout the coupling WaveNet (``Modules.py:766,818,825``).
    With ``return_params=True`` returns the effective (weight-normed)
    ``(kernel [k, in, out], bias)`` in fp32 instead of applying — the
    fused-coupling path feeds these to the Pallas kernel.

    With ``fold=True`` (serving path) the module expects ``v`` to already
    hold the effective kernel — apply :func:`fold_weight_norm_params` to a
    trained checkpoint — and skips the per-dispatch normalisation
    (``g`` no longer exists in the tree).
    """
    features: int
    kernel_size: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None
    fold: bool = False

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        kshape = (self.kernel_size, x.shape[-1], self.features)
        v = self.param('v', self.kernel_init, kshape)
        if self.fold:
            kernel = v
        else:
            # g initialised to ‖v‖ so the initial effective kernel equals v
            g = self.param(
                'g', lambda _: jnp.sqrt((v.astype(jnp.float32) ** 2)
                                        .sum(axis=(0, 1))))
            norm = jnp.sqrt((v.astype(jnp.float32) ** 2).sum(
                axis=(0, 1), keepdims=True))
            kernel = (g[None, None, :] * v / jnp.maximum(norm, 1e-12))
        if return_params:
            bias = (self.param('b', nn.initializers.zeros, (self.features,))
                    if self.use_bias else None)
            return kernel.astype(jnp.float32), bias
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            x = x.astype(self.dtype)
        # NOTE: 1×1 convs deliberately stay conv_general_dilated.  The
        # round-5 A/B (benchmarks/exp_variants_r5.jsonl 'wn1x1dot')
        # measured the "free XLA of conv layout constraints" rewrite
        # (1×1 → x @ kernel[0]) at 23.24 ms/step vs 20.80 conv — the
        # conv epilogue fusions beat the dot's layout preferences even
        # though the conv backward costs 24 relayout copies per step.
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,),
            padding=[((self.kernel_size - 1) // 2,
                      self.kernel_size // 2)],
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        if self.use_bias:
            bias = self.param('b', nn.initializers.zeros, (self.features,))
            out = out + (bias.astype(self.dtype) if self.dtype else bias)
        return out


# Dropout mask-word width and formulation (benchmarks/exp_train_variants.py,
# round-5 hardware sweep on v5e, batch 32 × 768 frames, chained protocol):
# 16-bit words won the train step (22.24 vs 23.90 ms/step at 32-bit —
# the 48 coupling-WaveNet masks are ~0.9 GB/step of RNG traffic at 32-bit,
# halved at 16); 8-bit regressed to 23.84 (sub-word layout cost eats the
# bandwidth win) and the multiply-by-mask formulation lost outright
# (26.4 ms).  The mask words are pure random bits — narrower words change
# only the threshold granularity (keep_prob quantised to 2^-bits instead
# of 2^-32; at rate 0.05 the effective rate moves by < 8e-6 at 16 bits),
# not the contract.  Module-level so the experiment harness can restore
# the 32-bit baseline for A/B runs.
_DROPOUT_BITS = 16
_DROPOUT_MUL = False
# Stateless-backward dropout: REGENERATE the mask from the rng key in the
# backward pass instead of letting XLA store the bits (or keep-mask)
# between fwd and bwd.  The round-5 profile shows the stored-mask
# round-trip as standalone copy_compare / multiply_select fusions
# (~4.6 ms/step across the 48 coupling-WaveNet sites); the hardware RNG
# re-draw is nearly free (rng-bit-generator totals 0.37 ms/step), so
# trading storage for recompute is the right direction on a
# bandwidth-bound step.  Gradients are bit-equal by construction (same
# key → same bits → same mask).  Two formulations:
#   _DROPOUT_STATELESS_BWD — custom_vjp pair.  BROKEN in this jax build:
#     a custom_vjp anywhere in the step flips the whole program's closure
#     consts into runtime const_args, and the jit fast path drops them on
#     the second dispatch ("Execution supplied 1553 buffers but compiled
#     program expected 1592" on CPU, opaque InvalidArgument on TPU).
#     Kept for when the bug is fixed; reproduced in
#     benchmarks/queue_logs/r5_variants.log.
#   _DROPOUT_REMAT_MASK — jax.checkpoint around just the mask derivation
#     (key → bits → keep).  Same effect (bwd recomputes the mask from the
#     4-word key), no custom_vjp, no const bug.
_DROPOUT_STATELESS_BWD = False
_DROPOUT_REMAT_MASK = False
# Kill switch for the time-major mask generation below (A/B harness:
# benchmarks/exp_train_variants.py 'no_tbc').
_DROPOUT_TIME_MAJOR = True
# Kill switch for the skewed-table relative attention (A/B harness
# 'no_skew'): False restores the pad/reshape rel↔abs shuffle path.
_ATTN_SKEW_TABLE = True


def _rng_bits(key4, shape, bits_dtype, time_major):
    """Draw mask words, optionally in time-major [T, B, C] order.

    At the profiled hot sites (WaveNet gate dropout, encoder FFN hidden)
    the consuming fusions read the mask in physical [T, B, C] order (XLA
    layout ``{2,0,1}``) while ``rng_bit_generator`` emits its logical
    shape row-major (``{2,1,0}``): the compiled train step re-laid every
    WaveNet gate mask out TWICE — 96 in-fusion ``u16[32,384,384]`` copies,
    ~0.9 GB/step of strided traffic (round-5 HLO dump,
    ``benchmarks/dump_hlo.py``).  Generating the bits with the logical
    shape already permuted to [T, B, C] and transposing back makes the
    transpose a layout bitcast, so consumers read the rng output directly.
    Value contract is unchanged (a different but equally-random stream).
    """
    if time_major and _DROPOUT_TIME_MAJOR and len(shape) == 3:
        t, b, c = shape[1], shape[0], shape[2]
        _, bits = jax.lax.rng_bit_generator(key4, (t, b, c),
                                            dtype=bits_dtype)
        return jax.lax.transpose(bits, (1, 0, 2))
    _, bits = jax.lax.rng_bit_generator(key4, shape, dtype=bits_dtype)
    return bits


def _stateless_dropout_fn(rate: float, nbits: int, time_major: bool):
    """Build (and cache) the custom_vjp dropout for a static (rate, width).

    The mask derivation must match FastDropout's inline path exactly —
    same rng_bit_generator call, same threshold — so flipping
    ``_DROPOUT_STATELESS_BWD`` never changes values, only where the
    backward's mask comes from.
    """
    cached = _stateless_dropout_cache.get((rate, nbits, time_major))
    if cached is not None:
        return cached

    bits_dtype = {32: jnp.uint32, 16: jnp.uint16, 8: jnp.uint8}[nbits]
    threshold = bits_dtype(int(round((1.0 - rate) * float(2 ** nbits) - 1)))
    keep_prob = 1.0 - rate

    def _apply(key4, v):
        bits = _rng_bits(key4, v.shape, bits_dtype, time_major)
        keep = bits <= threshold
        scale = jnp.asarray(1.0 / keep_prob, v.dtype)
        return jnp.where(keep, v * scale, jnp.zeros_like(v))

    @jax.custom_vjp
    def drop(key4, x):
        return _apply(key4, x)

    def drop_fwd(key4, x):
        return _apply(key4, x), key4      # residual: 4 uint32 words, no mask

    def drop_bwd(key4, g):
        return None, _apply(key4, g)      # re-draw the identical mask

    drop.defvjp(drop_fwd, drop_bwd)
    _stateless_dropout_cache[(rate, nbits, time_major)] = drop
    return drop


_stateless_dropout_cache = {}


class FastDropout(nn.Module):
    """Dropout with the hardware RNG (``lax.rng_bit_generator``).

    flax's ``nn.Dropout`` draws its mask through threefry — ~25 ALU ops
    per element on the VPU, and XLA *recomputes* the whole counter chain
    in the backward pass instead of storing the mask.  Profiled on the
    v5e train step (batch 32 × 768 frames) the threefry chains accounted
    for several ms/step, fused into the WaveNet conv epilogues and the
    bias-gradient reductions.  ``RngBitGenerator`` emits the mask in one
    hardware pass; the functional contract is unchanged (deterministic
    given the 'dropout' rng, distinct per layer via flax's path folding
    — only the stream of random bits differs, which dropout never
    promises anything about).
    """
    rate: float
    # Generate 3-D masks in time-major [T, B, C] order so the bits land in
    # the physical layout the consuming fusions read (see _rng_bits).
    # Opt-in per call site: the profiled win sites are the WaveNet gate
    # dropout and the encoder FFN/duration-predictor hiddens; the
    # post-attention residual sites get layout {1,2,0} from XLA already
    # copy-free and would regress.
    time_major_bits: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng('dropout')
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)
        rbg_key = jnp.tile(key.reshape(-1).astype(jnp.uint32), 2)[:4]
        nbits = _DROPOUT_BITS
        if _DROPOUT_STATELESS_BWD and not _DROPOUT_MUL:
            return _stateless_dropout_fn(
                float(self.rate), nbits, self.time_major_bits)(rbg_key, x)
        bits_dtype = {32: jnp.uint32, 16: jnp.uint16, 8: jnp.uint8}[nbits]
        keep_prob = 1.0 - self.rate
        threshold = bits_dtype(int(round(keep_prob * float(2 ** nbits) - 1)))

        def _keep(key4):
            bits = _rng_bits(key4, x.shape, bits_dtype,
                             self.time_major_bits)
            return bits <= threshold

        if _DROPOUT_REMAT_MASK:
            keep = jax.checkpoint(_keep)(rbg_key)
        else:
            keep = _keep(rbg_key)
        scale = jnp.asarray(1.0 / keep_prob, x.dtype)
        if _DROPOUT_MUL:
            return x * (keep.astype(x.dtype) * scale)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))


def fold_weight_norm_params(params):
    """Fold weight norm into the kernels of a trained parameter tree:
    every ``{v, g}`` pair becomes ``{v: g·v/‖v‖}`` (the exact fp32
    expression :class:`WNConv1d` evaluates per dispatch, so a ``fold=True``
    model on the folded tree is **bit-identical** to the unfolded model on
    the original tree).  The reference pays this recompute every call via
    torch ``weight_norm``'s pre-forward hook (``Modules.py:766,818,825``).
    """
    if isinstance(params, dict):
        if 'v' in params and 'g' in params:
            v = params['v']
            g = params['g']
            norm = jnp.sqrt((v.astype(jnp.float32) ** 2).sum(
                axis=(0, 1), keepdims=True))
            folded = dict(params)
            del folded['g']
            folded['v'] = (g[None, None, :] * v
                           / jnp.maximum(norm, 1e-12)).astype(v.dtype)
            return folded
        return {key: fold_weight_norm_params(val)
                for key, val in params.items()}
    return params


class LayerNorm(nn.Module):
    """LayerNorm over channels with the reference's eps (``Modules.py:472-475``:
    eps 1e-4, fp32 statistics)."""
    epsilon: float = 1e-4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


class RelativePositionMultiHeadAttention(nn.Module):
    """Multi-head attention with optional Shaw-style clipped relative
    position embeddings shared across heads.

    Behaviour surface of the reference ``RPR_MHA.py:5-165``:
    * conv-1×1 (== dense) Q/K/V projections, xavier-uniform initialised
    * rel-pos K/V tables ``[1, 2W+1, d_head]`` applied through the
      rel↔abs shuffles, scaled by 1/√d_head
    * optional proximal bias and block (band) masking for self-attention
    * masked positions filled with −1e4 before softmax (not −inf)
    * doubles as plain cross-attention when ``window_size`` is None
      (GST style-token attention, ``Modules.py:349-355``)
    """
    calc_channels: int
    out_channels: int
    num_heads: int
    window_size: Optional[int] = None
    heads_share: bool = True
    proximal_bias: bool = False
    block_length: Optional[int] = None
    dropout_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, queries, keys=None, values=None, mask=None,
                 deterministic: bool = True):
        """queries [B, T_q, C_q]; keys/values [B, T_k, C_k] (None → self);
        mask [B, 1, T_q, T_k] (1 = attend)."""
        self_attention = keys is None and values is None
        if self.window_size is not None or self.proximal_bias or \
                self.block_length is not None:
            assert self_attention, 'relative/proximal/block attention is self-attention only'
        keys = keys if keys is not None else (
            values if values is not None else queries)
        values = values if values is not None else keys

        h = self.num_heads
        d = self.calc_channels // h
        xavier = nn.initializers.xavier_uniform()
        q = nn.Dense(self.calc_channels, kernel_init=xavier,
                     dtype=self.dtype, name='query')(queries)
        k = nn.Dense(self.calc_channels, kernel_init=xavier,
                     dtype=self.dtype, name='key')(keys)
        v = nn.Dense(self.calc_channels, kernel_init=xavier,
                     dtype=self.dtype, name='value')(values)

        b, t_q, _ = q.shape
        t_k = k.shape[1]
        q = q.reshape(b, t_q, h, d).transpose(0, 2, 1, 3)     # [B,H,Tq,d]
        k = k.reshape(b, t_k, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_k, h, d).transpose(0, 2, 1, 3)

        scale = 1.0 / jnp.sqrt(d).astype(q.dtype)
        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                            preferred_element_type=jnp.float32) * scale

        if self.window_size is not None:
            init = nn.initializers.normal(stddev=d ** -0.5)
            n_tables = 1 if self.heads_share else h
            emb_k = self.param('rel_emb_k', init,
                               (n_tables, 2 * self.window_size + 1, d))
            rel_k = attn_ops.clip_relative_embedding(emb_k, t_k)
            if _ATTN_SKEW_TABLE:
                # skewed-table einsum: no [B,H,T,2T-1] activation, no
                # rel→abs relayout shuffle (see skewed_relative_table)
                skew_k = attn_ops.skewed_relative_table(rel_k, t_k)
                if self.heads_share:
                    rel_abs = jnp.einsum(
                        'bhqd,qkd->bhqk', q, skew_k[0],
                        preferred_element_type=jnp.float32)
                else:
                    rel_abs = jnp.einsum(
                        'bhqd,hqkd->bhqk', q, skew_k,
                        preferred_element_type=jnp.float32)
            else:
                # 'n' must broadcast per-head (reference matmul semantics),
                # not contract: with heads_share=False the n axis is h.
                eq = 'bhqd,nrd->bhqr' if self.heads_share else \
                     'bhqd,hrd->bhqr'
                rel_scores = jnp.einsum(eq, q, rel_k,
                                        preferred_element_type=jnp.float32)
                rel_abs = attn_ops.relative_to_absolute(rel_scores)
            scores = scores + rel_abs * scale

        if self.proximal_bias:
            scores = scores + attn_ops.proximal_bias(t_k, scores.dtype)

        if mask is not None:
            if self.block_length is not None:
                band = jnp.tril(
                    jnp.triu(jnp.ones((t_q, t_k), bool), -self.block_length),
                    self.block_length)
                mask = mask * band[None, None]
            scores = jnp.where(mask == 0, jnp.asarray(-1e4, scores.dtype),
                               scores)

        alignments = jax.nn.softmax(scores, axis=-1)
        alignments = FastDropout(self.dropout_rate)(
            alignments, deterministic=deterministic)
        out = jnp.einsum('bhqk,bhkd->bhqd',
                         alignments.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)

        if self.window_size is not None:
            emb_v = self.param('rel_emb_v',
                               nn.initializers.normal(stddev=d ** -0.5),
                               (1 if self.heads_share else h,
                                2 * self.window_size + 1, d))
            rel_v = attn_ops.clip_relative_embedding(emb_v, t_k)
            if _ATTN_SKEW_TABLE:
                skew_v = attn_ops.skewed_relative_table(rel_v, t_k)
                if self.heads_share:
                    out = out + jnp.einsum(
                        'bhqk,qkd->bhqd',
                        alignments.astype(rel_v.dtype), skew_v[0],
                        preferred_element_type=jnp.float32)
                else:
                    out = out + jnp.einsum(
                        'bhqk,hqkd->bhqd',
                        alignments.astype(rel_v.dtype), skew_v,
                        preferred_element_type=jnp.float32)
            else:
                rel_w = attn_ops.absolute_to_relative(alignments)
                eq = 'bhqr,nrd->bhqd' if self.heads_share else \
                     'bhqr,hrd->bhqd'
                out = out + jnp.einsum(eq,
                                       rel_w.astype(rel_v.dtype), rel_v,
                                       preferred_element_type=jnp.float32)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_q, self.calc_channels)
        out = nn.Dense(self.out_channels, dtype=self.dtype,
                       name='proj')(out.astype(queries.dtype))
        return out, alignments
