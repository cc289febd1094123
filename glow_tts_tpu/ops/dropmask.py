"""Portable counter-based dropout masks for the fused flow kernels.

The train-direction flow-stack megakernel (``ops/coupling.py`` /
``ops/coupling_grad.py``) needs WaveNet dropout *inside* the kernel
(reference ``Modules.py:854-862``: the in-conv output, including its
bias, is dropped before the conditioning adds), and its backward pass
must regenerate the **identical** mask.  ``pltpu.prng_*`` would do that
on hardware but has no interpret-mode lowering in this JAX, which would
make the kernels untestable on the CPU mesh — so the mask is instead a
pure integer-hash function of

    ``(seed, flow step, wavenet layer, sample·r + τ, channel)``

computed with plain ``jnp`` uint32 ops (~6 VPU ops/element) that lower
identically under Mosaic, the Pallas interpreter, and ordinary XLA.
The last property is what makes the exact-parity twin oracle possible:
``coupling_grad.flow_stack_train_reference`` recomputes the very same
masks outside the kernel, so forward values and gradients can be
checked to float32 accuracy without extracting anything from the
kernel.

Row indices are **global** (``sample·r + τ`` with ``r`` the per-sample
padded row count), not packed-block-local, so forward and backward
kernels may use different batch tiles and still agree.

Hash: ``lowbias32`` (Wang-style avalanche hash) applied twice — far
stronger mixing than dropout needs; sequential counters decorrelate
fully.  Keep decision matches ``layers.FastDropout``:
``bits <= round(keep_prob·2³² − 1)``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def hash_u32(x: jax.Array) -> jax.Array:
    """lowbias32: uint32 → uint32 avalanche hash (shifts/xors/mults)."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def layer_salt(seed: jax.Array, step: jax.Array | int,
               layer: int, num_layers: int) -> jax.Array:
    """Scalar uint32 salt for one (flow step, wavenet layer)."""
    sid = jnp.asarray(step, jnp.uint32) * np.uint32(num_layers) + np.uint32(
        layer)
    return hash_u32(jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
                    ^ (sid * np.uint32(0x9E3779B9)))


def keep_threshold(rate: float) -> np.uint32:
    """uint32 threshold: keep iff hash <= threshold (FastDropout's rule)."""
    keep_prob = 1.0 - float(rate)
    return np.uint32(int(round(keep_prob * float(2 ** 32) - 1)))


def keep_scale(salt: jax.Array, row0: jax.Array | int, shape,
               cols_dim: int, rate: float,
               dtype=jnp.float32) -> jax.Array:
    """Mask of {0, 1/(1−rate)} for rows ``row0 .. row0+shape[0]`` ×
    ``shape[1]`` channels (global row indices; ``cols_dim`` = the full
    channel count the counters are laid out over)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.asarray(
        row0, jnp.uint32)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    elem = rows * np.uint32(cols_dim) + cols
    bits = hash_u32(hash_u32(elem + salt))
    inv_keep = np.asarray(1.0 / (1.0 - float(rate)), np.float32)
    return jnp.where(bits <= keep_threshold(rate),
                     jnp.asarray(inv_keep, dtype),
                     jnp.zeros((), dtype))
