"""Isolate the WaveNet k5 conv's MXU efficiency on the real TPU.

The train profile shows the flow's k5 convs (fwd + both backward convs)
running at ~26 % of the MXU ideal.  This measures, at production shape
(batch 32 × 384 squeezed frames, 192→384 channels, k=5, bf16):

* ``lax.conv_general_dilated`` (what WNConv1d emits today)
* explicit im2col → one [B·T, 5C] @ [5C, N] matmul
* 5 shifted [B·T, C] @ [C, N] matmuls accumulated

each chained-carry timed (CLAUDE.md protocol), fwd and fwd+bwd.

Run: python benchmarks/profile_conv.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, CIN, COUT, K = 32, 384, 192, 384, 5
ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, CIN)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, CIN, COUT)) * 0.05,
                    jnp.bfloat16)

    def conv_xla(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,),
            padding=[((K - 1) // 2, K // 2)],
            dimension_numbers=('NWC', 'WIO', 'NWC'))

    def conv_im2col(x, w):
        pad = jnp.pad(x, ((0, 0), ((K - 1) // 2, K // 2), (0, 0)))
        cols = jnp.concatenate([pad[:, i:i + T] for i in range(K)],
                               axis=-1)                     # [B, T, K*C]
        return (cols.reshape(B * T, K * CIN)
                @ w.reshape(K * CIN, COUT)).reshape(B, T, COUT)

    def conv_shifted(x, w):
        pad = jnp.pad(x, ((0, 0), ((K - 1) // 2, K // 2), (0, 0)))
        acc = jnp.zeros((B, T, COUT), jnp.float32)
        for i in range(K):
            acc = acc + (pad[:, i:i + T].reshape(B * T, CIN)
                         @ w[i]).reshape(B, T, COUT).astype(jnp.float32)
        return acc.astype(x.dtype)

    flops_fwd = 2 * B * T * K * CIN * COUT
    peak = 197e12

    def timed(fn, grad=False):
        if grad:
            base = fn

            def loss(x, w):
                return base(x, w).astype(jnp.float32).sum()
            g = jax.grad(loss, argnums=(0, 1))

            def step(x, w):
                dx, dw = g(x, w)
                return dx.astype(x.dtype), dw

            @jax.jit
            def chained(x0, w):
                def body(i, carry):
                    dx, _ = step(carry, w)
                    return (carry * 0.999 + dx * 1e-3).astype(carry.dtype)
                return jax.lax.fori_loop(0, ITERS, body, x0)
        else:
            @jax.jit
            def chained(x0, w):
                def body(i, carry):
                    y = fn(carry, w)
                    return (carry * 0.999
                            + y[..., :CIN] * 1e-3).astype(carry.dtype)
                return jax.lax.fori_loop(0, ITERS, body, x0)
        out = chained(x, w)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = chained(x, w)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / ITERS

    print(f'# shape [{B},{T},{CIN}]→{COUT} k{K} bf16; '
          f'fwd ideal {flops_fwd / peak * 1e6:.1f} µs')
    for name, fn in (('xla_conv', conv_xla), ('im2col', conv_im2col),
                     ('shifted', conv_shifted)):
        us = timed(fn) * 1e6
        print(f'{name:10s} fwd  {us:8.1f} µs  '
              f'mxu_eff {flops_fwd / peak / (us / 1e6) * 100:5.1f}%',
              flush=True)
    for name, fn in (('xla_conv', conv_xla), ('im2col', conv_im2col),
                     ('shifted', conv_shifted)):
        us = timed(fn, grad=True) * 1e6
        print(f'{name:10s} f+b  {us:8.1f} µs  '
              f'mxu_eff {3 * flops_fwd / peak / (us / 1e6) * 100:5.1f}%',
              flush=True)


if __name__ == '__main__':
    main()
