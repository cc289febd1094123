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
# two chain lengths; report the SLOPE (t_long - t_short)/(n_long - n_short)
# so the ~35 ms tunnel dispatch and any early-readiness slack cancel out
# (CLAUDE.md: never trust a single small-dispatch axon timing)
ITERS_SHORT, ITERS_LONG = 200, 1000


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
        # DCE traps (measured: >100 % implied MXU before these fixes):
        # a y[..., :CIN] carry-slice lets XLA narrow the conv to half the
        # output channels, and a LINEAR loss makes the whole backward
        # pass constant-foldable (dy = ones).  Fold ALL outputs into the
        # carry and use a quadratic loss so dy depends on x and dw on y.
        if grad:
            base = fn

            def loss(x, w):
                y = base(x, w).astype(jnp.float32)
                return (y * y).sum() * 0.5
            g = jax.grad(loss, argnums=(0, 1))

            def make_chain(iters):
                @jax.jit
                def chained(x0, w):
                    def body(i, carry):
                        dx, dw = g(carry, w)
                        return (carry * 0.999 + dx.astype(carry.dtype) * 1e-3
                                + dw.astype(jnp.float32)
                                .sum(axis=(0, 2))[None, None, :]
                                .astype(carry.dtype) * 1e-6)
                    out = jax.lax.fori_loop(0, iters, body, x0)
                    return out.astype(jnp.float32).sum()
                return chained
        else:
            def make_chain(iters):
                @jax.jit
                def chained(x0, w):
                    def body(i, carry):
                        y = fn(carry, w)
                        folded = y.reshape(B, T, COUT // CIN, CIN) \
                            .astype(jnp.float32).sum(axis=2)
                        return (carry * 0.999
                                + folded.astype(carry.dtype) * 1e-3)
                    out = jax.lax.fori_loop(0, iters, body, x0)
                    return out.astype(jnp.float32).sum()
                return chained

        def run_once(chain):
            t0 = time.perf_counter()
            float(chain(x, w))          # scalar host readback: cannot
            return time.perf_counter() - t0  # complete before the device

        short, long_ = make_chain(ITERS_SHORT), make_chain(ITERS_LONG)
        run_once(short), run_once(long_)                 # compile
        ts = min(run_once(short) for _ in range(3))
        tl = min(run_once(long_) for _ in range(3))
        return (tl - ts) / (ITERS_LONG - ITERS_SHORT)

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
