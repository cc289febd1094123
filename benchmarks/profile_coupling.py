"""Fused Pallas coupling vs flax coupling on the real TPU.

Evidence script for the fused-kernel milestone (VERDICT r1 item 1):

* device-side ms for the full 12-step FlowDecoder in both directions at
  production size (batch 32, 768 mel frames → 384 squeezed), flax vs the
  per-step fused kernel vs the 12-step megakernel ('mega'), bf16 and
  f32 — timed with the chained-carry protocol
  (CLAUDE.md "benchmarking pitfalls": iteration i's input depends on the
  carry so XLA cannot hoist, and the chain runs device-side in one
  dispatch);
* numerical agreement between the two backends on device;
* optional ``--profile``: xplane op-time breakdown for both backends
  (the before/after fusion evidence).

Run: python benchmarks/profile_coupling.py [--profile] [--iters 50]
Writes benchmarks/coupling_results.json.
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, T_MEL = 32, 768

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'coupling_results.json')


def save_results(results):
    """Atomic per-row persist: a bounded invocation killed mid-dump must
    not truncate previously saved rows (ADVICE r3) — write to a temp file
    in the same directory and os.replace() over the target."""
    tmp = _OUT + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, _OUT)


def build(backend, dtype_str):
    import jax
    import jax.numpy as jnp
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.models.decoder import FlowDecoder

    cfg = load_config({'Mode': 'Vanilla',
                       'TPU': {'coupling_backend': backend,
                               'compute_dtype': dtype_str}})
    dt = jnp.bfloat16 if dtype_str == 'bfloat16' else jnp.float32
    dec = FlowDecoder(cfg, dtype=dt if dtype_str == 'bfloat16' else None)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (BATCH, T_MEL, cfg.sound.mel_dim)), dt)
    mask = jnp.ones((BATCH, T_MEL, 1), jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), x, mask)
    return dec, params, x, mask


def chained(dec, params, x, mask, reverse, iters, prec=None):
    """One jitted dispatch running ``iters`` chained decoder passes.
    ``prec``: matmul-precision scope — the f32 rows run the flax baseline
    under the selective-precision policy's 'tensorfloat32' (3-pass MXU),
    the same contraction the kernels' in-kernel decomposition performs."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0):
        def body(i, carry):
            with jax.default_matmul_precision(prec or 'default'):
                z, _, _ = dec.apply(params, carry, mask, reverse=reverse)
            # feed a scaled copy back so the loop cannot be hoisted
            return (z * 0.999 + 1e-4 * i).astype(carry.dtype)
        return jax.lax.fori_loop(0, iters, body, x0)

    out = run(x)                      # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0   # ms per pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--profile', action='store_true')
    parser.add_argument('--iters', type=int, default=50)
    args = parser.parse_args()

    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    import jax
    import jax.numpy as jnp

    results = {'device': str(jax.devices()[0]), 'batch': BATCH,
               'mel_frames': T_MEL, 'runs': {}}

    on_tpu = jax.default_backend() == 'tpu'
    for dtype_str in ('bfloat16', 'float32'):
        # Off-TPU the decoder gates resolve 'fused'/'mega' to flax —
        # record the RESOLVED backend and skip the self-comparison rows
        # so the JSON can never be misread as a kernel measurement
        # (ADVICE r2).  On-TPU f32 runs the kernels' in-kernel 3-pass
        # decomposition (ops/coupling.py) and IS measured.
        kernel_ok = on_tpu
        # identical params for both backends → direct numeric comparison
        dec_f, params, x, mask = build('flax', dtype_str)
        kernel_backends = ('fused', 'mega') if kernel_ok else ()
        prec = 'tensorfloat32' if dtype_str == 'float32' else None
        for reverse in (False, True):
            key = f"{dtype_str}/{'reverse' if reverse else 'forward'}"
            ms_f = chained(dec_f, params, x, mask, reverse, args.iters,
                           prec=prec)
            if not kernel_ok:
                results['runs'][key] = {
                    'flax_ms': round(ms_f, 3), 'fused_ms': None,
                    'backend_resolved': 'flax',
                    'note': 'fused/mega gates fall back to flax here; no '
                            'kernel measurement possible'}
                print(json.dumps({key: results['runs'][key]}), flush=True)
                save_results(results)       # fallback rows persist too
                continue
            row = {'flax_ms': round(ms_f, 3)}
            if prec:
                row['flax_precision'] = prec
            with jax.default_matmul_precision(prec or 'default'):
                z_f, ld_f, _ = jax.jit(functools.partial(
                    dec_f.apply, reverse=reverse))(params, x, mask)
            scale = float(jnp.max(jnp.abs(z_f.astype(jnp.float32)))) or 1.0
            for backend in kernel_backends:
                dec_k, _, _, _ = build(backend, dtype_str)
                z_k, ld_k, _ = jax.jit(functools.partial(
                    dec_k.apply, reverse=reverse))(params, x, mask)
                err = float(jnp.max(jnp.abs(z_f.astype(jnp.float32)
                                            - z_k.astype(jnp.float32))))
                ld_err = (float(jnp.max(jnp.abs(ld_f - ld_k)))
                          if ld_f is not None else None)
                ms_k = chained(dec_k, params, x, mask, reverse, args.iters,
                               prec=prec)
                row[f'{backend}_ms'] = round(ms_k, 3)
                row[f'{backend}_speedup'] = round(ms_f / ms_k, 3)
                row[f'{backend}_max_abs_diff'] = err
                row[f'{backend}_rel_diff'] = err / scale
                row[f'{backend}_logdet_max_diff'] = ld_err
            results['runs'][key] = row
            print(json.dumps({key: row}), flush=True)
            # persist after every row: cold-cache compiles through the
            # remote relay run ~5 min each, so a bounded invocation may
            # be killed mid-sweep — measured rows must survive it
            save_results(results)

    if args.profile:
        from benchmarks.profile_ops import profile_device_ops
        dec_f, params, x, mask = build('flax', 'bfloat16')
        dec_k, _, _, _ = build('fused', 'bfloat16')
        dec_m, _, _, _ = build('mega', 'bfloat16')
        for name, dec in (('flax', dec_f), ('fused', dec_k),
                          ('mega', dec_m)):
            fn = jax.jit(functools.partial(dec.apply, reverse=True))
            ops, total_ps = profile_device_ops(fn, params, x, mask, iters=3)
            top = [(op, ps / 1e9 / 3) for op, ps, _ in ops[:12]]
            results['runs'][f'profile_{name}_top_ops_ms'] = [
                (op, round(ms, 4)) for op, ms in top]
            results['runs'][f'profile_{name}_total_ms'] = round(
                total_ps / 1e9 / 3, 4)
            print(f'# {name} device total '
                  f'{total_ps / 1e9 / 3:.3f} ms/pass, top ops:', flush=True)
            for op, ms in top:
                print(f'#   {ms:8.4f} ms  {op}', flush=True)

    save_results(results)
    print(json.dumps({k: v for k, v in results.items() if k != 'runs'}))


if __name__ == '__main__':
    main()
