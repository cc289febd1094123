"""Train-step variant timings for the MFU push (VERDICT r4 #4).

The profiled 23.4 ms step is bandwidth-bound, not FLOP-bound: the matmul
fusions sum to ~9-10 ms (the XLA-counted 1.80 TFLOP step needs >= 9.15 ms
at v5e peak) and the other ~12 ms is memory-bound elementwise / dropout /
reduction fusions (benchmarks/queue_logs -- profile_train.py, round 5).
So the experiments here attack HBM traffic, not FLOPs:

  baseline     the round-4 shipping config ('auto' coupling backend,
               32-bit dropout words — pinned explicitly so the A/B stays
               valid now that 16-bit is the production default)
  remat        remat_flows=True (pure per-step recompute)
  remat_dots   remat + policy dots_saveable (keep MXU outputs, recompute
               the memory-bound elementwise chains in the backward)
  remat_dnb    remat + dots_with_no_batch_dims_saveable
  drop16       16-bit hardware-RNG dropout words (halves mask traffic)
  drop8        8-bit words
  dropmul      multiply-by-mask dropout formulation instead of select
  drop16mul    both
  d16m_rdots   drop16 + dropmul + remat_dots (stacking the winners)

XLA-flag variants are set by the CALLER via XLA_FLAGS (flags must be set
before backend init), e.g.:
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      python benchmarks/exp_train_variants.py baseline

Protocol = bench.py's train section verbatim: one jitted fori_loop of
CHAIN steps threaded through the carried TrainState (device-side time;
the ~35 ms tunnel dispatch amortises to ~0.35 ms/step at CHAIN=100),
best-of-2 with a scalar loss readback inside the timed region.

XLA compiler options (the axon client rejects TPU flags in XLA_FLAGS —
'Unknown flag', parse_flags_from_env is client-side) are passed per-compile
instead: a trailing ``opt:KEY=VALUE`` arg forwards to
``.compile(compiler_options=...)``, e.g.
  python benchmarks/exp_train_variants.py default 100 \
      opt:xla_tpu_scoped_vmem_limit_kib=65536

CLI: python benchmarks/exp_train_variants.py VARIANT [CHAIN] [opt:K=V ...]
Prints one JSON line {variant, ms_per_step, mfu, flops, loss}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'baseline'
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    compiler_options = {}
    for arg in sys.argv[3:]:
        if not arg.startswith('opt:') or '=' not in arg:
            raise SystemExit(f'bad arg {arg!r} (want opt:KEY=VALUE)')
        k, v = arg[4:].split('=', 1)
        compiler_options[k] = v

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.models import layers
    from glow_tts_tpu.training.step import (create_train_state,
                                            make_train_step)
    from bench import _compiled_flops, _peak_flops

    tpu_over = {'mas_backend': 'pallas'}
    if variant in ('remat', 'remat_dots', 'remat_dnb'):
        tpu_over['remat_flows'] = True
        tpu_over['remat_policy'] = {
            'remat': None,
            'remat_dots': 'dots_saveable',
            'remat_dnb': 'dots_with_no_batch_dims_saveable'}[variant]
    elif variant == 'drop16':
        layers._DROPOUT_BITS = 16
    elif variant == 'drop8':
        layers._DROPOUT_BITS = 8
    elif variant == 'dropmul':
        layers._DROPOUT_MUL = True
    elif variant == 'drop16mul':
        layers._DROPOUT_BITS = 16
        layers._DROPOUT_MUL = True
    elif variant == 'd16m_rdots':
        layers._DROPOUT_BITS = 16
        layers._DROPOUT_MUL = True
        tpu_over['remat_flows'] = True
        tpu_over['remat_policy'] = 'dots_saveable'
    elif variant == 'dropvjp':
        # 16-bit words + custom_vjp mask regeneration in the backward
        # (no stored bits / keep-mask between fwd and bwd)
        layers._DROPOUT_STATELESS_BWD = True
    elif variant == 'dropremat':
        # same regeneration via jax.checkpoint on the mask derivation —
        # sidesteps the custom_vjp const_args bug (see layers.py)
        layers._DROPOUT_REMAT_MASK = True
    elif variant == 'no_tbc':
        # disable time-major mask generation (the round-5 layout win:
        # 22.2 → 20.7 ms/step; this variant recreates the 22.2 baseline)
        layers._DROPOUT_TIME_MAJOR = False
    elif variant == 'no_skew':
        # disable the skewed-table relative attention (restores the
        # pad/reshape rel↔abs shuffle path of rounds 1-4)
        layers._ATTN_SKEW_TABLE = False
    elif variant == 'default':
        pass                      # whatever layers.py currently ships
    elif variant == 'baseline':
        layers._DROPOUT_BITS = 32
        layers._DROPOUT_MUL = False
    else:
        raise SystemExit(f'unknown variant {variant!r}')

    cfg = load_config({'Mode': 'Vanilla', 'TPU': tpu_over})
    BATCH, TOKEN_LEN, T_MEL = 32, 128, 768
    rng = np.random.default_rng(0)
    batch = {
        'tokens': rng.integers(0, 35, (BATCH, TOKEN_LEN)).astype(np.int32),
        'token_lengths': np.full((BATCH,), TOKEN_LEN, np.int32),
        'mels': rng.standard_normal((BATCH, T_MEL, 80)).astype(np.float32),
        'mel_lengths': np.full((BATCH,), T_MEL, np.int32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    train_fn = make_train_step(cfg, model)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    _, metrics_shape = jax.eval_shape(train_fn, state, jb)
    zero_metrics = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype), metrics_shape)

    @jax.jit
    def chained_train(st):
        return jax.lax.fori_loop(
            0, chain, lambda i, carry: train_fn(carry[0], jb),
            (st, zero_metrics))

    if variant == 'dropvjp':
        # The AOT handle cannot carry custom_vjp closures in this jax
        # build: the hoisted per-site constants become executable
        # const_args ("compiled for 1596 inputs but called with 1549"),
        # and even compiling the handle in-process poisons the later jit
        # dispatch (second call dies with an opaque TPU InvalidArgument).
        # Skip AOT entirely; the step's XLA-counted FLOPs are
        # dropout-variant-invariant, so reuse the default-variant figure
        # for the MFU denominator.
        flops = 1800352301056.0
        run = chained_train
    else:
        compiled = chained_train.lower(state).compile(
            compiler_options=compiler_options or None)
        flops = _compiled_flops(compiled)
        run = compiled
    out = run(state)
    jax.block_until_ready(out)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = run(out[0])
        float(np.asarray(out[1]['total']))
        times.append(time.perf_counter() - t0)
    sec = min(times) / chain
    peak = _peak_flops(jax.devices()[0])
    print(json.dumps({
        'variant': variant,
        'chain': chain,
        'ms_per_step': round(sec * 1e3, 3),
        'flops_per_step': flops,
        'mfu': round(flops / sec / peak, 4) if flops and peak else None,
        'loss': round(float(np.asarray(out[1]['total'])), 4),
        'xla_flags': os.environ.get('XLA_FLAGS', ''),
        'compiler_options': compiler_options,
    }), flush=True)


if __name__ == '__main__':
    main()
