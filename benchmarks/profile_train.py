"""Device-op profile of the TRAINING step (real TPU) — the evidence tool
for the MFU work: prints per-op device time for one chained 10-step train
executable (bench.py protocol: batch 32 × 768 mel frames, Vanilla).

CLI: python benchmarks/profile_train.py [top_n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_ops import profile_device_ops  # noqa: E402


def main(top_n: int = 40):
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import (create_train_state,
                                            make_train_step)

    BATCH, TOKEN_LEN, T_MEL = 32, 128, 768
    backend = os.environ.get('GLOWTTS_PROFILE_BACKEND', 'auto')
    cfg = load_config({'Mode': 'Vanilla',
                       'TPU': {'mas_backend': 'pallas',
                               'coupling_backend': backend}})
    print(f'coupling_backend={backend}', flush=True)
    rng = np.random.default_rng(0)
    init_batch = {
        'tokens': rng.integers(0, 35, (BATCH, TOKEN_LEN)).astype(np.int32),
        'token_lengths': np.full((BATCH,), TOKEN_LEN, np.int32),
        'mels': rng.standard_normal((BATCH, T_MEL, 80)).astype(np.float32),
        'mel_lengths': np.full((BATCH,), T_MEL, np.int32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), init_batch)
    train_fn = make_train_step(cfg, model)
    jb = {k: jnp.asarray(v) for k, v in init_batch.items()}
    _, metrics_shape = jax.eval_shape(train_fn, state, jb)
    zero_metrics = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype), metrics_shape)

    @jax.jit
    def chained_train(st):
        return jax.lax.fori_loop(
            0, 10, lambda i, carry: train_fn(carry[0], jb),
            (st, zero_metrics))

    def run(s):
        out = chained_train(s)
        jax.block_until_ready(out)
        return out

    ops, total = profile_device_ops(run, state, iters=1)

    def short(name):
        return name.split(' = ')[0].lstrip('%')

    def category(name):
        base = short(name)
        return base.rsplit('.', 1)[0]

    # the while op's duration IS the wall time of the 10 chained steps
    wall_ps = sum(ps for name, ps, _ in ops
                  if short(name).startswith('while'))
    print(f'while-loop wall: {wall_ps / 1e9:.2f} ms '
          f'(→ {wall_ps / 1e10:.2f} ms/step)')

    from collections import defaultdict
    cats = defaultdict(int)
    sync_ops = []
    for name, ps, count in ops:
        base = category(name)
        if base.startswith('while'):
            continue
        cats[base] += ps
        # async DMA (copy/slice start-done pairs) overlaps compute;
        # everything else executes serially on the core
        if not base.startswith(('copy-start', 'copy-done', 'slice-start',
                                'slice-done', 'collective-permute-start',
                                'all-gather-start')):
            sync_ops.append((short(name), name, ps, count))
    print('\nby category (async copy durations overlap compute):')
    for base, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f'{ps / 1e9:9.3f} ms  {base}')
    sync_total = sum(ps for _, _, ps, _ in sync_ops)
    print(f'\nsync-op total: {sync_total / 1e9:.2f} ms '
          f'({100 * sync_total / max(wall_ps, 1):.0f}% of wall)\n')
    sync_ops.sort(key=lambda t: -t[2])
    for sname, name, ps, count in sync_ops[:top_n]:
        # pull the fused computation hint out of the HLO text if present
        import re as _re
        hint = ''
        m = _re.search(r'op_name="([^"]+)"', name)
        if m:
            hint = m.group(1)[-110:]
        else:
            # fall back to the result shape + fusion kind
            m = _re.search(r'= (\S+)', name)
            shape = m.group(1) if m else ''
            m = _re.search(r'kind=(\w+)', name)
            hint = f'{shape} {m.group(1) if m else ""}'
        print(f'{ps / 1e9:9.3f} ms  {100 * ps / max(wall_ps, 1):5.1f}%  '
              f'×{count:<4d} {sname}  {hint}')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
