"""Train-step timing: flax/XLA decoder vs the train-direction flow-stack
megakernel pair (``ops/coupling_grad.py``).

Chained-carry protocol (CLAUDE.md timing traps): CHAIN steps through the
carried TrainState inside one jit, scalar loss readback inside the timed
region, best-of-2.  Writes ``benchmarks/train_mega_results.json``.

Usage (on the v5e):
    JAX_COMPILATION_CACHE_DIR=.jax_cache python benchmarks/profile_train_mega.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, TOKEN_LEN, T_MEL, CHAIN = 32, 128, 768, 100
# Production-length probe (VERDICT r4 Weak #1): the 674ba8f weight-streaming
# fix was committed against the 1000-frame scoped-VMEM OOM but the last
# committed hardware log predates it — GLOWTTS_TRAIN_MEGA_FRAMES=1000
# reruns the same protocol at the serving bucket and writes a
# frames-suffixed artifact instead of clobbering the 768-frame one.
T_MEL = int(os.environ.get('GLOWTTS_TRAIN_MEGA_FRAMES', str(T_MEL)))
CHAIN = int(os.environ.get('GLOWTTS_TRAIN_MEGA_CHAIN', str(CHAIN)))


def measure(backend):
    import jax
    import jax.numpy as jnp
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import create_train_state, \
        make_train_step

    on_tpu = jax.devices()[0].platform == 'tpu'
    cfg = load_config({
        'Mode': 'Vanilla',
        'TPU': {'mas_backend': 'pallas' if on_tpu else 'scan',
                'coupling_backend': backend},
    })
    rng = np.random.default_rng(0)
    s = cfg.decoder.num_squeeze
    batch = {
        'tokens': rng.integers(0, cfg.encoder.embedding_tokens,
                               (BATCH, TOKEN_LEN)).astype(np.int32),
        'token_lengths': np.full((BATCH,), TOKEN_LEN, np.int32),
        'mels': rng.standard_normal((BATCH, T_MEL, cfg.sound.mel_dim)
                                    ).astype(np.float32),
        'mel_lengths': np.full((BATCH,), T_MEL // s * s, np.int32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    train_fn = make_train_step(cfg, model)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    _, metrics_shape = jax.eval_shape(train_fn, state, jb)
    zero_metrics = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype), metrics_shape)

    @jax.jit
    def chained(st):
        return jax.lax.fori_loop(
            0, CHAIN, lambda i, carry: train_fn(carry[0], jb),
            (st, zero_metrics))

    t0 = time.perf_counter()
    compiled = chained.lower(state).compile()
    compile_s = time.perf_counter() - t0
    out = compiled(state)
    jax.block_until_ready(out)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = compiled(out[0])
        float(np.asarray(out[1]['total']))
        times.append(time.perf_counter() - t0)
    ms = min(times) / CHAIN * 1e3
    loss = float(np.asarray(out[1]['total']))
    print(f'{backend:6s}: {ms:8.2f} ms/step  loss {loss:.4f} '
          f'(compile {compile_s:.0f}s)', flush=True)
    return {'backend': backend, 'ms_per_step': round(ms, 3),
            'loss_after_chain': round(loss, 4),
            'compile_s': round(compile_s, 1)}


def main():
    import jax
    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    results = {
        'batch': BATCH, 'frames': T_MEL, 'chain': CHAIN,
        'device': str(jax.devices()[0]),
        'rows': [measure(b) for b in ('auto', 'mega')],
    }
    name = ('train_mega_results.json' if T_MEL == 768
            else f'train_mega_results_{T_MEL}.json')
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            name)
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
