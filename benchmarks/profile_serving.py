"""Serving latency on the real TPU: bucketed two-phase vs worst-case decode.

Evidence script for the mel-bucketed serving milestone: the decode phase's
FLOPs scale with the static mel bucket, so a short utterance served from a
128-frame bucket should cost ~1/8 the inverse-flow time of the 1024-frame
worst-case buffer.  Measures, per bucket:

* device-side ms per decode phase (chained-carry protocol — iteration
  ``i``'s noise key is folded with a readback of iteration ``i-1``'s mel
  sum, so XLA cannot hoist the chain, and the whole chain runs device-side
  in one dispatch; CLAUDE.md "benchmarking pitfalls");
* the prior-phase ms (token-capacity work, bucket-independent);
* single-phase (monolithic ``inference``) ms at the worst-case buffer for
  the end-to-end comparison.

Run: python benchmarks/profile_serving.py [--iters 30]
Writes benchmarks/serving_results.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, T_TOK = 8, 64
BUCKETS = (128, 256, 512, 1024)


def build():
    import jax
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import create_train_state

    cfg = load_config({'Mode': 'Vanilla'})
    rng = np.random.default_rng(0)
    batch = {
        'tokens': rng.integers(0, cfg.encoder.embedding_tokens,
                               (BATCH, T_TOK)).astype(np.int32),
        'token_lengths': rng.integers(T_TOK // 2, T_TOK + 1,
                                      BATCH).astype(np.int32),
        'mels': rng.standard_normal(
            (BATCH, 128, cfg.sound.mel_dim)).astype(np.float32),
        'mel_lengths': np.full((BATCH,), 128, np.int32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    infer_batch = {'tokens': batch['tokens'],
                   'token_lengths': batch['token_lengths']}
    return cfg, model, state, infer_batch


def time_chain(fn, iters):
    """fn(key) -> scalar; chain iters times device-side, return ms/iter."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(key):
        def body(i, carry):
            key, acc = carry
            key = jax.random.fold_in(key, acc.astype(jnp.int32))
            return key, fn(key)
        return jax.lax.fori_loop(0, iters, body,
                                 (key, jnp.zeros((), jnp.float32)))[1]

    key = jax.random.PRNGKey(1)
    float(chain(key))                      # compile + warm
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(chain(key))              # scalar readback inside timing
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(v)
    return best / iters * 1000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=30)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from glow_tts_tpu.models.glow_tts import GlowTTS
    from glow_tts_tpu.training.step import (make_inference_step,
                                            make_two_phase_inference)

    cfg, model, state, batch = build()
    prior_step, decode_for = make_two_phase_inference(cfg, model)
    prior = jax.jit(prior_step)(state, batch)
    prior = jax.tree_util.tree_map(lambda x: x, prior)   # materialise
    need = int(np.asarray(prior['durations']).sum(axis=1).max())

    results = {'platform': jax.devices()[0].platform,
               'batch': BATCH, 't_tok': T_TOK, 'need_frames': need,
               'iters': args.iters, 'buckets': {}}

    # prior phase (bucket-independent).  The 1e-30 perturbation is
    # numerically identity in f32 but keeps a real data dependency on the
    # chained key, so XLA cannot hoist the prior out of the timing loop.
    def prior_fn(key):
        scale = jnp.float32(1.0) + 1e-30 * jax.random.uniform(key)
        out = prior_step(state, dict(batch, length_scales=scale))
        return out['durations'].sum()
    results['prior_ms'] = time_chain(prior_fn, args.iters)

    # decode phase per bucket
    for bucket in BUCKETS:
        decode = decode_for(bucket)

        def decode_fn(key, _decode=decode):
            out = _decode(state, prior, batch, key, np.float32(1.0))
            return out['mels'].astype(jnp.float32).sum()
        ms = time_chain(decode_fn, args.iters)
        results['buckets'][bucket] = ms
        print(f'decode bucket {bucket:5d}: {ms:8.3f} ms')

    # monolithic single-phase at the worst-case buffer
    single = make_inference_step(cfg, model, max_mel_length=BUCKETS[-1])

    def single_fn(key):
        out = single(state, batch, key)
        return out['mels'].astype(jnp.float32).sum()
    results['single_phase_max_ms'] = time_chain(single_fn, args.iters)

    print(f"prior: {results['prior_ms']:.3f} ms; "
          f"single-phase@{BUCKETS[-1]}: "
          f"{results['single_phase_max_ms']:.3f} ms")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'serving_results.json')
    with open(out_path, 'w') as handle:
        json.dump(results, handle, indent=2)
    print('wrote', out_path)


if __name__ == '__main__':
    main()
