"""Public-API verification drive on the real TPU (the /verify recipe).

Checks, in order:
1. fused FlowStep vs the flax path on device (shared perturbed params,
   bf16): per-step forward rel < 1 %, logdet rel < 1 %;
2. the full 12-step FlowDecoder both backends: rel < 4 % (bf16 rounding
   compounds through 12 exp-affine steps — per-step is the tight bound;
   exact f32 parity is proven in tests/test_coupling_fused.py);
3. eval + inference through the public training.step API (fused path on,
   bf16): losses finite, mels finite, sane predicted lengths.

Run: timeout 570 python benchmarks/verify_drive.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    '.jax_cache'))


def main():
    import jax
    import jax.numpy as jnp
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.models import decoder as D
    print('device:', jax.devices()[0])

    rng = np.random.default_rng(7)
    B, T = 8, 96
    lengths = jnp.asarray([96, 80, 64, 96, 50, 96, 12, 96])
    mask = (jnp.arange(T)[None, :, None]
            < lengths[:, None, None]).astype(jnp.float32)
    x = (jnp.asarray(rng.standard_normal((B, T, 160)).astype(np.float32))
         .astype(jnp.bfloat16) * mask)

    for name, module_cls, tol in (('FlowStep', D.FlowStep, 0.01),
                                  ('FlowDecoder', D.FlowDecoder, 0.04)):
        outs = {}
        for backend in ('flax', 'fused'):
            cfg = load_config({'Mode': 'Vanilla',
                               'TPU': {'coupling_backend': backend,
                                       'compute_dtype': 'bfloat16'}})
            mod = module_cls(cfg, dtype=jnp.bfloat16)
            params = mod.init(jax.random.PRNGKey(0), x, mask)
            params = jax.tree_util.tree_map(
                lambda p: p + 0.02 * np.float32(
                    rng.standard_normal(p.shape)) if p.ndim > 0 else p,
                params)
            if backend == 'flax':
                shared = params
            res = jax.jit(mod.apply)(shared, x, mask)
            z, ld = res[0], res[1]
            outs[backend] = (np.asarray(z, np.float32),
                             np.asarray(ld, np.float32))
        dz = np.max(np.abs(outs['fused'][0] - outs['flax'][0]))
        scale = np.max(np.abs(outs['flax'][0]))
        dld = np.max(np.abs(outs['fused'][1] - outs['flax'][1])
                     / np.maximum(np.abs(outs['flax'][1]), 1.0))
        print(f'{name}: fused-vs-flax fwd rel {dz / scale:.2e} '
              f'logdet rel {dld:.2e}')
        assert dz / scale < tol and dld < tol, f'{name} divergence'

    from glow_tts_tpu.training.step import (create_train_state,
                                            make_eval_step,
                                            make_inference_step)
    cfg = load_config({'Mode': 'Vanilla',
                       'TPU': {'compute_dtype': 'bfloat16'}})
    batch = {'tokens': np.asarray(rng.integers(2, 30, (4, 24)), np.int32),
             'token_lengths': np.asarray([24, 20, 16, 9], np.int32),
             'mels': np.asarray(rng.standard_normal((4, 128, 80)),
                                np.float32),
             'mel_lengths': np.asarray([128, 100, 88, 64], np.int32)}
    model, state = create_train_state(cfg, jax.random.PRNGKey(1), batch)
    losses, _ = jax.jit(make_eval_step(cfg, model))(state, batch)
    print('eval (fused fwd):',
          {k: round(float(v), 4) for k, v in losses.items()})
    assert all(np.isfinite(float(v)) for v in losses.values())
    inf = jax.jit(make_inference_step(cfg, model, max_mel_length=256))
    out = inf(state, {'tokens': batch['tokens'],
                      'token_lengths': batch['token_lengths']},
              jax.random.PRNGKey(2))
    mels = np.asarray(out['mels'], np.float32)
    print('inference mels:', mels.shape, 'finite:',
          bool(np.isfinite(mels).all()),
          'lengths:', np.asarray(out['mel_lengths']))
    assert np.isfinite(mels).all()
    print('VERIFY OK')


if __name__ == '__main__':
    main()
