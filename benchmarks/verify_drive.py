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

import dataclasses
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

    # 4. train-direction megakernel pair at PRODUCTION length: t=384
    #    squeezed engages the ckpt-fold backward (fwd tile 2 / bwd tile 1
    #    through the 5-D checkpoint view) — grad finite and close to the
    #    flax/XLA gradient on the same params.
    cfg_m = load_config({'Mode': 'Vanilla',
                         'TPU': {'coupling_backend': 'mega',
                                 'compute_dtype': 'bfloat16'}})
    dec = D.FlowDecoder(cfg_m, dtype=jnp.bfloat16)
    xl = jnp.asarray(rng.standard_normal((8, 768, 80)), jnp.bfloat16)
    ml = jnp.ones((8, 768, 1), jnp.float32)
    p = dec.init(jax.random.PRNGKey(3), xl, ml)

    def loss(pp, fl):
        cfg_x = dataclasses.replace(
            cfg_m, tpu=dataclasses.replace(cfg_m.tpu,
                                           coupling_backend=fl))
        z, ld, _ = D.FlowDecoder(cfg_x, dtype=jnp.bfloat16).apply(
            pp, xl, ml, deterministic=False,
            rngs={'dropout': jax.random.PRNGKey(4)})
        return jnp.mean(z.astype(jnp.float32) ** 2) - jnp.mean(ld) * 1e-4

    gm = jax.jit(jax.grad(lambda pp: loss(pp, 'mega')))(p)
    gf = jax.jit(jax.grad(lambda pp: loss(pp, 'flax')))(p)
    nm = np.sqrt(sum(float(jnp.sum(a.astype(jnp.float32) ** 2))
                     for a in jax.tree_util.tree_leaves(gm)))
    nf = np.sqrt(sum(float(jnp.sum(a.astype(jnp.float32) ** 2))
                     for a in jax.tree_util.tree_leaves(gf)))
    dn = np.sqrt(sum(
        float(jnp.sum((a.astype(jnp.float32)
                       - b.astype(jnp.float32)) ** 2))
        for a, b in zip(jax.tree_util.tree_leaves(gm),
                        jax.tree_util.tree_leaves(gf))))
    print(f'train-mega fold grad: |g_mega|={nm:.4f} |g_flax|={nf:.4f} '
          f'rel-diff {dn / max(nf, 1e-9):.3f}')
    assert np.isfinite(nm) and nm > 0
    # dropout masks differ between backends (hash vs threefry) — norms
    # must agree to ~15 %, not elementwise
    assert abs(nm - nf) / max(nf, 1e-9) < 0.15
    print('VERIFY OK')


if __name__ == '__main__':
    main()
