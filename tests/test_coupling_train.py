"""Train-direction flow-stack megakernel (``ops/coupling_grad.py``):
forward and gradient parity against the differentiable pure-JAX twin
(which regenerates the identical hash dropout masks), rate-0 parity
against the flax path through the public model API, dropout-mask
statistics, and sharded==unsharded gradients under a mesh.

The custom-vjp backward is a hand-written Pallas kernel — these tests
are its correctness proof on the CPU interpreter; the opt-in hardware
suite (``tests/test_device_parity.py``) re-runs the core checks on the
real chip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.ops import coupling_grad as CG
from glow_tts_tpu.ops import dropmask
from tests.helpers import tiny_config


def _weights(rng, S, n, k, ch, c, ps=None):
    c2, ch2 = c // 2, 2 * ch
    shapes = [
        ('w_start', (S, c2, ch), .3), ('b_start', (S, ch), .1),
        ('w_in', (S, n, k, ch, ch2), .2), ('w_rs', (S, n, ch, ch2), .2),
        ('b_rs', (S, n, ch2), .1), ('w_end', (S, ch, c), .2),
        ('b_end', (S, c), .1), ('b_in', (S, n, ch2), .1),
        ('an_logs', (S, c), .1), ('an_bias', (S, c), .1),
        ('mix_t', (S, c, c), .2), ('ld_const', (S,), .1),
    ]
    if ps is not None:
        shapes.append(('w_pitch', (S, n, ps, ch2), .2))
    return {key: jnp.asarray(rng.standard_normal(sh), jnp.float32) * sc
            for key, sh, sc in shapes}


def _inputs(rng, b, t, c, lengths):
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    mask = (jnp.arange(t)[None, :, None]
            < jnp.asarray(lengths)[:, None, None]).astype(jnp.float32)
    return x * mask, mask


@pytest.mark.parametrize('rate', [0.0, 0.3])
@pytest.mark.parametrize('conditioning', ['none', 'cond', 'pitch'])
def test_train_fwd_matches_twin(rate, conditioning):
    rng = np.random.default_rng(0)
    S, n, k, ch, c = 3, 2, 5, 16, 16
    b, t, ps = 5, 13, 2
    x, mask = _inputs(rng, b, t, c, [13, 12, 8, 5, 2])
    W = _weights(rng, S, n, k, ch, c,
                 ps if conditioning == 'pitch' else None)
    cond = (jnp.asarray(rng.standard_normal((S, n, b, 2 * ch)),
                        jnp.float32) * .2
            if conditioning == 'cond' else None)
    pitch = (jnp.asarray(rng.standard_normal((b, t, ps)),
                         jnp.float32) * mask
             if conditioning == 'pitch' else None)
    seed = jnp.int32(1234)

    z, ld = CG.fused_flow_stack_train(
        x, mask, W, cond, pitch, seed=seed, dropout_rate=rate,
        interpret=True)
    zr, ldr = CG.flow_stack_train_reference(
        x, mask, W, cond, pitch, seed=seed, dropout_rate=rate)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zr),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ldr),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize('rate', [0.0, 0.3])
def test_train_grads_match_twin(rate):
    """The hand-written Pallas backward vs jax.grad of the twin — every
    weight cotangent, the input cotangent, the conditioning and pitch
    cotangents, through a loss touching both z and the logdet."""
    rng = np.random.default_rng(1)
    S, n, k, ch, c = 2, 2, 5, 16, 16
    b, t, ps = 3, 11, 2
    x, mask = _inputs(rng, b, t, c, [11, 7, 4])
    W = _weights(rng, S, n, k, ch, c, ps)
    cond = jnp.asarray(rng.standard_normal((S, n, b, 2 * ch)),
                       jnp.float32) * .2
    pitch = jnp.asarray(rng.standard_normal((b, t, ps)),
                        jnp.float32) * mask
    seed = jnp.int32(77)
    zt = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    wl = jnp.arange(1., b + 1.)

    def loss(fn):
        def inner(W_, x_, c_, p_):
            z, ld = fn(x_, mask, W_, c_, p_, seed=seed, dropout_rate=rate)
            return jnp.sum(z * zt) + 0.7 * jnp.sum(ld * wl)
        return inner

    kern = loss(lambda *a, **kw: CG.fused_flow_stack_train(
        *a, interpret=True, **kw))
    twin = loss(CG.flow_stack_train_reference)
    gk = jax.grad(kern, argnums=(0, 1, 2, 3))(W, x, cond, pitch)
    gt = jax.grad(twin, argnums=(0, 1, 2, 3))(W, x, cond, pitch)

    for key in W:
        np.testing.assert_allclose(
            np.asarray(gk[0][key]), np.asarray(gt[0][key]),
            rtol=1e-4, atol=1e-4, err_msg=f'weight grad {key}')
    for name, a, o in (('dx', gk[1], gt[1]), ('dcond', gk[2], gt[2]),
                       ('dpitch', gk[3], gt[3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_train_grads_bf16():
    """bf16 activations: gradients track the f32 oracle at bf16 noise
    level (norm-relative ≲ 3 %)."""
    rng = np.random.default_rng(2)
    S, n, k, ch, c = 2, 2, 5, 16, 16
    b, t = 4, 12
    x, mask = _inputs(rng, b, t, c, [12, 9, 6, 3])
    W = _weights(rng, S, n, k, ch, c)
    seed = jnp.int32(5)
    zt = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    def mk(fn, xx):
        def inner(W_):
            z, ld = fn(xx, mask, W_, seed=seed, dropout_rate=0.25)
            return (jnp.sum(z.astype(jnp.float32) * zt)
                    + 0.7 * jnp.sum(ld))
        return inner

    gt = jax.grad(mk(CG.flow_stack_train_reference, x))(W)
    g16 = jax.grad(mk(lambda *a, **kw: CG.fused_flow_stack_train(
        *a, interpret=True, **kw), x.astype(jnp.bfloat16)))(W)
    for key in W:
        a, o = np.asarray(g16[key], np.float32), np.asarray(gt[key])
        nr = np.linalg.norm((a - o).ravel()) / (
            np.linalg.norm(o.ravel()) + 1e-30)
        assert nr < 3e-2, f'{key}: norm-rel {nr}'


def test_dropout_mask_statistics():
    """The hash mask drops ≈rate of elements and preserves the mean."""
    rate = 0.3
    salt = dropmask.layer_salt(jnp.int32(9), 4, 1, 4)
    ks = dropmask.keep_scale(salt, 0, (512, 384), 384, rate)
    ks = np.asarray(ks)
    frac = (ks == 0).mean()
    assert abs(frac - rate) < 5e-3
    np.testing.assert_allclose(ks.mean(), 1.0, rtol=5e-3)
    # and a different (step, layer) salt gives a different mask
    ks2 = np.asarray(dropmask.keep_scale(
        dropmask.layer_salt(jnp.int32(9), 4, 2, 4), 0, (512, 384), 384,
        rate))
    assert (ks != ks2).mean() > 0.2


def _decoder_cfg(backend, rate):
    cfg = tiny_config()
    wn = dataclasses.replace(cfg.decoder.affine_coupling.wavenet,
                             dropout_rate=rate)
    ac = dataclasses.replace(cfg.decoder.affine_coupling, wavenet=wn)
    return dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, affine_coupling=ac),
        tpu=dataclasses.replace(cfg.tpu, coupling_backend=backend))


def test_decoder_train_mega_matches_flax_rate0():
    """Through the public FlowDecoder API at dropout rate 0: values,
    logdets and EVERY parameter gradient (incl. the weight-norm v/g
    chain, ActNorm and the inv-conv 4×4) match the flax path."""
    from glow_tts_tpu.models import decoder as D

    rng = np.random.default_rng(3)
    b, t, cmel = 5, 26, 8
    x, mask = _inputs(rng, b, t, cmel, [26, 20, 14, 8, 4])

    dec_f = D.FlowDecoder(_decoder_cfg('flax', 0.0))
    dec_m = D.FlowDecoder(_decoder_cfg('mega_interpret', 0.0))
    params = dec_f.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x, mask,
                        deterministic=False)
    params = jax.tree_util.tree_map(
        lambda p_: p_ + 0.03 * np.float32(rng.standard_normal(p_.shape)),
        params)

    def loss(ps, module):
        z, ld, _ = module.apply(ps, x, mask, deterministic=False,
                                rngs={'dropout': jax.random.PRNGKey(7)})
        return jnp.sum(z ** 2) - 0.01 * jnp.sum(ld), (z, ld)

    (_, (zf, ldf)), gf = jax.value_and_grad(
        loss, has_aux=True)(params, dec_f)
    (_, (zm, ldm)), gm = jax.value_and_grad(
        loss, has_aux=True)(params, dec_m)
    np.testing.assert_allclose(np.asarray(zm), np.asarray(zf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldm), np.asarray(ldf),
                               rtol=1e-4, atol=1e-4)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(gm))
    for pth, vf in flat_f:
        np.testing.assert_allclose(
            np.asarray(flat_m[pth]), np.asarray(vf), rtol=2e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(pth))


def test_decoder_train_mega_dropout_trains():
    """With real dropout the mega path produces finite values/grads and
    a mask stream that differs per rng key but is deterministic per key."""
    from glow_tts_tpu.models import decoder as D

    rng = np.random.default_rng(4)
    b, t, cmel = 4, 20, 8
    x, mask = _inputs(rng, b, t, cmel, [20, 16, 10, 6])
    dec = D.FlowDecoder(_decoder_cfg('mega_interpret', 0.3))
    params = dec.init({'params': jax.random.PRNGKey(0),
                       'dropout': jax.random.PRNGKey(1)}, x, mask,
                      deterministic=False)
    # perturb the zero-init end conv — otherwise the coupling transform
    # is the identity and dropout cannot influence z
    params = jax.tree_util.tree_map(
        lambda p_: p_ + 0.03 * np.float32(rng.standard_normal(p_.shape)),
        params)

    def run(key):
        z, ld, _ = dec.apply(params, x, mask, deterministic=False,
                             rngs={'dropout': key})
        return z, ld

    z1, ld1 = run(jax.random.PRNGKey(7))
    z1b, _ = run(jax.random.PRNGKey(7))
    z2, _ = run(jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z1b))
    assert float(jnp.abs(z1 - z2).max()) > 1e-4
    g = jax.grad(lambda ps: jnp.sum(run_loss(dec, ps, x, mask)))(params)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(g))


def run_loss(dec, ps, x, mask):
    z, ld, _ = dec.apply(ps, x, mask, deterministic=False,
                         rngs={'dropout': jax.random.PRNGKey(7)})
    return jnp.sum(z ** 2) - 0.01 * jnp.sum(ld)


def test_train_mega_sharded_matches_unsharded():
    """rate-0 mega-train under an ambient 8-device mesh: values and
    gradients equal the unsharded run (the custom-vjp pair does its own
    shard_map in fwd and bwd; per-shard weight grads reduce outside)."""
    from glow_tts_tpu.models import decoder as D
    from glow_tts_tpu.parallel import mesh as mesh_lib

    rng = np.random.default_rng(5)
    b, t, cmel = 8, 18, 8
    x, mask = _inputs(rng, b, t, cmel, [18, 16, 14, 12, 10, 8, 6, 4])
    dec = D.FlowDecoder(_decoder_cfg('mega_interpret', 0.0))
    params = dec.init({'params': jax.random.PRNGKey(0),
                       'dropout': jax.random.PRNGKey(1)}, x, mask,
                      deterministic=False)
    params = jax.tree_util.tree_map(
        lambda p_: p_ + 0.03 * np.float32(rng.standard_normal(p_.shape)),
        params)

    def loss(ps):
        return run_loss(dec, ps, x, mask)

    l0, g0 = jax.value_and_grad(loss)(params)
    import dataclasses as dc
    cfg = dc.replace(_decoder_cfg('mega_interpret', 0.0))
    mesh = mesh_lib.make_mesh(dc.replace(
        cfg, tpu=dc.replace(cfg.tpu, data_parallel=len(jax.devices()))))
    with mesh_lib.activate_mesh(mesh):
        l1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for (pth, a), (_, o) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g0)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(o), rtol=2e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(pth))


def test_full_train_step_mega_matches_flax_rate0():
    """The complete jitted train step (encoder → MAS → losses → grads →
    RAdam update) with the train megakernel vs the flax decoder at
    dropout rate 0: losses and post-step parameters agree.  The encoder
    keeps its own (identical) FastDropout streams — only the decoder
    backend differs."""
    from glow_tts_tpu.training.step import create_train_state, \
        make_train_step

    b, t_tok, t_mel = 4, 12, 32

    def mk_batch(cfg, seed):
        # fresh generator per call — the SAME batch for every backend
        rng = np.random.default_rng(seed)
        s = cfg.decoder.num_squeeze
        token_lengths = np.array([12, 9, 6, 4], np.int32)
        mel_lengths = np.array([32, 28, 20, 16], np.int32)
        mel_lengths = (mel_lengths // s) * s
        return {
            'tokens': jnp.asarray(rng.integers(
                0, cfg.encoder.embedding_tokens, (b, t_tok)), jnp.int32),
            'token_lengths': jnp.asarray(token_lengths),
            'mels': jnp.asarray(rng.standard_normal(
                (b, t_mel, cfg.sound.mel_dim)), jnp.float32),
            'mel_lengths': jnp.asarray(mel_lengths),
        }

    results = {}
    for backend in ('flax', 'mega_interpret'):
        cfg = _decoder_cfg(backend, 0.0)
        batch = mk_batch(cfg, 6)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          batch)
        step = make_train_step(cfg, model)
        new_state, metrics = step(state, batch)
        results[backend] = (float(metrics['total']), new_state.params)

    lf, pf = results['flax']
    lm, pm = results['mega_interpret']
    np.testing.assert_allclose(lm, lf, rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(pf)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(pm))
    for pth, vf in flat_f:
        np.testing.assert_allclose(
            np.asarray(flat_m[pth]), np.asarray(vf), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(pth))


def test_full_train_step_mega_matches_flax_gr_mode():
    """GR mode (speaker LUT + GST prosody + pitch conditioning + GRL
    classifier) through the full train step at dropout rate 0: the
    megakernel's conditioning and pitch cotangents feed the real
    upstream encoders.  Reference mode wiring: ``Modules.py:42-48``."""
    from glow_tts_tpu.training.step import create_train_state, \
        make_train_step

    b, t_tok, t_mel = 4, 10, 24

    def mk_batch(cfg, seed):
        rng = np.random.default_rng(seed)
        return {
            'tokens': jnp.asarray(rng.integers(
                0, cfg.encoder.embedding_tokens, (b, t_tok)), jnp.int32),
            'token_lengths': jnp.asarray([10, 8, 6, 4], jnp.int32),
            'mels': jnp.asarray(rng.standard_normal(
                (b, t_mel, cfg.sound.mel_dim)), jnp.float32),
            'mel_lengths': jnp.asarray([24, 20, 16, 12], jnp.int32),
            'speakers': jnp.asarray([0, 1, 2, 3], jnp.int32),
            'pitches': jnp.asarray(rng.standard_normal(
                (b, t_mel)), jnp.float32),
        }

    results = {}
    for backend in ('flax', 'mega_interpret'):
        cfg = dataclasses.replace(_decoder_cfg(backend, 0.0))
        cfg = dataclasses.replace(cfg, mode='GR')
        batch = mk_batch(cfg, 11)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          batch)
        step = make_train_step(cfg, model)
        _, metrics = step(state, batch)
        results[backend] = {k: float(v) for k, v in metrics.items()}

    for key in ('mle', 'duration', 'speaker', 'total', 'grad_norm'):
        np.testing.assert_allclose(
            results['mega_interpret'][key], results['flax'][key],
            rtol=2e-4, err_msg=key)


def test_vmem_tile_guard_and_explicit_tiles():
    """pick_batch_tile drops the tile at production-length sequences
    (the kernels' analogue of the MAS VMEM guard), and an explicitly
    non-default forward tile still matches the twin."""
    from glow_tts_tpu.ops.coupling import pick_batch_tile

    # production dims: k=5, ch=192, C=160, n=4.  Expectations are pinned
    # to the hardware compile probes (benchmarks/vmem_calibration.json,
    # v5e 2026-08-19): non-train bf16 keeps 4 at bench length; the train
    # kernels' dropout-mask stack temporaries force 2 at bench length
    # (bt=4 measured 23.9 M OOM, bt=2 fits); f32's 3-pass decomposition
    # temporaries force 2 (bt=4 measured 22.41 M OOM).
    assert pick_batch_tile(384, 5, 192, 160, jnp.bfloat16) == 4
    assert pick_batch_tile(384, 5, 192, 160, jnp.bfloat16, train=True) == 2
    assert pick_batch_tile(384, 5, 192, 160, jnp.float32) == 2
    assert pick_batch_tile(96, 5, 192, 160, jnp.bfloat16, train=True) == 4
    # Beyond 256 packed rows the bf16 train forward switches to manual
    # weight streaming (the BlockSpec route OOM'd scoped VMEM by 396 KB
    # inside the full train step, v5e 2026-08-19), which holds tile 2
    # out to t=500.
    assert pick_batch_tile(500, 5, 192, 160, jnp.bfloat16, train=True) == 2
    assert pick_batch_tile(768, 5, 192, 160, jnp.bfloat16, train=True) == 1
    assert pick_batch_tile(100, 5, 192, 160, jnp.bfloat16,
                           requested=1) == 1

    rng = np.random.default_rng(12)
    S, n, k, ch, c = 2, 2, 5, 16, 16
    b, t = 5, 9
    x, mask = _inputs(rng, b, t, c, [9, 7, 5, 3, 2])
    W = _weights(rng, S, n, k, ch, c)
    seed = jnp.int32(21)
    z2, ld2 = CG.fused_flow_stack_train(
        x, mask, W, seed=seed, dropout_rate=0.2, batch_tile=2,
        interpret=True)
    zr, ldr = CG.flow_stack_train_reference(
        x, mask, W, seed=seed, dropout_rate=0.2)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(zr),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ldr),
                               rtol=2e-5, atol=2e-4)


def test_train_row_chunks_match():
    """nc=4 must be numerically identical to nc=2 (the auto pick) through
    forward and gradients: chunks only tile the packed-row axis of the
    same MXU contractions.  (nc=4 was probed as a VMEM lever at
    production length and measured worse — kept here as an explicit
    knob whose correctness must not rot.)"""
    rng = np.random.default_rng(9)
    S, n, k, ch, c = 2, 2, 5, 16, 16
    b, t = 4, 33                       # p = bt·37: ragged last chunk
    x, mask = _inputs(rng, b, t, c, [33, 30, 21, 9])
    W = _weights(rng, S, n, k, ch, c)
    seed = jnp.int32(11)
    zt = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    def loss(nc):
        def inner(W_, x_):
            z, ld = CG.fused_flow_stack_train(
                x_, mask, W_, seed=seed, dropout_rate=0.3,
                row_chunks=nc, interpret=True)
            return jnp.sum(z * zt) + 0.7 * jnp.sum(ld)
        return inner

    g2 = jax.grad(loss(2), argnums=(0, 1))(W, x)
    g4 = jax.grad(loss(4), argnums=(0, 1))(W, x)
    for key in W:
        np.testing.assert_allclose(
            np.asarray(g4[0][key]), np.asarray(g2[0][key]),
            rtol=1e-5, atol=1e-5, err_msg=f'weight grad {key}')
    np.testing.assert_allclose(np.asarray(g4[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-5, err_msg='dx')


def test_train_forward_stream_parity():
    """Manual per-layer weight streaming (the bf16 policy at production
    length, where the whole-stack BlockSpec route OOMs scoped VMEM by
    396 KB — v5e 2026-08-19) must be bit-identical to the BlockSpec
    route: it changes only how ``w_in``/``w_rs`` reach VMEM."""
    rng = np.random.default_rng(13)
    S, n, k, ch, c = 2, 2, 5, 16, 16
    b, t = 4, 33
    x, mask = _inputs(rng, b, t, c, [33, 30, 21, 9])
    W = _weights(rng, S, n, k, ch, c)
    seed = jnp.int32(5)
    outs = {}
    for stream in (False, True):
        z, ld, ckpt = CG._fwd_call(x, mask, W, None, None, seed,
                                   rate=0.3, bt=2, nc=2, interpret=True,
                                   stream=stream)
        outs[stream] = (np.asarray(z, np.float32),
                        np.asarray(ld, np.float32),
                        np.asarray(ckpt, np.float32))
    for i, name in enumerate(('z', 'logdet', 'ckpt')):
        np.testing.assert_array_equal(outs[True][i], outs[False][i],
                                      err_msg=name)


def test_train_grads_fold_bwd_tile():
    """Forward tile 2 / backward tile 1 (ckpt_fold = 2): the production
    configuration at t > 256 — the backward kernel reads the checkpoint
    through the 5-D (nb, S, fold, p, c) view whose block dims equal the
    array dims (a (…, p, c) block over (…, fold·p, c) is Mosaic-illegal
    when p % 8 != 0; failed on hardware 2026-08-19).  Gradients must
    match the twin exactly as in the unfolded case."""
    rng = np.random.default_rng(5)
    S, n, k, ch, c = 2, 2, 5, 16, 16
    b, t, ps = 4, 11, 2
    x, mask = _inputs(rng, b, t, c, [11, 9, 6, 3])
    W = _weights(rng, S, n, k, ch, c, ps)
    cond = jnp.asarray(rng.standard_normal((S, n, b, 2 * ch)),
                       jnp.float32) * .2
    pitch = jnp.asarray(rng.standard_normal((b, t, ps)),
                        jnp.float32) * mask
    seed = jnp.int32(31)
    zt = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    def loss(**tiles):
        def inner(W_, x_, c_, p_):
            z, ld = CG.fused_flow_stack_train(
                x_, mask, W_, c_, p_, seed=seed, dropout_rate=0.3,
                interpret=True, **tiles)
            return jnp.sum(z * zt) + 0.7 * jnp.sum(ld)
        return inner

    gf = jax.grad(loss(batch_tile=2, bwd_batch_tile=1),
                  argnums=(0, 1, 2, 3))(W, x, cond, pitch)
    gu = jax.grad(loss(batch_tile=2, bwd_batch_tile=2),
                  argnums=(0, 1, 2, 3))(W, x, cond, pitch)
    for key in W:
        np.testing.assert_allclose(
            np.asarray(gf[0][key]), np.asarray(gu[0][key]),
            rtol=1e-5, atol=1e-5, err_msg=f'weight grad {key}')
    for name, a, o in (('dx', gf[1], gu[1]), ('dcond', gf[2], gu[2]),
                       ('dpitch', gf[3], gu[3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
