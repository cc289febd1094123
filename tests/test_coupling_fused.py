"""Fused Pallas coupling kernel vs the flax path: bit-level parity on the
same parameters (Pallas interpreter on CPU), both flow directions, all
conditioning modes, ragged masks, odd lengths, streamed and resident
weights (SURVEY.md §4b; verdict r1 item 1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.models import decoder as D
from tests.helpers import tiny_config


def _with_backend(cfg, backend):
    return dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, coupling_backend=backend))


def _inputs(rng, b, t, c, lengths):
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    mask = (jnp.arange(t)[None, :, None]
            < jnp.asarray(lengths)[:, None, None]).astype(jnp.float32)
    return x * mask, mask


@pytest.mark.parametrize('conditioning', ['none', 'speaker', 'both', 'pitch'])
@pytest.mark.parametrize('reverse', [False, True])
def test_fused_matches_flax(conditioning, reverse):
    cfg = tiny_config()
    rng = np.random.default_rng(3)
    b, t, c = 3, 11, 16
    x, mask = _inputs(rng, b, t, c, [11, 7, 4])

    kwargs = {}
    if conditioning in ('speaker', 'both'):
        kwargs['speaker'] = jnp.asarray(
            rng.standard_normal((b, 16)).astype(np.float32))
    if conditioning == 'both':
        kwargs['prosody'] = jnp.asarray(
            rng.standard_normal((b, 16)).astype(np.float32))
    if conditioning == 'pitch':
        kwargs['pitch'] = jnp.asarray(
            rng.standard_normal((b, t, 2)).astype(np.float32)) * mask

    flax_layer = D.AffineCoupling(_with_backend(cfg, 'flax'))
    fused_layer = D.AffineCoupling(_with_backend(cfg, 'fused_interpret'))
    params = flax_layer.init(jax.random.PRNGKey(0), x, mask, **kwargs)
    # warm the params with non-trivial end-conv weights (zero-init would
    # make the affine transform the identity and hide transform bugs)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.03 * np.float32(rng.standard_normal(p.shape)),
        params)

    z_ref, ld_ref = flax_layer.apply(params, x, mask, reverse=reverse,
                                     **kwargs)
    z_fus, ld_fus = fused_layer.apply(params, x, mask, reverse=reverse,
                                      **kwargs)
    np.testing.assert_allclose(np.asarray(z_fus), np.asarray(z_ref),
                               rtol=2e-5, atol=2e-6)
    if reverse:
        assert ld_ref is None and ld_fus is None
    else:
        np.testing.assert_allclose(np.asarray(ld_fus), np.asarray(ld_ref),
                                   rtol=2e-5, atol=1e-5)


def test_fused_roundtrip_and_identical_param_tree():
    cfg = _with_backend(tiny_config(), 'fused_interpret')
    rng = np.random.default_rng(4)
    x, mask = _inputs(rng, 2, 9, 16, [9, 5])
    layer = D.AffineCoupling(cfg)
    params = layer.init(jax.random.PRNGKey(1), x, mask)

    flax_params = D.AffineCoupling(_with_backend(cfg, 'flax')).init(
        jax.random.PRNGKey(1), x, mask)
    ref_paths = jax.tree_util.tree_structure(flax_params)
    assert jax.tree_util.tree_structure(params) == ref_paths
    for a, b_ in zip(jax.tree_util.tree_leaves(params),
                     jax.tree_util.tree_leaves(flax_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_))

    z, _ = layer.apply(params, x, mask)
    back, _ = layer.apply(params, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_fused_streamed_matches_resident():
    """HBM weight streaming (the f32 configuration) computes exactly what
    VMEM-resident weights compute."""
    from glow_tts_tpu.ops.coupling import fused_coupling

    cfg = tiny_config()
    rng = np.random.default_rng(5)
    b, t, c = 5, 13, 16          # odd batch → exercises batch-tile padding
    x, mask = _inputs(rng, b, t, c, [13, 12, 8, 5, 2])
    x_a, x_b = x[..., :8], x[..., 8:]
    n, k, ch = 2, 5, 16
    weights = {
        'w_start': jnp.asarray(rng.standard_normal((8, ch)), jnp.float32) * .3,
        'b_start': jnp.asarray(rng.standard_normal(ch), jnp.float32) * .1,
        'w_in': jnp.asarray(rng.standard_normal((n, k, ch, 2 * ch)),
                            jnp.float32) * .2,
        'w_rs': jnp.asarray(rng.standard_normal((n, ch, 2 * ch)),
                            jnp.float32) * .2,
        'b_rs': jnp.asarray(rng.standard_normal((n, 2 * ch)),
                            jnp.float32) * .1,
        'w_end': jnp.asarray(rng.standard_normal((ch, c)), jnp.float32) * .2,
        'b_end': jnp.asarray(rng.standard_normal(c), jnp.float32) * .1,
    }
    cond = jnp.asarray(rng.standard_normal((n, b, 2 * ch)), jnp.float32) * .2

    outs = {}
    for label, stream in (('resident', False), ('streamed', True)):
        z, ld = fused_coupling(x_a, x_b, mask, weights, cond,
                               stream_weights=stream, interpret=True)
        outs[label] = (np.asarray(z), np.asarray(ld))
    np.testing.assert_array_equal(outs['streamed'][0], outs['resident'][0])
    np.testing.assert_array_equal(outs['streamed'][1], outs['resident'][1])
    assert outs['resident'][1].shape == (b,)
    # fully-masked tail contributes no logdet
    assert np.isfinite(outs['resident'][1]).all()


def test_fused_flow_decoder_end_to_end():
    """Whole FlowDecoder (squeeze → 3 steps → unsqueeze) agrees between
    backends, including the summed logdet across steps."""
    cfg = tiny_config()
    rng = np.random.default_rng(6)
    x, mask = _inputs(rng, 2, 12, 8, [12, 8])
    flax_dec = D.FlowDecoder(_with_backend(cfg, 'flax'))
    fused_dec = D.FlowDecoder(_with_backend(cfg, 'fused_interpret'))
    params = flax_dec.init(jax.random.PRNGKey(2), x, mask)

    z_ref, ld_ref, m_ref = flax_dec.apply(params, x, mask)
    z_fus, ld_fus, m_fus = fused_dec.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(z_fus), np.asarray(z_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ld_fus), np.asarray(ld_ref),
                               rtol=2e-5, atol=1e-4)

    back_ref, _, _ = flax_dec.apply(params, z_ref, mask, reverse=True)
    back_fus, _, _ = fused_dec.apply(params, z_fus, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back_fus), np.asarray(back_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('reverse', [False, True])
def test_fused_flow_step_matches_flax(reverse):
    """Whole-FlowStep fusion (ActNorm + inv1×1 folded into the kernel)
    agrees with the three-module flax path on shared params."""
    cfg = tiny_config()
    rng = np.random.default_rng(7)
    b, t, c = 3, 9, 16
    x, mask = _inputs(rng, b, t, c, [9, 6, 3])

    flax_step = D.FlowStep(_with_backend(cfg, 'flax'))
    fused_step = D.FlowStep(_with_backend(cfg, 'fused_interpret'))
    params = flax_step.init(jax.random.PRNGKey(3), x, mask)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.03 * np.float32(rng.standard_normal(p.shape)),
        params)

    z_ref, ld_ref = flax_step.apply(params, x, mask, reverse=reverse)
    z_fus, ld_fus = fused_step.apply(params, x, mask, reverse=reverse)
    np.testing.assert_allclose(np.asarray(z_fus), np.asarray(z_ref),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(ld_fus), np.asarray(ld_ref),
                               rtol=3e-5, atol=1e-4)

    # roundtrip through the fused step
    back, _ = fused_step.apply(params, z_fus, mask,
                               reverse=not reverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('conditioning', ['none', 'speaker', 'both', 'pitch'])
@pytest.mark.parametrize('reverse', [False, True])
def test_mega_flow_stack_matches_flax(conditioning, reverse):
    """The 12-step megakernel (one pallas_call for the whole decoder)
    agrees with the sequential flax FlowDecoder on shared params — both
    directions, all conditioning modes, ragged masks."""
    cfg = tiny_config()
    rng = np.random.default_rng(11)
    b, t, c = 3, 12, 8
    x, mask = _inputs(rng, b, t, c, [12, 8, 4])

    kwargs = {}
    if conditioning in ('speaker', 'both'):
        kwargs['speaker'] = jnp.asarray(
            rng.standard_normal((b, 16)).astype(np.float32))
    if conditioning == 'both':
        kwargs['prosody'] = jnp.asarray(
            rng.standard_normal((b, 16)).astype(np.float32))
    if conditioning == 'pitch':
        kwargs['pitch'] = jnp.asarray(
            rng.standard_normal((b, t)).astype(np.float32)) * mask[..., 0]

    flax_dec = D.FlowDecoder(_with_backend(cfg, 'flax'))
    mega_dec = D.FlowDecoder(_with_backend(cfg, 'mega_interpret'))
    params = flax_dec.init(jax.random.PRNGKey(5), x, mask, **kwargs)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.03 * np.float32(rng.standard_normal(p.shape)),
        params)

    z_ref, ld_ref, _ = flax_dec.apply(params, x, mask, reverse=reverse,
                                      **kwargs)
    z_meg, ld_meg, _ = mega_dec.apply(params, x, mask, reverse=reverse,
                                      **kwargs)
    np.testing.assert_allclose(np.asarray(z_meg), np.asarray(z_ref),
                               rtol=3e-5, atol=3e-6)
    if reverse:
        assert ld_ref is None and ld_meg is None
    else:
        np.testing.assert_allclose(np.asarray(ld_meg), np.asarray(ld_ref),
                                   rtol=3e-5, atol=1e-4)


def test_mega_flow_stack_roundtrip_and_param_tree():
    """mega init declares the identical parameter tree as flax, and the
    inverse megakernel pass restores the forward pass's input."""
    cfg = tiny_config()
    rng = np.random.default_rng(12)
    x, mask = _inputs(rng, 2, 12, 8, [12, 6])

    mega_dec = D.FlowDecoder(_with_backend(cfg, 'mega_interpret'))
    flax_dec = D.FlowDecoder(_with_backend(cfg, 'flax'))
    params = mega_dec.init(jax.random.PRNGKey(6), x, mask)
    flax_params = flax_dec.init(jax.random.PRNGKey(6), x, mask)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(flax_params))
    for a, b_ in zip(jax.tree_util.tree_leaves(params),
                     jax.tree_util.tree_leaves(flax_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_))

    z, ld, _ = mega_dec.apply(params, x, mask)
    back, _, _ = mega_dec.apply(params, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back * mask),
                               np.asarray(x * mask),
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(np.asarray(ld)).all()


def _rand_coupling_weights(rng, c2, n, k, ch, c):
    f32 = jnp.float32
    return {
        'w_start': jnp.asarray(rng.standard_normal((c2, ch)), f32) * .3,
        'b_start': jnp.asarray(rng.standard_normal(ch), f32) * .1,
        'w_in': jnp.asarray(rng.standard_normal((n, k, ch, 2 * ch)),
                            f32) * .2,
        'w_rs': jnp.asarray(rng.standard_normal((n, ch, 2 * ch)), f32) * .2,
        'b_rs': jnp.asarray(rng.standard_normal((n, 2 * ch)), f32) * .1,
        'w_end': jnp.asarray(rng.standard_normal((ch, c)), f32) * .2,
        'b_end': jnp.asarray(rng.standard_normal(c), f32) * .1,
    }


@pytest.mark.parametrize('reverse', [False, True])
def test_mxu3x_coupling_accuracy(reverse):
    """The in-kernel 3-pass bf16 decomposition of f32 dots (what the
    hardware f32 path runs — Mosaic's native f32 dot is single-pass bf16,
    ~2.7e-1 err) stays within tf32-class error of the exact-f32
    interpreter result."""
    from glow_tts_tpu.ops.coupling import fused_coupling

    rng = np.random.default_rng(21)
    b, t, c = 3, 14, 16
    c2, n, k, ch = 8, 2, 5, 16
    x, mask = _inputs(rng, b, t, c, [14, 9, 4])
    x_a, x_b = x[..., :c2], x[..., c2:]
    weights = _rand_coupling_weights(rng, c2, n, k, ch, c)
    cond = jnp.asarray(rng.standard_normal((n, b, 2 * ch)), jnp.float32) * .2

    z_exact, ld_exact = fused_coupling(x_a, x_b, mask, weights, cond,
                                       reverse=reverse, interpret=True)
    z_3x, ld_3x = fused_coupling(x_a, x_b, mask, weights, cond,
                                 reverse=reverse, mxu3x=True, interpret=True)
    err = float(np.max(np.abs(np.asarray(z_3x) - np.asarray(z_exact))))
    # tf32-class (~1e-4 through the whole net); single-pass bf16 would be
    # two orders of magnitude worse
    assert err < 1e-3, err
    if not reverse:
        np.testing.assert_allclose(np.asarray(ld_3x), np.asarray(ld_exact),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize('reverse', [False, True])
def test_mxu3x_flow_stack(reverse):
    """f32 megakernel configuration: 3-pass dots + manual weight
    streaming.  Streamed and resident weights are bit-equal; both stay
    within tf32-class error of the exact-f32 interpreter result."""
    from glow_tts_tpu.ops.coupling import fused_flow_stack

    rng = np.random.default_rng(22)
    s_steps, b, t, c = 4, 3, 12, 16
    c2, n, k, ch = 8, 2, 5, 16
    x, mask = _inputs(rng, b, t, c, [12, 8, 5])

    weights = {}
    per_step = [_rand_coupling_weights(rng, c2, n, k, ch, c)
                for _ in range(s_steps)]
    for key in per_step[0]:
        weights[key] = jnp.stack([w[key] for w in per_step])
    weights['an_logs'] = jnp.asarray(
        rng.standard_normal((s_steps, c)), jnp.float32) * .05
    weights['an_bias'] = jnp.asarray(
        rng.standard_normal((s_steps, c)), jnp.float32) * .1
    # well-conditioned mixing: orthogonal-ish via QR per step
    mixes = []
    for _ in range(s_steps):
        q, _ = np.linalg.qr(rng.standard_normal((c, c)))
        mixes.append(q.astype(np.float32))
    weights['mix_t'] = jnp.asarray(np.stack(mixes))
    weights['ld_const'] = jnp.asarray(
        rng.standard_normal(s_steps), jnp.float32) * .01
    cond = jnp.asarray(
        rng.standard_normal((s_steps, n, b, 2 * ch)), jnp.float32) * .2

    z_exact, ld_exact = fused_flow_stack(x, mask, weights, cond,
                                         reverse=reverse, interpret=True)
    outs = {}
    for label, stream in (('resident', False), ('streamed', True)):
        outs[label] = fused_flow_stack(x, mask, weights, cond,
                                       reverse=reverse, mxu3x=True,
                                       stream_weights=stream, interpret=True)
    np.testing.assert_array_equal(np.asarray(outs['streamed'][0]),
                                  np.asarray(outs['resident'][0]))
    err = float(np.max(np.abs(np.asarray(outs['resident'][0])
                              - np.asarray(z_exact))))
    assert err < 3e-3, err
    if not reverse:
        np.testing.assert_array_equal(np.asarray(outs['streamed'][1]),
                                      np.asarray(outs['resident'][1]))
        np.testing.assert_allclose(np.asarray(outs['resident'][1]),
                                   np.asarray(ld_exact),
                                   rtol=1e-3, atol=2e-3)
