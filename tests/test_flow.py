"""Flow-decoder correctness: invertibility round-trips and exact
log-determinants vs autodiff Jacobians (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.models import decoder as D
from tests.helpers import tiny_config


def _mask(b, t):
    return jnp.ones((b, t, 1), jnp.float32)


def test_squeeze_unsqueeze_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 6)).astype(np.float32))
    mask = _mask(2, 10)
    sq, sq_mask = D.squeeze(x, mask, 2)
    assert sq.shape == (2, 5, 12)
    back, back_mask = D.unsqueeze(sq, sq_mask, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)
    # offset-major channel grouping: frame 2t lands in the first C channels
    np.testing.assert_allclose(np.asarray(sq[:, 0, :6]),
                               np.asarray(x[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sq[:, 0, 6:]),
                               np.asarray(x[:, 1]), rtol=1e-6)


@pytest.mark.parametrize('layer_cls,kwargs', [
    (D.ActNorm, {}),
    (D.InvertibleConv, {'num_split': 4}),
])
def test_layer_roundtrip(layer_cls, kwargs):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 6, 8)).astype(np.float32))
    mask = _mask(3, 6)
    layer = layer_cls(**kwargs)
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    z, logdet = layer.apply(params, x, mask)
    assert logdet.shape == (3,)
    back, _ = layer.apply(params, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_coupling_roundtrip():
    cfg = tiny_config()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    mask = _mask(2, 6)
    layer = D.AffineCoupling(cfg)
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    z, logdet = layer.apply(params, x, mask)
    back, _ = layer.apply(params, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    # zero-initialised end conv → identity transform at init, logdet 0
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)


def test_decoder_roundtrip_full():
    cfg = tiny_config()
    rng = np.random.default_rng(3)
    b, t, m = 2, 12, cfg.sound.mel_dim
    x = jnp.asarray(rng.standard_normal((b, t, m)).astype(np.float32))
    mask = _mask(b, t)
    dec = D.FlowDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(1), x, mask)
    z, logdets, out_mask = dec.apply(params, x, mask)
    assert z.shape == (b, t, m) and logdets.shape == (b,)
    back, none_logdet, _ = dec.apply(params, z, mask, reverse=True)
    assert none_logdet is None
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def test_decoder_logdet_matches_autodiff_jacobian():
    """Exact change-of-variables check: logdet == log|det ∂z/∂x| computed
    by autodiff on a full-mask sample."""
    cfg = tiny_config()
    rng = np.random.default_rng(4)
    b, t, m = 1, 4, cfg.sound.mel_dim
    x = jnp.asarray(rng.standard_normal((b, t, m)).astype(np.float32))
    mask = _mask(b, t)
    dec = D.FlowDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(2), x, mask)

    def flat_forward(x_flat):
        z, _, _ = dec.apply(params, x_flat.reshape(b, t, m), mask)
        return z.reshape(-1)

    _, logdets, _ = dec.apply(params, x, mask)
    jac = jax.jacfwd(flat_forward)(x.reshape(-1))
    _, expected = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(logdets[0]), expected,
                               rtol=1e-3, atol=1e-3)


def test_actnorm_data_dependent_init():
    """After init on a batch, the actnorm output must be standardised."""
    rng = np.random.default_rng(5)
    x = jnp.asarray((rng.standard_normal((4, 10, 8)) * 3.0 + 1.5
                     ).astype(np.float32))
    mask = _mask(4, 10)
    layer = D.ActNorm()
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    z, _ = layer.apply(params, x, mask)
    z = np.asarray(z).reshape(-1, 8)
    np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(z.std(axis=0), 1.0, atol=1e-3)


def test_actnorm_init_respects_mask():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    x[:, 5:] = 1e6   # garbage in padding — must not leak into init stats
    mask = jnp.asarray((np.arange(10) < 5)[None, :, None]
                       * np.ones((2, 1, 1))).astype(jnp.float32)
    layer = D.ActNorm()
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)
    z, _ = layer.apply(params, jnp.asarray(x), mask)
    valid = np.asarray(z)[:, :5].reshape(-1, 8)
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-3)
    np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=1e-2)
