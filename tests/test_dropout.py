"""FastDropout contract tests (CPU).

The contract is statistical, not stream-level (docstring of
``layers.FastDropout``): drop ≈rate of elements, scale survivors by
1/keep_prob, be deterministic per rng key, and vary across keys.  The
round-5 sweep made 16-bit mask words the default
(``layers._DROPOUT_BITS``, benchmarks/exp_variants_r5.jsonl) — these
tests pin the contract for whatever word width ships.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.models import layers


def _apply(rate, key, shape=(256, 1024), dtype=jnp.float32):
    mod = layers.FastDropout(rate)
    x = jnp.ones(shape, dtype)
    return np.asarray(
        jax.jit(lambda k: mod.apply({}, x, deterministic=False,
                                    rngs={'dropout': k}))(key),
        np.float32)


@pytest.mark.parametrize('rate', [0.05, 0.1, 0.5])
def test_statistics(rate):
    y = _apply(rate, jax.random.PRNGKey(3))
    drop_frac = float((y == 0).mean())
    # 256·1024 samples → σ of the drop fraction ≈ sqrt(r(1-r)/n) < 1e-3;
    # 16-bit threshold quantisation adds < 2^-16.
    assert abs(drop_frac - rate) < 0.006, drop_frac
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-5)


def test_deterministic_per_key_and_key_sensitive():
    a = _apply(0.1, jax.random.PRNGKey(7))
    b = _apply(0.1, jax.random.PRNGKey(7))
    c = _apply(0.1, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_rate_zero_and_deterministic_are_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    mod0 = layers.FastDropout(0.0)
    np.testing.assert_array_equal(
        np.asarray(mod0.apply({}, x, deterministic=False,
                              rngs={'dropout': jax.random.PRNGKey(0)})),
        np.asarray(x))
    mod = layers.FastDropout(0.5)
    np.testing.assert_array_equal(
        np.asarray(mod.apply({}, x, deterministic=True)), np.asarray(x))


def test_mask_regeneration_paths_are_bit_identical():
    """The stateless-backward formulations (custom_vjp / remat-mask) must
    produce bit-identical values AND gradients to the inline path — same
    key → same hardware-RNG bits → same mask, by construction."""
    x = jnp.asarray(np.random.default_rng(5).standard_normal((16, 64)),
                    jnp.float32)
    key = jax.random.PRNGKey(21)
    mod = layers.FastDropout(0.1)

    def value_and_grad():
        apply = lambda x: mod.apply({}, x, deterministic=False,
                                    rngs={'dropout': key})
        return (np.asarray(apply(x)),
                np.asarray(jax.grad(lambda x: apply(x).sum())(x)))

    try:
        layers._DROPOUT_REMAT_MASK = False
        layers._DROPOUT_STATELESS_BWD = False
        v0, g0 = value_and_grad()
        layers._DROPOUT_REMAT_MASK = True
        v1, g1 = value_and_grad()
        layers._DROPOUT_REMAT_MASK = False
        layers._DROPOUT_STATELESS_BWD = True
        v2, g2 = value_and_grad()
    finally:
        layers._DROPOUT_REMAT_MASK = False
        layers._DROPOUT_STATELESS_BWD = False
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(g0, g1)
    np.testing.assert_array_equal(v0, v2)
    np.testing.assert_array_equal(g0, g2)


def test_time_major_bits_shares_the_contract():
    """time_major_bits permutes only the GENERATION order of the mask
    words (a layout optimisation — see layers._rng_bits); the dropout
    contract (rate, scale, determinism, key sensitivity) is unchanged,
    and the stateless-backward path must reproduce the same stream."""
    rate, shape = 0.1, (8, 96, 64)
    x = jnp.asarray(np.random.default_rng(9).standard_normal(shape),
                    jnp.float32)
    key = jax.random.PRNGKey(13)
    mod = layers.FastDropout(rate, time_major_bits=True)
    apply = lambda: np.asarray(
        jax.jit(lambda k: mod.apply({}, x, deterministic=False,
                                    rngs={'dropout': k}))(key))
    a, b = apply(), apply()
    np.testing.assert_array_equal(a, b)
    drop_frac = float((a == 0).mean())
    assert abs(drop_frac - rate) < 0.02, drop_frac
    kept = a[a != 0] / np.asarray(x)[a != 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-5)

    # stateless-backward regeneration matches the inline stream bit-exactly
    try:
        layers._DROPOUT_STATELESS_BWD = True
        c = apply()
    finally:
        layers._DROPOUT_STATELESS_BWD = False
    np.testing.assert_array_equal(a, c)

    # the kill switch restores the row-major stream (different bits)
    try:
        layers._DROPOUT_TIME_MAJOR = False
        d = apply()
    finally:
        layers._DROPOUT_TIME_MAJOR = True
    assert (a != d).any()
    base = np.asarray(jax.jit(
        lambda k: layers.FastDropout(rate).apply(
            {}, x, deterministic=False, rngs={'dropout': k}))(key))
    np.testing.assert_array_equal(base, d)


def test_word_widths_share_the_contract():
    # the experiment harness flips these module globals; every width must
    # satisfy the same statistical contract (8-bit quantises rate 0.1 to
    # within 2^-8 — still inside the tolerance below)
    orig = layers._DROPOUT_BITS
    try:
        fracs = {}
        for bits in (8, 16, 32):
            layers._DROPOUT_BITS = bits
            y = _apply(0.1, jax.random.PRNGKey(11))
            fracs[bits] = float((y == 0).mean())
            kept = y[y != 0]
            np.testing.assert_allclose(kept, 1.0 / 0.9, rtol=1e-5)
        for bits, frac in fracs.items():
            assert abs(frac - 0.1) < 0.008, (bits, frac)
    finally:
        layers._DROPOUT_BITS = orig
