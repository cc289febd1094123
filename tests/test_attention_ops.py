"""Relative-position shuffles vs direct index arithmetic."""

import jax.numpy as jnp
import numpy as np

from glow_tts_tpu.ops import attention as A


def test_relative_to_absolute():
    rng = np.random.default_rng(0)
    b, h, t = 2, 3, 7
    x = rng.standard_normal((b, h, t, 2 * t - 1)).astype(np.float32)
    got = np.asarray(A.relative_to_absolute(jnp.asarray(x)))
    expected = np.zeros((b, h, t, t), np.float32)
    for i in range(t):
        for j in range(t):
            expected[:, :, i, j] = x[:, :, i, (j - i) + t - 1]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_absolute_to_relative():
    rng = np.random.default_rng(1)
    b, h, t = 2, 2, 6
    x = rng.standard_normal((b, h, t, t)).astype(np.float32)
    got = np.asarray(A.absolute_to_relative(jnp.asarray(x)))
    expected = np.zeros((b, h, t, 2 * t - 1), np.float32)
    for i in range(t):
        for r in range(2 * t - 1):
            j = i + r - (t - 1)
            if 0 <= j < t:
                expected[:, :, i, r] = x[:, :, i, j]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_shuffles_are_inverse_on_valid_band():
    rng = np.random.default_rng(2)
    b, h, t = 1, 1, 5
    x = rng.standard_normal((b, h, t, t)).astype(np.float32)
    back = np.asarray(A.relative_to_absolute(
        A.absolute_to_relative(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, rtol=1e-6)


def test_clip_relative_embedding_pad_and_slice():
    rng = np.random.default_rng(3)
    w = 3
    emb = rng.standard_normal((1, 2 * w + 1, 4)).astype(np.float32)
    # length larger than window: zero-pad outside the window
    length = 6
    got = np.asarray(A.clip_relative_embedding(jnp.asarray(emb), length))
    assert got.shape == (1, 2 * length - 1, 4)
    for r in range(2 * length - 1):
        offset = r - (length - 1)
        if abs(offset) <= w:
            np.testing.assert_allclose(got[:, r], emb[:, offset + w])
        else:
            assert np.all(got[:, r] == 0)
    # length smaller than window: center slice
    length = 2
    got = np.asarray(A.clip_relative_embedding(jnp.asarray(emb), length))
    assert got.shape == (1, 3, 4)
    np.testing.assert_allclose(got[0], emb[0, w - 1:w + 2])
