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


def test_skewed_relative_table_matches_index_arithmetic():
    rng = np.random.default_rng(4)
    n, t, d = 2, 6, 3
    rel = rng.standard_normal((n, 2 * t - 1, d)).astype(np.float32)
    got = np.asarray(A.skewed_relative_table(jnp.asarray(rel), t))
    assert got.shape == (n, t, t, d)
    for i in range(t):
        for j in range(t):
            np.testing.assert_allclose(got[:, i, j], rel[:, (j - i) + t - 1])


def test_skewed_table_vjp_is_scatter_free_diag_sum():
    """The custom backward (diag-sum via abs→rel) must equal the autodiff
    of the naive one-hot construction."""
    import jax

    rng = np.random.default_rng(5)
    n, t, d = 1, 5, 4
    rel = jnp.asarray(rng.standard_normal((n, 2 * t - 1, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, t, t, d)), jnp.float32)

    def naive(rel):
        idx = (np.arange(t)[None, :] - np.arange(t)[:, None]) + t - 1
        onehot = jnp.asarray(
            (idx[..., None] == np.arange(2 * t - 1)), jnp.float32)
        return jnp.einsum('ijr,nrd->nijd', onehot, rel)

    out, vjp = jax.vjp(lambda r: A.skewed_relative_table(r, t), rel)
    out_ref, vjp_ref = jax.vjp(naive, rel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]),
                               np.asarray(vjp_ref(g)[0]), rtol=1e-5,
                               atol=1e-6)


def test_attention_skew_path_matches_shuffle_path():
    """The skewed-table attention (layers._ATTN_SKEW_TABLE) must agree with
    the rel↔abs shuffle path in values AND parameter gradients."""
    import jax
    from glow_tts_tpu.models import layers

    rng = np.random.default_rng(6)
    b, t, c, heads, w = 2, 9, 8, 2, 3
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    mask = jnp.ones((b, 1, t, t), jnp.float32)
    for share in (True, False):
        mod = layers.RelativePositionMultiHeadAttention(
            calc_channels=c, out_channels=c, num_heads=heads,
            window_size=w, heads_share=share)
        params = mod.init(jax.random.PRNGKey(0), x, mask=mask)

        def loss(p, flag):
            old = layers._ATTN_SKEW_TABLE
            layers._ATTN_SKEW_TABLE = flag
            try:
                out, align = mod.apply(p, x, mask=mask)
            finally:
                layers._ATTN_SKEW_TABLE = old
            return (out * jnp.cos(jnp.arange(out.size)
                                  .reshape(out.shape))).sum(), (out, align)

        (l1, (o1, a1)), g1 = jax.value_and_grad(
            loss, has_aux=True)(params, True)
        (l0, (o0, a0)), g0 = jax.value_and_grad(
            loss, has_aux=True)(params, False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=2e-5, atol=2e-6)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat0 = jax.tree_util.tree_leaves(g0)
        for u, v in zip(flat1, flat0):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=2e-4, atol=2e-6)
