"""bfloat16 training smoke + the optional attention variants (proximal
bias, block masking) that the reference codes but never enables
(``RPR_MHA.py:111-116``; SURVEY §5 long-context)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glow_tts_tpu.models.layers import RelativePositionMultiHeadAttention
from glow_tts_tpu.training.step import create_train_state, make_train_step
from tests.helpers import synthetic_batch, tiny_config


def test_bfloat16_training_smoke():
    cfg = tiny_config(**{'TPU': {'compute_dtype': 'bfloat16',
                                 'mas_backend': 'scan'}})
    batch = synthetic_batch(cfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    # params stay f32 regardless of compute dtype
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    step = jax.jit(make_train_step(cfg, model))
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['total']))
    assert np.isfinite(float(metrics['grad_norm']))


def _attn(**kwargs):
    return RelativePositionMultiHeadAttention(
        calc_channels=16, out_channels=16, num_heads=2, **kwargs)


def test_proximal_bias_changes_scores():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    base = _attn()
    params = base.init(jax.random.PRNGKey(0), x)
    out_base, _ = base.apply(params, x)
    prox = _attn(proximal_bias=True)
    out_prox, _ = prox.apply(params, x)
    assert not np.allclose(np.asarray(out_base), np.asarray(out_prox))


def test_block_mask_limits_attention_span():
    rng = np.random.default_rng(1)
    t = 12
    x = jnp.asarray(rng.standard_normal((1, t, 16)).astype(np.float32))
    mask = jnp.ones((1, 1, t, t))
    attn = _attn(block_length=2)
    params = attn.init(jax.random.PRNGKey(0), x, mask=mask)
    _, alignments = attn.apply(params, x, mask=mask)
    a = np.asarray(alignments)[0, 0]
    for i in range(t):
        for j in range(t):
            if abs(i - j) > 2:
                assert a[i, j] < 1e-3, f'attention leaked at ({i},{j})'


def test_cross_attention_mode():
    """Plain cross-MHA (no rel-pos) as used by the GST layer."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((3, 1, 16)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((3, 7, 16)).astype(np.float32))
    attn = _attn()
    params = attn.init(jax.random.PRNGKey(0), q, keys=kv)
    out, alignments = attn.apply(params, q, keys=kv)
    assert out.shape == (3, 1, 16)
    np.testing.assert_allclose(np.asarray(alignments).sum(-1), 1.0,
                               rtol=1e-5)


def test_rel_pos_attention_rejects_cross():
    attn = _attn(window_size=2)
    q = jnp.ones((1, 4, 16))
    kv = jnp.ones((1, 6, 16))
    with pytest.raises(AssertionError):
        attn.init(jax.random.PRNGKey(0), q, keys=kv)
