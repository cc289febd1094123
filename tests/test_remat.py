"""remat_flows: identical forward values and gradients, recomputed
activations on the backward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.training.step import create_train_state, make_train_step
from tests.helpers import synthetic_batch, tiny_config


@pytest.mark.parametrize('policy', [None, 'dots_saveable'])
def test_remat_matches_plain_gradients(policy):
    base_cfg = tiny_config()
    remat_cfg = tiny_config(**{'TPU': {'compute_dtype': 'float32',
                                       'mas_backend': 'scan',
                                       'remat_flows': True,
                                       'remat_policy': policy}})
    batch = synthetic_batch(base_cfg, rng=np.random.default_rng(7))

    model_a, state_a = create_train_state(base_cfg, jax.random.PRNGKey(0),
                                          batch)
    model_b, state_b = create_train_state(remat_cfg, jax.random.PRNGKey(0),
                                          batch)
    # same init (seeds equal)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    step_a = jax.jit(make_train_step(base_cfg, model_a))
    step_b = jax.jit(make_train_step(remat_cfg, model_b))
    sa, ma = step_a(state_a, batch)
    sb, mb = step_b(state_b, batch)
    np.testing.assert_allclose(float(ma['total']), float(mb['total']),
                               rtol=1e-6)
    np.testing.assert_allclose(float(ma['grad_norm']),
                               float(mb['grad_norm']), rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(sa.params),
                      jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-7)


def test_remat_policy_typo_raises_at_load():
    with pytest.raises(ValueError, match='remat_policy'):
        tiny_config(**{'TPU': {'remat_flows': True,
                               'remat_policy': 'dots_savable'}})
