"""Optimizer / schedule parity with the reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from glow_tts_tpu.training.optim import (make_optimizer,
                                         modified_noam_schedule,
                                         scale_by_radam_ref)
from tests.helpers import tiny_config


def test_radam_matches_reference_torch():
    """Step-by-step trajectory parity with the reference RAdam
    (``Radam.py:25-90``) on identical gradients."""
    import torch
    sys_path_added = False
    import sys
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
        sys_path_added = True
    from Radam import RAdam as TorchRAdam

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((5, 3)).astype(np.float32)
    grads = [rng.standard_normal((5, 3)).astype(np.float32)
             for _ in range(12)]

    lr, betas, eps, wd = 1e-2, (0.9, 0.999), 1e-6, 1e-2
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = TorchRAdam([p_t], lr=lr, betas=betas, eps=eps, weight_decay=wd)

    tx = optax.chain(
        scale_by_radam_ref(betas[0], betas[1], eps),
        optax.add_decayed_weights(wd),
        optax.scale(-lr))
    params = {'w': jnp.asarray(w0)}
    state = tx.init(params)

    for g in grads:
        opt_t.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()
        updates, state = tx.update({'w': jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params['w']), p_t.detach().numpy(),
            rtol=2e-4, atol=5e-6)   # fp32 accumulation-order noise only
    if sys_path_added:
        sys.path.remove('/root/reference')


def test_modified_noam_schedule_matches_reference_formula():
    """scale = base^0.5 · (step + base)^-0.5 with the torch scheduler's
    last_epoch=max(1, t) quirk (``Noam_Scheduler.py:17-29``)."""
    initial, base = 1e-3, 4000
    schedule = modified_noam_schedule(initial, base)
    for step in [0, 1, 10, 4000, 100000]:
        expected = initial * base ** 0.5 * (max(step, 1) + base) ** -0.5
        np.testing.assert_allclose(float(schedule(jnp.asarray(step))),
                                   expected, rtol=1e-6)


def test_frozen_ge2e_mask():
    cfg = tiny_config()
    tx = make_optimizer(cfg)
    params = {
        'encoder': {'w': jnp.ones((3,))},
        'ge2e': {'lstm_cell_0': {'k': jnp.ones((3,))}},
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates['encoder']['w']).sum()) > 0
    assert float(jnp.abs(updates['ge2e']['lstm_cell_0']['k']).sum()) == 0


def test_gradient_clipping_in_optimizer():
    cfg = tiny_config()
    tx = make_optimizer(cfg)
    params = {'w': jnp.zeros((4,))}
    state = tx.init(params)
    huge = {'w': jnp.full((4,), 1e6)}
    updates, _ = tx.update(huge, state, params)
    # after clip to norm 5 and first radam step (plain momentum branch),
    # the update magnitude is bounded by ~lr · clip
    assert float(jnp.abs(updates['w']).max()) < 1.0
