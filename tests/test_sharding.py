"""Data-parallel training over a real ``jax.sharding.Mesh`` on the 8-device
virtual CPU platform — the TPU-style multi-chip validation (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np

from glow_tts_tpu.parallel import mesh as mesh_lib
from glow_tts_tpu.training.step import create_train_state, make_train_step
from tests.helpers import synthetic_batch, tiny_config


def test_mesh_shape():
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh(cfg)
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ('data', 'model')


def test_data_parallel_train_step_matches_single_device():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(cfg, model)

    # single-device result
    s1, m1 = jax.jit(train_step)(state, batch)

    # mesh-sharded result: batch split over 'data', state replicated
    mesh = mesh_lib.make_mesh(cfg)
    sharded_batch = mesh_lib.shard_batch(mesh, batch)
    rep = mesh_lib.replicated(mesh)
    state_r = jax.device_put(state, rep)
    step_sharded = jax.jit(train_step,
                           in_shardings=(rep, mesh_lib.batch_sharding(mesh)),
                           out_shardings=(rep, rep))
    s8, m8 = step_sharded(state_r, sharded_batch)

    np.testing.assert_allclose(np.asarray(m8['total']),
                               np.asarray(m1['total']), rtol=2e-4)
    # parameters identical after the distributed update
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_multi_step_sharded_training():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(1), batch)
    mesh = mesh_lib.make_mesh(cfg)
    rep = mesh_lib.replicated(mesh)
    state = jax.device_put(state, rep)
    step = jax.jit(make_train_step(cfg, model),
                   in_shardings=(rep, mesh_lib.batch_sharding(mesh)),
                   out_shardings=(rep, rep))
    sharded = mesh_lib.shard_batch(mesh, batch)
    for _ in range(3):
        state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics['total']))
    assert int(state.step) == 3


def test_shard_host_local_batch_single_process():
    """With one process the host-local path must equal the global path."""
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh(cfg)
    batch = {'x': np.arange(16, dtype=np.float32).reshape(16, 1)}
    a = mesh_lib.shard_batch(mesh, batch)['x']
    b = mesh_lib.shard_host_local_batch(mesh, batch)['x']
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert b.sharding.spec == a.sharding.spec
