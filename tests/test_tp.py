"""Tensor parallelism over the mesh 'model' axis (``parallel/tp.py``):
GSPMD partitioning of the train/eval steps on a dp×tp virtual mesh must
reproduce the single-device results.  The reference has no model-parallel
story (single GPU, ``Train.py:27-35``); this is TPU-native scaling."""

import dataclasses

import jax
import numpy as np

from glow_tts_tpu.parallel import mesh as mesh_lib, tp
from glow_tts_tpu.training.step import (create_train_state, make_eval_step,
                                        make_train_step)
from tests.helpers import synthetic_batch, tiny_config


def tp_config(mode='Vanilla', model=2):
    return tiny_config(mode, TPU={'compute_dtype': 'float32',
                                  'mas_backend': 'scan',
                                  'model_parallel': model})


def test_partition_rules_cover_expected_families():
    cfg = tp_config()
    batch = synthetic_batch(cfg, batch=8)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    specs = tp.param_specs(state.params, tp=2)
    sharded = {p for p, s in specs.items() if any(a == 'model' for a in s)}
    # every family the rules target is present and sharded
    assert 'encoder/block_0/attention/query/kernel' in sharded
    assert 'encoder/block_0/attention/proj/kernel' in sharded
    assert 'encoder/block_0/conv_0/conv/kernel' in sharded
    assert 'encoder/block_0/conv_1/conv/kernel' in sharded
    assert 'encoder/duration_predictor/conv_0/conv/kernel' in sharded
    assert 'decoder/flow_0/coupling/start/v' in sharded
    assert 'decoder/flow_0/coupling/wavenet/in_0/v' in sharded
    # and the sharded dims all divide
    flat = {tp._path_str(p): leaf for p, leaf in
            jax.tree_util.tree_flatten_with_path(state.params)[0]}
    for path, spec in specs.items():
        for dim, axis in enumerate(spec):
            if axis == 'model':
                assert flat[path].shape[dim] % 2 == 0, (path, spec)


def test_indivisible_dim_falls_back_to_replicated():
    cfg = tp_config()
    batch = synthetic_batch(cfg, batch=8)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    # hidden channels are 16/32 wide — model=64 cannot divide them
    specs = tp.param_specs(state.params, tp=64)
    assert all(not any(a == 'model' for a in s) for s in specs.values())


def test_place_state_shards_params_and_moments():
    cfg = tp_config()
    batch = synthetic_batch(cfg, batch=8)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.make_mesh(cfg)
    assert mesh.devices.shape == (4, 2)
    placed = tp.place_state(state, mesh)

    v = placed.params['decoder']['flow_0']['coupling']['wavenet']['in_0']['v']
    assert v.sharding.spec == jax.sharding.PartitionSpec(None, 'model', None)
    shard = v.addressable_shards[0].data
    assert shard.shape[1] == v.shape[1] // 2          # actually split
    # optimizer moments mirror their parameters
    mu_leaves = [leaf for path, leaf in
                 jax.tree_util.tree_flatten_with_path(placed.opt_state)[0]
                 if tp._dict_key_path(path).endswith(
                     'decoder/flow_0/coupling/wavenet/in_0/v')
                 and getattr(leaf, 'shape', None) == v.shape]
    assert mu_leaves, 'no optimizer moments found for the sharded param'
    for leaf in mu_leaves:
        assert leaf.sharding.spec == v.sharding.spec
    # scalars stay replicated
    assert placed.step.sharding.is_fully_replicated

    sharded, total = tp.sharded_param_count(placed, mesh)
    assert sharded > 0.3 * total      # the big matmuls are covered


def _run_single_device(cfg, batch, mode_steps=2):
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg, model))
    metrics = None
    for _ in range(mode_steps):
        state, metrics = step(state, batch)
    return state, metrics


def _run_tp(cfg, batch, mode_steps=2):
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.make_mesh(cfg)
    state = tp.place_state(state, mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    step = jax.jit(make_train_step(cfg, model))
    metrics = None
    with mesh_lib.activate_mesh(mesh):
        for _ in range(mode_steps):
            state, metrics = step(state, sharded)
    return state, metrics


def test_tp_train_steps_match_single_device():
    cfg = tp_config()
    batch = synthetic_batch(cfg, batch=8)
    s1, m1 = _run_single_device(cfg, batch)
    s2, m2 = _run_tp(cfg, batch)
    np.testing.assert_allclose(np.asarray(m2['total']),
                               np.asarray(m1['total']), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_tp_train_gr_mode_matches_single_device():
    """GR mode exercises the conditioned WaveNet (speaker/pitch inputs),
    the GRL custom_vjp and the CE loss under tensor parallelism."""
    cfg = tp_config(mode='GR')
    batch = synthetic_batch(cfg, batch=8)
    s1, m1 = _run_single_device(cfg, batch, mode_steps=1)
    s2, m2 = _run_tp(cfg, batch, mode_steps=1)
    np.testing.assert_allclose(np.asarray(m2['total']),
                               np.asarray(m1['total']), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_tp_eval_step_matches_single_device():
    cfg = tp_config()
    batch = synthetic_batch(cfg, batch=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    eval_step = jax.jit(make_eval_step(cfg, model))
    losses1, _ = eval_step(state, batch)

    mesh = mesh_lib.make_mesh(cfg)
    placed = tp.place_state(state, mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    with mesh_lib.activate_mesh(mesh):
        losses2, _ = jax.jit(make_eval_step(cfg, model))(placed, sharded)
    for key in losses1:
        np.testing.assert_allclose(np.asarray(losses2[key]),
                                   np.asarray(losses1[key]),
                                   rtol=5e-5, atol=1e-6)


def test_tp_resolves_coupling_backend_to_flax():
    """Under a model>1 mesh the GSPMD-opaque kernel backends must fall
    through to flax — the mega/fused gates consult the ambient mesh."""
    cfg = tp_config()
    cfg = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu,
                                     coupling_backend='mega_interpret'))
    batch = synthetic_batch(cfg, batch=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.make_mesh(cfg)
    placed = tp.place_state(state, mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    with mesh_lib.activate_mesh(mesh):
        assert mesh_lib.active_model_parallel() == 2
        losses, _ = jax.jit(make_eval_step(cfg, model))(placed, sharded)
    # flax path result == kernel-free single-device flax result
    cfg_flax = tp_config()
    losses1, _ = jax.jit(make_eval_step(cfg_flax, model))(state, batch)
    np.testing.assert_allclose(np.asarray(losses['total']),
                               np.asarray(losses1['total']),
                               rtol=5e-5, atol=1e-6)
