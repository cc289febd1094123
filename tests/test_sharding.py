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


# ---------------------------------------------------------------------------
# multi-host building blocks (process-count faked on one machine)
# ---------------------------------------------------------------------------

def test_batch_sampler_process_shards_are_disjoint_and_cover():
    from glow_tts_tpu.data.loader import BatchSampler

    class FakeDataset(list):
        pass

    dataset = FakeDataset(range(37))
    shards = []
    for rank in range(4):
        sampler = BatchSampler(dataset, batch_size=2, shuffle=True, seed=5,
                               drop_last=False, shard_index=rank,
                               num_shards=4)
        indices = [int(i) for batch in sampler for i in batch]
        shards.append(set(indices))
        assert len(indices) == len(shards[-1])          # no dup within shard
    union = set().union(*shards)
    assert union == set(range(37))                      # full coverage
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (shards[a] & shards[b])          # pairwise disjoint


def test_replicate_host_local_batch_roundtrip():
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh(cfg)
    batch = {'x': np.arange(24, dtype=np.float32).reshape(4, 6)}
    out = mesh_lib.replicate_host_local_batch(mesh, batch)
    assert out['x'].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out['x']), batch['x'])
    np.testing.assert_array_equal(
        mesh_lib.local_batch_view(out['x']), batch['x'])


def test_local_batch_view_on_sharded_array():
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh(cfg)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    sharded = mesh_lib.shard_batch(mesh, {'x': x})['x']
    np.testing.assert_array_equal(mesh_lib.local_batch_view(sharded), x)


def test_attention_diagonality_device_matches_numpy():
    from glow_tts_tpu.training.trainer import (attention_diagonality,
                                               attention_diagonality_device)
    rng = np.random.default_rng(0)
    b, t_tok, t_mel = 5, 11, 30
    tl = rng.integers(2, t_tok + 1, b).astype(np.int32)
    ml = np.array([rng.integers(t, t_mel + 1) for t in tl], np.int32)
    # synthesize monotonic one-hot paths like MAS produces
    attn = np.zeros((b, t_tok, t_mel), np.float32)
    for i in range(b):
        idx = np.sort(rng.integers(0, tl[i], ml[i]))
        attn[i, idx, np.arange(ml[i])] = 1.0
    expected = attention_diagonality(attn, tl, ml)
    got = float(np.asarray(attention_diagonality_device(
        jnp.asarray(attn), jnp.asarray(tl), jnp.asarray(ml))))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_initialize_distributed_noop_without_env(monkeypatch):
    monkeypatch.delenv('GLOWTTS_MULTIHOST', raising=False)
    assert mesh_lib.initialize_distributed() is False


def test_mas_shard_mapped_under_mesh_matches_unwrapped():
    """Under an ambient mesh, maximum_path shard_maps over 'data' — the
    result must equal the unwrapped op bit-for-bit."""
    from glow_tts_tpu.ops.mas import maximum_path
    rng = np.random.default_rng(11)
    b, t_tok, t_mel = 8, 12, 24
    log_p = jnp.asarray(rng.standard_normal((b, t_tok, t_mel)), jnp.float32)
    tl = jnp.asarray(rng.integers(4, t_tok + 1, b), jnp.int32)
    ml = jnp.asarray(rng.integers(t_tok, t_mel + 1, b), jnp.int32)
    ml = jnp.maximum(ml, tl)

    ref = np.asarray(maximum_path(log_p, tl, ml, backend='scan'))
    mesh = mesh_lib.make_mesh(tiny_config())
    with mesh_lib.activate_mesh(mesh):
        sharded = np.asarray(jax.jit(
            lambda a, b_, c: maximum_path(a, b_, c, backend='scan')
        )(log_p, tl, ml))
    np.testing.assert_array_equal(sharded, ref)

    # odd batch → mesh doesn't divide it → transparent unwrapped fallback
    with mesh_lib.activate_mesh(mesh):
        odd = np.asarray(maximum_path(log_p[:5], tl[:5], ml[:5],
                                      backend='scan'))
    np.testing.assert_array_equal(odd, ref[:5])


def test_fused_coupling_shard_mapped_under_mesh_matches_unwrapped():
    from glow_tts_tpu.ops.coupling import fused_coupling
    rng = np.random.default_rng(12)
    b, t, c2, ch, n, k = 8, 10, 8, 16, 2, 5
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.2
    w = {'w_start': mk(c2, ch), 'b_start': mk(ch), 'w_in': mk(n, k, ch, 2 * ch),
         'w_rs': mk(n, ch, 2 * ch), 'b_rs': mk(n, 2 * ch),
         'w_end': mk(ch, 2 * c2), 'b_end': mk(2 * c2)}
    cond = mk(n, b, 2 * ch)
    mask = (jnp.arange(t)[None, :, None]
            < jnp.asarray([10, 8, 6, 10, 3, 10, 9, 2])[:, None, None]
            ).astype(jnp.float32)
    x_a, x_b = mk(b, t, c2) * mask, mk(b, t, c2) * mask

    z_ref, ld_ref = fused_coupling(x_a, x_b, mask, w, cond, interpret=True)
    mesh = mesh_lib.make_mesh(tiny_config())
    with mesh_lib.activate_mesh(mesh):
        z_sh, ld_sh = jax.jit(
            lambda *a: fused_coupling(*a, interpret=True)
        )(x_a, x_b, mask, w, cond)
    np.testing.assert_array_equal(np.asarray(z_sh), np.asarray(z_ref))
    np.testing.assert_array_equal(np.asarray(ld_sh), np.asarray(ld_ref))


def test_mega_flow_stack_shard_mapped_under_mesh_matches_unwrapped():
    """The 12-step megakernel under an ambient mesh shard_maps over
    'data' (weights replicated, batch split) — bit-equal to unwrapped."""
    from glow_tts_tpu.ops.coupling import fused_flow_stack
    rng = np.random.default_rng(13)
    s_steps, b, t, c = 3, 8, 10, 16
    c2, ch, n, k = 8, 16, 2, 5
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.2
    w = {'w_start': mk(s_steps, c2, ch), 'b_start': mk(s_steps, ch),
         'w_in': mk(s_steps, n, k, ch, 2 * ch),
         'w_rs': mk(s_steps, n, ch, 2 * ch), 'b_rs': mk(s_steps, n, 2 * ch),
         'w_end': mk(s_steps, ch, c), 'b_end': mk(s_steps, c),
         'an_logs': mk(s_steps, c) * 0.2, 'an_bias': mk(s_steps, c),
         'mix_t': jnp.asarray(np.stack(
             [np.linalg.qr(rng.standard_normal((c, c)))[0]
              for _ in range(s_steps)]), jnp.float32),
         'ld_const': mk(s_steps) * 0.1}
    cond = mk(s_steps, n, b, 2 * ch)
    mask = (jnp.arange(t)[None, :, None]
            < jnp.asarray([10, 8, 6, 10, 3, 10, 9, 2])[:, None, None]
            ).astype(jnp.float32)
    x = mk(b, t, c) * mask

    z_ref, ld_ref = fused_flow_stack(x, mask, w, cond, interpret=True)
    mesh = mesh_lib.make_mesh(tiny_config())
    with mesh_lib.activate_mesh(mesh):
        z_sh, ld_sh = jax.jit(
            lambda *a: fused_flow_stack(*a, interpret=True)
        )(x, mask, w, cond)
    np.testing.assert_array_equal(np.asarray(z_sh), np.asarray(z_ref))
    np.testing.assert_array_equal(np.asarray(ld_sh), np.asarray(ld_ref))
