"""MAS backends against the banded-DP oracle (reference core.pyx semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.ops import mas


def _random_problem(rng, b=5, t_tok=37, t_mel=93):
    log_p = rng.standard_normal((b, t_tok, t_mel)).astype(np.float32)
    token_lengths = rng.integers(2, t_tok + 1, size=b).astype(np.int32)
    mel_lengths = np.array([
        rng.integers(tl, t_mel + 1) for tl in token_lengths
    ], dtype=np.int32)
    # mask like the model does (log_p *= mask, Modules.py:939)
    tok_mask = np.arange(t_tok)[None, :, None] < token_lengths[:, None, None]
    mel_mask = np.arange(t_mel)[None, None, :] < mel_lengths[:, None, None]
    log_p = log_p * tok_mask * mel_mask
    return log_p, token_lengths, mel_lengths


def _check_path_properties(path, token_lengths, mel_lengths):
    b, t_tok, t_mel = path.shape
    for i in range(b):
        p = path[i]
        ty, tx = int(mel_lengths[i]), int(token_lengths[i])
        # one token per valid frame, nothing outside
        assert np.all(p[:, :ty].sum(axis=0) == 1)
        assert np.all(p[:, ty:] == 0)
        assert np.all(p[tx:, :] == 0)
        # monotonic, starts at token 0, ends at token tx-1
        idx = np.argmax(p[:, :ty], axis=0)
        assert idx[0] == 0
        assert idx[-1] == tx - 1
        assert np.all(np.diff(idx) >= 0)
        assert np.all(np.diff(idx) <= 1)


def test_oracle_properties():
    rng = np.random.default_rng(0)
    log_p, tl, ml = _random_problem(rng)
    path = mas.maximum_path_numpy(log_p, tl, ml)
    _check_path_properties(path, tl, ml)


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_scan_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    log_p, tl, ml = _random_problem(rng)
    expected = mas.maximum_path_numpy(log_p, tl, ml)
    got = np.asarray(mas.maximum_path_scan(
        jnp.asarray(log_p), jnp.asarray(tl), jnp.asarray(ml)))
    np.testing.assert_array_equal(got, expected)


def test_scan_degenerate_lengths():
    # token length == mel length → forced diagonal path
    b, t_tok, t_mel = 2, 8, 16
    rng = np.random.default_rng(7)
    log_p = rng.standard_normal((b, t_tok, t_mel)).astype(np.float32)
    tl = np.array([8, 1], np.int32)
    ml = np.array([8, 5], np.int32)
    tok_mask = np.arange(t_tok)[None, :, None] < tl[:, None, None]
    mel_mask = np.arange(t_mel)[None, None, :] < ml[:, None, None]
    log_p = log_p * tok_mask * mel_mask
    expected = mas.maximum_path_numpy(log_p, tl, ml)
    got = np.asarray(mas.maximum_path_scan(
        jnp.asarray(log_p), jnp.asarray(tl), jnp.asarray(ml)))
    np.testing.assert_array_equal(got, expected)
    # sample 0: diagonal
    np.testing.assert_array_equal(got[0, :, :8], np.eye(8, dtype=np.float32))


@pytest.mark.parametrize('seed', [0, 5])
def test_cpp_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    log_p, tl, ml = _random_problem(rng, b=9)
    expected = mas.maximum_path_numpy(log_p, tl, ml)
    from glow_tts_tpu.ops import mas_cpp
    got = np.asarray(mas_cpp.maximum_path_cpp(log_p, tl, ml))
    np.testing.assert_array_equal(got, expected)


def test_pallas_interpret_matches_oracle():
    rng = np.random.default_rng(11)
    log_p, tl, ml = _random_problem(rng, b=6, t_tok=32, t_mel=64)
    expected = mas.maximum_path_numpy(log_p, tl, ml)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(mas.maximum_path_pallas(
            jnp.asarray(log_p), jnp.asarray(tl), jnp.asarray(ml)))
    np.testing.assert_array_equal(got, expected)


def test_scan_vmap_consistency_under_padding():
    # The same utterance must yield the same path regardless of batch padding.
    rng = np.random.default_rng(3)
    log_p, tl, ml = _random_problem(rng, b=3, t_tok=20, t_mel=50)
    full = np.asarray(mas.maximum_path_scan(
        jnp.asarray(log_p), jnp.asarray(tl), jnp.asarray(ml)))
    padded = np.pad(log_p, ((0, 0), (0, 12), (0, 14)))
    got = np.asarray(mas.maximum_path_scan(
        jnp.asarray(padded), jnp.asarray(tl), jnp.asarray(ml)))
    np.testing.assert_array_equal(got[:, :20, :50], full)
    assert got[:, 20:, :].sum() == 0 and got[:, :, 50:].sum() == 0


def test_pallas_oversize_falls_back_to_scan():
    """Shapes whose direction table exceeds the VMEM budget must fall back
    to the scan path (same result) instead of a Mosaic allocation error."""
    rng = np.random.default_rng(21)
    t_tok, t_mel = 48, 3072          # padded dir table ≈ 36 MiB > budget
    assert mas._pallas_vmem_bytes(
        t_mel, 16, t_tok + (-t_tok) % 128) > mas._VMEM_BUDGET_BYTES
    log_p, tl, ml = _random_problem(rng, b=2, t_tok=t_tok, t_mel=t_mel)
    expected = np.asarray(mas.maximum_path_scan(
        jnp.asarray(log_p), jnp.asarray(tl), jnp.asarray(ml)))
    with pytest.warns(UserWarning, match='VMEM'):
        got = np.asarray(mas.maximum_path_pallas(
            jnp.asarray(log_p), jnp.asarray(tl), jnp.asarray(ml)))
    np.testing.assert_array_equal(got, expected)
