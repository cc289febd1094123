"""Two-phase bucketed inference (``GlowTTS.inference_prior`` +
``inference_decode``; serving integration in ``inference.py``):

* composing the phases at the full capacity must equal the single-phase
  ``inference`` bit-for-bit (they share the model methods);
* with the noise path silenced, decoding in a smaller bucket must produce
  the identical mels as the worst-case buffer, truncated — the bucket only
  changes the padded capacity, never the content.

The reference decodes at the dynamic batch max on one GPU
(``/root/reference/Modules.py:128-204``); static buckets are the
XLA-native equivalent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.models.glow_tts import GlowTTS
from glow_tts_tpu.training.step import (create_train_state,
                                        make_inference_step,
                                        make_two_phase_inference)
from tests.helpers import synthetic_batch, tiny_config


def _setup(mode='Vanilla'):
    cfg = tiny_config(mode)
    batch = synthetic_batch(cfg, batch=4)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    infer_batch = {'tokens': batch['tokens'],
                   'token_lengths': batch['token_lengths']}
    if 'speakers' in batch:
        infer_batch['speakers'] = batch['speakers']
    if 'mels_for_ge2e' in batch:
        infer_batch['mels_for_ge2e'] = batch['mels_for_ge2e']
    if mode == 'PE' or mode == 'GR':
        infer_batch['mels_for_prosody'] = batch['mels']
        infer_batch['mel_lengths_for_prosody'] = batch['mel_lengths']
    if 'pitches' in batch:
        infer_batch['pitches'] = batch['pitches']
        infer_batch['pitch_lengths'] = batch['mel_lengths']
    return cfg, model, state, infer_batch


@pytest.mark.parametrize('mode', ['Vanilla', 'GR'])
def test_two_phase_equals_single_phase_at_full_capacity(mode):
    cfg, model, state, batch = _setup(mode)
    rng = jax.random.PRNGKey(7)

    single = jax.jit(make_inference_step(cfg, model, max_mel_length=64))
    ref = single(state, batch, rng)

    prior_step, decode_for = make_two_phase_inference(cfg, model)
    prior = jax.jit(prior_step)(state, batch)
    out = jax.jit(decode_for(64))(state, prior, batch, rng,
                                  np.float32(1.0))
    for key in ('mels', 'mel_lengths', 'attentions', 'durations'):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)


def test_small_bucket_matches_full_capacity_truncated():
    cfg, model, state, batch = _setup()
    rng = jax.random.PRNGKey(3)
    prior_step, decode_for = make_two_phase_inference(cfg, model)
    prior = jax.jit(prior_step)(state, batch)

    need = int(np.asarray(prior['durations']).sum(axis=1).max())
    small = max(((need + 1) // 2) * 2, cfg.decoder.num_squeeze)  # fits
    big = 4 * small

    zero = np.float32(0.0)   # silence the noise: content is deterministic
    out_s = jax.jit(decode_for(small))(state, prior, batch, rng, zero)
    out_b = jax.jit(decode_for(big))(state, prior, batch, rng, zero)
    np.testing.assert_array_equal(np.asarray(out_s['mel_lengths']),
                                  np.asarray(out_b['mel_lengths']))
    np.testing.assert_allclose(
        np.asarray(out_s['mels']),
        np.asarray(out_b['mels'])[:, :small], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(out_s['attentions']),
        np.asarray(out_b['attentions'])[:, :, :small])


def test_overflowing_bucket_clamps_like_single_phase():
    """A bucket smaller than the predicted length clamps mel_lengths the
    same way the single-phase step does at that capacity."""
    cfg, model, state, batch = _setup()
    rng = jax.random.PRNGKey(5)
    tiny = 2 * cfg.decoder.num_squeeze

    single = jax.jit(make_inference_step(cfg, model, max_mel_length=tiny))
    ref = single(state, batch, rng)
    prior_step, decode_for = make_two_phase_inference(cfg, model)
    prior = jax.jit(prior_step)(state, batch)
    out = jax.jit(decode_for(tiny))(state, prior, batch, rng,
                                    np.float32(1.0))
    np.testing.assert_array_equal(np.asarray(out['mel_lengths']),
                                  np.asarray(ref['mel_lengths']))
    np.testing.assert_array_equal(np.asarray(out['mels']),
                                  np.asarray(ref['mels']))


def test_noise_scale_is_honored():
    cfg, model, state, batch = _setup()
    rng = jax.random.PRNGKey(9)
    prior_step, decode_for = make_two_phase_inference(cfg, model)
    prior = jax.jit(prior_step)(state, batch)
    decode = jax.jit(decode_for(64))
    a = decode(state, prior, batch, rng, np.float32(0.0))
    b = decode(state, prior, batch, rng, np.float32(1.0))
    assert not np.allclose(np.asarray(a['mels']), np.asarray(b['mels'])), \
        'noise_scale had no effect'
