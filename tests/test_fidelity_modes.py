"""Fidelity vs the torch reference for the conditioned modes (SE-LUT, PE,
GR) — exercises speaker LUT, GST prosody encoder (conv2d + GRU + style-token
attention), WaveNet conditioning projections, GRL classifier and pitch
conditioning with imported weights."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glow_tts_tpu.config import load_config
from glow_tts_tpu.training.step import build_model
from glow_tts_tpu.utils.torch_import import convert_reference_state_dict

REFERENCE = '/root/reference'


def load_reference(mode: str, workdir) -> 'module':
    import torch
    import yaml
    with open(os.path.join(REFERENCE, 'Hyper_Parameters.yaml'),
              encoding='utf-8') as f:
        hp = yaml.safe_load(f)
    hp['Mode'] = mode
    hp['Use_Cython_Alignment'] = False
    hp['Device'] = '-1'
    hp['Speaker_Embedding']['Type'] = 'LUT'
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, 'Hyper_Parameters.yaml'), 'w') as f:
        yaml.safe_dump(hp, f)

    stub = types.ModuleType('Speaker_Embedding')
    stub_modules = types.ModuleType('Speaker_Embedding.Modules')
    stub_modules.Encoder = object
    stub_modules.Normalize = lambda x: x
    sys.modules['Speaker_Embedding'] = stub
    sys.modules['Speaker_Embedding.Modules'] = stub_modules
    if not hasattr(torch, 'qr'):
        torch.qr = lambda a: tuple(torch.linalg.qr(a))

    cwd = os.getcwd()
    os.chdir(workdir)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    sys.modules.pop('Modules', None)
    try:
        import Modules
    finally:
        os.chdir(cwd)
    return Modules


def _setup(mode, tmp_path):
    import torch
    Modules = load_reference(mode, str(tmp_path / f'ref_{mode}'))
    torch.manual_seed(11)
    tmodel = Modules.GlowTTS().eval()
    for module in tmodel.modules():
        if isinstance(module, Modules.Activation_Norm):
            module.initialized = True
            with torch.no_grad():
                module.logs.uniform_(-0.3, 0.3)
                module.bias.uniform_(-0.5, 0.5)
    cfg = load_config({'Mode': mode,
                       'Speaker_Embedding': {'Type': 'LUT',
                                             'Num_Speakers': 109,
                                             'Embedding_Size': 256},
                       'TPU': {'compute_dtype': 'float32',
                               'mas_backend': 'scan'}})
    params = convert_reference_state_dict(tmodel.state_dict(), cfg)
    jmodel = build_model(cfg)
    return tmodel, jmodel, params, cfg


def _inputs(seed=0, b=2, t_tok=14, t_mel=128):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, 35, (b, t_tok)).astype(np.int64)
    token_lengths = np.array([t_tok, t_tok - 4], np.int64)
    mels = np.clip(rng.standard_normal((b, t_mel, 80)) * 1.5, -4, 4
                   ).astype(np.float32)
    mel_lengths = np.array([t_mel, t_mel - 14 - (t_mel - 14) % 2], np.int64)
    for i, (tl, ml) in enumerate(zip(token_lengths, mel_lengths)):
        tokens[i, tl:] = 1
        mels[i, ml:] = -4.0
    speakers = rng.integers(0, 109, b).astype(np.int64)
    pitches = rng.random((b, t_mel)).astype(np.float32)
    for i, ml in enumerate(mel_lengths):
        pitches[i, ml:] = 0.0
    return tokens, token_lengths, mels, mel_lengths, speakers, pitches


@pytest.mark.parametrize('mode', ['SE', 'PE', 'GR'])
def test_mode_training_forward_parity(mode, tmp_path):
    import torch
    tmodel, jmodel, params, cfg = _setup(mode, tmp_path)
    tokens, token_lengths, mels, mel_lengths, speakers, pitches = _inputs()

    with torch.no_grad():
        t_out = tmodel(
            tokens=torch.from_numpy(tokens),
            token_lengths=torch.from_numpy(token_lengths),
            mels=torch.from_numpy(mels).transpose(2, 1),
            mel_lengths=torch.from_numpy(mel_lengths),
            speakers=torch.from_numpy(speakers),
            mels_for_ge2e=None,
            pitches=torch.from_numpy(pitches))
    (t_z, t_mean, t_std, t_logdets, t_logdur, t_dur_targets,
     t_attn, t_classified) = t_out

    j_out = jmodel.apply(
        {'params': params},
        tokens=jnp.asarray(tokens, jnp.int32),
        token_lengths=jnp.asarray(token_lengths, jnp.int32),
        mels=jnp.asarray(mels),
        mel_lengths=jnp.asarray(mel_lengths, jnp.int32),
        speakers=jnp.asarray(speakers, jnp.int32),
        pitches=jnp.asarray(pitches),
        deterministic=True)

    np.testing.assert_allclose(
        np.asarray(j_out['z']), t_z.numpy().transpose(0, 2, 1),
        rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(j_out['log_dets']), t_logdets.numpy(),
        rtol=1e-4, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(j_out['attentions']),
                                  t_attn.numpy())
    np.testing.assert_allclose(
        np.asarray(j_out['log_durations'])[..., 0],
        t_logdur.numpy()[:, 0, :], rtol=1e-3, atol=5e-4)
    if mode == 'GR':
        np.testing.assert_allclose(
            np.asarray(j_out['classified_speakers']),
            t_classified.numpy(), rtol=1e-3, atol=5e-4)


def test_gr_inference_mel_parity(tmp_path):
    """GR inference: pitch tracks are linearly resampled to the predicted
    mel lengths (torch F.interpolate align_corners=True vs our fractional
    gather, ``Modules.py:387-405``) and condition every WaveNet layer."""
    import torch
    tmodel, jmodel, params, cfg = _setup('GR', tmp_path)
    tokens, token_lengths, mels, mel_lengths, speakers, pitches = \
        _inputs(seed=9)
    pitch_lengths = mel_lengths.copy()

    with torch.no_grad():
        t_mels, t_lengths, _ = tmodel.inference(
            tokens=torch.from_numpy(tokens),
            token_lengths=torch.from_numpy(token_lengths),
            mels_for_prosody=torch.from_numpy(mels).transpose(2, 1),
            mel_lengths_for_prosody=torch.from_numpy(mel_lengths),
            speakers=torch.from_numpy(speakers),
            mels_for_ge2e=None,
            pitches=torch.from_numpy(pitches),
            pitch_lengths=torch.from_numpy(pitch_lengths),
            noise_scale=0.0,
            length_scale=torch.full((tokens.shape[0],), 1.0))

    j_out = jmodel.apply(
        {'params': params},
        tokens=jnp.asarray(tokens, jnp.int32),
        token_lengths=jnp.asarray(token_lengths, jnp.int32),
        mels_for_prosody=jnp.asarray(mels),
        mel_lengths_for_prosody=jnp.asarray(mel_lengths, jnp.int32),
        speakers=jnp.asarray(speakers, jnp.int32),
        pitches=jnp.asarray(pitches),
        pitch_lengths=jnp.asarray(pitch_lengths, jnp.int32),
        noise_key=jax.random.PRNGKey(0),
        noise_scale=0.0,
        max_mel_length=256,
        method=jmodel.inference)

    j_mels = np.asarray(j_out['mels'])
    j_lengths = np.asarray(j_out['mel_lengths'])
    t_np = t_mels.numpy().transpose(0, 2, 1)
    for i in range(tokens.shape[0]):
        n = min(int(j_lengths[i]), t_np.shape[1])
        mae = np.abs(j_mels[i, :n] - t_np[i, :n]).mean()
        assert mae < 1e-3, f'GR sample {i}: mel MAE {mae:.2e}'


@pytest.mark.parametrize('mode', ['SE', 'PE'])
def test_mode_inference_mel_parity(mode, tmp_path):
    import torch
    tmodel, jmodel, params, cfg = _setup(mode, tmp_path)
    tokens, token_lengths, mels, mel_lengths, speakers, pitches = \
        _inputs(seed=3)

    kwargs_t = dict(
        tokens=torch.from_numpy(tokens),
        token_lengths=torch.from_numpy(token_lengths),
        mels_for_prosody=torch.from_numpy(mels).transpose(2, 1),
        mel_lengths_for_prosody=torch.from_numpy(mel_lengths),
        speakers=torch.from_numpy(speakers),
        mels_for_ge2e=None, pitches=None, pitch_lengths=None,
        noise_scale=0.0,
        length_scale=torch.full((tokens.shape[0],), 1.0))
    with torch.no_grad():
        t_mels, t_lengths, _ = tmodel.inference(**kwargs_t)

    j_out = jmodel.apply(
        {'params': params},
        tokens=jnp.asarray(tokens, jnp.int32),
        token_lengths=jnp.asarray(token_lengths, jnp.int32),
        mels_for_prosody=jnp.asarray(mels),
        mel_lengths_for_prosody=jnp.asarray(mel_lengths, jnp.int32),
        speakers=jnp.asarray(speakers, jnp.int32),
        noise_key=jax.random.PRNGKey(0),
        noise_scale=0.0,
        max_mel_length=256,
        method=jmodel.inference)

    j_mels = np.asarray(j_out['mels'])
    j_lengths = np.asarray(j_out['mel_lengths'])
    t_mels_np = t_mels.numpy().transpose(0, 2, 1)
    for i in range(tokens.shape[0]):
        n = min(int(j_lengths[i]), t_mels_np.shape[1])
        mae = np.abs(j_mels[i, :n] - t_mels_np[i, :n]).mean()
        assert mae < 1e-3, f'{mode} sample {i}: mel MAE {mae:.2e}'
