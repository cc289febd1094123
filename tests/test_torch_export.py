"""Round-trip interop: our params → reference state dict → back, and the
exported weights loaded into the live reference model reproduce our mels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glow_tts_tpu.config import load_config
from glow_tts_tpu.training.step import build_model
from glow_tts_tpu.utils.torch_export import convert_params_to_reference
from glow_tts_tpu.utils.torch_import import convert_reference_state_dict
from tests.test_fidelity_modes import load_reference


@pytest.mark.parametrize('mode', ['Vanilla', 'GR'])
def test_roundtrip_import_export(mode, tmp_path):
    """export(import(sd)) must reproduce every reference tensor exactly."""
    import torch
    Modules = load_reference(mode, str(tmp_path / f'rt_{mode}'))
    torch.manual_seed(3)
    tmodel = Modules.GlowTTS().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = load_config({'Mode': mode,
                       'Speaker_Embedding': {'Type': 'LUT',
                                             'Num_Speakers': 109,
                                             'Embedding_Size': 256},
                       'TPU': {'compute_dtype': 'float32',
                               'mas_backend': 'scan'}})
    params = convert_reference_state_dict(sd, cfg)
    back = convert_params_to_reference(params, cfg)

    missing = set(sd) - set(back)
    extra = set(back) - set(sd)
    assert not missing, f'missing keys: {sorted(missing)[:5]}'
    assert not extra, f'extra keys: {sorted(extra)[:5]}'
    for key in sd:
        if mode == 'GR' and '.GRU.bias' in key:
            # the h-side r/z biases are folded into the i-side on import;
            # only the sum is meaningful (torch adds them elementwise)
            continue
        np.testing.assert_allclose(back[key], sd[key], rtol=1e-6,
                                   atol=1e-7, err_msg=key)
    if mode == 'GR':
        for i in range(1):
            pe = 'layer_Dict.Prosody_Encoder.layer_Dict'
            np.testing.assert_allclose(
                back[f'{pe}.GRU.bias_ih_l{i}'] + back[f'{pe}.GRU.bias_hh_l{i}'],
                sd[f'{pe}.GRU.bias_ih_l{i}'] + sd[f'{pe}.GRU.bias_hh_l{i}'],
                rtol=1e-6, atol=1e-7)


def test_exported_weights_run_in_reference(tmp_path):
    """Load our (randomly initialised) params into the live reference via
    the exporter and compare inference mels."""
    import torch
    Modules = load_reference('Vanilla', str(tmp_path / 'exp'))

    cfg = load_config({'Mode': 'Vanilla',
                       'TPU': {'compute_dtype': 'float32',
                               'mas_backend': 'scan'}})
    jmodel = build_model(cfg)
    rng = np.random.default_rng(5)
    init_batch = dict(
        tokens=rng.integers(0, 35, (2, 12)).astype(np.int32),
        token_lengths=np.array([12, 10], np.int32),
        mels=rng.standard_normal((2, 32, 80)).astype(np.float32),
        mel_lengths=np.array([32, 28], np.int32))
    variables = jmodel.init(
        {'params': jax.random.PRNGKey(0),
         'dropout': jax.random.PRNGKey(1)},
        jnp.asarray(init_batch['tokens']),
        jnp.asarray(init_batch['token_lengths']),
        jnp.asarray(init_batch['mels']),
        jnp.asarray(init_batch['mel_lengths']), deterministic=True)
    params = variables['params']

    sd = convert_params_to_reference(params, cfg)
    tmodel = Modules.GlowTTS().eval()
    tmodel.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()})
    for module in tmodel.modules():
        if isinstance(module, Modules.Activation_Norm):
            module.initialized = True

    tokens = rng.integers(0, 35, (2, 14)).astype(np.int64)
    token_lengths = np.array([14, 11], np.int64)
    with torch.no_grad():
        t_mels, t_lengths, _ = tmodel.inference(
            tokens=torch.from_numpy(tokens),
            token_lengths=torch.from_numpy(token_lengths),
            mels_for_prosody=None, mel_lengths_for_prosody=None,
            speakers=None, mels_for_ge2e=None,
            pitches=None, pitch_lengths=None,
            noise_scale=0.0, length_scale=torch.full((2,), 2.0))

    j_out = jmodel.apply(
        {'params': params},
        tokens=jnp.asarray(tokens, jnp.int32),
        token_lengths=jnp.asarray(token_lengths, jnp.int32),
        noise_key=jax.random.PRNGKey(0), noise_scale=0.0,
        length_scale=2.0, max_mel_length=128,
        method=jmodel.inference)
    j_mels = np.asarray(j_out['mels'])
    j_lengths = np.asarray(j_out['mel_lengths'])
    t_np = t_mels.numpy().transpose(0, 2, 1)
    for i in range(2):
        n = min(int(j_lengths[i]), t_np.shape[1])
        mae = np.abs(j_mels[i, :n] - t_np[i, :n]).mean()
        assert mae < 1e-3, f'sample {i}: MAE {mae:.2e}'
