"""GE2E d-vector encoder parity: stacked torch LSTM + Linear vs our
lax.scan LSTM with imported weights (SURVEY §2.11 — the reference's GE2E
submodule is not vendored, so parity is checked against the equivalent
torch topology directly)."""

import numpy as np

import jax
import jax.numpy as jnp

from glow_tts_tpu.models.conditioning import GE2ESpeakerEncoder
from glow_tts_tpu.utils.torch_import import (convert_ge2e_state_dict,
                                             convert_torch_lstm_layer)
from tests.helpers import tiny_config


def test_lstm_layer_parity():
    import torch
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(input_size=6, hidden_size=8, num_layers=1,
                         batch_first=True).eval()
    x = torch.randn(3, 11, 6)
    with torch.no_grad():
        y_t, _ = lstm(x)

    from flax import linen as nn
    params = convert_torch_lstm_layer(
        lstm.weight_ih_l0, lstm.weight_hh_l0,
        lstm.bias_ih_l0, lstm.bias_hh_l0)
    cell = nn.OptimizedLSTMCell(8, name='cell')
    rnn = nn.RNN(cell)
    y_j = rnn.apply({'params': {'cell': params}}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_ge2e_encoder_parity_with_torch_stack():
    import torch
    torch.manual_seed(1)
    cfg = tiny_config(mode='SE', **{
        'Speaker_Embedding': {
            'Type': 'GE2E', 'Num_Speakers': 4, 'Embedding_Size': 16,
            'GE2E': {'LSTM': {'Sizes': 16, 'Stacks': 2},
                     'Inference': {'Samples': 2, 'Slice_Length': 12,
                                   'Overlap_Length': 4}}}})
    mel_dim = cfg.sound.mel_dim

    lstm = torch.nn.LSTM(input_size=mel_dim, hidden_size=16, num_layers=2,
                         batch_first=True).eval()
    linear = torch.nn.Linear(16, 16).eval()

    # assemble a reference-style state dict
    sd = {}
    for i in range(2):
        for name in ('weight_ih', 'weight_hh', 'bias_ih', 'bias_hh'):
            sd[f'layer_Dict.LSTM.{name}_l{i}'] = getattr(lstm,
                                                         f'{name}_l{i}')
    sd['layer_Dict.Linear.weight'] = linear.weight
    sd['layer_Dict.Linear.bias'] = linear.bias

    params = convert_ge2e_state_dict(sd, cfg)
    encoder = GE2ESpeakerEncoder(cfg)

    x = np.random.default_rng(2).standard_normal(
        (4, 12, mel_dim)).astype(np.float32)
    with torch.no_grad():
        h, _ = lstm(torch.from_numpy(x))
        emb_t = linear(h[:, -1])
        emb_t = emb_t / emb_t.norm(dim=1, keepdim=True)

    emb_j = encoder.apply({'params': params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(),
                               rtol=1e-4, atol=1e-5)

    # pooled utterance embedding: unit-norm output
    pooled = encoder.apply({'params': params}, jnp.asarray(x),
                           method=encoder.embed_utterances)
    norms = np.linalg.norm(np.asarray(pooled), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_ge2e_import_discovers_unknown_prefixes():
    """The submodule's exact module paths are unknown — tensors must be
    found by torch-LSTM naming convention and projection shape, whatever
    prefix the checkpoint uses."""
    import torch
    torch.manual_seed(3)
    cfg = tiny_config(mode='SE', **{
        'Speaker_Embedding': {
            'Type': 'GE2E', 'Num_Speakers': 4, 'Embedding_Size': 16,
            'GE2E': {'LSTM': {'Sizes': 16, 'Stacks': 2},
                     'Inference': {'Samples': 2, 'Slice_Length': 12,
                                   'Overlap_Length': 4}}}})
    mel_dim = cfg.sound.mel_dim
    lstm = torch.nn.LSTM(input_size=mel_dim, hidden_size=16, num_layers=2,
                         batch_first=True).eval()
    linear = torch.nn.Linear(16, 16).eval()

    sd = {}
    for i in range(2):
        for name in ('weight_ih', 'weight_hh', 'bias_ih', 'bias_hh'):
            sd[f'encoder.rnn_stack.{name}_l{i}'] = getattr(lstm,
                                                           f'{name}_l{i}')
    sd['encoder.proj.weight'] = linear.weight
    sd['encoder.proj.bias'] = linear.bias
    sd['some.other.counter'] = torch.zeros(1)

    params = convert_ge2e_state_dict(sd, cfg)     # no prefixes given
    encoder = GE2ESpeakerEncoder(cfg)
    x = np.random.default_rng(4).standard_normal(
        (2, 12, mel_dim)).astype(np.float32)
    import torch as _t
    with _t.no_grad():
        h, _ = lstm(_t.from_numpy(x))
        emb_t = linear(h[:, -1])
        emb_t = emb_t / emb_t.norm(dim=1, keepdim=True)
    emb_j = encoder.apply({'params': params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_ge2e_import_mismatch_lists_checkpoint_keys():
    import pytest
    import torch
    cfg = tiny_config(mode='SE', **{
        'Speaker_Embedding': {
            'Type': 'GE2E', 'Num_Speakers': 4, 'Embedding_Size': 16,
            'GE2E': {'LSTM': {'Sizes': 16, 'Stacks': 2},
                     'Inference': {'Samples': 2, 'Slice_Length': 12,
                                   'Overlap_Length': 4}}}})
    # wrong LSTM width → loud error including the actual keys/shapes
    sd = {'m.weight_ih_l0': torch.zeros(4 * 99, cfg.sound.mel_dim),
          'm.weight_hh_l0': torch.zeros(4 * 99, 99),
          'm.bias_ih_l0': torch.zeros(4 * 99),
          'm.bias_hh_l0': torch.zeros(4 * 99)}
    with pytest.raises(KeyError) as err:
        convert_ge2e_state_dict(sd, cfg)
    msg = str(err.value)
    assert 'm.weight_ih_l0' in msg and '396' in msg

    # missing projection → error naming the expectation
    sd_ok = {'m.weight_ih_l0': torch.zeros(64, cfg.sound.mel_dim),
             'm.weight_hh_l0': torch.zeros(64, 16),
             'm.bias_ih_l0': torch.zeros(64),
             'm.bias_hh_l0': torch.zeros(64),
             'm.weight_ih_l1': torch.zeros(64, 16),
             'm.weight_hh_l1': torch.zeros(64, 16),
             'm.bias_ih_l1': torch.zeros(64),
             'm.bias_hh_l1': torch.zeros(64)}
    with pytest.raises(KeyError) as err:
        convert_ge2e_state_dict(sd_ok, cfg)
    assert 'projection' in str(err.value)
