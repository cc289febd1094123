"""Import reference PyTorch checkpoints into glow_tts_tpu parameter trees.

The numerical-fidelity bridge (BASELINE.json north star: mel MAE < 1e-3
against the torch reference): every reference parameter maps onto this
framework's channels-last layout —

* Conv1d ``weight [out, in, k]`` → kernel ``[k, in, out]`` (k=1 convs are
  Dense ``[in, out]``)
* weight-normalised convs keep (g, v) decomposed: ``weight_g [out,1,1]`` →
  ``g [out]``, ``weight_v [out,in,k]`` → ``v [k,in,out]``
* ActNorm ``[1, C, 1]`` vectors → ``[C]``
* LayerNorm ``weight`` → ``scale``
* Shaw relative-position tables and the 4×4 invertible-conv weight carry
  over unchanged.

Supports Vanilla / SE-LUT / PE / GR topologies (GE2E LSTM import pending —
the reference's GE2E weights live in a separate submodule checkpoint).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from glow_tts_tpu.config import Config


def _np(t) -> np.ndarray:
    if hasattr(t, 'detach'):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_kernel(w) -> np.ndarray:
    """torch [out, in, k] → flax [k, in, out]."""
    return _np(w).transpose(2, 1, 0)


def _dense_kernel(w) -> np.ndarray:
    """torch 1×1 conv [out, in, 1] → Dense [in, out]."""
    return _np(w)[:, :, 0].T


def _dense(sd, prefix) -> Dict:
    return {'kernel': _dense_kernel(sd[f'{prefix}.weight']),
            'bias': _np(sd[f'{prefix}.bias'])}


def _conv(sd, prefix) -> Dict:
    return {'conv': {'kernel': _conv_kernel(sd[f'{prefix}.weight']),
                     'bias': _np(sd[f'{prefix}.bias'])}}


def _wnconv(sd, prefix) -> Dict:
    return {'g': _np(sd[f'{prefix}.weight_g']).reshape(-1),
            'v': _conv_kernel(sd[f'{prefix}.weight_v']),
            'b': _np(sd[f'{prefix}.bias'])}


def _layernorm(sd, prefix) -> Dict:
    return {'LayerNorm_0': {'scale': _np(sd[f'{prefix}.weight']),
                            'bias': _np(sd[f'{prefix}.bias'])}}


def convert_reference_state_dict(state_dict: Dict, config: Config) -> Dict:
    """Reference ``GlowTTS.state_dict()`` → flax params for
    :class:`glow_tts_tpu.models.glow_tts.GlowTTS`."""
    sd = state_dict
    enc = 'layer_Dict.Encoder.layer_Dict'
    params: Dict = {}

    # ---- encoder ----------------------------------------------------------
    prenet = {'proj': {'dense': _dense(sd, f'{enc}.Prenet.layer_Dict.Conv1x1')}}
    for i in range(config.encoder.prenet.stacks):
        base = f'{enc}.Prenet.layer_Dict.CLRD_{i}.layer_Dict'
        prenet[f'conv_{i}'] = _conv(sd, f'{base}.Conv')
        prenet[f'norm_{i}'] = _layernorm(sd, f'{base}.LayerNorm')

    encoder = {
        'embedding': {'embedding': _np(sd[f'{enc}.Embedding.weight'])},
        'prenet': prenet,
        'project': {'dense': _dense(sd, f'{enc}.Project')},
    }
    for i in range(config.encoder.transformer.stacks):
        base = f'{enc}.Transformer.layer_Dict.ANCRDCN_{i}.layer_Dict'
        attention = {
            'query': _dense(sd, f'{base}.Attention.layer_Dict.Query'),
            'key': _dense(sd, f'{base}.Attention.layer_Dict.Key'),
            'value': _dense(sd, f'{base}.Attention.layer_Dict.Value'),
            'proj': _dense(sd, f'{base}.Attention.layer_Dict.Projection'),
            'rel_emb_k': _np(sd[f'{base}.Attention.weight_K']),
            'rel_emb_v': _np(sd[f'{base}.Attention.weight_V']),
        }
        encoder[f'block_{i}'] = {
            'attention': attention,
            'norm_0': _layernorm(sd, f'{base}.LayerNorm_0'),
            'norm_1': _layernorm(sd, f'{base}.LayerNorm_1'),
            'conv_0': _conv(sd, f'{base}.Conv_0'),
            'conv_1': _conv(sd, f'{base}.Conv_1'),
        }

    duration = {
        'proj': {'dense': _dense(
            sd, f'{enc}.Duration_Predictor.layer_Dict.Projection')}}
    for i in range(config.encoder.duration_predictor.stacks):
        base = f'{enc}.Duration_Predictor.layer_Dict.CRND_{i}.layer_Dict'
        duration[f'conv_{i}'] = _conv(sd, f'{base}.Conv')
    encoder['duration_predictor'] = duration
    params['encoder'] = encoder

    # ---- flow decoder -----------------------------------------------------
    decoder = {}
    for k in range(config.decoder.stack):
        flow = f'layer_Dict.Decoder.layer_Dict.Flows.{k}'
        wavenet = {}
        for i in range(config.decoder.affine_coupling.wavenet.num_layers):
            wn = f'{flow}.layers.2.layer_Dict.WaveNet.layer_Dict'
            wavenet[f'in_{i}'] = _wnconv(sd, f'{wn}.In_{i}')
            wavenet[f'res_skip_{i}'] = _wnconv(sd, f'{wn}.Res_Skip_{i}')
            if config.uses_speaker_embedding:
                wavenet[f'speaker_{i}'] = _wnconv(sd, f'{wn}.Speaker_{i}')
            if config.uses_prosody_encoder:
                wavenet[f'prosody_{i}'] = _wnconv(sd, f'{wn}.Prosody_{i}')
            if config.uses_gradient_reversal:
                wavenet[f'pitch_{i}'] = _wnconv(sd, f'{wn}.Pitch_{i}')
        decoder[f'flow_{k}'] = {
            'actnorm': {
                'logs': _np(sd[f'{flow}.layers.0.logs']).reshape(-1),
                'bias': _np(sd[f'{flow}.layers.0.bias']).reshape(-1)},
            'invconv': {'weight': _np(sd[f'{flow}.layers.1.weight'])},
            'coupling': {
                'start': _wnconv(sd, f'{flow}.layers.2.layer_Dict.Start'),
                'end': {'dense': _dense(sd,
                                        f'{flow}.layers.2.layer_Dict.End')},
                'wavenet': wavenet,
            },
        }
    params['decoder'] = decoder

    # ---- conditioning -----------------------------------------------------
    if config.uses_speaker_embedding and \
            config.speaker_embedding.type.upper() == 'LUT':
        params['speaker_lut'] = {
            'lut': {'embedding': _np(sd['layer_Dict.LUT.weight'])}}
    if config.uses_prosody_encoder:
        params['prosody_encoder'] = _convert_prosody(sd, config)
    if config.uses_gradient_reversal:
        params['speaker_classifier'] = _convert_classifier(sd, config)
    return params


def _convert_prosody(sd, config: Config) -> Dict:
    pe = 'layer_Dict.Prosody_Encoder.layer_Dict'
    out: Dict = {}
    for i in range(len(config.prosody_encoder.reference_encoder.conv
                       .kernel_size)):
        # torch Conv2d [out, in, k_mel, k_time] with H=mel, W=time; this
        # framework runs NHWC with H=time, W=mel → swap the spatial axes:
        # [k_time, k_mel, in, out]
        w = _np(sd[f'{pe}.Conv_{i}.Conv.weight']).transpose(3, 2, 1, 0)
        out[f'conv_{i}'] = {'kernel': w}
    for i in range(config.prosody_encoder.reference_encoder.gru.stacks):
        w_ih = _np(sd[f'{pe}.GRU.weight_ih_l{i}'])       # [3H, in]
        w_hh = _np(sd[f'{pe}.GRU.weight_hh_l{i}'])       # [3H, H]
        b_ih = _np(sd[f'{pe}.GRU.bias_ih_l{i}'])
        b_hh = _np(sd[f'{pe}.GRU.bias_hh_l{i}'])
        h = w_hh.shape[1]
        # torch gate order (r, z, n); flax GRUCell: ir/iz/in, hr/hz/hn.
        # flax has no h-side bias for r/z — fold torch's b_hh into the
        # i-side bias (identical math since they just add).
        out[f'gru_cell_{i}'] = {
            'ir': {'kernel': w_ih[:h].T, 'bias': b_ih[:h] + b_hh[:h]},
            'iz': {'kernel': w_ih[h:2 * h].T,
                   'bias': b_ih[h:2 * h] + b_hh[h:2 * h]},
            'in': {'kernel': w_ih[2 * h:].T, 'bias': b_ih[2 * h:]},
            'hr': {'kernel': w_hh[:h].T},
            'hz': {'kernel': w_hh[h:2 * h].T},
            'hn': {'kernel': w_hh[2 * h:].T, 'bias': b_hh[2 * h:]},
        }
    att = 'layer_Dict.Prosody_Encoder.layer_Dict.Attention.layer_Dict'
    out['attention'] = {
        'query': _dense(sd, f'{att}.Query'),
        'key': _dense(sd, f'{att}.Key'),
        'value': _dense(sd, f'{att}.Value'),
        'proj': _dense(sd, f'{att}.Projection'),
    }
    out['style_tokens'] = _np(
        sd['layer_Dict.Prosody_Encoder.gst_Tokens']).T
    return out


def convert_torch_lstm_layer(w_ih, w_hh, b_ih, b_hh) -> Dict:
    """One torch LSTM layer → flax ``OptimizedLSTMCell`` params.

    torch packs gates (i, f, g, o) into ``[4H, *]`` tensors with separate
    i/h biases; flax keeps per-gate Dense params with the bias on the
    h-side only (fold ``b_ih + b_hh`` there — identical math).
    """
    w_ih, w_hh = _np(w_ih), _np(w_hh)
    b = _np(b_ih) + _np(b_hh)
    h = w_hh.shape[1]
    gates = ('i', 'f', 'g', 'o')
    out: Dict = {}
    for n, g in enumerate(gates):
        sl = slice(n * h, (n + 1) * h)
        out[f'i{g}'] = {'kernel': w_ih[sl].T}
        out[f'h{g}'] = {'kernel': w_hh[sl].T, 'bias': b[sl]}
    return out


def _describe_keys(sd: Dict) -> str:
    lines = []
    for k, v in sd.items():
        try:
            shape = tuple(_np(v).shape)
        except Exception:
            shape = '?'
        lines.append(f'  {k}: {shape}')
    return '\n'.join(lines)


def convert_ge2e_state_dict(state_dict: Dict, config: Config,
                            lstm_prefix: str = None,
                            linear_prefix: str = None) -> Dict:
    """Pre-trained GE2E d-vector checkpoint → :class:`GE2ESpeakerEncoder`
    params (reference loads these from a separate submodule checkpoint,
    ``Train.py:555-561``; the stacked-LSTM + linear topology is fixed by
    ``Hyper_Parameters.yaml:58-66``).

    The submodule is not vendored in the reference snapshot, so the exact
    module paths inside its checkpoints are unknowable here.  By default the
    tensors are therefore *discovered*: torch LSTMs always name their
    per-layer tensors ``…weight_ih_l{i}`` / ``…weight_hh_l{i}`` /
    ``…bias_*_l{i}`` whatever the module path, and the output projection is
    the unique ``…weight``/``…bias`` pair shaped
    ``[embedding_size, lstm_size]``.  Explicit prefixes still win when
    given; any mismatch raises an error listing the checkpoint's actual
    keys and shapes."""
    sd = state_dict
    ge2e = config.speaker_embedding.ge2e
    h = ge2e.lstm.sizes
    emb = config.speaker_embedding.embedding_size
    mel = config.sound.mel_dim

    def fail(what):
        raise KeyError(
            f'GE2E checkpoint: {what}.\nCheckpoint contains:\n'
            + _describe_keys(sd))

    out: Dict = {}
    for i in range(ge2e.lstm.stacks):
        tensors = {}
        for part in ('weight_ih', 'weight_hh', 'bias_ih', 'bias_hh'):
            if lstm_prefix:
                key = f'{lstm_prefix}.{part}_l{i}'
                if key not in sd:
                    fail(f'missing LSTM tensor {key!r}')
            else:
                matches = [k for k in sd if k.endswith(f'{part}_l{i}')]
                if len(matches) != 1:
                    fail(f'expected exactly one key ending '
                         f'"{part}_l{i}", found {matches}')
                key = matches[0]
            tensors[part] = sd[key]
        w_ih = _np(tensors['weight_ih'])
        expected_in = mel if i == 0 else h
        if w_ih.shape != (4 * h, expected_in):
            fail(f'LSTM layer {i} weight_ih has shape {w_ih.shape}, '
                 f'expected {(4 * h, expected_in)} for LSTM.Sizes={h}, '
                 f'Mel_Dim={mel}')
        out[f'lstm_cell_{i}'] = convert_torch_lstm_layer(
            tensors['weight_ih'], tensors['weight_hh'],
            tensors['bias_ih'], tensors['bias_hh'])

    if linear_prefix:
        wkey, bkey = f'{linear_prefix}.weight', f'{linear_prefix}.bias'
        if wkey not in sd or bkey not in sd:
            fail(f'missing projection tensors {wkey!r}/{bkey!r}')
    else:
        candidates = []
        for k, v in sd.items():
            if not k.endswith('weight') or 'weight_ih' in k \
                    or 'weight_hh' in k:
                continue
            b = k[:-len('weight')] + 'bias'
            try:
                shape = tuple(_np(v).shape)
            except Exception:
                continue
            if shape == (emb, h) and b in sd:
                candidates.append((k, b))
        if len(candidates) != 1:
            fail(f'expected exactly one [{emb}, {h}] projection '
                 f'weight/bias pair, found {[c[0] for c in candidates]}')
        wkey, bkey = candidates[0]
    out['projection'] = {'kernel': _np(sd[wkey]).T,
                         'bias': _np(sd[bkey])}
    return out


def _convert_classifier(sd, config: Config) -> Dict:
    cls = 'layer_Dict.Speaker_Classifier_GR.layer'
    out: Dict = {}
    for i, _ in enumerate(config.speaker_classifier_gr.channels):
        out[f'hidden_{i}'] = _dense(sd, f'{cls}.Hidden_{i}')
    last = len(config.speaker_classifier_gr.channels) - 1
    out['output'] = _dense(sd, f'{cls}.Output_{last}')
    return out
