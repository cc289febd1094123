"""Export glow_tts_tpu parameters to the reference's PyTorch checkpoint
format — the inverse of :mod:`glow_tts_tpu.utils.torch_import`.

Models trained here can be loaded by the reference ``Train.py``/
``Inference.py`` (state-dict key and layout compatible, ``S_<step>.pt``
payload shape per ``Train.py:535-553``), closing the interop loop in both
directions.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from glow_tts_tpu.config import Config


def _conv_weight(kernel: np.ndarray) -> np.ndarray:
    """flax [k, in, out] → torch [out, in, k]."""
    return np.asarray(kernel).transpose(2, 1, 0)


def _dense_weight(kernel: np.ndarray) -> np.ndarray:
    """flax Dense [in, out] → torch 1×1 conv [out, in, 1]."""
    return np.asarray(kernel).T[:, :, None]


def _dense(out: Dict, prefix: str, p: Dict) -> None:
    out[f'{prefix}.weight'] = _dense_weight(p['kernel'])
    out[f'{prefix}.bias'] = np.asarray(p['bias'])


def _conv(out: Dict, prefix: str, p: Dict) -> None:
    out[f'{prefix}.weight'] = _conv_weight(p['conv']['kernel'])
    out[f'{prefix}.bias'] = np.asarray(p['conv']['bias'])


def _wnconv(out: Dict, prefix: str, p: Dict) -> None:
    out[f'{prefix}.weight_g'] = np.asarray(p['g'])[:, None, None]
    out[f'{prefix}.weight_v'] = _conv_weight(p['v'])
    out[f'{prefix}.bias'] = np.asarray(p['b'])


def _layernorm(out: Dict, prefix: str, p: Dict) -> None:
    out[f'{prefix}.weight'] = np.asarray(p['LayerNorm_0']['scale'])
    out[f'{prefix}.bias'] = np.asarray(p['LayerNorm_0']['bias'])


def convert_params_to_reference(params: Dict, config: Config
                                ) -> Dict[str, np.ndarray]:
    """flax params → reference ``GlowTTS.state_dict()`` (numpy values)."""
    enc_p = params['encoder']
    enc = 'layer_Dict.Encoder.layer_Dict'
    sd: Dict[str, np.ndarray] = {}

    sd[f'{enc}.Embedding.weight'] = np.asarray(
        enc_p['embedding']['embedding'])
    _dense(sd, f'{enc}.Prenet.layer_Dict.Conv1x1',
           enc_p['prenet']['proj']['dense'])
    for i in range(config.encoder.prenet.stacks):
        base = f'{enc}.Prenet.layer_Dict.CLRD_{i}.layer_Dict'
        _conv(sd, f'{base}.Conv', enc_p['prenet'][f'conv_{i}'])
        _layernorm(sd, f'{base}.LayerNorm', enc_p['prenet'][f'norm_{i}'])
    for i in range(config.encoder.transformer.stacks):
        base = f'{enc}.Transformer.layer_Dict.ANCRDCN_{i}.layer_Dict'
        block = enc_p[f'block_{i}']
        for name, key in [('Query', 'query'), ('Key', 'key'),
                          ('Value', 'value'), ('Projection', 'proj')]:
            _dense(sd, f'{base}.Attention.layer_Dict.{name}',
                   block['attention'][key])
        sd[f'{base}.Attention.weight_K'] = np.asarray(
            block['attention']['rel_emb_k'])
        sd[f'{base}.Attention.weight_V'] = np.asarray(
            block['attention']['rel_emb_v'])
        _layernorm(sd, f'{base}.LayerNorm_0', block['norm_0'])
        _layernorm(sd, f'{base}.LayerNorm_1', block['norm_1'])
        _conv(sd, f'{base}.Conv_0', block['conv_0'])
        _conv(sd, f'{base}.Conv_1', block['conv_1'])
    _dense(sd, f'{enc}.Project', enc_p['project']['dense'])
    dur = enc_p['duration_predictor']
    for i in range(config.encoder.duration_predictor.stacks):
        _conv(sd, f'{enc}.Duration_Predictor.layer_Dict.CRND_{i}'
                  f'.layer_Dict.Conv', dur[f'conv_{i}'])
    _dense(sd, f'{enc}.Duration_Predictor.layer_Dict.Projection',
           dur['proj']['dense'])

    for k in range(config.decoder.stack):
        flow = f'layer_Dict.Decoder.layer_Dict.Flows.{k}'
        fp = params['decoder'][f'flow_{k}']
        sd[f'{flow}.layers.0.logs'] = np.asarray(
            fp['actnorm']['logs'])[None, :, None]
        sd[f'{flow}.layers.0.bias'] = np.asarray(
            fp['actnorm']['bias'])[None, :, None]
        sd[f'{flow}.layers.1.weight'] = np.asarray(fp['invconv']['weight'])
        _wnconv(sd, f'{flow}.layers.2.layer_Dict.Start',
                fp['coupling']['start'])
        _dense(sd, f'{flow}.layers.2.layer_Dict.End',
               fp['coupling']['end']['dense'])
        wn = fp['coupling']['wavenet']
        for i in range(config.decoder.affine_coupling.wavenet.num_layers):
            base = f'{flow}.layers.2.layer_Dict.WaveNet.layer_Dict'
            _wnconv(sd, f'{base}.In_{i}', wn[f'in_{i}'])
            _wnconv(sd, f'{base}.Res_Skip_{i}', wn[f'res_skip_{i}'])
            if config.uses_speaker_embedding:
                _wnconv(sd, f'{base}.Speaker_{i}', wn[f'speaker_{i}'])
            if config.uses_prosody_encoder:
                _wnconv(sd, f'{base}.Prosody_{i}', wn[f'prosody_{i}'])
            if config.uses_gradient_reversal:
                _wnconv(sd, f'{base}.Pitch_{i}', wn[f'pitch_{i}'])

    if config.uses_speaker_embedding and \
            config.speaker_embedding.type.upper() == 'LUT':
        sd['layer_Dict.LUT.weight'] = np.asarray(
            params['speaker_lut']['lut']['embedding'])
    if config.uses_prosody_encoder:
        _export_prosody(sd, params['prosody_encoder'], config)
    if config.uses_gradient_reversal:
        cls = params['speaker_classifier']
        for i, _ in enumerate(config.speaker_classifier_gr.channels):
            _dense(sd, f'layer_Dict.Speaker_Classifier_GR.layer.Hidden_{i}',
                   cls[f'hidden_{i}'])
        last = len(config.speaker_classifier_gr.channels) - 1
        _dense(sd, f'layer_Dict.Speaker_Classifier_GR.layer.Output_{last}',
               cls['output'])
    return sd


def _export_prosody(sd: Dict, pp: Dict, config: Config) -> None:
    pe = 'layer_Dict.Prosody_Encoder.layer_Dict'
    ref = config.prosody_encoder.reference_encoder
    for i in range(len(ref.conv.kernel_size)):
        # flax [k_time, k_mel, in, out] → torch [out, in, k_mel, k_time]
        sd[f'{pe}.Conv_{i}.Conv.weight'] = np.asarray(
            pp[f'conv_{i}']['kernel']).transpose(3, 2, 1, 0)
    for i in range(ref.gru.stacks):
        cell = pp[f'gru_cell_{i}']
        w_ih = np.concatenate([np.asarray(cell[g]['kernel']).T
                               for g in ('ir', 'iz', 'in')])
        w_hh = np.concatenate([np.asarray(cell[g]['kernel']).T
                               for g in ('hr', 'hz', 'hn')])
        h = w_hh.shape[1]
        # flax folds the torch h-side r/z biases into the i-side; split
        # them back as all-i (identical math in torch's GRU formulation)
        b_ih = np.concatenate([np.asarray(cell['ir']['bias']),
                               np.asarray(cell['iz']['bias']),
                               np.asarray(cell['in']['bias'])])
        b_hh = np.concatenate([np.zeros(h, np.float32),
                               np.zeros(h, np.float32),
                               np.asarray(cell['hn']['bias'])])
        sd[f'{pe}.GRU.weight_ih_l{i}'] = w_ih
        sd[f'{pe}.GRU.weight_hh_l{i}'] = w_hh
        sd[f'{pe}.GRU.bias_ih_l{i}'] = b_ih
        sd[f'{pe}.GRU.bias_hh_l{i}'] = b_hh
    att = f'{pe}.Attention.layer_Dict'
    for name, key in [('Query', 'query'), ('Key', 'key'),
                      ('Value', 'value'), ('Projection', 'proj')]:
        _dense(sd, f'{att}.{name}', pp['attention'][key])
    sd['layer_Dict.Prosody_Encoder.gst_Tokens'] = np.asarray(
        pp['style_tokens']).T


def save_reference_checkpoint(params: Dict, config: Config, step: int,
                              path: str) -> None:
    """Write an ``S_<step>.pt``-style torch checkpoint loadable by the
    reference (``Train.py:499-533`` expects the Model/Steps keys)."""
    import torch
    state_dict = {
        key: torch.from_numpy(np.ascontiguousarray(value))
        for key, value in convert_params_to_reference(params, config).items()
    }
    torch.save({'Model': state_dict, 'Steps': step, 'Epochs': 0}, path)


def main():
    import argparse
    parser = argparse.ArgumentParser(
        description='Export a glow_tts_tpu checkpoint to the reference '
                    'PyTorch S_<step>.pt format.')
    parser.add_argument('-c', '--checkpoint', required=True,
                        help='orbax checkpoint directory')
    parser.add_argument('-s', '--step', default=0, type=int,
                        help='checkpoint step; 0 = latest')
    parser.add_argument('-o', '--output', default=None,
                        help='output .pt path (default S_<step>.pt)')
    args = parser.parse_args()

    from glow_tts_tpu.inference import Inferencer
    inferencer = Inferencer(args.checkpoint, step=args.step)
    out = args.output or f'S_{inferencer.step}.pt'
    save_reference_checkpoint(inferencer.state.params, inferencer.config,
                              inferencer.step, out)
    print(f'exported step {inferencer.step} → {out}')


if __name__ == '__main__':
    main()
