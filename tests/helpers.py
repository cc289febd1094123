"""Shared test fixtures: tiny configs and synthetic batches."""

import numpy as np

from glow_tts_tpu.config import Config, load_config


def tiny_config(mode='Vanilla', **overrides) -> Config:
    data = {
        'Sound': {'Mel_Dim': 8, 'Spectrogram_Dim': 65, 'Frame_Length': 64,
                  'Frame_Shift': 16, 'Sample_Rate': 1600},
        'Mode': mode,
        'Encoder': {
            'Channels': 16, 'Embedding_Tokens': 35,
            'Prenet': {'Kernel_Size': 5, 'Dropout_Rate': 0.5, 'Stacks': 2},
            'Transformer': {
                'Attention': {'Heads': 2, 'Window_Size': 2},
                'Conv': {'Kernel_Size': 3, 'Calc_Channels': 32},
                'Dropout_Rate': 0.1, 'Stacks': 2},
            'Duration_Predictor': {'Kernel_Size': 3, 'Channels': 16,
                                   'Stacks': 2, 'Dropout_Rate': 0.1}},
        'Decoder': {'Stack': 3, 'Num_Squeeze': 2, 'Num_Split': 4,
                    'Affine_Coupling': {
                        'Calc_Channels': 16,
                        'WaveNet': {'Num_Layers': 2, 'Kernel_Size': 5,
                                    'Dropout_Rate': 0.05}}},
        'Speaker_Embedding': {
            'Type': 'LUT', 'Num_Speakers': 4, 'Embedding_Size': 16,
            'GE2E': {'LSTM': {'Sizes': 16, 'Stacks': 2},
                     'Inference': {'Samples': 2, 'Slice_Length': 12,
                                   'Overlap_Length': 4}}},
        'Prosody_Encoder': {
            'Size': 16,
            'Reference_Encoder': {
                'Conv': {'Kernel_Size': [3, 3], 'Channels': [4, 8],
                         'Strides': [2, 2]},
                'GRU': {'Size': 8, 'Stacks': 1}},
            'Style_Token': {'Num_Tokens': 6, 'Size': 16,
                            'Attention_Head': 2}},
        'Speaker_Classifier_GR': {'Channels': [16]},
        'Train': {'Batch_Size': 4,
                  'Learning_Rate': {'Initial': 1.0e-3, 'Base': 100},
                  'ADAM': {'Beta1': 0.9, 'Beta2': 0.999, 'Epsilon': 1.0e-6},
                  'Weight_Decay': 1.0e-6, 'Gradient_Norm': 5.0},
        'TPU': {'compute_dtype': 'float32', 'mas_backend': 'scan'},
    }
    data.update(overrides)
    return load_config(data)


def synthetic_batch(config: Config, rng=None, batch=4, t_tok=12, t_mel=24):
    rng = rng or np.random.default_rng(0)
    s = config.decoder.num_squeeze
    mel_dim = config.sound.mel_dim
    token_lengths = rng.integers(6, t_tok + 1, batch).astype(np.int32)
    mel_lengths = np.array(
        [rng.integers(max(tl, s), t_mel // s + 1) * s
         for tl in token_lengths], np.int32)
    mel_lengths = np.maximum(mel_lengths, token_lengths)   # t_y >= t_x
    mel_lengths = (mel_lengths // s) * s
    tokens = rng.integers(
        0, config.encoder.embedding_tokens, (batch, t_tok)).astype(np.int32)
    mels = rng.standard_normal((batch, t_mel, mel_dim)).astype(np.float32)
    mel_mask = (np.arange(t_mel)[None, :, None]
                < mel_lengths[:, None, None])
    mels = mels * mel_mask + (-config.sound.max_abs_mel) * (~mel_mask)
    batch_dict = {
        'tokens': tokens,
        'token_lengths': token_lengths,
        'mels': mels.astype(np.float32),
        'mel_lengths': mel_lengths,
    }
    if config.uses_speaker_embedding or config.uses_gradient_reversal:
        batch_dict['speakers'] = rng.integers(
            0, config.speaker_embedding.num_speakers, batch).astype(np.int32)
        if config.speaker_embedding.type.upper() == 'GE2E':
            samples = config.speaker_embedding.ge2e.inference.samples
            slice_len = config.speaker_embedding.ge2e.inference.slice_length
            batch_dict['mels_for_ge2e'] = rng.standard_normal(
                (batch * samples, slice_len, mel_dim)).astype(np.float32)
    if config.uses_gradient_reversal:
        batch_dict['pitches'] = rng.random((batch, t_mel)).astype(np.float32)
    return batch_dict
