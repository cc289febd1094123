"""Full ETL (wav → mel/pitch pickle → METADATA → Dataset) for every corpus
layout the reference supports (``Pattern_Generator.py:107-326``) — not just
the directory-walking contracts.  Each corpus gets tiny real audio files in
its native tree shape; Libri additionally runs on flac when soundfile is
available (the real corpus ships flac)."""

import os
import pickle

import numpy as np
import pytest

from glow_tts_tpu.data import pattern_generator as pg
from glow_tts_tpu.data.collate import TrainCollater
from glow_tts_tpu.data.loader import DataLoader
from glow_tts_tpu.data.patterns import PatternDataset
from glow_tts_tpu.text import Tokenizer, load_token_dict
from tests.helpers import tiny_config

SR = 1600
TEXTS = [
    'THE QUICK BROWN FOX JUMPS OVER THE DOG.',
    'PACK MY BOX WITH FIVE DOZEN JUGS.',
    'HOW QUICKLY DAFT ZEBRAS JUMP TODAY.',
    'SPHINX OF BLACK QUARTZ JUDGE MY VOW.',
]


def _audio(i, dur=1.0):
    t = np.arange(int(SR * dur)) / SR
    rng = np.random.default_rng(i)
    return (0.5 * np.sin(2 * np.pi * (150 + 40 * i) * t)
            + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)


def _write_wav(path, i):
    from scipy.io import wavfile
    os.makedirs(os.path.dirname(path), exist_ok=True)
    wavfile.write(path, SR, (_audio(i) * 32767).astype(np.int16))


def _write_flac(path, i):
    soundfile = pytest.importorskip('soundfile')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    soundfile.write(path, _audio(i), SR, format='FLAC')


def _build_lj(root):
    lines = []
    for i, text in enumerate(TEXTS):
        _write_wav(str(root / 'wavs' / f'LJ001-{i:04d}.wav'), i)
        lines.append(f'LJ001-{i:04d}|{text}|{text}')
    (root / 'metadata.csv').write_text('\n'.join(lines))


def _build_bc2013(root):
    for i, text in enumerate(TEXTS):
        _write_wav(str(root / 'wav' / f'utt{i}.wav'), i)
        os.makedirs(root / 'txt', exist_ok=True)
        (root / 'txt' / f'utt{i}.txt').write_text(text + '\n')


def _build_cmua(root):
    spk = root / 'cmu_us_bdl_arctic'
    lines = []
    for i, text in enumerate(TEXTS):
        _write_wav(str(spk / 'wav' / f'arctic_a{i:04d}.wav'), i)
        lines.append(f'( arctic_a{i:04d} "{text.capitalize()}" )')
    os.makedirs(spk / 'etc', exist_ok=True)
    (spk / 'etc' / 'txt.done.data').write_text('\n'.join(lines))


def _build_vctk(root):
    for i, text in enumerate(TEXTS):
        spk = f'p{225 + (i % 2)}'
        _write_wav(str(root / 'wav48' / spk / f'{spk}_{i:03d}.wav'), i)
        txt = root / 'txt' / spk / f'{spk}_{i:03d}.txt'
        os.makedirs(txt.parent, exist_ok=True)
        txt.write_text(text + '\n')


def _build_libri(root, ext='.wav'):
    writer = _write_wav if ext == '.wav' else _write_flac
    for i, text in enumerate(TEXTS):
        stem = root / f'{19 + i}' / '198' / f'{19 + i}_198_000000'
        writer(str(stem) + ext, i)
        (stem.parent / (stem.name + '.normalized.txt')
         ).write_text(text + '\n')


def _build_vox(root):
    for i in range(len(TEXTS)):
        _write_wav(str(root / f'id1000{i % 2}' / 'clip' / f'{i:05d}.wav'), i)


BUILDERS = {
    'LJ': (_build_lj, True),
    'BC2013': (_build_bc2013, True),
    'CMUA': (_build_cmua, True),
    'VCTK': (_build_vctk, True),
    'Libri': (_build_libri, True),
    'VC1': (_build_vox, False),
    'VC2': (_build_vox, False),
    'VC1T': (_build_vox, False),
}


def _etl_config(work):
    return tiny_config(**{
        'Token_Path': str(work / 'Token.yaml'),
        'Train': {
            'Train_Pattern': {'Path': str(work / 'Train'),
                              'Mel_Length': {'Min': 10, 'Max': 1000},
                              'Text_Length': {'Min': 5, 'Max': 200}},
            'Eval_Pattern': {'Path': str(work / 'Eval'),
                             'Mel_Length': {'Min': 10, 'Max': 1000},
                             'Text_Length': {'Min': 5, 'Max': 200}},
            'Batch_Size': 2,
        },
        'Sound': {'Mel_Dim': 8, 'Spectrogram_Dim': 65, 'Frame_Length': 64,
                  'Frame_Shift': 16, 'Sample_Rate': SR, 'Mel_F_Min': 50,
                  'Mel_F_Max': 600, 'Max_Abs_Mel': 4,
                  'Confidence_Threshold': 0.6,
                  'Gaussian_Smoothing_Sigma': 0.0,
                  'Pitch_Min': 100.0, 'Pitch_Max': 400.0},
        'TPU': {'compute_dtype': 'float32', 'mas_backend': 'scan',
                'token_bucket': 16, 'mel_bucket': 32},
    })


@pytest.mark.parametrize('corpus', list(BUILDERS))
def test_full_etl(corpus, tmp_path):
    builder, has_text = BUILDERS[corpus]
    root = tmp_path / corpus
    builder(root)
    work = tmp_path / 'work'
    cfg = _etl_config(work)

    pg.generate_patterns(cfg, {corpus: str(root)}, use_text=has_text,
                         eval_ratio=0.25, eval_min=1, max_workers=2)

    meta = pickle.load(open(work / 'Train' / 'METADATA.PICKLE', 'rb'))
    assert meta['File_List'], f'{corpus}: no training patterns'
    assert os.path.exists(work / 'Eval' / 'METADATA.PICKLE')
    sample = pickle.load(
        open(os.path.join(work / 'Train', meta['File_List'][0]), 'rb'))
    assert sample['Mel'].shape[1] == cfg.sound.mel_dim
    assert sample['Mel'].shape[0] == sample['Pitch'].shape[0]
    assert sample['Mel'].shape[0] >= 10
    assert sample['Dataset'] == corpus
    if has_text:
        assert sample['Text'] and sample['Text'] == sample['Text'].upper()

    if not has_text:
        return      # VoxCeleb corpora carry no transcripts (speaker data)

    # pickles → Dataset → Collater: one real batch end-to-end
    dataset = PatternDataset(
        pattern_path=str(work / 'Train'),
        metadata_file='METADATA.PICKLE',
        mel_length_min=10, mel_length_max=1000,
        text_length_min=5, text_length_max=200)
    assert len(dataset) >= 1
    tokenizer = Tokenizer(load_token_dict(cfg.token_path))
    loader = DataLoader(dataset, TrainCollater(cfg, tokenizer),
                        batch_size=min(2, len(dataset)), shuffle=False,
                        prefetch=0, drop_last=False)
    batch = next(iter(loader))
    assert batch['mels'].shape[0] >= 1
    assert batch['mels'].shape[2] == cfg.sound.mel_dim
    assert (batch['mel_lengths'] >= 10).all()
    assert (batch['tokens'] >= 0).all()


def test_libri_flac_etl(tmp_path):
    """The real LibriTTS ships flac — decode path must survive it."""
    pytest.importorskip('soundfile')
    root = tmp_path / 'Libri'
    _build_libri(root, ext='.flac')
    work = tmp_path / 'work'
    cfg = _etl_config(work)
    pg.generate_patterns(cfg, {'Libri': str(root)}, use_text=True,
                         eval_ratio=0.25, eval_min=1, max_workers=2)
    meta = pickle.load(open(work / 'Train' / 'METADATA.PICKLE', 'rb'))
    assert meta['File_List'], 'no patterns from flac input'
    sample = pickle.load(
        open(os.path.join(work / 'Train', meta['File_List'][0]), 'rb'))
    assert sample['Mel'].shape[0] >= 10
