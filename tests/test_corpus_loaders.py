"""Corpus-loader directory contracts (reference ``Pattern_Generator.py``
per-corpus loaders §2.23) exercised on synthetic directory trees."""

import os

import pytest

from glow_tts_tpu.data import pattern_generator as pg


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(b'\x00')


def test_lj_loader(tmp_path):
    root = tmp_path / 'LJ'
    for i in range(3):
        _touch(str(root / 'wavs' / f'LJ001-{i:04d}.wav'))
    (root / 'metadata.csv').write_text(
        'LJ001-0000|raw|Printing was the first.\n'
        'LJ001-0001|raw|bad 123 line\n'
        'LJ001-0002|raw|In the only sense.\n')
    paths, texts, speakers = pg.lj_info(str(root), use_text=True)
    assert len(paths) == 2                       # digits line filtered
    assert all(speakers[p] == 'LJ' for p in paths)
    assert texts[paths[0]] == texts[paths[0]].upper()


def test_vctk_loader(tmp_path):
    root = tmp_path / 'VCTK'
    for spk, n in [('p225', 2), ('p315', 1)]:
        for i in range(n):
            _touch(str(root / 'wav48' / spk / f'{spk}_{i:03d}.wav'))
            txt = root / 'txt' / spk / f'{spk}_{i:03d}.txt'
            os.makedirs(txt.parent, exist_ok=True)
            txt.write_text('The rainbow is a division of white light.\n')
    paths, texts, speakers = pg.vctk_info(str(root), use_text=True)
    # p315 transcripts are officially lost → excluded
    assert len(paths) == 2
    assert all(speakers[p] == 'VCTK.P225' for p in paths)


def test_libri_loader(tmp_path):
    root = tmp_path / 'Libri'
    wav = root / '19' / '198' / '19_198_000000.wav'
    _touch(str(wav))
    (root / '19' / '198' / '19_198_000000.normalized.txt').write_text(
        'This is a normalized transcript.\n')
    paths, texts, speakers = pg.libri_info(str(root), use_text=True)
    assert len(paths) == 1
    assert speakers[paths[0]] == 'Libri.0019'


def test_cmua_loader(tmp_path):
    root = tmp_path / 'CMUA' / 'cmu_us_bdl_arctic'
    _touch(str(root / 'wav' / 'arctic_a0001.wav'))
    os.makedirs(root / 'etc', exist_ok=True)
    (root / 'etc' / 'txt.done.data').write_text(
        '( arctic_a0001 "Author of the danger trail." )\n')
    paths, texts, speakers = pg.cmua_info(str(tmp_path / 'CMUA'),
                                          use_text=True)
    assert len(paths) == 1
    assert speakers[paths[0]] == 'CMUA.BDL'
    assert texts[paths[0]] == 'AUTHOR OF THE DANGER TRAIL.'


def test_voxceleb_loaders(tmp_path):
    root = tmp_path / 'VC1'
    _touch(str(root / 'id10001' / 'clip' / '00001.wav'))
    paths, texts, speakers = pg.vc1_info(str(root))
    assert len(paths) == 1 and speakers[paths[0]] == 'VC1.ID10001'
    with pytest.raises(ValueError):
        pg.vc1_info(str(root), use_text=True)
    with pytest.raises(ValueError):
        pg.vc2_info(str(root), use_text=True)
    with pytest.raises(ValueError):
        pg.vc1t_info(str(root), use_text=True)


def test_bc2013_loader(tmp_path):
    root = tmp_path / 'BC'
    _touch(str(root / 'wav' / 'utt1.wav'))
    os.makedirs(root / 'txt', exist_ok=True)
    (root / 'txt' / 'utt1.txt').write_text('A tale of two cities.\n')
    paths, texts, speakers = pg.bc2013_info(str(root), use_text=True)
    assert len(paths) == 1
    assert speakers[paths[0]] == 'BC2013'
    assert texts[paths[0]] == 'A TALE OF TWO CITIES.'
