"""Pure-Python FLAC codec: lossless round-trips over every subframe type,
stereo decorrelation mode, and integrity check.

The decoder exists so LibriTTS flac ETL works with zero external audio
dependencies (reference decodes via librosa/soundfile, ``Audio.py:3-7``);
the encoder generates the fixtures and proves losslessness."""

import numpy as np
import pytest

from glow_tts_tpu.data import flac


def _signal(n=6400, seed=0, amplitude=0.4):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = amplitude * np.sin(2 * np.pi * 220 * t) \
        + 0.02 * rng.standard_normal(n)
    return np.clip(np.round(x * 32767), -32768, 32767).astype(np.int64)


@pytest.mark.parametrize('strategy', ['verbatim', 'fixed', 'lpc', 'wasted'])
def test_mono_roundtrip(strategy):
    x = _signal()
    if strategy == 'wasted':
        x = (x >> 3) << 3     # 3 genuinely wasted bits per sample
    data = flac.encode(x, 16000, block_size=1000, strategy=strategy)
    decoded, rate, bps = flac.decode(data)
    assert (rate, bps) == (16000, 16)
    np.testing.assert_array_equal(decoded[:, 0], x)


def test_escape_partition_roundtrip():
    x = _signal(3000)
    data = flac.encode(x, 16000, strategy='fixed', force_escape=True)
    decoded, _, _ = flac.decode(data)
    np.testing.assert_array_equal(decoded[:, 0], x)


def test_constant_subframe():
    x = np.full(2500, -123, np.int64)
    decoded, _, _ = flac.decode(flac.encode(x, 8000))
    np.testing.assert_array_equal(decoded[:, 0], x)


@pytest.mark.parametrize('mid_side', [False, True])
def test_stereo_roundtrip(mid_side):
    left = _signal(5000, seed=1)
    right = np.roll(left, 7) // 2
    stereo = np.stack([left, right], axis=-1)
    data = flac.encode(stereo, 22050, block_size=512, mid_side=mid_side)
    decoded, rate, _ = flac.decode(data)
    assert rate == 22050
    np.testing.assert_array_equal(decoded, stereo)


def test_partial_final_block():
    x = _signal(1537)     # not a multiple of the block size
    decoded, _, _ = flac.decode(flac.encode(x, 16000, block_size=512))
    assert decoded.shape[0] == 1537
    np.testing.assert_array_equal(decoded[:, 0], x)


def test_corruption_detected():
    data = bytearray(flac.encode(_signal(2000), 16000))
    data[len(data) // 2] ^= 0x40     # flip a bit mid-stream
    with pytest.raises(ValueError):
        flac.decode(bytes(data))


def test_md5_guards_stream_integrity():
    # zero out the MD5 → decode must succeed without the check
    data = bytearray(flac.encode(_signal(2000), 16000))
    info_md5_offset = 8 + 18         # fLaC + block header + 18 body bytes
    good = flac.decode(bytes(data))[0]
    data[info_md5_offset:info_md5_offset + 16] = b'\x00' * 16
    np.testing.assert_array_equal(flac.decode(bytes(data))[0], good)


def test_file_helpers_roundtrip(tmp_path):
    path = str(tmp_path / 'clip.flac')
    audio = _signal(4000).astype(np.float32) / 32768.0
    flac.write(path, audio, 16000)
    back, rate = flac.read(path)
    assert rate == 16000 and back.ndim == 1
    assert np.abs(back - audio).max() <= 1.0 / 32767   # int16 quantisation


def test_property_roundtrip_fuzz():
    """Property fuzz of the from-scratch codec: random lengths, channel
    counts, bit depths, strategies, extreme amplitudes and constant runs
    must all round-trip exactly (hypothesis-style sweep, fixed seed so
    CI is deterministic)."""
    import itertools
    import numpy as np
    from glow_tts_tpu.data import flac

    rng = np.random.default_rng(0)
    strategies = ['fixed', 'verbatim', 'constant_ok']
    cases = 0
    for trial in range(60):
        n = int(rng.integers(1, 5000))
        channels = int(rng.integers(1, 3))
        bps = int(rng.choice([8, 16, 24]))
        lim = 2 ** (bps - 1)
        kind = trial % 5
        if kind == 0:
            x = rng.integers(-lim, lim, (n, channels))
        elif kind == 1:                       # near-silence
            x = rng.integers(-2, 2, (n, channels))
        elif kind == 2:                       # full-scale square wave
            x = np.where((np.arange(n) // 7 % 2)[:, None].astype(bool),
                         lim - 1, -lim) * np.ones((1, channels), int)
        elif kind == 3:                       # constant
            x = np.full((n, channels), int(rng.integers(-lim, lim)))
        else:                                 # ramp hitting both rails
            x = np.linspace(-lim, lim - 1, n)[:, None] * np.ones(
                (1, channels))
        x = x.astype(np.int32)
        if channels == 1:
            x = x[:, 0]
        data = flac.encode(x, sample_rate=16000, bits_per_sample=bps,
                           block_size=int(rng.choice([256, 1024, 4096])))
        y, sr, _ = flac.decode(data)
        np.testing.assert_array_equal(
            np.asarray(y).reshape(x.shape), x,
            err_msg=f'trial {trial} n={n} ch={channels} bps={bps} '
                    f'kind={kind}')
        assert sr == 16000
        cases += 1
    assert cases == 60
