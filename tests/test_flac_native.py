"""Native FLAC decoder (``native/flac.cpp`` via ``data/flac_native.py``)
must agree bit-exactly with the pure-Python oracle codec on every stream
shape the encoder can produce, and the ETL decode chain must route flac
through it transparently."""

import numpy as np
import pytest

from glow_tts_tpu.data import flac, flac_native

pytestmark = pytest.mark.skipif(
    not flac_native.available(),
    reason='no C++ toolchain to build native/flac.cpp')


def _signal(n=6400, seed=0, amplitude=0.4):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.standard_normal(n)) * 500 + rng.standard_normal(n) * 600
    return np.clip(x, -32000 * amplitude, 32000 * amplitude).astype(np.int64)


def _assert_match(data: bytes):
    ref, sr_r, bps_r = flac.decode(data)
    got, sr_g, bps_g = flac_native.decode(data)
    assert (sr_g, bps_g) == (sr_r, bps_r)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize('strategy', ['verbatim', 'fixed', 'lpc', 'wasted'])
def test_mono_matches_oracle(strategy):
    _assert_match(flac.encode(_signal(), 24000, strategy=strategy))


def test_escape_partition_matches_oracle():
    _assert_match(flac.encode(_signal(seed=3), 16000, strategy='fixed',
                              force_escape=True))


def test_constant_subframe_matches_oracle():
    _assert_match(flac.encode(np.full(1200, -7, np.int64), 22050))


@pytest.mark.parametrize('mid_side', [False, True])
def test_stereo_matches_oracle(mid_side):
    sig = _signal(4800, seed=5)
    stereo = np.stack([sig, (sig * 0.6).astype(np.int64)], axis=-1)
    _assert_match(flac.encode(stereo, 48000, mid_side=mid_side))


def test_partial_final_block_matches_oracle():
    _assert_match(flac.encode(_signal(777, seed=7), 8000, block_size=256))


def test_corruption_detected():
    data = bytearray(flac.encode(_signal(seed=9), 24000))
    data[len(data) // 2] ^= 0x40
    with pytest.raises(ValueError):
        flac_native.decode(bytes(data))


def test_md5_mismatch_detected():
    data = bytearray(flac.encode(_signal(seed=11), 24000))
    # flip a bit inside the STREAMINFO MD5 field (bytes 8+4+18 .. +34):
    # frames all CRC-check but the stream digest no longer matches
    data[8 + 4 + 20] ^= 0x01
    with pytest.raises(ValueError, match='MD5'):
        flac_native.decode(bytes(data))
    assert flac_native.decode(bytes(data), verify_md5=False)[0].size


def test_property_fuzz_matches_oracle():
    rng = np.random.default_rng(99)
    for trial in range(12):
        n = int(rng.integers(64, 3000))
        channels = int(rng.integers(1, 3))
        sig = np.clip(np.cumsum(rng.standard_normal((n, channels)), axis=0)
                      * rng.uniform(10, 2000)
                      + rng.standard_normal((n, channels)) * 300,
                      -32000, 32000).astype(np.int64)
        if channels == 1:
            sig = sig[:, 0]
        kwargs = dict(
            strategy=str(rng.choice(['verbatim', 'fixed', 'lpc', 'wasted'])),
            block_size=int(rng.choice([192, 256, 1024, 4096])),
            force_escape=bool(rng.integers(0, 2)))
        if channels == 2 and rng.integers(0, 2):
            kwargs['mid_side'] = True
        _assert_match(flac.encode(sig, 24000, **kwargs))


def test_read_layout_matches_python(tmp_path):
    path = str(tmp_path / 'x.flac')
    sig = _signal(2400, seed=13)
    flac.write(path, sig.astype(np.float32) / 32768.0, 24000)
    a, sr_a = flac.read(path)
    b, sr_b = flac_native.read(path)
    assert sr_a == sr_b
    np.testing.assert_array_equal(a, b)


def test_audio_io_routes_flac_through_native(tmp_path, monkeypatch):
    """The ETL decode chain prefers the native decoder and falls back to
    the python codec when it declines."""
    from glow_tts_tpu.data import audio_io
    path = str(tmp_path / 'y.flac')
    sig = _signal(3200, seed=17)
    flac.write(path, sig.astype(np.float32) / 32768.0, 24000)
    expected = audio_io.load_audio(path, 24000)

    calls = {}
    real = flac_native.read

    def spy(p):
        calls['native'] = True
        return real(p)
    monkeypatch.setattr(flac_native, 'read', spy)
    got = audio_io.load_audio(path, 24000)
    assert calls.get('native'), 'native decoder was not used'
    np.testing.assert_array_equal(got, expected)

    # native declines (UnsupportedStream) -> transparent python fallback
    def decline(_):
        raise flac_native.UnsupportedStream('no total')
    monkeypatch.setattr(flac_native, 'read', decline)
    fallback = audio_io.load_audio(path, 24000)
    np.testing.assert_array_equal(fallback, expected)
