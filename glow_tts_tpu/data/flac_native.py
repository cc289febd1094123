"""ctypes wrapper for the native FLAC decoder (``native/flac.cpp``).

Production decode path for flac corpora: the pure-Python codec
(:mod:`glow_tts_tpu.data.flac`) is the oracle and the encoder, but its bit
IO runs at roughly real time — a full LibriTTS ETL would spend most of its
wall clock in it.  The C++ twin decodes the identical format (CRC-8/16
verified per frame) and this wrapper re-verifies the stream MD5 from
STREAMINFO over the decoded samples, so the integrity guarantees match the
Python decoder's.  Builds on first use, like ``ops/mas_cpp.py``.

The reference leans on librosa/soundfile for flac (``Audio.py:3-7``);
neither is guaranteed on a TPU host image.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libflacdec.so')

_lib = None
_lock = threading.Lock()


class UnsupportedStream(Exception):
    """Valid FLAC the native decoder declines (e.g. no declared total
    sample count) — callers fall back to the pure-Python decoder."""


def _load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            subprocess.run(['make', '-C', _NATIVE_DIR, 'libflacdec.so'],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.flac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # data
            ctypes.c_int64,                   # size
            ctypes.POINTER(ctypes.c_int32),   # out (NULL -> probe)
            ctypes.c_int64,                   # out capacity (elements)
            ctypes.POINTER(ctypes.c_int32),   # meta[4]
            ctypes.c_char_p,                  # err
            ctypes.c_int32,                   # err capacity
        ]
        lib.flac_decode.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    """True when the shared library exists or can be built."""
    try:
        _load_library()
        return True
    except Exception:
        return False


def decode(data: bytes, verify_md5: bool = True
           ) -> Tuple[np.ndarray, int, int]:
    """FLAC bytes → (samples [T, C] int32, sample_rate, bits_per_sample).

    Same contract as :func:`glow_tts_tpu.data.flac.decode`; raises
    ``ValueError`` on malformed streams (including streams without a
    declared total sample count, which the Python decoder handles)."""
    lib = _load_library()
    buf = np.frombuffer(data, np.uint8)
    data_p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    meta = np.zeros(4, np.int32)
    meta_p = meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    err = ctypes.create_string_buffer(256)

    total = lib.flac_decode(data_p, len(data), None, 0, meta_p, err, 256)
    if total < 0:
        raise ValueError(err.value.decode(errors='replace'))
    if total == 0:
        raise UnsupportedStream('flac: unknown total sample count '
                                '(use the python decoder)')
    channels = int(meta[0])
    out = np.empty(total * channels, np.int32)
    got = lib.flac_decode(
        data_p, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.shape[0], meta_p, err, 256)
    if got < 0:
        raise ValueError(err.value.decode(errors='replace'))
    samples = out.reshape(int(got), channels)
    sample_rate, bps = int(meta[1]), int(meta[2])

    if verify_md5:
        md5 = _streaminfo_md5(data)
        if md5 is not None and md5 != b'\x00' * 16:
            from glow_tts_tpu.data.flac import _interleave_bytes
            width = (bps + 7) // 8
            digest = hashlib.md5(
                _interleave_bytes(samples.astype(np.int64), width)).digest()
            if digest != md5:
                raise ValueError('flac: decoded stream fails the MD5 check')
    return samples, sample_rate, bps


def _streaminfo_md5(data: bytes) -> Optional[bytes]:
    if data[:4] != b'fLaC':
        return None
    offset = 4
    while offset + 4 <= len(data):
        header = data[offset]
        length = int.from_bytes(data[offset + 1:offset + 4], 'big')
        if header & 0x7F == 0 and length >= 34:
            return data[offset + 4 + 18:offset + 4 + 34]
        offset += 4 + length
        if header & 0x80:
            break
    return None


def read(path: str) -> Tuple[np.ndarray, int]:
    """Decode a flac file → (float32 audio in [-1, 1], sample_rate) — same
    layout as :func:`glow_tts_tpu.data.flac.read` / ``soundfile.read``."""
    with open(path, 'rb') as handle:
        samples, sample_rate, bps = decode(handle.read())
    audio = samples.astype(np.float32) / float(1 << (bps - 1))
    if audio.shape[1] == 1:
        audio = audio[:, 0]
    return audio, sample_rate
