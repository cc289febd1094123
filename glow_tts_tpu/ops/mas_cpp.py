"""ctypes wrapper for the host C++/OpenMP MAS kernel (native/mas.cpp).

Builds the shared library on first use if ``native/libmas.so`` is absent.
This mirrors the role of the reference's Cython extension
(``monotonic_align/setup.py``) but note that on TPU the on-device Pallas
kernel in :mod:`glow_tts_tpu.ops.mas` is the production path — this host
kernel exists for CPU deployments and as a cross-check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libmas.so')

_lib = None
_lock = threading.Lock()


def _load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.maximum_path_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32),   # paths
            ctypes.POINTER(ctypes.c_float),   # values
            ctypes.POINTER(ctypes.c_int32),   # t_xs
            ctypes.POINTER(ctypes.c_int32),   # t_ys
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.maximum_path_batch.restype = None
        _lib = lib
        return _lib


def maximum_path_cpp(log_p, token_lengths, mel_lengths):
    """Host MAS: [B, T_tok, T_mel] masked log-probs → {0,1} path.

    Device arrays are transferred to host, processed with OpenMP
    batch-parallelism, and transferred back (the round trip the Pallas
    kernel avoids).
    """
    lib = _load_library()
    values = np.ascontiguousarray(np.asarray(log_p), dtype=np.float32)
    t_xs = np.ascontiguousarray(np.asarray(token_lengths), dtype=np.int32)
    t_ys = np.ascontiguousarray(np.asarray(mel_lengths), dtype=np.int32)
    b, t_tok, t_mel = values.shape
    paths = np.zeros((b, t_tok, t_mel), dtype=np.int32)
    lib.maximum_path_batch(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_tok, t_mel)
    return jnp.asarray(paths, dtype=jnp.float32)
