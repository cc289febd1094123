"""Jit-compiled audio DSP: preemphasis, STFT, mel spectrogram.

Replaces the reference's librosa/scipy host pipeline (``Audio.py:14-47``)
with pure-JAX kernels that run batched on TPU (or jit-compiled on the CPU
ETL hosts).  Numerical conventions follow the reference exactly:

* preemphasis FIR ``y[n] = x[n] - 0.97·x[n-1]`` (``Audio.py:50-51``)
* STFT: ``n_fft = (num_frequency-1)*2``, hann window of ``win_length``
  zero-padded to ``n_fft``, hop ``frame_shift``, centre-padded (reflect) —
  librosa's conventions, which ``librosa.stft`` used in ``Audio.py:30-35``
* mel filterbank: slaney-scale, slaney-normalised triangles (librosa default,
  ``Audio.py:37``)
* dB + normalisation: ``20·log10(mel + 1e-7)`` clipped into
  ``[-max_abs, max_abs]`` (``Audio.py:40-45``)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def preemphasis(audio: jax.Array, coef: float = 0.97) -> jax.Array:
    """First-order high-pass FIR: y[n] = x[n] - coef·x[n-1]."""
    return jnp.concatenate(
        [audio[..., :1], audio[..., 1:] - coef * audio[..., :-1]], axis=-1)


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (scipy ``get_window('hann', n, fftbins=True)``)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def stft_magnitude(audio: jax.Array,
                   n_fft: int,
                   hop_length: int,
                   win_length: int,
                   center: bool = True,
                   pad_mode: str = 'reflect') -> jax.Array:
    """|STFT| with librosa conventions.  audio: [..., samples] →
    [..., frames, n_fft//2 + 1] (note: frame-major, TPU-friendly layout —
    the reference keeps frequency-major)."""
    if center:
        pad = [(0, 0)] * (audio.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        audio = jnp.pad(audio, pad, mode=pad_mode)
    window = hann_window(win_length, audio.dtype)
    # librosa centre-pads the window to n_fft
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    num_frames = 1 + (audio.shape[-1] - n_fft) // hop_length
    # Gather frames: [..., num_frames, n_fft]
    idx = (jnp.arange(num_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = audio[..., idx] * window
    return jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))


@functools.lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int,
                   n_fft: int,
                   n_mels: int,
                   fmin: float,
                   fmax: float) -> np.ndarray:
    """Slaney-scale, slaney-normalised triangular mel filterbank
    [n_fft//2+1, n_mels] (transposed vs librosa for right-matmul on TPU)."""

    def hz_to_mel(f):
        # Slaney: linear below 1 kHz, log above.
        f = np.asarray(f, dtype=np.float64)
        min_log_hz = 1000.0
        lin = f / (200.0 / 3.0)
        step = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        15.0 + np.log(np.maximum(f, 1e-10) / min_log_hz) / step,
                        lin)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        min_log_mel = 15.0
        step = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        1000.0 * np.exp(step * (m - min_log_mel)),
                        (200.0 / 3.0) * m)

    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                    n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]       # [n_mels+2, n_freq]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # [n_mels, n_freq]

    # Slaney normalisation: each triangle integrates to ~2/bandwidth.
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)                  # [n_freq, n_mels]


def mel_spectrogram(audio: jax.Array,
                    sample_rate: int = 24000,
                    num_frequency: int = 1025,
                    num_mel: int = 80,
                    window_length: int = 1024,
                    hop_length: int = 256,
                    pre_emphasis: float = 0.97,
                    mel_fmin: float = 125.0,
                    mel_fmax: float = 7600.0,
                    min_level_db: float = -100.0,
                    max_abs_value: float = 4.0,
                    center: bool = True) -> jax.Array:
    """Full mel pipeline (parity with reference ``Audio.py:14-47``).

    audio: [..., samples] → mel [..., frames, num_mel] in
    [-max_abs_value, max_abs_value].  ``center=False`` assumes the caller
    already applied the reflect padding (see :func:`mel_spectrogram_host`).
    """
    n_fft = (num_frequency - 1) * 2
    emphasized = preemphasis(audio, pre_emphasis)
    magnitude = stft_magnitude(emphasized, n_fft, hop_length, window_length,
                               center=center)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, num_mel,
                                    mel_fmin, mel_fmax))
    mel = magnitude @ fb                                  # [..., frames, mel]
    db = 20.0 * jnp.log10(mel + 1e-7)
    return jnp.clip(
        (2.0 * max_abs_value) * (db - min_level_db) / (-min_level_db)
        - max_abs_value,
        -max_abs_value, max_abs_value)


def mel_spectrogram_host(audio: np.ndarray,
                         sample_rate: int = 24000,
                         num_frequency: int = 1025,
                         num_mel: int = 80,
                         window_length: int = 1024,
                         hop_length: int = 256,
                         length_bucket: int = 32768,
                         **kwargs) -> np.ndarray:
    """ETL variant: identical output to :func:`mel_spectrogram` but with
    the audio length padded up to a bucket multiple so arbitrary-length
    utterances reuse a handful of compiled shapes instead of one
    compilation each.

    Bit-exactness: preemphasis and the reflect (librosa-center) padding are
    applied on the true signal *before* the zero-pad, and the true frame
    count ``1 + n // hop`` only reads samples inside the reflect-padded
    region.
    """
    import jax.numpy as jnp
    n = audio.shape[-1]
    n_fft = (num_frequency - 1) * 2
    n_frames = 1 + n // hop_length
    coef = kwargs.get('pre_emphasis', 0.97)
    emphasized = np.concatenate(
        [audio[:1], audio[1:] - coef * audio[:-1]]).astype(np.float32)
    padded = np.pad(emphasized, (n_fft // 2, n_fft // 2), mode='reflect')
    target = -(-padded.shape[0] // length_bucket) * length_bucket
    padded = np.pad(padded, (0, target - padded.shape[0]))
    mel = np.asarray(_mel_no_preemph_jit(
        jnp.asarray(padded), sample_rate, num_frequency, num_mel,
        window_length, hop_length,
        float(kwargs.get('mel_fmin', 125.0)),
        float(kwargs.get('mel_fmax', 7600.0)),
        float(kwargs.get('min_level_db', -100.0)),
        float(kwargs.get('max_abs_value', 4.0))))
    return mel[:n_frames]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def _mel_no_preemph_jit(padded, sample_rate, num_frequency, num_mel,
                        window_length, hop_length, mel_fmin, mel_fmax,
                        min_level_db, max_abs_value):
    n_fft = (num_frequency - 1) * 2
    magnitude = stft_magnitude(padded, n_fft, hop_length, window_length,
                               center=False)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, num_mel,
                                    mel_fmin, mel_fmax))
    mel = magnitude @ fb
    db = 20.0 * jnp.log10(mel + 1e-7)
    return jnp.clip(
        (2.0 * max_abs_value) * (db - min_level_db) / (-min_level_db)
        - max_abs_value,
        -max_abs_value, max_abs_value)


def trim_silence(audio: np.ndarray,
                 top_db: float = 60.0,
                 frame_length: int = 512,
                 hop_length: int = 256) -> np.ndarray:
    """Host-side leading/trailing silence trim (librosa.effects.trim
    semantics used by ``Audio.py:8``): drop edge frames quieter than
    ``ref_max_db - top_db`` where power is the frame RMS**2."""
    if audio.size == 0:
        return audio
    # frame the signal (centered, like librosa.feature.rms with center=True)
    padded = np.pad(audio, frame_length // 2, mode='constant')
    n = 1 + (padded.shape[0] - frame_length) // hop_length
    idx = (np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :])
    rms = np.sqrt(np.mean(padded[idx] ** 2, axis=-1))
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(rms.max(), 1e-10))
    keep = np.flatnonzero(db > -top_db)
    if keep.size == 0:
        return audio[:0]
    start = int(keep[0] * hop_length)
    end = min(audio.shape[0], int((keep[-1] + 1) * hop_length))
    return audio[start:end]


def normalize_audio(audio: np.ndarray) -> np.ndarray:
    """Peak-normalise (librosa.util.normalize default, ``Audio.py:9``)."""
    peak = np.max(np.abs(audio))
    return audio / peak if peak > 0 else audio
