"""YIN fundamental-frequency estimation as a batched, jit-compiled kernel.

The reference (``yin.py:104-155``, adapted from patriceguyot/Yin) loops over
frames in Python, running one FFT per frame on host.  Here every frame is
processed in parallel: one batched rFFT computes all difference functions at
once and the threshold-search / local-minimum walk is vectorised with masked
argmax — no data-dependent control flow, so the whole pipeline jits.

Semantics preserved from the reference:
* centre padding ``(w_step + w_len - n % w_step) // 2`` reflect
  (``yin.py:126-127``)
* frame positions ``range(0, n - w_len, w_step)`` (``yin.py:132``)
* difference function via cumulative energy + FFT autocorrelation
  (``yin.py:40-63``); CMND with +1e-8 guard (``yin.py:66-79``)
* pitch pick: first lag under the harmonicity threshold, then walk forward
  while the CMND decreases (``yin.py:82-101``); 0 when unvoiced
* ``pitch_calc`` fixes ``w_len=1024, w_step=256`` and uses threshold
  ``1 - confidence`` (``yin.py:163-183``)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _next_fft_size(n: int) -> int:
    size = 1
    while size < n:
        size *= 2
    return size


@functools.partial(jax.jit, static_argnames=(
    'sample_rate', 'w_len', 'w_step', 'f0_min', 'f0_max'))
def compute_yin_frames(audio: jax.Array,
                       sample_rate: int,
                       w_len: int = 1024,
                       w_step: int = 256,
                       f0_min: float = 100.0,
                       f0_max: float = 500.0,
                       harmo_thresh: float = 0.4) -> jax.Array:
    """Per-frame pitch for a 1-D signal (already centre-padded).

    Returns pitches [num_frames] in Hz (0 where unvoiced).
    """
    tau_min = int(sample_rate / f0_max)
    tau_max = int(sample_rate / f0_min)

    n = audio.shape[-1]
    # reference iterates range(0, n - w_len, w_step) — exclusive stop
    num_frames = len(range(0, n - w_len, w_step))
    idx = (jnp.arange(num_frames)[:, None] * w_step
           + jnp.arange(w_len)[None, :])
    frames = audio[idx].astype(jnp.float64 if audio.dtype == jnp.float64
                               else jnp.float32)          # [F, w_len]

    # difference function d(tau) for all frames at once
    energy = jnp.concatenate(
        [jnp.zeros_like(frames[:, :1]),
         jnp.cumsum(frames * frames, axis=-1)], axis=-1)   # [F, w_len+1]
    fft_size = _next_fft_size(w_len + tau_max)
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=fft_size,
                        axis=-1)[:, :tau_max]              # [F, tau_max]
    taus = jnp.arange(tau_max)
    df = (energy[:, w_len] [:, None]                       # E[w]
          + jnp.take(energy, w_len - taus, axis=-1)        # E[w - tau]
          - energy[:, :tau_max]                            # E[tau]
          - 2.0 * acf)

    # cumulative mean-normalised difference function
    cums = jnp.cumsum(df[:, 1:], axis=-1)
    cmdf = jnp.concatenate(
        [jnp.ones_like(df[:, :1]),
         df[:, 1:] * jnp.arange(1, tau_max) / (cums + 1e-8)], axis=-1)

    # first lag below threshold within [tau_min, tau_max)
    in_range = (taus >= tau_min) & (taus < tau_max)
    below = (cmdf < harmo_thresh) & in_range               # [F, tau_max]
    voiced = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)                     # [F]

    # walk forward while cmdf keeps decreasing (local minimum of the dip)
    nxt = jnp.concatenate(
        [cmdf[:, 1:], jnp.full_like(cmdf[:, :1], jnp.inf)], axis=-1)
    cont = (taus + 1 < tau_max) & (nxt < cmdf)
    stop = (taus[None, :] >= first[:, None]) & ~cont
    lag = jnp.argmax(stop, axis=-1)
    lag = jnp.maximum(lag, 1)

    return jnp.where(voiced, sample_rate / lag, 0.0).astype(jnp.float32)


def pitch_calc(audio,
               sample_rate: int,
               w_len: int = 1024,
               w_step: int = 256,
               f0_min: float = 100.0,
               f0_max: float = 500.0,
               confidence_threshold: float = 0.6,
               gaussian_smoothing_sigma: float = 0.0) -> np.ndarray:
    """Pitch track aligned with the mel frames (reference ``yin.py:163-183``
    plus the centre padding of ``compute_yin``)."""
    audio = np.asarray(audio, dtype=np.float32)
    pad = (w_step + w_len - audio.shape[0] % w_step) // 2
    padded = np.pad(audio, pad, mode='reflect')
    # Zero-pad to a length bucket so arbitrary utterance lengths reuse a
    # handful of compiled shapes (frames beyond the true count are sliced
    # off; frames inside it never read the zero region).
    true_frames = len(range(0, padded.shape[0] - w_len, w_step))
    bucket = 32 * w_len
    target = -(-padded.shape[0] // bucket) * bucket
    padded = np.pad(padded, (0, target - padded.shape[0]))
    pitches = np.asarray(compute_yin_frames(
        jnp.asarray(padded), sample_rate, w_len=w_len, w_step=w_step,
        f0_min=f0_min, f0_max=f0_max,
        harmo_thresh=1.0 - confidence_threshold))[:true_frames]
    if gaussian_smoothing_sigma > 0.0:
        from scipy.ndimage import gaussian_filter1d
        pitches = gaussian_filter1d(pitches, sigma=gaussian_smoothing_sigma)
    return pitches


def normalize_pitch(pitch: np.ndarray) -> np.ndarray:
    """Min-max normalise to [0, 1] (reference ``Pattern_Generator.py:41-52``)."""
    return (pitch - pitch.min()) / (pitch.max() - pitch.min() + 1e-7)
