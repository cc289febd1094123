"""Griffin-Lim vocoder: mel → waveform, jit-compiled.

The reference has **no vocoder code** — wav export is delegated to an
external pre-trained Parallel WaveGAN repo (``README.md:119-124``; SURVEY
§2.31 "current code stops at mels").  This built-in Griffin-Lim path closes
that gap for self-contained listening tests: it inverts the exact mel
pipeline of :mod:`glow_tts_tpu.ops.stft` (dB denormalisation → pseudoinverse
mel filterbank → iterative phase recovery → inverse preemphasis).  Neural
vocoders can still be dropped in downstream, as with the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from glow_tts_tpu.ops.stft import hann_window, mel_filterbank, stft_magnitude


def mel_to_magnitude(mel: jax.Array,
                     sample_rate: int,
                     num_frequency: int,
                     num_mel: int,
                     mel_fmin: float,
                     mel_fmax: float,
                     min_level_db: float = -100.0,
                     max_abs_value: float = 4.0,
                     power: float = 1.2) -> jax.Array:
    """[..., T, M] normalised mel → [..., T, F] linear magnitude.

    Inverts the dB normalisation of ``mel_spectrogram`` and lifts to the
    linear frequency axis with the filterbank pseudoinverse; ``power`` > 1
    sharpens (standard Griffin-Lim practice)."""
    n_fft = (num_frequency - 1) * 2
    db = ((mel + max_abs_value) * (-min_level_db)
          / (2.0 * max_abs_value)) + min_level_db
    amplitude = jnp.power(10.0, db / 20.0)
    fb = mel_filterbank(sample_rate, n_fft, num_mel, mel_fmin, mel_fmax)
    inv_fb = jnp.asarray(np.linalg.pinv(fb))                # [M, F]
    magnitude = jnp.maximum(amplitude @ inv_fb, 1e-10)
    return jnp.power(magnitude, power)


def _istft(spec: jax.Array, n_fft: int, hop_length: int,
           win_length: int) -> jax.Array:
    """Inverse STFT with hann overlap-add (librosa conventions, centred).

    spec: [frames, n_fft//2+1] complex → [samples]."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)          # [T, n_fft]
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window

    num_frames = frames.shape[0]
    total = n_fft + hop_length * (num_frames - 1)
    idx = (jnp.arange(num_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    audio = jnp.zeros((total,), frames.dtype).at[idx].add(frames.reshape(-1))
    norm = jnp.zeros((total,), frames.dtype).at[idx].add(
        jnp.tile(window ** 2, (num_frames,)))
    audio = audio / jnp.maximum(norm, 1e-8)
    return audio[n_fft // 2: total - n_fft // 2]            # undo centre pad


@functools.partial(jax.jit, static_argnames=(
    'n_fft', 'hop_length', 'win_length', 'iterations'))
def griffin_lim(magnitude: jax.Array,
                n_fft: int,
                hop_length: int,
                win_length: int,
                iterations: int = 60,
                seed: int = 0) -> jax.Array:
    """Phase recovery: [T, F] magnitude → [samples] waveform."""
    key = jax.random.PRNGKey(seed)
    angles = jax.random.uniform(key, magnitude.shape,
                                minval=-jnp.pi, maxval=jnp.pi)
    spec = magnitude * jnp.exp(1j * angles)

    def body(_, spec):
        audio = _istft(spec, n_fft, hop_length, win_length)
        re_spec = _stft_complex(audio, n_fft, hop_length, win_length)
        re_spec = re_spec[:magnitude.shape[0]]
        phase = re_spec / jnp.maximum(jnp.abs(re_spec), 1e-10)
        return magnitude * phase

    spec = jax.lax.fori_loop(0, iterations, body, spec)
    return _istft(spec, n_fft, hop_length, win_length)


def _stft_complex(audio, n_fft, hop_length, win_length):
    pad = n_fft // 2
    audio = jnp.pad(audio, (pad, pad), mode='reflect')
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    num_frames = 1 + (audio.shape[-1] - n_fft) // hop_length
    idx = (jnp.arange(num_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    return jnp.fft.rfft(audio[idx] * window, n=n_fft, axis=-1)


def inverse_preemphasis(audio: jax.Array, coef: float = 0.97) -> jax.Array:
    """IIR y[n] = x[n] + coef·y[n-1] (inverse of the analysis FIR)."""
    def step(y_prev, x):
        y = x + coef * y_prev
        return y, y
    _, out = jax.lax.scan(step, jnp.zeros((), audio.dtype), audio)
    return out


def mel_to_audio(mel,
                 sound_config,
                 iterations: int = 60,
                 power: float = 1.2) -> np.ndarray:
    """Normalised mel [T, M] → float32 waveform (peak-normalised)."""
    magnitude = mel_to_magnitude(
        jnp.asarray(mel),
        sample_rate=sound_config.sample_rate,
        num_frequency=sound_config.spectrogram_dim,
        num_mel=sound_config.mel_dim,
        mel_fmin=sound_config.mel_f_min,
        mel_fmax=sound_config.mel_f_max,
        max_abs_value=sound_config.max_abs_mel,
        power=power)
    n_fft = (sound_config.spectrogram_dim - 1) * 2
    audio = griffin_lim(magnitude, n_fft, sound_config.frame_shift,
                        sound_config.frame_length, iterations=iterations)
    audio = inverse_preemphasis(audio)
    audio = np.asarray(audio)
    peak = np.abs(audio).max()
    return (audio / peak if peak > 0 else audio).astype(np.float32)


def save_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    from scipy.io import wavfile
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    wavfile.write(path, sample_rate,
                  (np.clip(audio, -1, 1) * 32767).astype(np.int16))
