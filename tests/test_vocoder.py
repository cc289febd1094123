"""Griffin-Lim vocoder: mel of a known tone → waveform whose spectrum peaks
at the tone frequency."""

import numpy as np
import jax.numpy as jnp

from glow_tts_tpu.config import SoundConfig
from glow_tts_tpu.ops import stft as S
from glow_tts_tpu.ops import vocoder as V


def _sound():
    return SoundConfig(
        spectrogram_dim=257, mel_dim=80, frame_length=512, frame_shift=128,
        sample_rate=16000, mel_f_min=50, mel_f_max=7600, max_abs_mel=4.0)


def test_griffin_lim_recovers_tone():
    snd = _sound()
    sr = snd.sample_rate
    freq = 440.0
    t = np.arange(sr) / sr
    audio = (0.7 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    mel = np.asarray(S.mel_spectrogram(
        jnp.asarray(audio), sample_rate=sr,
        num_frequency=snd.spectrogram_dim, num_mel=snd.mel_dim,
        window_length=snd.frame_length, hop_length=snd.frame_shift,
        mel_fmin=snd.mel_f_min, mel_fmax=snd.mel_f_max,
        max_abs_value=snd.max_abs_mel))

    recovered = V.mel_to_audio(mel, snd, iterations=30)
    assert recovered.ndim == 1 and np.isfinite(recovered).all()
    assert abs(recovered.shape[0] - audio.shape[0]) < snd.frame_length

    spectrum = np.abs(np.fft.rfft(recovered))
    peak_hz = np.argmax(spectrum) * sr / recovered.shape[0]
    # tolerance ≈ one mel-triangle width at 440 Hz (mel-bin quantisation
    # bounds how precisely a pinv reconstruction can localise the tone)
    assert abs(peak_hz - freq) < 30.0, f'peak at {peak_hz:.1f} Hz'


def test_istft_roundtrip():
    rng = np.random.default_rng(0)
    n_fft, hop, win = 512, 128, 512
    audio = rng.standard_normal(4096).astype(np.float32)
    spec = V._stft_complex(jnp.asarray(audio), n_fft, hop, win)
    back = np.asarray(V._istft(spec, n_fft, hop, win))
    n = min(back.shape[0], audio.shape[0])
    # interior reconstructs exactly (edges lose the analysis taper)
    np.testing.assert_allclose(back[hop:n - hop], audio[hop:n - hop],
                               rtol=1e-4, atol=1e-4)


def test_inverse_preemphasis_roundtrip():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(2000).astype(np.float32)
    emphasized = np.asarray(S.preemphasis(jnp.asarray(audio)))
    restored = np.asarray(V.inverse_preemphasis(jnp.asarray(emphasized)))
    np.testing.assert_allclose(restored, audio, rtol=1e-3, atol=1e-4)


def test_save_wav(tmp_path):
    from scipy.io import wavfile
    audio = np.sin(np.linspace(0, 100, 1600)).astype(np.float32)
    path = str(tmp_path / 'x' / 'out.wav')
    V.save_wav(path, audio, 16000)
    sr, data = wavfile.read(path)
    assert sr == 16000 and data.dtype == np.int16
    assert data.shape[0] == 1600
