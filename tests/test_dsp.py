"""DSP golden tests: STFT vs torch.stft, slaney mel filterbank vs an
independent construction, bucketed-host vs direct mel, YIN on known tones."""

import numpy as np
import jax.numpy as jnp
import pytest

from glow_tts_tpu.ops import stft as S
from glow_tts_tpu.ops import yin as Y


def test_stft_magnitude_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(5000).astype(np.float32)
    n_fft, hop, win = 512, 128, 256
    ours = np.asarray(S.stft_magnitude(jnp.asarray(audio), n_fft, hop, win))
    ref = torch.stft(torch.from_numpy(audio), n_fft=n_fft,
                     hop_length=hop, win_length=win,
                     window=torch.hann_window(win, periodic=True),
                     center=True, pad_mode='reflect',
                     return_complex=True).abs().numpy().T
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_matches_independent_slaney():
    sr, n_fft, n_mels, fmin, fmax = 24000, 2048, 80, 125.0, 7600.0
    got = S.mel_filterbank(sr, n_fft, n_mels, fmin, fmax)   # [freq, mel]

    # independent, loop-based slaney construction
    def hz2mel(f):
        return (f / (200.0 / 3) if f < 1000.0
                else 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0))

    def mel2hz(m):
        return (m * (200.0 / 3) if m < 15.0
                else 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)))

    mels = np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2)
    hz = np.array([mel2hz(m) for m in mels])
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    expected = np.zeros((n_fft // 2 + 1, n_mels))
    for m in range(n_mels):
        lower, center, upper = hz[m], hz[m + 1], hz[m + 2]
        for k, f in enumerate(freqs):
            if lower <= f <= center:
                w = (f - lower) / max(center - lower, 1e-12)
            elif center < f <= upper:
                w = (upper - f) / max(upper - center, 1e-12)
            else:
                w = 0.0
            expected[k, m] = w * 2.0 / (upper - lower)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-7)


def test_mel_host_bucketing_bit_exact():
    rng = np.random.default_rng(1)
    for n in (4001, 7777, 12000):
        audio = rng.standard_normal(n).astype(np.float32)
        kwargs = dict(sample_rate=16000, num_frequency=257, num_mel=20,
                      window_length=256, hop_length=64,
                      mel_fmin=50.0, mel_fmax=7000.0)
        direct = np.asarray(S.mel_spectrogram(jnp.asarray(audio), **kwargs))
        bucketed = S.mel_spectrogram_host(audio, length_bucket=4096,
                                          **kwargs)
        assert bucketed.shape == direct.shape
        np.testing.assert_allclose(bucketed, direct, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('freq', [110.0, 220.0, 330.0])
def test_yin_recovers_sine_frequency(freq):
    sr = 16000
    t = np.arange(sr) / sr
    audio = (0.6 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    pitch = Y.pitch_calc(audio, sr, w_len=1024, w_step=256,
                         f0_min=80.0, f0_max=500.0,
                         confidence_threshold=0.6)
    voiced = pitch[pitch > 0]
    assert voiced.size > 0.8 * pitch.size
    median = np.median(voiced)
    assert abs(median - freq) / freq < 0.05, f'{median} vs {freq}'


def test_yin_noise_is_mostly_unvoiced():
    # (pure digital silence is degenerate in YIN — CMND is 0/ε ≈ 0 and the
    # reference reports f0_max there too; aperiodic noise is the real
    # "unvoiced" case)
    sr = 16000
    rng = np.random.default_rng(3)
    audio = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    pitch = Y.pitch_calc(audio, sr, w_len=1024, w_step=256,
                         confidence_threshold=0.8)
    assert np.mean(pitch == 0.0) > 0.5


def test_preemphasis_matches_fir():
    from scipy.signal import lfilter
    rng = np.random.default_rng(2)
    audio = rng.standard_normal(1000).astype(np.float32)
    ours = np.asarray(S.preemphasis(jnp.asarray(audio)))
    ref = lfilter([1.0, -0.97], [1.0], audio)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_trim_silence():
    sr = 16000
    silence = np.zeros(sr // 2, np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 220 *
                        np.arange(sr) / sr).astype(np.float32)
    audio = np.concatenate([silence, tone, silence])
    trimmed = S.trim_silence(audio, top_db=40)
    assert trimmed.shape[0] < audio.shape[0]
    assert trimmed.shape[0] >= tone.shape[0] - 1024
    assert np.abs(trimmed).max() > 0.4
