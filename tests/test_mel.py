"""Audio front-end tests: STFT/mel numerics against independent references."""

import numpy as np
import pytest

from zeggs_tpu.ops import mel
from zeggs_tpu.audio import loudness
from tests.synthetic import make_audio


def _np_stft_mag(x, n_fft, hop):
    """Independent STFT written with stride tricks (reference convention:
    symmetric hann, reflect-centered, amp/n_fft)."""
    n = np.arange(n_fft)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * n / (n_fft - 1))
    if len(x) < n_fft:
        x = np.concatenate([x, np.zeros(n_fft - len(x))])
    x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    n_total = len(x)
    t = (
        n_total // hop - n_fft // hop
        if n_total % hop == 0
        else 1 + (n_total - n_fft) // hop
    )
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[:: hop][:t]
    return np.abs(np.fft.rfft(frames * win, axis=-1)) / n_fft


@pytest.mark.parametrize("n_samples", [16000, 16001, 15900, 799, 500])
def test_stft_magnitude_matches_numpy(n_samples):
    x = make_audio(2.0)[:n_samples] if n_samples <= 32000 else make_audio(3.0)[:n_samples]
    if len(x) < n_samples:
        x = np.pad(x, (0, n_samples - len(x)))
    ref = _np_stft_mag(x.astype(np.float64), 800, 200)
    import jax.numpy as jnp

    ours = np.asarray(
        mel.stft_magnitude(jnp.asarray(x), jnp.asarray(mel.hann_symmetric(800)), 800, 200)
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mel_scale_anchors():
    # Slaney scale: linear below 1 kHz with 200/3 Hz per mel, log above
    np.testing.assert_allclose(mel._hz_to_mel(1000.0), 15.0, atol=1e-9)
    np.testing.assert_allclose(mel._mel_to_hz(15.0), 1000.0, atol=1e-9)
    np.testing.assert_allclose(mel._hz_to_mel(200.0 / 3), 1.0, atol=1e-9)
    np.testing.assert_allclose(mel._mel_to_hz(mel._hz_to_mel(3456.0)), 3456.0, rtol=1e-12)


def test_mel_filterbank_shape_and_coverage():
    fb = mel.mel_filterbank(800, 16000, 80, 20.0, 7600.0, True)
    assert fb.shape == (80, 401)
    assert (fb >= 0).all()
    # every filter has nonzero response
    assert (fb.max(axis=1) > 0).all()
    # filters live inside [fmin, fmax]
    freqs = np.linspace(0, 8000, 401)
    active = fb.sum(axis=0) > 0
    assert freqs[active].min() >= 20 - 20
    assert freqs[active].max() <= 7600 + 20


def test_mel_spectrogram_range_and_tone():
    cfg = mel.MelConfig(normalize_loudness=False)
    x = make_audio(1.0)
    m = np.asarray(mel.mel_spectrogram_tts(x, cfg))
    assert m.shape[1] == 80
    assert (m >= 0).all() and (m <= 1.2).all()
    # a pure 1 kHz tone should peak near the 1 kHz mel bin
    t = np.arange(16000) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    mt = np.asarray(mel.mel_spectrogram_tts(tone, cfg))
    peak_bin = mt.mean(axis=0).argmax()
    mel_centers = mel._mel_to_hz(
        np.linspace(mel._hz_to_mel(20.0), mel._hz_to_mel(7600.0), 82)
    )[1:-1]
    assert abs(mel_centers[peak_bin] - 1000) < 100


def test_linear_resample_matches_interp():
    rng = np.random.default_rng(0)
    y = rng.normal(size=(37, 3)).astype(np.float32)
    t_new = np.linspace(0, 36, 50).astype(np.float32)
    import jax.numpy as jnp

    ours = np.asarray(mel.linear_resample(jnp.asarray(y), jnp.asarray(t_new)))
    for c in range(3):
        ref = np.interp(t_new, np.arange(37), y[:, c])
        np.testing.assert_allclose(ours[:, c], ref, atol=1e-5)


def test_linear_resample_extrapolates():
    import jax.numpy as jnp

    y = jnp.asarray(np.array([[0.0], [1.0], [2.0]], np.float32))
    out = np.asarray(mel.linear_resample(y, jnp.asarray([3.5]), extrapolate=True))
    np.testing.assert_allclose(out[0, 0], 3.5, atol=1e-6)


def test_audio_features_shape():
    cfg = mel.MelConfig(normalize_loudness=False)
    x = make_audio(2.0)
    n_frames = int(round(60 * 2.0))
    feats = np.asarray(mel.audio_features(x, 60, n_frames, cfg))
    assert feats.shape == (n_frames, 81)
    assert np.isfinite(feats).all()


def test_preemphasis():
    x = make_audio(0.1)
    y = np.asarray(mel.preemphasis(x, 0.97))
    ref = np.concatenate([x[:1], x[1:] - 0.97 * x[:-1]])
    np.testing.assert_allclose(y, ref, atol=1e-6)
    # equals scipy lfilter([1,-p],[1],x)
    from scipy.signal import lfilter

    np.testing.assert_allclose(y, lfilter([1, -0.97], [1], x), atol=1e-6)


def test_loudness_sine_reference():
    """A full-scale 997 Hz sine should measure ~ -3.01 LUFS at 48 kHz
    (BS.1770 reference level: -0.691 + 10log10(0.5 * k-gain)). We check the
    well-known property that a 0 dBFS 1 kHz sine reads about -3 LUFS."""
    fs = 48000
    t = np.arange(fs * 3) / fs
    x = np.sin(2 * np.pi * 997 * t)
    lufs = loudness.integrated_loudness(x, fs)
    assert abs(lufs - (-3.0)) < 0.2


def test_loudness_normalize():
    fs = 16000
    x = 0.1 * np.sin(2 * np.pi * 440 * np.arange(fs * 2) / fs)
    y = loudness.normalize_loudness(x, fs, -20.0)
    assert abs(loudness.integrated_loudness(y, fs) - (-20.0)) < 0.3


def test_loudness_gain_linearity():
    fs = 16000
    x = make_audio(2.0)
    l1 = loudness.integrated_loudness(x, fs)
    l2 = loudness.integrated_loudness(2 * x.astype(np.float64), fs)
    assert abs((l2 - l1) - 20 * np.log10(2)) < 0.3
