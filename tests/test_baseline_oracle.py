"""Sanity checks on the NumPy oracle itself (shapes, schema contract, and
known-signal behavior), since it gates every JAX parity test."""
import numpy as np
import pytest

from tpu_breath.baseline import dsp_np as L
from tpu_breath.baseline import feature_np
from tpu_breath.config import FeatureSpec

SPEC = FeatureSpec()


def test_schema_contract(real_clips):
    out = feature_np.process_clip(real_clips[0], SPEC)
    assert set(out.keys()) == set(SPEC.npz_keys) | {"scalars"}
    for k in SPEC.npz_keys:
        assert out[k].shape == (128, 63), k
        assert out[k].dtype == np.float32, k
    assert out["scalars"].shape == (SPEC.n_scalars,)


def test_stft_shape_and_parseval():
    rng = np.random.default_rng(1)
    y = rng.standard_normal(16000).astype(np.float32)
    S = L.stft(y, 512, 256)
    assert S.shape == (257, 63)
    # windowed energy sanity: middle frame matches direct rfft of that frame
    ypad = np.pad(y, 256)
    fr = ypad[30 * 256: 30 * 256 + 512] * L.hann(512)
    np.testing.assert_allclose(S[:, 30], np.fft.rfft(fr), rtol=1e-10, atol=1e-10)


def test_mel_filterbank_matches_slaney_properties():
    fb = L.mel_filterbank(16000, 512, 128, fmax=4500)
    assert fb.shape == (128, 257)
    assert np.all(fb >= 0)
    # Slaney normalization: each filter integrates to ~2/bandwidth; peak bins
    # lie within [0, 4500] Hz
    freqs = L.fft_frequencies(16000, 512)
    peak_freqs = freqs[np.argmax(fb, axis=1)]
    assert peak_freqs.max() <= 4500.0


def test_power_to_db_ref_max_and_topdb():
    S = np.array([[1e-12, 1.0, 100.0]])
    db = L.power_to_db(S, ref=np.max)
    assert db.max() == 0.0
    assert db.min() >= -80.0


def test_delta_is_savgol():
    import scipy.signal
    x = np.arange(63, dtype=np.float64)[None, :] ** 2
    d = L.delta(x, order=1)
    ref = scipy.signal.savgol_filter(x, 9, polyorder=1, deriv=1, axis=-1, mode="interp")
    np.testing.assert_allclose(d, ref)


def test_tone_lands_in_correct_mel_bin():
    sr = 16000
    t = np.arange(16000) / sr
    y = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    m = L.melspectrogram(y, sr, n_fft=512, hop_length=256, n_mels=128, fmax=4500)
    centers = L.mel_frequencies(130, 0, 4500)[1:-1]
    peak_bin = int(np.argmax(m[:, 31]))
    assert abs(centers[peak_bin] - 1000.0) < 100.0


def test_cqt_tone_peaks_at_expected_bin():
    sr = 16000
    fmin = SPEC.cqt_fmin
    k_target = 150  # bin 150 of 252
    f = fmin * 2 ** (k_target / 36)
    t = np.arange(16000) / sr
    y = np.sin(2 * np.pi * f * t).astype(np.float32)
    C = np.abs(L.cqt(y, sr, 256, fmin, 252, 36))
    assert abs(int(np.argmax(C[:, 31])) - k_target) <= 1


def test_chroma_stft_tone():
    # 440 Hz (A) should dominate chroma class 9 (A) with base_c ordering
    sr = 16000
    t = np.arange(16000) / sr
    y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    S = np.abs(L.stft(y, 512, 256))
    ch = L.chroma_stft(S, sr)
    assert ch.shape == (12, 63)
    assert int(np.argmax(ch[:, 31])) == 9


def test_tempogram_properties():
    rng = np.random.default_rng(2)
    oe = np.abs(rng.standard_normal(63))
    tg = L.tempogram(oe, 384)
    assert tg.shape == (384, 63)
    # lag-0 autocorrelation dominates -> inf-norm puts 1.0 at row 0
    np.testing.assert_allclose(tg[0], np.ones(63), atol=1e-9)


def test_lpc_matches_known_ar_process():
    # AR(2): y[n] = 0.75 y[n-1] - 0.5 y[n-2] + e  ->  a = [1, -0.75, 0.5]
    rng = np.random.default_rng(3)
    e = rng.standard_normal(4000)
    y = np.zeros(4000)
    for n in range(2, 4000):
        y[n] = 0.75 * y[n - 1] - 0.5 * y[n - 2] + e[n]
    a = L.lpc(y, 2)
    np.testing.assert_allclose(a, [1.0, -0.75, 0.5], atol=0.05)


def test_scalar_vector_is_36_dim(real_clips):
    s = feature_np.extract_scalar_features(real_clips[0], SPEC)
    assert s.shape == (36,)
    assert np.all(np.isfinite(s))


def test_onset_strength_length():
    rng = np.random.default_rng(4)
    y = rng.standard_normal(16000).astype(np.float32)
    oe = L.onset_strength(y, 16000, 256)
    assert oe.shape == (63,)
    assert np.all(oe[:5] == 0.0)  # center compensation prepends 5 zeros
    assert np.all(oe >= 0)
