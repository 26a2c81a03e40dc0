"""Frontend numerics: matmul-DFT vs numpy rFFT, mel/DCT parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.config import prepare_model_settings
from speech_recognition_tpu.ops import frontend as fe


SETTINGS = prepare_model_settings(
    label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
    dct_coefficient_count=80, num_log_mel_features=60,
    output_representation="mfcc")


def _np_stft_magnitude(x, frame_length, frame_step, fft_length):
    """Independent reference: numpy rFFT with periodic Hann window."""
    n = np.arange(frame_length)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * n / frame_length)
    num_frames = 1 + (x.shape[-1] - frame_length) // frame_step
    frames = np.stack([x[..., i * frame_step:i * frame_step + frame_length]
                       for i in range(num_frames)], axis=-2)
    return np.abs(np.fft.rfft(frames * window, n=fft_length, axis=-1))


def test_stft_matches_numpy_rfft():
    rng = np.random.default_rng(42)
    wav = rng.standard_normal((3, 16000)).astype(np.float32) * 0.1
    front = fe.Frontend(SETTINGS)
    got = np.asarray(front.spectrogram(jnp.asarray(wav)))
    want = _np_stft_magnitude(wav.astype(np.float64), 480, 160, 512)
    assert got.shape == (3, 98, 257)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_frame_indices_geometry():
    idx = fe.frame_indices(16000, 480, 160)
    assert idx.shape == (98, 480)
    assert idx[0, 0] == 0 and idx[0, -1] == 479
    assert idx[1, 0] == 160
    assert idx[-1, -1] == 97 * 160 + 479  # < 16000


def test_hann_window_periodic():
    w = fe.hann_window_periodic(480)
    assert w[0] == 0.0
    # periodic window: w[n] = 0.5-0.5cos(2 pi n/N); max is slightly off-center
    np.testing.assert_allclose(w[240], 1.0, atol=1e-6)
    # endpoint is NOT zero at n=N-1 for the periodic variant
    assert w[-1] > 0.0


def _np_mel_matrix(num_mel, num_bins, sr, f_lo, f_hi):
    """Independent re-derivation of tf.signal.linear_to_mel_weight_matrix."""
    def h2m(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    linear = np.linspace(0, sr / 2, num_bins)[1:]
    bins_mel = h2m(linear)[:, None]
    edges = np.linspace(h2m(f_lo), h2m(f_hi), num_mel + 2)
    out = np.zeros((num_bins - 1, num_mel))
    for j in range(num_mel):
        lo, c, hi = edges[j], edges[j + 1], edges[j + 2]
        low_slope = (bins_mel[:, 0] - lo) / (c - lo)
        up_slope = (hi - bins_mel[:, 0]) / (hi - c)
        out[:, j] = np.maximum(0, np.minimum(low_slope, up_slope))
    return np.vstack([np.zeros((1, num_mel)), out])


def test_mel_matrix_matches_tf_algorithm():
    got = fe.linear_to_mel_weight_matrix(80, 257, 16000, 80.0, 7600.0)
    want = _np_mel_matrix(80, 257, 16000, 80.0, 7600.0)
    assert got.shape == (257, 80)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # DC bin must be zeroed (tf excludes it)
    assert (got[0] == 0).all()
    # every mel filter has nonzero support
    assert (got.sum(axis=0) > 0).all()


def test_dct2_matches_scipy_convention():
    # dct2_matrix folds in the 1/sqrt(2N) scale of
    # mfccs_from_log_mel_spectrograms
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 80))
    mat = fe.dct2_matrix(80, 60)
    got = x @ mat
    # independent DCT-II (unnormalized, scipy norm=None convention)
    n = np.arange(80)[None, :, None]
    k = np.arange(60)[None, None, :]
    want = (2 * (x[:, :, None] *
                 np.cos(np.pi * k * (2 * n + 1) / 160)).sum(axis=1)
            / np.sqrt(160.0))
    np.testing.assert_allclose(got, want, atol=1e-4)  # f32 basis rounding


def test_mfcc_pipeline_shapes_and_finiteness():
    rng = np.random.default_rng(7)
    wav = rng.uniform(-0.5, 0.5, (2, 16000)).astype(np.float32)
    front = fe.Frontend(SETTINGS)
    mfcc = np.asarray(front.mfcc(jnp.asarray(wav)))
    assert mfcc.shape == (2, 98, 60)
    assert np.isfinite(mfcc).all()
    # silence clip -> log(1e-6)-dominated features, still finite
    mfcc0 = np.asarray(front.mfcc(jnp.zeros((1, 16000))))
    assert np.isfinite(mfcc0).all()


def test_features_dispatch():
    front = fe.Frontend(SETTINGS)
    wav = jnp.zeros((2, 16000))
    assert front.features(wav, "raw").shape == (2, 16000)
    assert front.features(wav, "spec").shape == (2, 98 * 257)
    assert front.features(wav, "mfcc").shape == (2, 98 * 60)
    m, r = front.features(wav, "mfcc_and_raw")
    assert m.shape == (2, 98 * 60) and r.shape == (2, 16000)
    with pytest.raises(ValueError):
        front.features(wav, "nope")


def test_log_mel_running_stats_plausible():
    # train.py:14 documents running_mean ~ -0.8, running_std ~ 7.0 for the
    # (x+0.8)/7 preprocess of MFCC-space inputs; sanity-check our log-mel
    # lands in a comparable range on noise input.
    rng = np.random.default_rng(3)
    wav = rng.uniform(-0.08, 0.08, (4, 16000)).astype(np.float32)
    front = fe.Frontend(SETTINGS)
    lm = np.asarray(front.log_mel(jnp.asarray(wav)))
    assert -15 < lm.mean() < 10
