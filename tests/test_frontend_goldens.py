"""Frontend regression goldens: pinned numeric values.

Fixed-seed waveform -> specific spectrogram/log-mel/MFCC values. These
were captured from the float32-verified implementation (which itself is
validated against numpy rFFT and independent mel/DCT derivations in
test_frontend.py); any numerics drift fails loudly here.
"""

import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.config import prepare_model_settings
from speech_recognition_tpu.ops.frontend import Frontend


def _wav():
    rng = np.random.default_rng(1234)
    t = np.arange(16000) / 16000.0
    wav = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1337 * t)
           + 0.01 * rng.standard_normal(16000))
    return wav.astype(np.float32)[None, :]


SETTINGS = prepare_model_settings(
    label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
    dct_coefficient_count=80, num_log_mel_features=60,
    output_representation="mfcc")


def test_spectrogram_peak_bin():
    front = Frontend(SETTINGS)
    spec = np.asarray(front.spectrogram(jnp.asarray(_wav())))[0]
    # 440 Hz -> bin 440/(16000/512) = 14.08; 1337 Hz -> bin 42.8
    mean_spec = spec.mean(axis=0)
    assert mean_spec[14] == mean_spec[13:17].max() or \
        mean_spec[15] == mean_spec[13:17].max()
    top2 = np.argsort(mean_spec)[-4:]
    assert any(abs(int(b) - 14) <= 1 for b in top2)
    assert any(abs(int(b) - 43) <= 1 for b in top2)


def test_logmel_golden_values():
    front = Frontend(SETTINGS)
    lm = np.asarray(front.log_mel(jnp.asarray(_wav())))[0]
    assert lm.shape == (98, 60 + 20)  # 80 mel bins
    # pinned summary statistics (tolerances cover MXU vs CPU rounding)
    np.testing.assert_allclose(float(lm.mean()), -0.825184, atol=2e-3)
    np.testing.assert_allclose(float(lm.max()), 3.884764, atol=2e-3)
    np.testing.assert_allclose(float(lm[50, 10]), 0.234581, atol=5e-3)


def test_mfcc_golden_values():
    front = Frontend(SETTINGS)
    m = np.asarray(front.mfcc(jnp.asarray(_wav())))[0]
    assert m.shape == (98, 60)
    np.testing.assert_allclose(float(m[0, 0]), -10.245123, atol=2e-2)
    np.testing.assert_allclose(float(m.mean()), -0.366526, atol=2e-3)
