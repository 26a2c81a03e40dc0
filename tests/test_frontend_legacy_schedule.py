"""Legacy tutorial-MFCC path and pseudo-frequency schedule."""

import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.config import prepare_model_settings
from speech_recognition_tpu.ops.frontend import Frontend
from speech_recognition_tpu.train.loop import reference_pseudo_schedule


def test_legacy_mfcc_shapes_and_finiteness():
    settings = prepare_model_settings(
        label_count=4, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="mfcc")
    front = Frontend(settings)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 16000)).astype(np.float32))
    m = np.asarray(front.legacy_mfcc(wav))
    assert m.shape == (2, 98, 40)
    assert np.isfinite(m).all()
    # silence input hits the 1e-12 log floor, stays finite
    m0 = np.asarray(front.legacy_mfcc(jnp.zeros((1, 16000))))
    assert np.isfinite(m0).all()
    # energy scaling: louder input -> larger 0th coefficient
    m2 = np.asarray(front.legacy_mfcc(2.0 * wav))
    assert (m2[..., 0].mean() > m[..., 0].mean())


def test_legacy_mfcc_differs_from_signal_mfcc():
    # the two reference MFCC pipelines (input_data.py vs audio.py) are
    # genuinely different ops; verify ours are too
    settings = prepare_model_settings(
        label_count=4, dct_coefficient_count=40, num_log_mel_features=40,
        output_representation="mfcc")
    front = Frontend(settings)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.uniform(-0.3, 0.3, (1, 16000)).astype(np.float32))
    a = np.asarray(front.mfcc(wav))
    b = np.asarray(front.legacy_mfcc(wav))
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 0.1


def test_reference_pseudo_schedule():
    assert reference_pseudo_schedule(0) == 1.0
    assert reference_pseudo_schedule(20) == 1.0
    assert reference_pseudo_schedule(21) == 0.7
    assert reference_pseudo_schedule(30) == 0.7
    assert reference_pseudo_schedule(31) == 0.4
    assert reference_pseudo_schedule(40) == 0.4
    assert reference_pseudo_schedule(41) == 0.2
    assert reference_pseudo_schedule(99) == 0.2
