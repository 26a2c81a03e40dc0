"""Train-step coverage for the non-raw representations and the exported
32->12 artifact (combinations not covered elsewhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.config import (
    AugmentConfig, prepare_model_settings,
)
from speech_recognition_tpu.data.device_bank import synthetic_device_dataset
from speech_recognition_tpu.parallel.mesh import make_mesh
from speech_recognition_tpu.train.loop import Trainer


def _run_one_step(model_name, representation, num_log_mel_features=60):
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80,
        num_log_mel_features=num_log_mel_features,
        output_representation=representation)
    ds = synthetic_device_dataset(num_train=32, num_val=16, num_pseudo=4)
    trainer = Trainer(model_name=model_name, settings=settings,
                      dataset=ds, augment=AugmentConfig(),
                      batch_size=8, mesh=make_mesh())
    state = trainer.init_state()
    state, metrics = trainer.train_step(state, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    conf, val_loss = trainer.evaluate(state)
    assert np.isfinite(val_loss)
    return trainer


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_spec_representation_training():
    _run_one_step("conv_1d_spec", "spec")


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_mfcc_and_raw_representation_training():
    # two-input model: features are a (mfcc_flat, raw) tuple end-to-end
    _run_one_step("conv_1d_mfcc_and_raw", "mfcc_and_raw")


def test_exported_32_to_12_artifact(tmp_path):
    from speech_recognition_tpu.export.aot import (
        export_inference, load_exported,
    )
    from speech_recognition_tpu.models import build_model
    from speech_recognition_tpu.ops.frontend import Frontend

    settings = prepare_model_settings(
        label_count=32, dct_coefficient_count=80, num_log_mel_features=40,
        output_representation="mfcc")
    module, _ = build_model("conv_2d_fast", num_classes=32,
                            spectrogram_length=98, num_log_mel_features=40)
    frontend = Frontend(settings)
    x = frontend.features(jnp.zeros((1, 16000)), "mfcc")
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    artifact = export_inference(module, frontend, "mfcc", variables,
                                batch_size=1, map_to_12=True)
    fn = load_exported(artifact)
    wav = jnp.asarray(np.random.default_rng(0).uniform(
        -0.1, 0.1, (1, 16000)).astype(np.float32))
    probs = np.asarray(fn(wav))
    # the artifact emits the collapsed 12-class distribution
    assert probs.shape == (1, 12)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
