"""Keras HDF5 importer: synthetic checkpoint in Keras layout -> flax."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.export.keras_import import import_keras_hdf5
from speech_recognition_tpu.models import build_model


def _write_keras_style(path, layers):
    """layers: [(layer_name, [(weight_name, array), ...])]."""
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        g.attrs["layer_names"] = np.array(
            [l.encode() for l, _ in layers])
        for lname, weights in layers:
            lg = g.create_group(lname)
            lg.attrs["weight_names"] = np.array(
                [w.encode() for w, _ in weights])
            for wname, arr in weights:
                lg.create_dataset(wname, data=arr)


def test_import_simple_model(tmp_path):
    # 'simple' = preprocess + Dense(12): one kernel + one bias
    module, _ = build_model("simple", num_classes=12)
    x = jnp.zeros((1, 98 * 40))
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    kernel = np.arange(98 * 40 * 12, dtype=np.float32).reshape(3920, 12)
    bias = np.arange(12, dtype=np.float32)
    p = str(tmp_path / "ckpt.hdf5")
    _write_keras_style(p, [
        ("dense_1", [("dense_1/kernel:0", kernel),
                     ("dense_1/bias:0", bias)]),
    ])
    loaded = import_keras_hdf5(p, variables)
    leaves = jax.tree_util.tree_leaves(loaded["params"])
    shapes = sorted(tuple(l.shape) for l in leaves)
    assert shapes == [(12,), (3920, 12)]
    got_kernel = [l for l in leaves if l.ndim == 2][0]
    np.testing.assert_allclose(np.asarray(got_kernel), kernel)
    # imported weights drive the forward pass
    out = module.apply(loaded, jnp.ones((1, 3920)), train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_import_depthwise_and_bn(tmp_path):
    from speech_recognition_tpu.models.layers import DepthwiseConvBlock

    module = DepthwiseConvBlock(features=8, kernel=3)
    x = jnp.zeros((1, 16, 4))
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    dw = np.arange(1 * 3 * 4 * 1, dtype=np.float32).reshape(1, 3, 4, 1)
    pw = np.arange(1 * 4 * 8, dtype=np.float32).reshape(1, 4, 8)
    gamma = np.full(8, 2.0, np.float32)
    beta = np.full(8, 0.5, np.float32)
    mean = np.zeros(8, np.float32)
    var = np.ones(8, np.float32)
    p = str(tmp_path / "dw.hdf5")
    _write_keras_style(p, [
        ("depthwise_conv2d_1",
         [("depthwise_conv2d_1/depthwise_kernel:0", dw)]),
        ("conv1d_1", [("conv1d_1/kernel:0", pw)]),
        ("batch_normalization_1",
         [("batch_normalization_1/gamma:0", gamma),
          ("batch_normalization_1/beta:0", beta),
          ("batch_normalization_1/moving_mean:0", mean),
          ("batch_normalization_1/moving_variance:0", var)]),
    ])
    loaded = import_keras_hdf5(p, variables)
    # depthwise [1,3,4,1] -> [3,1,4]
    dwk = loaded["params"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(dwk), dw[0, :, :, 0][:, None, :])
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["BatchNorm_0"]["scale"]), gamma)
    np.testing.assert_allclose(
        np.asarray(loaded["batch_stats"]["BatchNorm_0"]["var"]), var)


def test_import_mismatch_raises(tmp_path):
    module, _ = build_model("simple", num_classes=12)
    variables = module.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 3920)), train=False)
    p = str(tmp_path / "bad.hdf5")
    _write_keras_style(p, [
        ("dense_1", [("dense_1/kernel:0",
                      np.zeros((10, 12), np.float32))]),
    ])
    with pytest.raises(ValueError):
        import_keras_hdf5(p, variables)


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_import_checkpoint_cli(tmp_path):
    """scripts/import_checkpoint.py end to end: Keras hdf5 -> orbax
    checkpoint that restores into a fresh Trainer state with the
    imported weights."""
    import os
    import subprocess
    import sys

    kernel = np.linspace(-1, 1, 98 * 40 * 12,
                         dtype=np.float32).reshape(3920, 12)
    bias = np.arange(12, dtype=np.float32)
    h5 = str(tmp_path / "ep-001-vl-0.5.hdf5")
    _write_keras_style(h5, [
        ("dense_1", [("dense_1/kernel:0", kernel),
                     ("dense_1/bias:0", bias)]),
    ])
    out = str(tmp_path / "orbax_ckpt")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "import_checkpoint.py"),
         "--hdf5", h5, "--out", out, "--model", "simple",
         "--output_representation", "mfcc", "--wanted_only",
         "--dct_coefficient_count", "40", "--num_log_mel_features", "40"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "params" in proc.stdout

    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import (
        synthetic_device_dataset,
    )
    from speech_recognition_tpu.train.checkpoint import restore_checkpoint
    from speech_recognition_tpu.train.loop import Trainer

    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=40, num_log_mel_features=40,
        output_representation="mfcc")
    trainer = Trainer(model_name="simple", settings=settings,
                      dataset=synthetic_device_dataset(num_classes=12),
                      augment=AugmentConfig(), batch_size=8)
    state = restore_checkpoint(out, trainer.init_state())
    leaves = jax.tree_util.tree_leaves(state.params)
    got_kernel = [l for l in leaves if l.ndim == 2][0]
    np.testing.assert_allclose(np.asarray(got_kernel), kernel)
    assert int(state.step) == 0
