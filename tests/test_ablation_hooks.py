"""Ablation hooks added for the round-4 accuracy investigations.

``model_kwargs`` (extra module-constructor fields threaded through
``build_model``/``Trainer``) and ``learning_rate`` (registry-recipe
override) exist so calibrate_accuracy.py can run controlled ablations —
e.g. the conv_2d_fast GAP-vs-flatten head study (docs/ACCURACY.md).
Defaults must remain reference-exact: no kwargs -> identical params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.config import (
    AugmentConfig, prepare_model_settings,
)
from speech_recognition_tpu.data.device_bank import synthetic_device_dataset
from speech_recognition_tpu.models import build_model
from speech_recognition_tpu.train.loop import Trainer

SETTINGS_MFCC40 = dict(spectrogram_length=98, num_log_mel_features=40,
                       spectrogram_frequencies=257, desired_samples=16000,
                       window_size_samples=480, window_stride_samples=160)


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


def test_conv2d_fast_flatten_head_changes_only_the_head():
    x = jnp.zeros((2, 98 * 40))
    counts = {}
    for head in ("gap", "flatten"):
        module, _ = build_model(
            "conv_2d_fast", num_classes=12,
            model_kwargs=({"head": head} if head != "gap" else None),
            **SETTINGS_MFCC40)
        variables = module.init({"params": jax.random.PRNGKey(0)},
                                x, train=False)
        logits = module.apply(variables, x, train=False)
        assert logits.shape == (2, 12)
        counts[head] = _param_count(variables["params"])
    # flatten keeps the 6x2 post-pool grid: head input 12x wider than GAP's
    # channel vector -> exactly 11 * (C * num_classes) extra head weights
    # on top of an otherwise identical trunk
    assert counts["flatten"] > counts["gap"]
    assert (counts["flatten"] - counts["gap"]) % 12 == 0


def test_default_model_kwargs_is_reference_exact():
    x = jnp.zeros((2, 98 * 40))
    a, _ = build_model("conv_2d_fast", num_classes=12, **SETTINGS_MFCC40)
    b, _ = build_model("conv_2d_fast", num_classes=12, model_kwargs={},
                       **SETTINGS_MFCC40)
    va = a.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vb = b.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda p, q: np.array_equal(p, q),
                               va["params"], vb["params"]))


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_trainer_threads_model_kwargs_and_lr_override():
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=40,
        output_representation="mfcc")
    ds = synthetic_device_dataset(num_train=64, num_val=32, num_pseudo=8)
    trainer = Trainer(model_name="conv_2d_fast", settings=settings,
                      dataset=ds, augment=AugmentConfig(),
                      batch_size=16, model_kwargs={"head": "flatten"},
                      learning_rate=0.01)
    state = trainer.init_state()
    state, metrics = trainer.train_step(state, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # the override reached the optimizer: hyperparams carry the new LR
    # (keras-exact optimizers store lr inside the tx; probe via a big
    # step — lr 0.01 moves params 10x a 0.001 run on the first step)
    trainer_ref = Trainer(model_name="conv_2d_fast", settings=settings,
                          dataset=ds, augment=AugmentConfig(),
                          batch_size=16, model_kwargs={"head": "flatten"})
    state_ref = trainer_ref.init_state()
    state_ref, _ = trainer_ref.train_step(state_ref, jax.random.PRNGKey(0))
    # same init (same seed), different LR -> different params after 1 step
    pa = jax.tree_util.tree_leaves(state.params)[0]
    pb = jax.tree_util.tree_leaves(state_ref.params)[0]
    assert not np.allclose(np.asarray(pa), np.asarray(pb))
