"""Zoo param-count regression goldens.

Pins every constructor's parameter count (harvested on first
implementation, 12 classes, 98x60 feature geometry / 98x40 for the
tutorial 2-D models). Any architecture edit that changes a count must
update the golden deliberately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.models import MODEL_REGISTRY, build_model

GOLDEN_PARAM_COUNTS = {
    "conv_1d_fast": 540_000,
    "conv_1d_gru": 950_539,
    "conv_1d_heavy": 1_588_800,
    "conv_1d_learned_spec": 1_555_932,
    "conv_1d_log_mfcc": 774_990,
    "conv_1d_mfcc_and_raw": 1_911_084,
    "conv_1d_multi_time_sliced": 437_522,
    "conv_1d_residual": 6_472_332,
    "conv_1d_simple": 540_587,
    "conv_1d_spec": 1_040_712,
    "conv_1d_spectrogram": 812_814,
    "conv_1d_time_sliced": 1_271_008,
    "conv_1d_time_sliced_group": 686_340,
    "conv_1d_time_sliced_with_attention": 1_191_433,
    "conv_1d_time_stacked": 843_660,
    "conv_1d_top_down": 651_612,
    "conv_2d": 706_764,
    "conv_2d_fast": 102_988,
    "conv_2d_mobile": 1_176_684,
    "inception": 7_966_236,
    "inception_d1": 2_122_060,
    "simple": 47_052,
    "snn": 2_180_812,
    "steffeNet": 20_056_448,
    "xception_with_attention": 2_264_654,
}

SETTINGS = dict(spectrogram_length=98, num_log_mel_features=60,
                spectrogram_frequencies=257, desired_samples=16000,
                window_size_samples=480, window_stride_samples=160)

# spot-check a representative subset every run (the full 25 take ~8 min
# of CPU compile; the zoo forward test already exercises all of them)
SPOT = ["conv_1d_time_sliced_with_attention", "conv_2d_fast", "simple",
        "conv_1d_fast", "conv_1d_spec"]


def _count(name):
    spec = MODEL_REGISTRY[name]
    s = dict(SETTINGS)
    if name in ("conv_2d", "conv_2d_mobile", "conv_2d_fast"):
        s["num_log_mel_features"] = 40
    module, _ = build_model(name, num_classes=12, **s)
    rep = spec.representation
    if rep == "raw":
        x = jnp.zeros((1, 16000))
    elif rep == "spec":
        x = jnp.zeros((1, 98 * 257))
    elif rep == "mfcc":
        dim = 98 * 40 if name in ("conv_2d", "conv_2d_mobile",
                                  "conv_2d_fast", "simple", "snn") \
            else 98 * 60
        x = jnp.zeros((1, dim))
    else:
        x = (jnp.zeros((1, 98 * 60)), jnp.zeros((1, 16000)))
    v = module.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x, train=False)
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(v["params"]))


def test_goldens_cover_registry():
    assert set(GOLDEN_PARAM_COUNTS) == set(MODEL_REGISTRY)


@pytest.mark.parametrize("name", SPOT)
def test_param_count_golden(name):
    assert _count(name) == GOLDEN_PARAM_COUNTS[name]


@pytest.mark.parametrize("num_classes", [32, 49])
def test_flagship_class_variants(num_classes):
    """The 32-class (model-106) and 49-class (reversed-words) tasks
    (classes.py:5-23) build and emit the right logit width."""
    module, _ = build_model("conv_1d_time_sliced_with_attention",
                            num_classes=num_classes)
    x = jnp.zeros((2, 16000))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            x, train=False)
    logits = module.apply(variables, x, train=False)
    assert logits.shape == (2, num_classes)
