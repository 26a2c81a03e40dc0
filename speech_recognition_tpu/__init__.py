"""speech_recognition_tpu — a TPU-native keyword-spotting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the winning
Kaggle TensorFlow Speech Recognition Challenge solution
(see--/speech_recognition): deterministic dataset indexing, device-resident
batched audio augmentation, an MXU-friendly log-mel/MFCC frontend, a
25-model zoo, DP training over a `jax.sharding.Mesh`, TTA inference,
pseudo-labeling, ensembling, and AOT export.

Unlike the reference (per-sample TF feed_dict round-trips, single GPU),
everything compute-shaped here is a single jitted program: sample
selection, augmentation, feature extraction, and the train step run
device-resident, batch-sharded over a data-parallel mesh.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # An explicit CPU request must actually win. Some deployments pin
    # jax to a remote TPU plugin at the site level, where the
    # JAX_PLATFORMS env var alone is not honored — backend discovery
    # still contacts the remote service and can HANG if it is
    # unreachable (observed on the bench tunnel). Pinning through
    # jax.config before any backend initializes bypasses that hook, so
    # subprocesses launched with JAX_PLATFORMS=cpu (tests, CI) stay
    # deterministic-CPU regardless of tunnel state.
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from speech_recognition_tpu import labels  # noqa: F401
from speech_recognition_tpu.config import (  # noqa: F401
    AugmentConfig, ModelSettings, prepare_model_settings,
)


def __getattr__(name):
    """Lazy top-level API (avoids importing jax for light consumers)."""
    if name == "Trainer":
        from speech_recognition_tpu.train.loop import Trainer
        return Trainer
    if name == "Predictor":
        from speech_recognition_tpu.infer.tta import Predictor
        return Predictor
    if name == "build_model":
        from speech_recognition_tpu.models import build_model
        return build_model
    if name == "build_dataset_index":
        from speech_recognition_tpu.data.index import build_dataset_index
        return build_dataset_index
    if name == "build_device_dataset":
        from speech_recognition_tpu.data.device_bank import (
            build_device_dataset,
        )
        return build_device_dataset
    if name == "Frontend":
        from speech_recognition_tpu.ops.frontend import Frontend
        return Frontend
    raise AttributeError(name)
