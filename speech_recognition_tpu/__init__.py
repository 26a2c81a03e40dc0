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

from speech_recognition_tpu import labels  # noqa: F401
from speech_recognition_tpu.config import ModelSettings, prepare_model_settings  # noqa: F401
