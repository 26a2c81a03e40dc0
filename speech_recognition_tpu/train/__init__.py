from speech_recognition_tpu.train.optim import (  # noqa: F401
    smooth_cross_entropy, build_optimizer, ReduceLROnPlateau,
)
from speech_recognition_tpu.train.loop import Trainer, TrainState  # noqa: F401
