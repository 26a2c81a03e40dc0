from speech_recognition_tpu.models.zoo import (  # noqa: F401
    MODEL_REGISTRY, ModelSpec, build_model, speech_model,
)
