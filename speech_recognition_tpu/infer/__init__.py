from speech_recognition_tpu.infer.tta import Predictor, TTAConfig  # noqa: F401
