from speech_recognition_tpu.ops.frontend import Frontend  # noqa: F401
