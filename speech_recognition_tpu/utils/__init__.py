from speech_recognition_tpu.utils.profiling import (  # noqa: F401
    trace_context, StepTimer,
)
