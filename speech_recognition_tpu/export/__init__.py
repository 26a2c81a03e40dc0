from speech_recognition_tpu.export.aot import (  # noqa: F401
    export_inference, load_exported, save_exported,
    map_32_to_12_probs,
)
