from speech_recognition_tpu.data.wav import (  # noqa: F401
    decode_wav_bytes, load_wav_file, save_wav_file,
)
from speech_recognition_tpu.data.index import (  # noqa: F401
    which_set, DatasetIndex, build_dataset_index,
)
