"""End-to-end: build a real file-backed dataset, train, verify learning.

Synthetic task: each class is a pure tone at a distinct frequency. A few
epochs of the tiny conv_2d_fast model must beat chance by a wide margin —
this exercises index -> WAV decode -> device bank -> augment -> frontend
-> model -> optimizer -> eval as one pipeline.
"""

import numpy as np
import pytest

from speech_recognition_tpu.config import (
    AugmentConfig, prepare_model_settings,
)
from speech_recognition_tpu.data.device_bank import build_device_dataset
from speech_recognition_tpu.data.index import build_dataset_index
from speech_recognition_tpu.data.wav import save_wav_file
from speech_recognition_tpu.train.loop import Trainer
from speech_recognition_tpu.train.metrics import accuracy


WANTED = ["stop", "go"]
FREQS = {"stop": 400.0, "go": 1200.0, "cat": 2500.0}


def _build_corpus(root, n_per=24, sr=16000):
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    for word, freq in FREQS.items():
        d = root / word
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per):
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(0.3, 0.8)
            tone = amp * np.sin(2 * np.pi * freq * t + phase)
            tone += rng.normal(0, 0.01, sr)
            save_wav_file(str(d / f"spk{i:03d}_nohash_0.wav"),
                          tone.astype(np.float32), sr)
    bg = root / "_background_noise_"
    bg.mkdir(exist_ok=True)
    save_wav_file(str(bg / "noise.wav"),
                  rng.normal(0, 0.05, sr * 3).astype(np.float32), sr)


@pytest.mark.slow
def test_tone_classification_learns(tmp_path):
    _build_corpus(tmp_path)
    settings = prepare_model_settings(
        label_count=4, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=40,
        output_representation="mfcc")
    index = build_dataset_index(
        data_dirs=[str(tmp_path)], silence_percentage=10.0,
        unknown_percentage=30.0, wanted_words=WANTED,
        validation_percentage=25.0, testing_percentage=0.0)
    assert index.background_files, "background bank must be discovered"
    dataset = build_device_dataset(index, settings)
    assert dataset.background is not None
    trainer = Trainer(
        model_name="conv_2d_fast", settings=settings, dataset=dataset,
        augment=AugmentConfig(background_frequency=0.2,
                              background_volume_range=0.1),
        batch_size=16)
    state = trainer.init_state()
    conf0, _ = trainer.evaluate(state)
    state, history = trainer.fit(state, epochs=6)
    conf, _ = trainer.evaluate(state)
    acc = accuracy(conf)
    # 4 classes; tones are trivially separable -> must crush chance
    assert acc > 0.6, f"model failed to learn: acc={acc:.3f}\n{conf}"
    assert history["loss"][-1] < history["loss"][0]
