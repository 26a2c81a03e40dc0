"""Reference-compatibility facade.

Drop-in equivalents of the reference's entry objects so migrating code
keeps its shape: ``AudioProcessor`` (input_data.py:159-610) and
``data_gen`` (utils.py:6-53). Internally everything runs the TPU-native
path (device-resident bank, batched augmentation, MXU frontend); the
``sess`` parameters are accepted and ignored.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from speech_recognition_tpu.config import AugmentConfig, ModelSettings
from speech_recognition_tpu.data.device_bank import (
    DeviceDataset, build_device_dataset,
)
from speech_recognition_tpu.data.index import (
    DatasetIndex, build_dataset_index,
)
from speech_recognition_tpu.ops.augment import augment_batch
from speech_recognition_tpu.ops.frontend import Frontend


class AudioProcessor:
    """Reference-signature data engine (input_data.py:162-175).

    ``model_settings`` may be a ModelSettings dataclass or the reference's
    settings dict (prepare_model_settings output).
    """

    def __init__(self, data_dirs: Sequence[str],
                 silence_percentage: float, unknown_percentage: float,
                 wanted_words: Sequence[str],
                 validation_percentage: float, testing_percentage: float,
                 model_settings, output_representation: str = "raw"):
        if isinstance(model_settings, dict):
            model_settings = ModelSettings(
                label_count=model_settings["label_count"],
                sample_rate=model_settings["sample_rate"],
                desired_samples=model_settings["desired_samples"],
                window_size_samples=model_settings["window_size_samples"],
                window_stride_samples=model_settings[
                    "window_stride_samples"],
                spectrogram_length=model_settings["spectrogram_length"],
                dct_coefficient_count=model_settings[
                    "dct_coefficient_count"],
                num_log_mel_features=model_settings.get(
                    "num_log_mel_features", 40),
                output_representation=output_representation,
                fingerprint_size=model_settings.get("fingerprint_size", 0),
            )
        assert output_representation in {"raw", "spec", "mfcc",
                                         "mfcc_and_raw"}
        self.output_representation = output_representation
        self.model_settings = model_settings
        self.index: DatasetIndex = build_dataset_index(
            data_dirs=data_dirs,
            silence_percentage=silence_percentage,
            unknown_percentage=unknown_percentage,
            wanted_words=wanted_words,
            validation_percentage=validation_percentage,
            testing_percentage=testing_percentage)
        self.dataset: DeviceDataset = build_device_dataset(
            self.index, model_settings)
        self.frontend = Frontend(model_settings)
        self.words_list = self.index.words_list
        self.word_to_index = self.index.word_to_index
        self._rng_key = jax.random.PRNGKey(0)

    # -- reference API ------------------------------------------------------

    def set_size(self, mode: str) -> int:
        """input_data.py:383-393."""
        return self.dataset.set_size(mode)

    def summary(self) -> None:
        """input_data.py:591-610."""
        print(self.index.summary())

    def _next_key(self) -> jax.Array:
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    def get_data(self, how_many: int, offset: int,
                 background_frequency: float,
                 background_volume_range: float,
                 foreground_frequency: float,
                 foreground_volume_range: float,
                 time_shift_frequency: float,
                 time_shift_range: Sequence[int],
                 mode: str, sess=None,
                 pseudo_frequency: float = 0.0,
                 flip_frequency: float = 0.0,
                 silence_volume_range: float = 0.0,
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched equivalent of input_data.py:395-541.

        Returns (features, one-hot labels) as numpy, with the reference's
        semantics: random draws in training mode, deterministic sequential
        batches otherwise; ``sess`` is ignored.
        """
        del sess
        ds = self.dataset
        cfg = AugmentConfig(
            background_frequency=background_frequency,
            background_volume_range=background_volume_range,
            foreground_frequency=foreground_frequency,
            foreground_volume_range=foreground_volume_range,
            time_shift_frequency=time_shift_frequency,
            time_shift_range=(int(time_shift_range[0]),
                              int(time_shift_range[1])),
            flip_frequency=flip_frequency,
            silence_volume_range=silence_volume_range,
            pseudo_frequency=pseudo_frequency)
        training = mode == "training"
        if how_many == -1:
            how_many = ds.set_size(mode)
        if training:
            fids, labels, silence = ds.sample_train_ids(
                self._next_key(), how_many, pseudo_frequency)
        else:
            count = max(0, min(how_many, ds.set_size(mode) - offset))
            fids, labels, silence = ds.eval_ids(mode, offset, count)
        wav = ds.decode(fids)
        wav = augment_batch(self._next_key(), wav, silence, cfg,
                            background=ds.background if training else None,
                            training=training)
        feats = self.frontend.features(wav, self.output_representation)
        onehot = np.zeros((len(np.asarray(labels)),
                           self.model_settings.label_count), np.float32)
        onehot[np.arange(onehot.shape[0]), np.asarray(labels)] = 1.0
        if self.output_representation == "mfcc_and_raw":
            mfcc, raw = feats
            return [np.asarray(mfcc), np.asarray(raw)], onehot
        return np.asarray(feats), onehot

    def get_unprocessed_data(self, how_many: int, model_settings=None,
                             mode: str = "validation",
                             ) -> Tuple[np.ndarray, List[str]]:
        """input_data.py:543-589 (labels as strings, like the reference)."""
        del model_settings
        wav, labels = self.dataset.get_unprocessed_data(mode, how_many)
        names = [self.words_list[i] if i < len(self.words_list) else
                 "_unknown_" for i in np.asarray(labels)]
        return np.asarray(wav), names


def data_gen(audio_processor: AudioProcessor, sess=None,
             batch_size: int = 128,
             background_frequency: float = 0.3,
             background_volume_range: float = 0.15,
             foreground_frequency: float = 0.3,
             foreground_volume_range: float = 0.15,
             time_shift_frequency: float = 0.3,
             time_shift_range: Sequence[int] = (-500, 0),
             mode: str = "validation",
             pseudo_frequency: float = 0.33,
             flip_frequency: float = 0.0,
             silence_volume_range: float = 0.3,
             ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Infinite batch generator (parity: utils.py:6-53 incl. the
    non-training neutralization of every knob except silence volume)."""
    del sess
    offset = 0
    if mode != "training":
        background_frequency = 0.0
        background_volume_range = 0.0
        foreground_frequency = 0.0
        foreground_volume_range = 0.0
        pseudo_frequency = 0.0
        time_shift_frequency = 0.0
        time_shift_range = (0, 0)
        flip_frequency = 0.0
    while True:
        x, y = audio_processor.get_data(
            how_many=batch_size,
            offset=0 if mode == "training" else offset,
            background_frequency=background_frequency,
            background_volume_range=background_volume_range,
            foreground_frequency=foreground_frequency,
            foreground_volume_range=foreground_volume_range,
            time_shift_frequency=time_shift_frequency,
            time_shift_range=time_shift_range,
            mode=mode, pseudo_frequency=pseudo_frequency,
            flip_frequency=flip_frequency,
            silence_volume_range=silence_volume_range)
        offset += batch_size
        if offset > audio_processor.set_size(mode) - batch_size:
            offset = 0
        yield x, y
