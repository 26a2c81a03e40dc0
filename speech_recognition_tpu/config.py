"""Typed configuration (replaces the reference's settings dicts).

``ModelSettings`` carries the same derived quantities as the reference's
``prepare_model_settings`` (model.py:1785-1829) plus ``settings.py:1-11``,
but as a frozen dataclass so it is hashable (usable as a jit static arg)
and self-documenting. Augmentation knobs live in ``AugmentConfig``
(defaults = reference utils.py:8-12 / train.py:40-47).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

OUTPUT_REPRESENTATIONS = ("raw", "spec", "mfcc", "mfcc_and_raw")


@dataclasses.dataclass(frozen=True)
class ModelSettings:
    """Derived audio/feature geometry shared by data, frontend, and models."""

    label_count: int
    sample_rate: int = 16000
    desired_samples: int = 16000
    window_size_samples: int = 480
    window_stride_samples: int = 160
    spectrogram_length: int = 98
    # Fixed by fft_length=512 -> 257 rFFT bins (reference model.py:1804).
    spectrogram_frequencies: int = 257
    # Number of mel bins (the reference reuses the name
    # 'dct_coefficient_count' for this; model.py:1796,input_data.py:371).
    dct_coefficient_count: int = 80
    # MFCCs kept after the DCT (input_data.py:379-381).
    num_log_mel_features: int = 60
    output_representation: str = "raw"
    fingerprint_size: int = 16000
    # Mel filterbank edges (input_data.py:368).
    lower_edge_hertz: float = 80.0
    upper_edge_hertz: float = 7600.0

    @property
    def fft_length(self) -> int:
        """Smallest power of two >= window (tf.signal.stft fft_length=None)."""
        n = 1
        while n < self.window_size_samples:
            n *= 2
        return n

    def input_size(self) -> int:
        """Flat model input dim (train.py:51-53)."""
        if self.output_representation == "raw":
            return self.desired_samples
        return self.fingerprint_size


def prepare_model_settings(label_count: int,
                           sample_rate: int = 16000,
                           clip_duration_ms: int = 1000,
                           window_size_ms: float = 30.0,
                           window_stride_ms: float = 10.0,
                           dct_coefficient_count: int = 80,
                           num_log_mel_features: int = 60,
                           output_representation: str = "raw") -> ModelSettings:
    """Compute derived settings (parity: reference model.py:1785-1829)."""
    if output_representation not in OUTPUT_REPRESENTATIONS:
        raise ValueError(f"invalid output_representation "
                         f"{output_representation!r}")
    desired_samples = int(sample_rate * clip_duration_ms / 1000)
    window_size_samples = int(sample_rate * window_size_ms / 1000)
    window_stride_samples = int(sample_rate * window_stride_ms / 1000)
    length_minus_window = desired_samples - window_size_samples
    spectrogram_frequencies = 257
    if length_minus_window < 0:
        spectrogram_length = 0
    else:
        spectrogram_length = 1 + length_minus_window // window_stride_samples
    if output_representation in ("mfcc", "mfcc_and_raw"):
        fingerprint_size = num_log_mel_features * spectrogram_length
    elif output_representation == "raw":
        fingerprint_size = desired_samples
    else:  # spec
        fingerprint_size = spectrogram_frequencies * spectrogram_length
    return ModelSettings(
        label_count=label_count,
        sample_rate=sample_rate,
        desired_samples=desired_samples,
        window_size_samples=window_size_samples,
        window_stride_samples=window_stride_samples,
        spectrogram_length=spectrogram_length,
        spectrogram_frequencies=spectrogram_frequencies,
        dct_coefficient_count=dct_coefficient_count,
        num_log_mel_features=num_log_mel_features,
        output_representation=output_representation,
        fingerprint_size=fingerprint_size,
    )


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Per-batch augmentation policy.

    Defaults mirror the reference training generator (utils.py:8-12) and the
    per-sample draw policy in input_data.py:457-514. All draws happen
    batched on device with `jax.random`.
    """

    background_frequency: float = 0.3
    background_volume_range: float = 0.15
    foreground_frequency: float = 0.3
    foreground_volume_range: float = 0.15
    time_shift_frequency: float = 0.3
    time_shift_range: Tuple[int, int] = (-500, 0)
    flip_frequency: float = 0.0
    silence_volume_range: float = 0.3
    # Probability that a silence clip still gets background mixed in even
    # when the background draw failed (input_data.py:493-496).
    silence_background_frequency: float = 0.9
    pseudo_frequency: float = 0.0

    def eval_variant(self) -> "AugmentConfig":
        """Deterministic policy for validation/testing (utils.py:15-24).

        Every knob is zero: silence clips evaluate all-zero. The
        reference behaves identically — its eval generator carries
        silence_volume_range=0.3 (utils.py:24), but ``get_data`` only
        mixes background in training mode (input_data.py:453), so that
        knob is dead in eval there too. It is zeroed here instead of
        carried so the config cannot misdescribe its own semantics.
        """
        return AugmentConfig(
            background_frequency=0.0,
            background_volume_range=0.0,
            foreground_frequency=0.0,
            foreground_volume_range=0.0,
            time_shift_frequency=0.0,
            time_shift_range=(0, 0),
            flip_frequency=0.0,
            silence_volume_range=0.0,
            silence_background_frequency=0.0,
            pseudo_frequency=0.0,
        )


TRAIN_AUGMENT_DEFAULTS = AugmentConfig()


def get_legacy_settings() -> ModelSettings:
    """Frozen tutorial-era inference settings (parity: settings.py:1-11):
    40 DCT coefficients, 98 frames, 4 labels, 480/160 windows."""
    return ModelSettings(
        label_count=4,
        sample_rate=16000,
        desired_samples=16000,
        window_size_samples=480,
        window_stride_samples=160,
        spectrogram_length=98,
        dct_coefficient_count=40,
        num_log_mel_features=40,
        output_representation="mfcc",
        fingerprint_size=3920,
    )
