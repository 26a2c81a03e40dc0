"""Audio feature frontend — batched, jit-friendly, MXU-shaped.

Replaces the reference's per-sample TF graph (input_data.py:360-381):

    tf.contrib.signal.stft(frame_length=W, frame_step=S, fft_length=None)
    -> abs -> linear_to_mel_weight_matrix(n_mels, 257, sr, 80, 7600)
    -> log(mel + 1e-6) -> mfccs_from_log_mel_spectrograms[..., :n_mfcc]

Design: everything becomes constant matrices applied with batched matmuls
so the whole frontend rides the MXU instead of scalar FFT butterflies:

  * framing        — one gather with a precomputed [frames, W] index grid
  * rFFT           — real/imag DFT bases [W, fft_bins] (window folded in)
  * mel filterbank — [fft_bins, n_mels] constant matmul
  * DCT-II         — [n_mels, n_mfcc] constant matmul

Numerics follow tf.signal exactly: periodic Hann window, fft_length =
next_pow2(W) -> 257 bins, HTK mel scale 1127*ln(1+f/700) with the DC bin
zeroed, and DCT-II scaled by 1/sqrt(2*n_mels).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.config import ModelSettings

LOG_OFFSET = 1e-6  # input_data.py:378


def hann_window_periodic(length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (tf.signal.hann_window(periodic=True))."""
    n = np.arange(length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / length)).astype(dtype)


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def hertz_to_mel(freq_hz):
    """HTK mel scale used by tf.signal: 1127 * ln(1 + f/700)."""
    return 1127.0 * np.log1p(np.asarray(freq_hz, dtype=np.float64) / 700.0)


def linear_to_mel_weight_matrix(num_mel_bins: int,
                                num_spectrogram_bins: int,
                                sample_rate: float,
                                lower_edge_hertz: float,
                                upper_edge_hertz: float,
                                dtype=np.float32) -> np.ndarray:
    """Triangular mel filterbank, parity with tf.signal (input_data.py:369-373).

    The DC bin is excluded from the triangle computation and re-added as a
    zero row, matching tf.signal.linear_to_mel_weight_matrix.
    """
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[1:]
    spectrogram_bins_mel = hertz_to_mel(linear_freqs)[:, None]
    band_edges_mel = np.linspace(hertz_to_mel(lower_edge_hertz),
                                 hertz_to_mel(upper_edge_hertz),
                                 num_mel_bins + 2)
    lower = band_edges_mel[None, 0:num_mel_bins]
    center = band_edges_mel[None, 1:num_mel_bins + 1]
    upper = band_edges_mel[None, 2:num_mel_bins + 2]
    lower_slopes = (spectrogram_bins_mel - lower) / (center - lower)
    upper_slopes = (upper - spectrogram_bins_mel) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    return np.pad(weights, [[1, 0], [0, 0]]).astype(dtype)


def dct2_matrix(n_in: int, n_out: int, dtype=np.float32) -> np.ndarray:
    """Unnormalized DCT-II basis scaled by 1/sqrt(2*n_in).

    tf.signal.mfccs_from_log_mel_spectrograms computes
    ``dct(type=2, norm=None) * rsqrt(2 * num_mel_bins)``; the [n_in, n_out]
    matrix here folds both in so MFCC extraction is one matmul (and the
    truncation to the first ``n_out`` coefficients, input_data.py:379-381).
    """
    n = np.arange(n_in, dtype=np.float64)[:, None]
    k = np.arange(n_out, dtype=np.float64)[None, :]
    basis = 2.0 * np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * n_in))
    return (basis / np.sqrt(2.0 * n_in)).astype(dtype)


def legacy_mel_filterbank_matrix(input_length: int,
                                 sample_rate: float,
                                 channels: int = 40,
                                 lower_frequency: float = 20.0,
                                 upper_frequency: float = 4000.0,
                                 dtype=np.float32) -> np.ndarray:
    """The legacy ``contrib_audio.mfcc`` filterbank as a constant matrix.

    TF's C++ ``MfccMelFilterbank`` (the op behind reference audio.py:20-23)
    differs from ``tf.signal.linear_to_mel_weight_matrix`` in three ways:
    it splits each FFT bin between its two surrounding channel *centers*
    by linear interpolation in mel space (instead of triangles between
    band edges), it operates on magnitudes (sqrt of the squared-magnitude
    spectrogram), and it hard-limits bins to ``int(1.5 + lower/hz_per_bin)
    .. int(upper/hz_per_bin)``. Verified to 7.5e-6 against the actual
    ``gen_audio_ops.mfcc`` kernel (tests/goldens/generate_tf_goldens.py).

    Returns [input_length, channels]; apply to |STFT| magnitudes.
    """
    mel_low = hertz_to_mel(lower_frequency)
    mel_hi = hertz_to_mel(upper_frequency)
    spacing = (mel_hi - mel_low) / (channels + 1)
    center = mel_low + spacing * (np.arange(channels + 1) + 1)
    hz_per_sbin = 0.5 * sample_rate / (input_length - 1)
    start_index = int(1.5 + lower_frequency / hz_per_sbin)
    end_index = int(upper_frequency / hz_per_sbin)
    weights = np.zeros((input_length, channels))
    channel = 0
    for i in range(input_length):
        melf = float(hertz_to_mel(i * hz_per_sbin))
        if i < start_index or i > end_index:
            continue
        while channel < channels and center[channel] < melf:
            channel += 1
        ch = channel - 1  # -1 means "below the first center"
        if ch >= 0:
            w = (center[ch + 1] - melf) / (center[ch + 1] - center[ch])
            weights[i, ch] += w
        else:
            w = (center[0] - melf) / (center[0] - mel_low)
        if ch + 1 < channels:
            weights[i, ch + 1] += 1.0 - w
    return weights.astype(dtype)


def legacy_dct_matrix(n_in: int, n_out: int, dtype=np.float32) -> np.ndarray:
    """TF ``MfccDct`` basis: sqrt(2/N) * cos(k * pi/N * (n + 0.5))."""
    n = np.arange(n_in, dtype=np.float64)[:, None]
    k = np.arange(n_out, dtype=np.float64)[None, :]
    basis = np.cos(k * (np.pi / n_in) * (n + 0.5)) * np.sqrt(2.0 / n_in)
    return basis.astype(dtype)


def dft_bases(frame_length: int, fft_length: int,
              window: Optional[np.ndarray] = None,
              dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag rFFT bases [frame_length, fft_length//2+1].

    frames @ cos_basis == Re(rfft(frames * window, fft_length)) and
    frames @ sin_basis == Im(...); zero-padding the frame to fft_length is
    implicit since basis rows only cover the first ``frame_length`` samples.
    The analysis window is folded into the bases (one less elementwise op).
    """
    num_bins = fft_length // 2 + 1
    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(num_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fft_length
    cos_b, sin_b = np.cos(ang), -np.sin(ang)
    if window is not None:
        cos_b = cos_b * window[:, None].astype(np.float64)
        sin_b = sin_b * window[:, None].astype(np.float64)
    return cos_b.astype(dtype), sin_b.astype(dtype)


def frame_indices(num_samples: int, frame_length: int,
                  frame_step: int) -> np.ndarray:
    """[num_frames, frame_length] gather grid (no pad_end, like tf stft)."""
    num_frames = 1 + (num_samples - frame_length) // frame_step
    return (np.arange(num_frames)[:, None] * frame_step +
            np.arange(frame_length)[None, :]).astype(np.int32)


def frame_signal(x: jax.Array, frame_length: int,
                 frame_step: int) -> jax.Array:
    """Frame [..., T] into [..., frames, frame_length] via one gather."""
    idx = jnp.asarray(frame_indices(x.shape[-1], frame_length, frame_step))
    return x[..., idx]


@dataclasses.dataclass(frozen=True)
class Frontend:
    """Batched feature extractor for a fixed ``ModelSettings`` geometry.

    All methods take float32 waveforms [B, desired_samples] and are safe
    under jit/pjit (constants are closed-over numpy arrays).

    ``precision`` controls the MXU pass count of the frontend matmuls.
    The default HIGHEST meets the float32-parity requirement (the
    tf.signal goldens, tests/test_tf_parity_goldens.py). Training may
    use 'fastest' (single-pass bf16 inputs, f32 accumulate): profiling
    showed the two HIGHEST DFT matmuls cost ~0.7 ms/step at batch 384 —
    a quarter of an mfcc-model step — while the ~1e-2 absolute feature
    error is far below augmentation noise; export/inference paths keep
    HIGHEST so deployed features stay parity-exact.
    """

    settings: ModelSettings
    compute_dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @functools.cached_property
    def _constants(self):
        s = self.settings
        window = hann_window_periodic(s.window_size_samples)
        cos_b, sin_b = dft_bases(s.window_size_samples, s.fft_length, window)
        mel = linear_to_mel_weight_matrix(
            s.dct_coefficient_count, s.fft_length // 2 + 1, s.sample_rate,
            s.lower_edge_hertz, s.upper_edge_hertz)
        dct = dct2_matrix(s.dct_coefficient_count, s.num_log_mel_features)
        idx = frame_indices(s.desired_samples, s.window_size_samples,
                            s.window_stride_samples)
        return dict(window=window, cos_b=cos_b, sin_b=sin_b, mel=mel,
                    dct=dct, idx=idx)

    def spectrogram(self, wav: jax.Array) -> jax.Array:
        """|STFT| magnitude [B, frames, fft_bins] (input_data.py:361-366)."""
        c = self._constants
        frames = wav[..., jnp.asarray(c["idx"])]
        frames = frames.astype(self.compute_dtype)
        # HIGHEST precision: the MXU's default bf16 passes cost ~1e-2
        # absolute error here, violating the float32-parity requirement.
        # The frontend is a tiny share of total FLOPs, so this is cheap.
        re = jnp.matmul(frames, jnp.asarray(c["cos_b"]),
                        preferred_element_type=jnp.float32,
                        precision=self.precision)
        im = jnp.matmul(frames, jnp.asarray(c["sin_b"]),
                        preferred_element_type=jnp.float32,
                        precision=self.precision)
        return jnp.sqrt(re * re + im * im)

    def log_mel(self, wav: jax.Array) -> jax.Array:
        """log(mel + 1e-6) [B, frames, n_mels] (input_data.py:374-378)."""
        spec = self.spectrogram(wav)
        mel = jnp.matmul(spec, jnp.asarray(self._constants["mel"]),
                         preferred_element_type=jnp.float32,
                         precision=self.precision)
        return jnp.log(mel + LOG_OFFSET)

    def mfcc(self, wav: jax.Array) -> jax.Array:
        """MFCCs [B, frames, num_log_mel_features] (input_data.py:379-381)."""
        return jnp.matmul(self.log_mel(wav),
                          jnp.asarray(self._constants["dct"]),
                          preferred_element_type=jnp.float32,
                          precision=self.precision)

    @functools.cached_property
    def _legacy_constants(self):
        """Tutorial-era MFCC pipeline constants (audio.py:6-28 compat).

        The reference's second MFCC path uses the legacy
        ``contrib_audio.audio_spectrogram(magnitude_squared=True)`` +
        ``contrib_audio.mfcc`` ops: the MfccMelFilterbank weighting (40
        channels, 20-4000 Hz, applied to magnitudes — see
        ``legacy_mel_filterbank_matrix``), log floored at 1e-12, and the
        MfccDct sqrt(2/N) basis. Verified to 7.5e-6 max abs error against
        the real ``gen_audio_ops`` kernels (tests/test_tf_parity_goldens.py).
        """
        s = self.settings
        mel = legacy_mel_filterbank_matrix(
            s.fft_length // 2 + 1, s.sample_rate, 40, 20.0, 4000.0)
        dct = legacy_dct_matrix(40, 40)
        return dict(mel=mel, dct=dct)

    def legacy_mfcc(self, wav: jax.Array,
                    dct_coefficient_count: int = 40) -> jax.Array:
        """Legacy/tutorial MFCC (parity target: audio.py AudioConverter).

        ``audio_spectrogram(magnitude_squared=True)`` followed by the
        legacy ``mfcc`` op, whose filterbank takes sqrt of its input —
        i.e. the filterbank runs on |STFT| magnitudes.
        """
        c = self._legacy_constants
        mag = self.spectrogram(wav)
        mel = jnp.matmul(mag, jnp.asarray(c["mel"]),
                         preferred_element_type=jnp.float32,
                         precision=self.precision)
        logmel = jnp.log(jnp.maximum(mel, 1e-12))
        dct = jnp.asarray(c["dct"][:, :dct_coefficient_count])
        return jnp.matmul(logmel, dct, preferred_element_type=jnp.float32,
                          precision=self.precision)

    def load_legacy_mfcc_file(self, filename: str) -> jax.Array:
        """File -> tutorial MFCC [frames, 40] (parity: audio.py
        AudioConverter.load — decode_wav + audio_spectrogram + mfcc)."""
        from speech_recognition_tpu.data.wav import load_wav_file
        wav = load_wav_file(filename,
                            desired_samples=self.settings.desired_samples)
        return self.legacy_mfcc(jnp.asarray(wav[None, :]))[0]

    def features(self, wav: jax.Array, representation: Optional[str] = None):
        """Dispatch on output representation, flattened like the reference.

        'raw' -> [B, T]; 'spec' -> [B, frames*257]; 'mfcc' ->
        [B, frames*n_mfcc]; 'mfcc_and_raw' -> (mfcc_flat, raw).
        (input_data.py:437-448,517-531)
        """
        rep = representation or self.settings.output_representation
        if rep == "raw":
            return wav
        if rep == "spec":
            s = self.spectrogram(wav)
            return s.reshape(s.shape[0], -1)
        if rep == "mfcc":
            m = self.mfcc(wav)
            return m.reshape(m.shape[0], -1)
        if rep == "mfcc_and_raw":
            m = self.mfcc(wav)
            return m.reshape(m.shape[0], -1), wav
        raise ValueError(f"unknown representation {rep!r}")
