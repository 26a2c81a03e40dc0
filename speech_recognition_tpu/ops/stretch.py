"""Batched phase-vocoder time stretch (TPU-native librosa.time_stretch).

Replaces the reference's offline librosa speed-TTA builder
(create_tta_set.py:19: ``effects.time_stretch(data, 0.9)``) with a jitted,
batch-vectorized implementation: STFT -> phase-vocoder frame resampling ->
iSTFT, librosa conventions (n_fft=2048, hop=512, centered Hann, reflect
padding, window-sum-squares normalization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hann(n: int) -> np.ndarray:
    # symmetric Hann as used by librosa (scipy.signal.get_window('hann'))
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


def _stft(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Centered STFT [B, bins, frames] (librosa layout)."""
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    t = x.shape[-1]
    num_frames = 1 + (t - n_fft) // hop
    idx = (np.arange(num_frames)[:, None] * hop +
           np.arange(n_fft)[None, :])
    frames = x[:, idx] * _hann(n_fft)[None, None, :]
    return jnp.fft.rfft(frames, axis=-1).swapaxes(1, 2)


def _istft(spec: jax.Array, n_fft: int, hop: int,
           length: int) -> jax.Array:
    """Inverse STFT with window-sum-squares normalization."""
    frames = jnp.fft.irfft(spec.swapaxes(1, 2), n=n_fft, axis=-1)
    window = _hann(n_fft)
    frames = frames * window[None, None, :]
    num_frames = frames.shape[1]
    out_len = n_fft + hop * (num_frames - 1)
    # overlap-add via scatter-add
    idx = (np.arange(num_frames)[:, None] * hop +
           np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((frames.shape[0], out_len), frames.dtype)
    out = out.at[:, idx].add(frames.reshape(frames.shape[0], -1))
    # normalization by the summed squared window
    wss = np.zeros(out_len, np.float32)
    flat_idx = idx.reshape(num_frames, n_fft)
    for i in range(num_frames):
        wss[flat_idx[i]] += window ** 2
    out = out / jnp.maximum(jnp.asarray(wss), 1e-8)
    pad = n_fft // 2
    return out[:, pad:pad + length]


@functools.partial(jax.jit, static_argnames=("rate", "n_fft", "hop",
                                             "output_length"))
def time_stretch(x: jax.Array, rate: float = 0.9,
                 n_fft: int = 2048, hop: int = 512,
                 output_length: int = 0) -> jax.Array:
    """Stretch [B, T] waveforms by ``rate`` (<1 slows down).

    Output length defaults to round(T / rate) like librosa; pass
    ``output_length`` to fix a static shape.
    """
    t = x.shape[-1]
    spec = _stft(x, n_fft, hop)  # [B, bins, frames]
    b, num_bins, n_frames = spec.shape
    # phase vocoder (librosa.phase_vocoder semantics)
    time_steps = np.arange(0, n_frames, rate, dtype=np.float64)
    phi_advance = np.linspace(0, np.pi * hop, num_bins,
                              dtype=np.float32)[None, :, None]
    # pad one frame so idx+1 is valid
    spec = jnp.pad(spec, [(0, 0), (0, 0), (0, 2)])
    idx = np.floor(time_steps).astype(np.int32)
    alpha = jnp.asarray((time_steps - idx).astype(np.float32))[None, None, :]
    s0 = spec[:, :, idx]
    s1 = spec[:, :, idx + 1]
    mag = (1.0 - alpha) * jnp.abs(s0) + alpha * jnp.abs(s1)
    # accumulate phase
    dphase = jnp.angle(s1) - jnp.angle(s0) - phi_advance
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
    steps = dphase + phi_advance  # [B, bins, out_frames]
    phase0 = jnp.angle(s0[:, :, :1])
    phase_acc = phase0 + jnp.concatenate(
        [jnp.zeros_like(steps[:, :, :1]),
         jnp.cumsum(steps[:, :, :-1], axis=-1)], axis=-1)
    stretched = mag * jnp.exp(1j * phase_acc)
    out_len = output_length or int(round(t / rate))
    return _istft(stretched, n_fft, hop, out_len)


def slow_variant_keep_tail(x: jax.Array, rate: float = 0.9,
                           num_samples: int = 16000) -> jax.Array:
    """The reference's speed-TTA transform (create_tta_set.py:19-21):
    slow down by ``rate`` and keep the last ``num_samples`` samples."""
    out_len = int(round(x.shape[-1] / rate))
    stretched = time_stretch(x, rate=rate, output_length=out_len)
    return stretched[:, -num_samples:]
