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
    # periodic Hann as used by librosa: scipy.signal.get_window('hann',
    # n) with the default fftbins=True, i.e. 0.5 - 0.5*cos(2*pi*k/n)
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


# TPU note: jnp.fft.rfft/irfft and scatter-add overlap-add are
# pathological on the TPU backend (a single batch through the original
# fft+scatter formulation did not finish compile+run in 10 minutes).
# Like ops/frontend.py, the transform is instead expressed as constant
# DFT-basis matmuls (MXU work, HIGHEST precision to keep f32 accuracy)
# and the overlap-add as m = n_fft//hop static pad+adds — no FFT op, no
# scatter, no dynamic shapes.

@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int):
    """Window-folded rFFT bases [n_fft, bins]: frames @ cos == Re(rfft),
    frames @ sin == Im(rfft) of the Hann-windowed frame."""
    bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    w = _hann(n_fft).astype(np.float64)[:, None]
    return (np.asarray(w * np.cos(ang), np.float32),
            np.asarray(w * np.sin(ang), np.float32))


@functools.lru_cache(maxsize=None)
def _idft_bases(n_fft: int):
    """Window-folded irfft bases [bins, n_fft]: Re @ C + Im @ S equals
    irfft(spec, n_fft) * hann — the windowed iSTFT frame."""
    bins = n_fft // 2 + 1
    k = np.arange(bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    # hermitian weights: bins 0 and n_fft/2 appear once, the rest twice
    wk = np.full((bins, 1), 2.0)
    wk[0] = 1.0
    if n_fft % 2 == 0:
        wk[-1] = 1.0
    w = _hann(n_fft).astype(np.float64)[None, :]
    c = wk * np.cos(ang) / n_fft * w
    s = -wk * np.sin(ang) / n_fft * w
    return np.asarray(c, np.float32), np.asarray(s, np.float32)


def _stft(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Centered STFT [B, bins, frames] (librosa layout)."""
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    t = x.shape[-1]
    num_frames = 1 + (t - n_fft) // hop
    idx = (np.arange(num_frames)[:, None] * hop +
           np.arange(n_fft)[None, :])
    frames = x[:, idx]
    cos_b, sin_b = _dft_bases(n_fft)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos_b, precision=hi)
    im = jnp.matmul(frames, sin_b, precision=hi)
    return jax.lax.complex(re, im).swapaxes(1, 2)


def _istft(spec: jax.Array, n_fft: int, hop: int,
           length: int) -> jax.Array:
    """Inverse STFT with window-sum-squares normalization."""
    spec = spec.swapaxes(1, 2)  # [B, frames, bins]
    c, s = _idft_bases(n_fft)
    hi = jax.lax.Precision.HIGHEST
    frames = (jnp.matmul(jnp.real(spec), c, precision=hi)
              + jnp.matmul(jnp.imag(spec), s, precision=hi))
    b, num_frames, _ = frames.shape
    out_len = n_fft + hop * (num_frames - 1)
    if n_fft % hop == 0:
        # m-phase overlap-add: frame t's j-th hop-block lands at output
        # block t+j; each phase is one static pad, summed — no scatter
        m = n_fft // hop
        blocks = num_frames + m - 1
        out = sum(
            jnp.pad(frames[:, :, j * hop:(j + 1) * hop],
                    [(0, 0), (j, blocks - num_frames - j), (0, 0)])
            for j in range(m)).reshape(b, blocks * hop)
    else:  # pragma: no cover - non-divisor hops (unused by the tools)
        idx = (np.arange(num_frames)[:, None] * hop +
               np.arange(n_fft)[None, :]).reshape(-1)
        out = jnp.zeros((b, out_len), frames.dtype)
        out = out.at[:, idx].add(frames.reshape(b, -1))
    out = out[:, :out_len]
    # normalization by the summed squared window
    window = _hann(n_fft)
    wss = np.zeros(out_len, np.float32)
    for i in range(num_frames):
        wss[i * hop:i * hop + n_fft] += window ** 2
    out = out / jnp.maximum(jnp.asarray(wss), 1e-8)
    pad = n_fft // 2
    return out[:, pad:pad + length]


def phase_vocoder(spec: jax.Array, rate: float,
                  hop: int = 512) -> jax.Array:
    """Batched ``librosa.phase_vocoder``: [B, bins, frames] -> stretched.

    Numerics notes (pinned by tests/test_phase_vocoder_independent.py):
    all phase arithmetic is mod 2*pi, so both the expected per-frame
    advance (librosa: ``linspace(0, pi*hop, bins)``) and each
    accumulated step are pre-wrapped to their principal values — every
    f32 operand stays O(pi) instead of O(pi*hop), removing an
    accumulating ~1e-4 rad/frame rounding error that audibly corrupts
    late frames at hop=512 (unwrapped cumsum reaches ~5e4 rad, where
    f32 resolution is ~4e-3 rad). Wrapping changes nothing in exact
    arithmetic: the wrapped quantities differ by exact 2*pi multiples
    and only ``exp(i*phase)`` is consumed.
    """
    b, num_bins, n_frames = spec.shape
    time_steps = np.arange(0, n_frames, rate, dtype=np.float64)
    phi64 = np.linspace(0, np.pi * hop, num_bins, dtype=np.float64)
    phi64 -= 2.0 * np.pi * np.round(phi64 / (2.0 * np.pi))
    phi_advance = phi64.astype(np.float32)[None, :, None]
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
    steps = steps - 2.0 * np.pi * jnp.round(steps / (2.0 * np.pi))
    phase0 = jnp.angle(s0[:, :, :1])
    phase_acc = phase0 + jnp.concatenate(
        [jnp.zeros_like(steps[:, :, :1]),
         jnp.cumsum(steps[:, :, :-1], axis=-1)], axis=-1)
    return mag * jnp.exp(1j * phase_acc)


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
    stretched = phase_vocoder(spec, rate, hop)
    out_len = output_length or int(round(t / rate))
    return _istft(stretched, n_fft, hop, out_len)


def slow_variant_keep_tail(x: jax.Array, rate: float = 0.9,
                           num_samples: int = 16000) -> jax.Array:
    """The reference's speed-TTA transform (create_tta_set.py:19-21):
    slow down by ``rate`` and keep the last ``num_samples`` samples."""
    out_len = int(round(x.shape[-1] / rate))
    stretched = time_stretch(x, rate=rate, output_length=out_len)
    return stretched[:, -num_samples:]
