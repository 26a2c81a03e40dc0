"""Pin ops/stretch.py against an INDEPENDENT NumPy phase vocoder.

librosa is not in the image, so the reference's speed-TTA transform
(`librosa.effects.time_stretch(data, 0.9)`, create_tta_set.py:19) was
previously covered only by property tests (pitch preserved, length
correct). This file hand-writes a second phase vocoder directly from
librosa's documented conventions — centered STFT (n_fft=2048,
hop=n_fft//4, periodic Hann, reflect padding), per-output-frame phase
accumulation with per-bin expected advance ``linspace(0, pi*hop,
bins)``, princarg wrapping of the deviation, two-frame zero pad, and
windowed overlap-add iSTFT normalized by the summed squared window —
as an explicit frame-by-frame Python loop, sharing no code or
structure with the batched JAX implementation.

Pinning is stage-wise because end-to-end f32-vs-f64 agreement on tonal
signals is FUNDAMENTALLY bounded: the vocoder accumulates ``angle()``
of every bin including near-silent ones, and the angle of a near-zero
bin is precision noise. Once a previously-silent bin gains energy (a
chirp sweeping through it), the noise-phase it accumulated while
silent persists as a frozen offset (~1e-2 rad observed), which
overlap-add turns into a few-percent time-domain difference. librosa
itself would disagree with a float32 build of librosa in exactly the
same way. So: STFT, the vocoder core ON THE SAME SPECTRUM (which
equalizes silent-bin angles), and iSTFT are pinned tightly; end-to-end
is pinned tightly for broadband signals (no silent bins) and at the
noise-accumulation bound for tonal ones.

Writing this test caught two real accumulating-f32-rounding bugs in
ops/stretch.py (unwrapped phi_advance and unwrapped cumsum steps,
~1e-4 rad/frame each) — see the phase_vocoder docstring.
"""

import numpy as np
import pytest

from speech_recognition_tpu.ops.stretch import (
    _istft, _stft, phase_vocoder, slow_variant_keep_tail, time_stretch,
)

SR = 16000
N_FFT, HOP = 2048, 512


# ---------------------------------------------------------------------------
# Independent implementation: straight from the librosa docs/paper, one
# frame at a time, mutable phase accumulator. No vectorized framing, no
# shared helpers with ops/stretch.py.
# ---------------------------------------------------------------------------

def _ref_window(n):
    # periodic Hann — scipy.signal.get_window("hann", n) with the
    # default fftbins=True, which is librosa's stft/istft window
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _ref_stft(y, n_fft, hop):
    pad = n_fft // 2
    y = np.pad(y, pad, mode="reflect")
    frames = []
    start = 0
    w = _ref_window(n_fft)
    while start + n_fft <= len(y):
        frames.append(np.fft.rfft(y[start:start + n_fft] * w))
        start += hop
    return np.stack(frames, axis=1)  # [bins, frames]


def _ref_istft(D, n_fft, hop, length):
    w = _ref_window(n_fft)
    n_frames = D.shape[1]
    out = np.zeros(n_fft + hop * (n_frames - 1))
    wss = np.zeros_like(out)
    for t in range(n_frames):
        seg = np.fft.irfft(D[:, t], n=n_fft)
        out[t * hop:t * hop + n_fft] += seg * w
        wss[t * hop:t * hop + n_fft] += w ** 2
    good = wss > 1e-8
    out[good] /= wss[good]
    pad = n_fft // 2
    return out[pad:pad + length]


def _ref_phase_vocoder(D, rate, hop):
    """librosa.phase_vocoder: sequential per-frame phase accumulation."""
    n_bins, n_frames = D.shape
    time_steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop, n_bins)
    D = np.pad(D, [(0, 0), (0, 2)], mode="constant")
    out = np.zeros((n_bins, len(time_steps)), dtype=complex)
    phase_acc = np.angle(D[:, 0])
    for t, step in enumerate(time_steps):
        lo = int(step)
        col0, col1 = D[:, lo], D[:, lo + 1]
        alpha = step - lo
        mag = (1.0 - alpha) * np.abs(col0) + alpha * np.abs(col1)
        out[:, t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(col1) - np.angle(col0) - phi_advance
        dphase -= 2.0 * np.pi * np.round(dphase / (2.0 * np.pi))
        phase_acc += phi_advance + dphase
    return out


def _ref_time_stretch(y, rate, n_fft=N_FFT, hop=HOP):
    D = _ref_stft(y, n_fft, hop)
    D = _ref_phase_vocoder(D, rate, hop)
    length = int(round(len(y) / rate))
    return _ref_istft(D, n_fft, hop, length)


def _signals():
    rng = np.random.default_rng(7)
    t = np.arange(SR) / SR
    chirp = np.sin(2 * np.pi * (300 + 400 * t) * t).astype(np.float32)
    tones = (0.6 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 987 * t + 1.3)).astype(np.float32)
    noise = rng.normal(0, 0.3, SR).astype(np.float32)
    burst = np.zeros(SR, np.float32)
    burst[4000:9000] = np.sin(2 * np.pi * 650 * t[:5000]).astype(np.float32)
    return {"chirp": chirp, "tones": tones, "noise": noise, "burst": burst}


# ---------------------------------------------------------------------------
# Stage pins (tight)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["chirp", "tones", "noise", "burst"])
def test_stft_matches(name):
    y = _signals()[name]
    want = _ref_stft(y, N_FFT, HOP)
    got = np.asarray(_stft(y[None, :], N_FFT, HOP))[0]
    assert got.shape == want.shape
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-5, f"stft rel err {err:.2e}"


@pytest.mark.parametrize("rate", [0.9, 1.1, 0.8])
@pytest.mark.parametrize("name", ["chirp", "noise", "burst"])
def test_phase_vocoder_core_matches_on_same_spectrum(name, rate):
    """Both vocoders fed the SAME spectrum: silent-bin angles are then
    identical on both sides and the comparison pins the vocoder math
    (column selection, interpolation, expected advance, princarg,
    accumulation) to the f32 floor."""
    y = _signals()[name]
    D = _ref_stft(y, N_FFT, HOP)
    want = _ref_phase_vocoder(D, rate, HOP)
    got = np.asarray(phase_vocoder(
        D.astype(np.complex64)[None], rate, HOP))[0]
    assert got.shape == want.shape
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 2e-4, f"{name}@{rate}: vocoder core rel err {err:.2e}"


@pytest.mark.parametrize("name", ["chirp", "noise"])
def test_istft_matches(name):
    y = _signals()[name]
    D = _ref_phase_vocoder(_ref_stft(y, N_FFT, HOP), 0.9, HOP)
    length = int(round(len(y) / 0.9))
    want = _ref_istft(D, N_FFT, HOP, length)
    got = np.asarray(_istft(
        D.astype(np.complex64)[None], N_FFT, HOP, length))[0]
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 2e-5, f"istft rel err {err:.2e}"


# ---------------------------------------------------------------------------
# End-to-end pins
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rate", [0.9, 1.1, 0.8])
def test_end_to_end_broadband_tight(rate):
    """Broadband noise has no silent bins, so no noise-phase
    accumulation: end-to-end f32 agreement sits at the f32 floor."""
    y = _signals()["noise"]
    want = _ref_time_stretch(y, rate)
    got = np.asarray(time_stretch(y[None, :], rate=rate))[0]
    assert got.shape == want.shape
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 5e-5, f"noise@{rate}: rel err {err:.2e}"


@pytest.mark.parametrize("rate", [0.9, 1.1, 0.8])
@pytest.mark.parametrize("name", ["chirp", "tones", "burst"])
def test_end_to_end_tonal_bounded(name, rate):
    """Tonal signals: bounded by accumulated silent-bin phase noise
    (~1e-2 rad frozen offsets -> few percent after overlap-add); the
    bound below is ~2x the observed worst case (7.5e-2)."""
    y = _signals()[name]
    want = _ref_time_stretch(y, rate)
    got = np.asarray(time_stretch(y[None, :], rate=rate))[0]
    assert got.shape == want.shape
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.15, f"{name}@{rate}: rel err {err:.2e}"


def test_keep_tail_matches_independent():
    """The full reference transform (slow 0.9x, keep last 16000)."""
    y = _signals()["noise"]
    want = _ref_time_stretch(y, 0.9)[-SR:]
    got = np.asarray(slow_variant_keep_tail(y[None, :], rate=0.9))[0]
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_phase_vocoder_core_identity_rate():
    """rate=1.0 must reconstruct the input almost exactly away from the
    edges (phase advance equals expected advance frame-for-frame)."""
    y = _signals()["tones"]
    out = np.asarray(time_stretch(y[None, :], rate=1.0))[0]
    # interior only: the first/last n_fft samples see pad effects
    assert np.abs(out[2048:-2048] - y[2048:-2048]).max() < 2e-2
