"""Fused Pallas decode+augment kernel vs the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.ops.pallas.augment_kernel import (
    fused_decode_augment,
)


def _reference(bank, bg_flat, fids, shifts, fg, bg_pos, bg_vol):
    out = []
    t = bank.shape[1]
    for b in range(len(fids)):
        row = bank[fids[b]].astype(np.float32) / 32768.0 * fg[b]
        rolled = np.roll(row, shifts[b])
        crop = bg_flat[bg_pos[b]:bg_pos[b] + t]
        out.append(rolled + crop * bg_vol[b])
    return np.stack(out)


@pytest.mark.parametrize("batch,t", [(4, 512), (3, 16000)])
def test_fused_kernel_matches_reference(batch, t):
    rng = np.random.default_rng(0)
    bank = rng.integers(-3000, 3000, (8, t), dtype=np.int16)
    bg_flat = rng.uniform(-0.2, 0.2, 4 * t).astype(np.float32)
    fids = rng.integers(0, 8, batch).astype(np.int32)
    shifts = rng.integers(-t // 32, 1, batch).astype(np.int32)
    fg = rng.uniform(0.5, 1.5, batch).astype(np.float32)
    bg_pos = rng.integers(0, 3 * t, batch).astype(np.int32)
    bg_vol = rng.uniform(0, 0.3, batch).astype(np.float32)

    got = np.asarray(fused_decode_augment(
        jnp.asarray(bank), jnp.asarray(bg_flat), jnp.asarray(fids),
        jnp.asarray(shifts), jnp.asarray(fg), jnp.asarray(bg_pos),
        jnp.asarray(bg_vol), interpret=True))
    want = _reference(bank, bg_flat, fids, shifts, fg, bg_pos, bg_vol)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_kernel_zero_shift_and_volume():
    bank = np.full((2, 256), 16384, dtype=np.int16)
    bg = np.zeros(512, np.float32)
    got = np.asarray(fused_decode_augment(
        jnp.asarray(bank), jnp.asarray(bg),
        jnp.asarray([0, 1], jnp.int32),
        jnp.zeros(2, jnp.int32),
        jnp.asarray([1.0, 0.0], jnp.float32),
        jnp.zeros(2, jnp.int32),
        jnp.zeros(2, jnp.float32), interpret=True))
    np.testing.assert_allclose(got[0], 0.5)
    np.testing.assert_allclose(got[1], 0.0)
