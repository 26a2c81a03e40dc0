"""Doubled-bank rolled decode == decode + roll + mix reference."""

import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.ops.augment import (
    BackgroundBank, rolled_decode_augment,
)
from speech_recognition_tpu.ops.pallas.augment_kernel import double_bank


def test_rolled_decode_matches_reference():
    rng = np.random.default_rng(0)
    n, t, b = 16, 512, 12
    bank = rng.integers(-3000, 3000, (n, t), dtype=np.int16)
    bank2 = double_bank(jnp.asarray(bank)).reshape(-1)
    bg_clip = rng.uniform(-0.2, 0.2, 5 * t).astype(np.float32)
    background = BackgroundBank.from_arrays([bg_clip], min_length=t)
    fids = rng.integers(0, n, b).astype(np.int32)
    shifts = rng.integers(-t // 4, t // 4, b).astype(np.int32)
    fg = rng.uniform(0.5, 1.5, b).astype(np.float32)
    bg_pos = rng.integers(0, 4 * t, b).astype(np.int32)
    bg_vol = rng.uniform(0, 0.3, b).astype(np.float32)

    got = np.asarray(rolled_decode_augment(
        bank2, background, jnp.asarray(fids), jnp.asarray(shifts),
        jnp.asarray(fg), jnp.asarray(bg_pos), jnp.asarray(bg_vol),
        num_samples=t))
    for i in range(b):
        row = bank[fids[i]].astype(np.float32) / 32768.0 * fg[i]
        want = np.roll(row, shifts[i]) \
            + bg_clip[bg_pos[i]:bg_pos[i] + t] * bg_vol[i]
        np.testing.assert_allclose(got[i], want, rtol=1e-6, atol=1e-6)


def test_rolled_decode_no_background():
    rng = np.random.default_rng(1)
    n, t, b = 4, 256, 4
    bank = rng.integers(-3000, 3000, (n, t), dtype=np.int16)
    bank2 = double_bank(jnp.asarray(bank)).reshape(-1)
    fids = np.arange(b, dtype=np.int32)
    shifts = np.zeros(b, np.int32)
    got = np.asarray(rolled_decode_augment(
        bank2, None, jnp.asarray(fids), jnp.asarray(shifts),
        jnp.ones(b, np.float32), jnp.zeros(b, jnp.int32),
        jnp.zeros(b, np.float32), num_samples=t))
    np.testing.assert_allclose(got, bank[:b].astype(np.float32) / 32768.0)
