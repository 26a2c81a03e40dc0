"""shard_map-wrapped fused augment kernel on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.ops.pallas.augment_kernel import (
    chunk_background, double_bank,
)
from speech_recognition_tpu.ops.pallas.sharded import (
    fused_decode_augment_sharded,
)
from speech_recognition_tpu.parallel.mesh import make_mesh, shard_batch


def test_sharded_kernel_matches_reference():
    rng = np.random.default_rng(0)
    n, t, b = 8, 512, 16  # 2 rows per device
    bank = rng.integers(-3000, 3000, (n, t), dtype=np.int16)
    bg_clip = rng.uniform(-0.2, 0.2, 5 * t).astype(np.float32)
    mesh = make_mesh()
    bank_chunks = double_bank(jnp.asarray(bank))
    bg_chunks = chunk_background(jnp.asarray(bg_clip), t)
    fids = rng.integers(0, n, b).astype(np.int32)
    shifts = rng.integers(-t // 4, t // 4, b).astype(np.int32)
    fg = rng.uniform(0.5, 1.5, b).astype(np.float32)
    bg_pos = rng.integers(0, 4 * t, b).astype(np.int32)
    bg_vol = rng.uniform(0, 0.3, b).astype(np.float32)
    args = shard_batch((jnp.asarray(fids), jnp.asarray(shifts),
                        jnp.asarray(fg), jnp.asarray(bg_pos),
                        jnp.asarray(bg_vol)), mesh)
    got = np.asarray(fused_decode_augment_sharded(
        mesh, bank_chunks, bg_chunks, *args, num_samples=t,
        interpret=True))
    assert got.shape == (b, t)
    for i in range(b):
        row = bank[fids[i]].astype(np.float32) / 32768.0 * fg[i]
        want = np.roll(row, shifts[i]) \
            + bg_clip[bg_pos[i]:bg_pos[i] + t] * bg_vol[i]
        np.testing.assert_allclose(got[i], want, rtol=1e-6, atol=1e-6)
