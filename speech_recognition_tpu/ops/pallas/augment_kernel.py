"""Fused decode+augment Pallas kernel — the data path as ONE pass.

Replaces the XLA chain bank-gather -> int16->f32 -> foreground multiply ->
circular roll -> background-crop gather -> scale-add with a single kernel:
per batch row, DMA the clip window and the background crop from HBM and
decode/scale/mix in VMEM. XLA lowers the roll/crop gathers into a
linearized elementwise gather in some program contexts (~60 ms at
384x16000); this kernel is immune by construction.

Mosaic constraint handling (probed on this toolchain):
  * dynamic DMA starts must index an *untiled* leading dim -> HBM arrays
    are chunk stacks ([rows, 2, 128] int16 / [rows, 8, 128] f32), so a
    window starting at any chunk is a legal ``ref.at[pl.ds(chunk, n)]``;
  * the sub-chunk remainder shift happens in VMEM: a dynamic sublane
    rotate (``pltpu.roll`` axis 0) + two dynamic lane rotates (axis 1)
    + an iota select implement flat_window(buf, s) for any s — rotate
    requires 32-bit data, so int16 decodes to f32 first;
  * the circular foreground roll uses a periodically tiled clip bank
    (each row = clip repeated to ``fg_chunks_per_clip(T)`` chunks, 127
    at T=16000 — ~2x the clip plus fetch slack), making roll(clip, s)
    a contiguous window at (-s) mod T.

Semantics identical to the jnp path (same ``draw_augment_params``):

    out[b] = roll(bank[file_ids[b]] * fg_scale[b], shifts[b])
             + bg_flat[bg_pos[b] : bg_pos[b]+T] * bg_vol[b]

with fg_scale folding the 1/32768 int16 decode (input_data.py:334-357).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
FG_CHUNK = 256     # int16 chunk: [2, 128]
BG_CHUNK = 1024    # f32 chunk:  [8, 128]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fg_chunks_per_clip(t: int) -> int:
    """Chunk rows per bank clip: window start < T, window = T + slack."""
    return _round_up(t + FG_CHUNK, FG_CHUNK) // FG_CHUNK \
        + _round_up(t, FG_CHUNK) // FG_CHUNK


def fg_fetch_chunks(t: int) -> int:
    return _round_up(t + FG_CHUNK, FG_CHUNK) // FG_CHUNK


def bg_fetch_chunks(t: int) -> int:
    return _round_up(t + BG_CHUNK, BG_CHUNK) // BG_CHUNK


def double_bank(bank: jax.Array) -> jax.Array:
    """[N, T] int16 -> [N * chunks_per_clip, 2, 128] periodic chunk stack.

    Stored once at startup (~2x int16 HBM; Speech Commands ~4 GB of 16 GB).
    ``roll(bank[f], s)`` = window of ``fg_fetch_chunks`` chunk rows at
    ``f*chunks_per_clip + ((-s) mod T)//256`` plus a <256 in-VMEM shift.
    """
    n, t = bank.shape
    if t % LANE:
        raise ValueError(f"desired_samples must be a multiple of {LANE}")
    per_clip = fg_chunks_per_clip(t)
    total = per_clip * FG_CHUNK
    reps = -(-total // t)
    tiled = jnp.tile(bank, (1, reps))[:, :total]
    return tiled.reshape(n * per_clip, 2, LANE)


def double_bank_host(bank_np, block_clips: int = 4096) -> "np.ndarray":
    """Host (numpy) twin of :func:`double_bank` — same layout, built
    before upload so the flat bank never has to coexist with the chunk
    stack in HBM (the chunked form can then BE the dataset's storage,
    see data/device_bank.py).

    Built block-wise into one preallocated output instead of
    ``np.tile`` + contiguous copy: at Speech Commands scale the tile
    formulation transiently held flat (2.4 GB) + 3x-tiled (7.3 GB) +
    output (4.9 GB) ≈ 14.6 GB of host RAM; this form peaks at
    flat + output ≈ 7.3 GB.
    """
    import numpy as np
    n, t = bank_np.shape
    if t % LANE:
        raise ValueError(f"desired_samples must be a multiple of {LANE}")
    per_clip = fg_chunks_per_clip(t)
    total = per_clip * FG_CHUNK
    out = np.empty((n * per_clip, 2, LANE), bank_np.dtype)
    flat = out.reshape(n, total)  # contiguous view of out
    for lo in range(0, n, block_clips):
        hi = min(lo + block_clips, n)
        src = bank_np[lo:hi]
        for off in range(0, total, t):
            w = min(t, total - off)
            flat[lo:hi, off:off + w] = src[:, :w]
    return out


def decode_chunked(bank_chunks: jax.Array, file_ids: jax.Array,
                   t: int) -> jax.Array:
    """Recover decoded f32 clips from the periodic chunk stack.

    Row-major, the ``fg_chunks_per_clip(t)`` chunk rows of clip ``f``
    are the clip tiled periodically — so its first ``t`` samples are
    the original clip exactly. One row gather + reshape + slice; used
    by eval/BN-recalibration paths when the chunk stack is the bank's
    only storage (~2x the bytes of a flat gather, negligible off the
    train hot path).
    """
    per_clip = fg_chunks_per_clip(t)
    rows = (file_ids.astype(jnp.int32)[:, None] * per_clip
            + jnp.arange(per_clip, dtype=jnp.int32)[None, :])
    gathered = bank_chunks[rows]                    # [B, pc, 2, LANE]
    flat = gathered.reshape(file_ids.shape[0], per_clip * FG_CHUNK)
    # 1/32768 = decode_wav scaling (data.wav.INT16_DECODE_SCALE)
    return flat[:, :t].astype(jnp.float32) / 32768.0


def chunk_background(flat: jax.Array, t: int) -> jax.Array:
    """[M] f32 -> [rows, 8, 128] chunk stack with fetch headroom."""
    m = flat.shape[0]
    padded = _round_up(m, BG_CHUNK) + bg_fetch_chunks(t) * BG_CHUNK
    flat = jnp.concatenate([flat, jnp.zeros((padded - m,), flat.dtype)])
    return flat.reshape(padded // BG_CHUNK, 8, LANE)


def _window(buf2d: jax.Array, shift, chunks: int) -> jax.Array:
    """flat_window: out[r*128+c] = buf2d.flat[shift + r*128 + c].

    buf2d: [R, 128] f32 with R >= chunks + 1 + max_sublane_shift.
    shift: traced scalar in [0, (R - chunks - 1) * 128).
    """
    r_total = buf2d.shape[0]
    sub = shift // LANE
    lane = shift % LANE
    shifted = pltpu.roll(buf2d, (-sub) % r_total, axis=0)
    rot = (-lane) % LANE
    lo = pltpu.roll(shifted[0:chunks, :], rot, axis=1)
    hi = pltpu.roll(shifted[1:chunks + 1, :], rot, axis=1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, LANE), 1)
    return jnp.where(lane_ids < LANE - lane, lo, hi)


def _kernel(fgchunk_ref, fgrem_ref, fgscale_ref,
            bgchunk_ref, bgrem_ref, bgvol_ref,        # scalars (SMEM)
            bank_ref, bg_ref,                          # chunked HBM
            out_ref,                                   # VMEM out tile
            fg_buf, bg_buf, sems,
            *, chunks, fg_fetch, bg_fetch, rows_per_block):
    base = pl.program_id(0) * rows_per_block

    def fg_copy(r):
        return pltpu.make_async_copy(
            bank_ref.at[pl.ds(fgchunk_ref[base + r], fg_fetch)],
            fg_buf.at[r], sems.at[r, 0])

    def bg_copy(r):
        return pltpu.make_async_copy(
            bg_ref.at[pl.ds(bgchunk_ref[base + r], bg_fetch)],
            bg_buf.at[r], sems.at[r, 1])

    for r in range(rows_per_block):
        fg_copy(r).start()
        bg_copy(r).start()
    for r in range(rows_per_block):
        fg_copy(r).wait()
        bg_copy(r).wait()
        # rotate needs 32-bit data: decode int16 -> f32 first
        fg2d = fg_buf[r].reshape(fg_fetch * 2, LANE).astype(jnp.float32)
        bg2d = bg_buf[r].reshape(bg_fetch * 8, LANE)
        fg_win = _window(fg2d, fgrem_ref[base + r], chunks)
        bg_win = _window(bg2d, bgrem_ref[base + r], chunks)
        out_ref[r] = (fg_win * fgscale_ref[base + r]
                      + bg_win * bgvol_ref[base + r])


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fused_decode_augment_flat(bank_chunks: jax.Array,  # [*, 2, 128] int16
                              bg_chunks: jax.Array,    # [*, 8, 128] f32
                              file_ids: jax.Array,     # [B] int32
                              shifts: jax.Array,       # [B] int32 (np.roll)
                              fg_vol: jax.Array,       # [B] f32
                              bg_pos: jax.Array,       # [B] int32
                              bg_vol: jax.Array,       # [B] f32
                              num_samples: int,
                              interpret: bool = False) -> jax.Array:
    """One-pass decode+augment from chunked banks. [B, T] float32."""
    batch = file_ids.shape[0]
    t = num_samples
    chunks = t // LANE
    fg_fetch = fg_fetch_chunks(t)
    bg_fetch = bg_fetch_chunks(t)
    rows_per_block = 8 if batch % 8 == 0 else batch
    fg_scale = (fg_vol / 32768.0).astype(jnp.float32)
    starts = ((-shifts) % t).astype(jnp.int32)
    fg_chunk = (file_ids.astype(jnp.int32) * fg_chunks_per_clip(t)
                + starts // FG_CHUNK)
    fg_rem = starts % FG_CHUNK
    bg_pos = bg_pos.astype(jnp.int32)
    bg_chunk = bg_pos // BG_CHUNK
    bg_rem = bg_pos % BG_CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(batch // rows_per_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((rows_per_block, chunks, LANE),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_per_block, fg_fetch, 2, LANE), jnp.int16),
            pltpu.VMEM((rows_per_block, bg_fetch, 8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((rows_per_block, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, chunks=chunks, fg_fetch=fg_fetch, bg_fetch=bg_fetch,
        rows_per_block=rows_per_block)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, chunks, LANE), jnp.float32),
        interpret=interpret,
    )(fg_chunk, fg_rem, fg_scale, bg_chunk, bg_rem,
      bg_vol.astype(jnp.float32), bank_chunks, bg_chunks)
    return out.reshape(batch, t)


def fused_decode_augment(bank: jax.Array, bg_flat: jax.Array,
                         file_ids: jax.Array, shifts: jax.Array,
                         fg_vol: jax.Array, bg_pos: jax.Array,
                         bg_vol: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Convenience wrapper building the chunked banks on the fly (tests).
    Production callers pre-build via ``double_bank``/``chunk_background``."""
    t = bank.shape[1]
    return fused_decode_augment_flat(
        double_bank(bank), chunk_background(bg_flat, t), file_ids, shifts,
        fg_vol, bg_pos, bg_vol, num_samples=t, interpret=interpret)
