"""Fused decode+augment Pallas kernel — the data path as ONE pass.

Replaces the XLA chain bank-gather -> int16->f32 -> foreground multiply ->
circular roll -> background-crop gather -> scale-add with a single kernel:
per batch row, DMA the clip window and the background crop from HBM and
decode/scale/mix in VMEM. XLA lowers the roll/crop gathers into a
linearized elementwise gather in some program contexts (~60 ms at
384x16000); this kernel is immune by construction.

Mosaic constraint handling (this toolchain):
  * dynamic DMA starts must be tile-aligned -> all HBM arrays are viewed
    as [rows, 1, 128] chunk stacks; the leading dim is untiled, so a
    window starting at any 128-sample chunk is a legal
    ``ref.at[pl.ds(chunk, n)]`` DMA;
  * the remaining 0..127-sample shift happens in VMEM as two dynamic
    lane-rolls (``pltpu.roll`` with a traced shift) + an iota select —
    window[i] = buf[shift + i] needs row r and r+1 of the chunk stack,
    hence copies fetch chunks+1 rows;
  * the circular foreground roll uses a pre-doubled clip bank
    ([N, 2T] -> chunks), making roll(clip, s) a contiguous window at
    (-s) mod T.

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bank_chunk_count(t: int) -> int:
    """Chunk rows per doubled clip."""
    return 2 * t // LANE


def double_bank(bank: jax.Array) -> jax.Array:
    """[N, T] int16 -> [N * 2T/128, 1, 128] doubled chunk stack.

    Stored once at startup (~2x int16 HBM; Speech Commands ~4 GB of 16 GB).
    ``roll(bank[f], s)`` becomes the window of ``T/128 + 1`` chunk rows
    starting at ``f*(2T/128) + ((-s) mod T)//128`` plus a <128 lane shift.
    """
    n, t = bank.shape
    if t % LANE:
        raise ValueError(f"desired_samples must be a multiple of {LANE}")
    doubled = jnp.concatenate([bank, bank], axis=1)
    return doubled.reshape(n * bank_chunk_count(t), 1, LANE)


def chunk_background(flat: jax.Array, t: int) -> jax.Array:
    """[M] f32 -> [ceil/128 rows + headroom, 1, 128] chunk stack.

    Pads with zeros so any window of ``T/128 + 1`` chunk rows starting at
    ``pos // 128`` (pos + T <= M guaranteed by the sampler) is in range.
    """
    m = flat.shape[0]
    padded = _round_up(m, LANE) + 2 * LANE
    flat = jnp.concatenate(
        [flat, jnp.zeros((padded - m,), flat.dtype)])
    return flat.reshape(padded // LANE, 1, LANE)


def _window(buf2d, lane_shift, chunks):
    """Extract flat window starting at ``lane_shift`` from a
    [chunks+1, LANE] buffer -> [chunks, LANE].

    out[r, c] = buf[r + (c + s >= LANE), (c + s) % LANE]; both candidate
    rows come from dynamic lane-rolls of the static row slices.
    """
    s = lane_shift
    rolled_shift = (-s) % LANE
    lo = pltpu.roll(buf2d[0:chunks, :], rolled_shift, axis=1)
    hi = pltpu.roll(buf2d[1:chunks + 1, :], rolled_shift, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunks, LANE), 1)
    return jnp.where(lane < LANE - s, lo, hi)


def _kernel(fgchunk_ref, fglane_ref, fgscale_ref,
            bgchunk_ref, bglane_ref, bgvol_ref,       # scalars (SMEM)
            bank_ref, bg_ref,                          # chunked HBM
            out_ref,                                   # VMEM out tile
            fg_buf, bg_buf, sems,
            *, chunks, rows_per_block):
    base = pl.program_id(0) * rows_per_block

    def fg_copy(r):
        return pltpu.make_async_copy(
            bank_ref.at[pl.ds(fgchunk_ref[base + r], chunks + 1)],
            fg_buf.at[r], sems.at[r, 0])

    def bg_copy(r):
        return pltpu.make_async_copy(
            bg_ref.at[pl.ds(bgchunk_ref[base + r], chunks + 1)],
            bg_buf.at[r], sems.at[r, 1])

    for r in range(rows_per_block):
        fg_copy(r).start()
        bg_copy(r).start()
    for r in range(rows_per_block):
        fg_copy(r).wait()
        bg_copy(r).wait()
        fg2d = fg_buf[r].reshape(chunks + 1, LANE)
        bg2d = bg_buf[r].reshape(chunks + 1, LANE)
        fg_win = _window(fg2d, fglane_ref[base + r], chunks)
        bg_win = _window(bg2d, bglane_ref[base + r], chunks)
        out_ref[r] = (fg_win.astype(jnp.float32) * fgscale_ref[base + r]
                      + bg_win * bgvol_ref[base + r])


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fused_decode_augment_flat(bank_chunks: jax.Array,  # [N*2T/128, 1, 128]
                              bg_chunks: jax.Array,    # [*, 1, 128] f32
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
    rows_per_block = 8 if batch % 8 == 0 else batch
    fg_scale = (fg_vol / 32768.0).astype(jnp.float32)
    starts = ((-shifts) % t).astype(jnp.int32)
    fg_chunk = (file_ids.astype(jnp.int32) * bank_chunk_count(t)
                + starts // LANE)
    fg_lane = starts % LANE
    bg_pos = bg_pos.astype(jnp.int32)
    bg_chunk = bg_pos // LANE
    bg_lane = bg_pos % LANE
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
            pltpu.VMEM((rows_per_block, chunks + 1, 1, LANE), jnp.int16),
            pltpu.VMEM((rows_per_block, chunks + 1, 1, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((rows_per_block, 2)),
        ],
    )
    kernel = functools.partial(_kernel, chunks=chunks,
                               rows_per_block=rows_per_block)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, chunks, LANE), jnp.float32),
        interpret=interpret,
    )(fg_chunk, fg_lane, fg_scale, bg_chunk, bg_lane,
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
