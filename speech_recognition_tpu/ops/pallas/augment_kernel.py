"""Fused decode+augment Pallas kernel — the data path as ONE pass.

Replaces the XLA chain bank-gather -> int16->f32 -> foreground multiply ->
circular roll -> background-crop gather -> scale-add (each a separate HBM
round-trip, and the roll gather is pathological when XLA linearizes it)
with a single kernel per batch tile: DMA the (pre-rolled) int16 clip and
the background crop from HBM, then decode/scale/mix in VMEM.

The circular roll costs nothing: the clip bank is stored doubled along
time ([N, 2T] flattened), so ``roll(bank[f], s)`` is just the contiguous
window ``bank2[f*2T + ((-s) mod T) : ... + T]`` — a dynamic-start DMA,
the same primitive as the background crop. (A VMEM dynamic lane-slice
formulation is rejected by current Mosaic; this one uses only supported
ops.)

Semantics identical to the jnp path in ops/augment.py (same
``draw_augment_params`` feeds both):

    out[b] = roll(bank[file_ids[b]] * fg_scale[b], shifts[b])
             + bg_flat[bg_pos[b] : bg_pos[b]+T] * bg_vol[b]

where fg_scale folds the 1/32768 decode (input_data.py:334-357).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def copy_length(t: int) -> int:
    """DMA length: Mosaic requires 1-D slice shapes aligned to the 1-D
    tiling (1024 f32 / 2048 int16); only the first ``t`` samples are
    consumed."""
    return _round_up(t, 2048)


def row_stride(t: int) -> int:
    """Padded doubled-row stride: any window [start, start+copy_length)
    with start < t must stay inside the row."""
    return t + copy_length(t)


def double_bank(bank: jax.Array) -> jax.Array:
    """[N, T] -> flat [N*stride] periodic rows (clip tiled to ``row_stride``).

    Stored once at startup; ~2x int16 HBM (Speech Commands: ~4 GB of 16 GB).
    ``roll(bank[f], s)`` becomes the contiguous window starting at
    ``f*stride + ((-s) mod T)``.
    """
    n, t = bank.shape
    reps = -(-row_stride(t) // t)  # ceil
    tiled = jnp.tile(bank, (1, reps))[:, :row_stride(t)]
    return tiled.reshape(n * row_stride(t))


def _kernel(pos_row_ref, fg_ref, bgpos_ref, bgvol_ref,  # scalars (SMEM)
            bank2_ref, bg_ref,                          # flat HBM
            out_ref,                                    # VMEM out tile
            rows_i16, bg_rows, sems,
            *, num_samples, rows_per_block):
    t = num_samples
    cl = copy_length(t)
    base = pl.program_id(0) * rows_per_block

    def row_copy(r):
        return pltpu.make_async_copy(
            bank2_ref.at[pl.ds(pos_row_ref[base + r], cl)],
            rows_i16.at[r], sems.at[r, 0])

    def bg_copy(r):
        return pltpu.make_async_copy(
            bg_ref.at[pl.ds(bgpos_ref[base + r], cl)], bg_rows.at[r],
            sems.at[r, 1])

    for r in range(rows_per_block):
        row_copy(r).start()
        bg_copy(r).start()
    for r in range(rows_per_block):
        row_copy(r).wait()
        bg_copy(r).wait()
        out_ref[r, :] = (rows_i16[r, :t].astype(jnp.float32)
                         * fg_ref[base + r]
                         + bg_rows[r, :t] * bgvol_ref[base + r])


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fused_decode_augment_flat(bank2_flat: jax.Array,  # [N*2T] int16 (HBM)
                              bg_flat: jax.Array,     # [M] f32 (HBM)
                              file_ids: jax.Array,    # [B] int32
                              shifts: jax.Array,      # [B] int32 (np.roll)
                              fg_vol: jax.Array,      # [B] f32
                              bg_pos: jax.Array,      # [B] int32
                              bg_vol: jax.Array,      # [B] f32
                              num_samples: int,
                              interpret: bool = False) -> jax.Array:
    """One-pass decode+augment from a doubled flat bank. [B, T] float32."""
    batch = file_ids.shape[0]
    t = num_samples
    cl = copy_length(t)
    rows_per_block = 8 if batch % 8 == 0 else batch
    fg_scale = (fg_vol / 32768.0).astype(jnp.float32)
    starts = ((-shifts) % t).astype(jnp.int32)
    pos_row = file_ids.astype(jnp.int32) * row_stride(t) + starts
    # background bank must allow reads up to pos + copy_length; callers
    # guarantee pos + t <= len, we pad the tail here once per unique shape
    pad = cl - t
    if pad:
        bg_flat = jnp.concatenate(
            [bg_flat, jnp.zeros((pad,), bg_flat.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch // rows_per_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # bank stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # bg_flat stays in HBM
        ],
        out_specs=pl.BlockSpec((rows_per_block, t),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_per_block, cl), jnp.int16),
            pltpu.VMEM((rows_per_block, cl), jnp.float32),
            pltpu.SemaphoreType.DMA((rows_per_block, 2)),
        ],
    )
    kernel = functools.partial(_kernel, num_samples=t,
                               rows_per_block=rows_per_block)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, t), jnp.float32),
        interpret=interpret,
    )(pos_row, fg_scale,
      bg_pos.astype(jnp.int32), bg_vol.astype(jnp.float32),
      bank2_flat, bg_flat)


def fused_decode_augment(bank: jax.Array, bg_flat: jax.Array,
                         file_ids: jax.Array, shifts: jax.Array,
                         fg_vol: jax.Array, bg_pos: jax.Array,
                         bg_vol: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Convenience wrapper building the doubled bank on the fly (tests).
    Production callers should pre-double once via ``double_bank``."""
    return fused_decode_augment_flat(
        double_bank(bank), bg_flat, file_ids, shifts, fg_vol, bg_pos,
        bg_vol, num_samples=bank.shape[1], interpret=interpret)
