"""Batched, device-resident audio augmentation.

Replaces the reference's per-sample Python->TF-session hot loop
(input_data.py:457-536) with vectorized `jax.random` draws under jit.
Marginal distributions match the reference's per-sample policy:

  * time shift   — w.p. ``time_shift_frequency`` a circular np.roll by
                   randint[min, max] (tf_roll, utils.py:56-73; applied
                   input_data.py:346-347,471-475)
  * background   — training only: random bank snippet at a random offset;
                   volume ~ U(0, background_volume_range) w.p.
                   ``background_frequency`` else 0, except silence clips
                   which w.p. 0.9 get U(0, silence_volume_range)
                   (input_data.py:481-496,503-504)
  * foreground   — silence -> 0; else 1, w.p. ``foreground_frequency``
                   1 + U(-r, r); sign-flipped w.p. ``flip_frequency``
                   (input_data.py:503-514)
  * composition  — out = background*bg_vol + roll(wav*fg_vol, shift);
                   clipping deliberately omitted (input_data.py:356)

All shapes are static; randomness comes from one splittable PRNG key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.config import AugmentConfig


from flax import struct


class BackgroundBank(struct.PyTreeNode):
    """Flattened background-noise bank for random-crop gathers.

    ``flat`` concatenates every ``_background_noise_`` clip; ``starts`` and
    ``lengths`` delimit each clip. Clips shorter than ``min_length`` must be
    filtered out by the builder (the reference requires background files
    longer than one second, input_data.py:484-487).

    A pytree node so it can be a jit *argument* — closure-captured banks
    get embedded into the serialized program, which both bloats compiles
    and breaks remote-compile size limits.
    """

    flat: jax.Array       # [total_samples] float32
    starts: jax.Array     # [num_clips] int32
    lengths: jax.Array    # [num_clips] int32

    @property
    def num_clips(self) -> int:
        return self.starts.shape[0]

    @staticmethod
    def from_arrays(clips, min_length: int) -> "BackgroundBank":
        clips = [np.asarray(c, dtype=np.float32) for c in clips
                 if len(c) > min_length]
        if not clips:
            raise ValueError("no background clip longer than %d" % min_length)
        flat = np.concatenate(clips)
        lengths = np.array([len(c) for c in clips], dtype=np.int32)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
        return BackgroundBank(flat=jnp.asarray(flat),
                              starts=jnp.asarray(starts),
                              lengths=jnp.asarray(lengths))


def roll_batch(wav: jax.Array, shifts: jax.Array) -> jax.Array:
    """Per-sample circular shift with np.roll semantics.

    out[b, i] = wav[b, (i - shifts[b]) % T] — the jit-able answer to the
    reference's ``TODO(see--): Write test with np.roll`` (input_data.py:345).

    A per-row modular gather: cheap on TPU (~0.14 ms at 384 x 16000)
    because the index pattern is a row permutation along the minor axis.
    (A vmapped dynamic-slice variant measures 4x faster standalone but
    inflates XLA compile time of the full train program by minutes —
    not worth it at this cost level.)
    """
    t = wav.shape[-1]
    idx = (jnp.arange(t)[None, :] - shifts[:, None]) % t
    return jnp.take_along_axis(wav, idx, axis=-1)


def sample_background_positions(key: jax.Array, bank: BackgroundBank,
                                batch_size: int,
                                num_samples: int) -> jax.Array:
    """Random crop start positions into the flat bank.

    Parity: input_data.py:481-487 (uniform clip choice, uniform offset in
    [0, len - num_samples)).
    """
    k_clip, k_off = jax.random.split(key)
    clip_idx = jax.random.randint(k_clip, (batch_size,), 0, bank.num_clips)
    max_off = (bank.lengths[clip_idx] - num_samples).astype(jnp.float32)
    u = jax.random.uniform(k_off, (batch_size,))
    offsets = jnp.floor(u * max_off).astype(jnp.int32)
    return bank.starts[clip_idx] + offsets


def sample_background(key: jax.Array, bank: BackgroundBank,
                      batch_size: int, num_samples: int) -> jax.Array:
    """Random [batch, num_samples] crops from the background bank.

    Crops are contiguous dynamic slices from the flat bank — 20x faster
    on TPU than the [B, T] elementwise gather formulation.
    """
    pos = sample_background_positions(key, bank, batch_size, num_samples)
    flat = bank.flat
    return jax.vmap(
        lambda p: jax.lax.dynamic_slice(flat, (p,), (num_samples,)))(pos)


def draw_volumes(key: jax.Array, is_silence: jax.Array,
                 cfg: AugmentConfig, batch_size: int,
                 use_background: bool) -> Tuple[jax.Array, jax.Array]:
    """Draw (foreground_volume, background_volume) per sample."""
    k_bgp, k_bgv, k_silp, k_silv, k_fgp, k_fgv, k_flip = (
        jax.random.split(key, 7))
    # background volume (input_data.py:489-496)
    if use_background:
        bg_hit = jax.random.uniform(k_bgp, (batch_size,)) \
            < cfg.background_frequency
        bg_vol = jnp.where(
            bg_hit,
            jax.random.uniform(k_bgv, (batch_size,))
            * cfg.background_volume_range,
            0.0)
        sil_hit = (~bg_hit) & is_silence & (
            jax.random.uniform(k_silp, (batch_size,))
            < cfg.silence_background_frequency)
        bg_vol = jnp.where(
            sil_hit,
            jax.random.uniform(k_silv, (batch_size,))
            * cfg.silence_volume_range,
            bg_vol)
    else:
        bg_vol = jnp.zeros((batch_size,))
    # foreground volume (input_data.py:503-514)
    fg_vol = jnp.ones((batch_size,))
    fg_hit = jax.random.uniform(k_fgp, (batch_size,)) \
        < cfg.foreground_frequency
    fg_vol = jnp.where(
        fg_hit,
        1.0 + jax.random.uniform(
            k_fgv, (batch_size,),
            minval=-cfg.foreground_volume_range,
            maxval=cfg.foreground_volume_range),
        fg_vol)
    flip = jax.random.uniform(k_flip, (batch_size,)) < cfg.flip_frequency
    fg_vol = jnp.where(flip, -fg_vol, fg_vol)
    fg_vol = jnp.where(is_silence, 0.0, fg_vol)
    return fg_vol, bg_vol


def draw_augment_params(key: jax.Array, is_silence: jax.Array,
                        cfg: AugmentConfig,
                        background: Optional[BackgroundBank],
                        batch: int, num_samples: int,
                        ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                   jax.Array]:
    """All per-sample augmentation draws: (shifts, fg_vol, bg_pos, bg_vol).

    Shared by the jnp path and the Pallas fused kernel so both have
    identical distributions. ``bg_pos`` is zeros when no background bank.
    """
    k_shift_p, k_shift, k_bg, k_vol = jax.random.split(key, 4)
    lo, hi = cfg.time_shift_range
    if cfg.time_shift_frequency > 0.0 and (lo, hi) != (0, 0):
        do_shift = jax.random.uniform(k_shift_p, (batch,)) \
            < cfg.time_shift_frequency
        shift = jax.random.randint(k_shift, (batch,), lo, hi + 1)
        shift = jnp.where(do_shift, shift, 0)
    else:
        shift = jnp.zeros((batch,), jnp.int32)
    use_background = background is not None
    fg_vol, bg_vol = draw_volumes(k_vol, is_silence, cfg, batch,
                                  use_background)
    if use_background:
        bg_pos = sample_background_positions(k_bg, background, batch,
                                             num_samples)
    else:
        bg_pos = jnp.zeros((batch,), jnp.int32)
    return shift, fg_vol, bg_pos, bg_vol


def rolled_decode_augment(bank2: jax.Array,
                          background: Optional[BackgroundBank],
                          file_ids: jax.Array, shifts: jax.Array,
                          fg_vol: jax.Array, bg_pos: jax.Array,
                          bg_vol: jax.Array,
                          num_samples: int) -> jax.Array:
    """Gather + int16 decode + circular roll + background mix, TPU-fast.

    Key insight: with the clip bank stored periodically tiled along time
    (ops/pallas/augment_kernel.double_bank layout, any shape
    reshapeable to ``[rows, FG_CHUNK]``), ``roll(bank[f], s)`` is the
    contiguous window at ``f*stride + ((-s) mod T)`` — one vmapped
    dynamic_slice (a gather of contiguous slices, which TPU executes as
    DMAs) instead of the elementwise modular gather XLA otherwise
    linearizes into a ~60 ms kernel at batch 384. (On TPU the Pallas
    kernel ``fused_decode_augment_flat`` goes further and fuses the
    whole path.)

    Addressing happens at chunk-row granularity (row index + <256
    in-window offset, like the Pallas kernel): a flat sample index
    ``file_ids * stride`` would exceed int32 beyond ~66k clips at
    T=16000 (the full Speech Commands corpus is 75.6k) and silently
    wrap; row indices stay far inside int32 at any realistic scale.
    """
    from speech_recognition_tpu.ops.pallas.augment_kernel import (
        FG_CHUNK, fg_chunks_per_clip, fg_fetch_chunks,
    )
    t = num_samples
    per_clip = fg_chunks_per_clip(t)
    fetch = fg_fetch_chunks(t)
    rows2d = bank2.reshape(-1, FG_CHUNK)
    starts = ((-shifts) % t).astype(jnp.int32)
    # row0 + fetch <= (f+1)*per_clip by the double_bank invariant
    # (max row offset (t-1)//FG_CHUNK plus fetch fits inside a clip's
    # chunk rows — same window arithmetic as the Pallas kernel)
    row0 = file_ids.astype(jnp.int32) * per_clip + starts // FG_CHUNK
    rem = starts % FG_CHUNK

    def slice_one(r0, rm):
        win = jax.lax.dynamic_slice(rows2d, (r0, 0), (fetch, FG_CHUNK))
        return jax.lax.dynamic_slice(win.reshape(-1), (rm,), (t,))

    rows = jax.vmap(slice_one)(row0, rem)
    out = rows.astype(jnp.float32) * (fg_vol / 32768.0)[:, None]
    if background is not None:
        flat = background.flat

        def bg_one(p):
            return jax.lax.dynamic_slice(flat, (p,), (t,))

        out = out + jax.vmap(bg_one)(bg_pos) * bg_vol[:, None]
    return out


def augment_batch(key: jax.Array,
                  wav: jax.Array,
                  is_silence: jax.Array,
                  cfg: AugmentConfig,
                  background: Optional[BackgroundBank] = None,
                  training: bool = True) -> jax.Array:
    """Apply the full augmentation policy to a batch.

    Args:
      key: PRNG key (split internally).
      wav: [B, T] float32 decoded waveforms.
      is_silence: [B] bool, True for ``_silence_``-labeled entries.
      cfg: augmentation knobs (static under jit).
      background: background bank; only used when ``training``.
      training: static flag; False reproduces the reference's eval path
        (neutral feed: no shift, no background, fg volume 1 or 0;
        make_submission.py:86-93, utils.py:15-24).

    Returns [B, T] float32 augmented waveforms (no clipping,
    input_data.py:356).
    """
    batch, num_samples = wav.shape
    if not training:
        fg_vol = jnp.where(is_silence, 0.0, 1.0)
        return wav * fg_vol[:, None]

    shift, fg_vol, bg_pos, bg_vol = draw_augment_params(
        key, is_silence, cfg, background, batch, num_samples)
    scaled = wav * fg_vol[:, None]
    # barrier: without it XLA fuses the decode-multiply into the roll
    # gather and linearizes it into a 64-bit elementwise gather (~60 ms at
    # 384x16000 vs 0.14 ms for the row-wise form)
    scaled = jax.lax.optimization_barrier(scaled)
    out = roll_batch(scaled, shift)
    if background is not None:
        flat = background.flat
        snippets = jax.vmap(
            lambda p: jax.lax.dynamic_slice(flat, (p,), (num_samples,)))(
                bg_pos)
        out = out + snippets * bg_vol[:, None]
    return out
