"""Multi-chip wrapper for the fused augment kernel.

Pallas kernels don't auto-partition under jit; for a data-parallel mesh
the kernel runs per-shard via ``shard_map``: banks replicated, per-sample
vectors batch-sharded, each chip augmenting its own micro-batch locally
(no collectives — the data path is embarrassingly parallel).
"""

from __future__ import annotations

import functools

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from speech_recognition_tpu.ops.pallas.augment_kernel import (
    fused_decode_augment_flat,
)


def fused_decode_augment_sharded(mesh: Mesh,
                                 bank_chunks: jax.Array,
                                 bg_chunks: jax.Array,
                                 file_ids: jax.Array,
                                 shifts: jax.Array,
                                 fg_vol: jax.Array,
                                 bg_pos: jax.Array,
                                 bg_vol: jax.Array,
                                 num_samples: int,
                                 axis_name: str = "data",
                                 interpret: bool = False) -> jax.Array:
    """Batch-sharded fused decode+augment over ``mesh``. [B, T] f32."""
    kernel = functools.partial(fused_decode_augment_flat,
                               num_samples=num_samples,
                               interpret=interpret)
    fn = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_rep=False)
    return fn(bank_chunks, bg_chunks, file_ids, shifts, fg_vol, bg_pos,
              bg_vol)
