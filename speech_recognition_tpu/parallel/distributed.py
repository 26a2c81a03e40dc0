"""Multi-host (DCN) setup helpers (SURVEY §2.4 TPU plan).

Single v5e-8 slices need none of this; for pod slices call
``initialize_distributed()`` once per process before any jax use, build
the mesh over ``jax.devices()`` (global), and shard host-side work by
``process_shard``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-based autodetection."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def process_shard(items: Sequence[T],
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> List[T]:
    """This host's strided shard of a work list (e.g. WAV paths for the
    streaming loader, data/prefetch.py)."""
    idx = jax.process_index() if process_index is None else process_index
    count = jax.process_count() if process_count is None else process_count
    return list(items[idx::count])


def host_replicated(tree, mesh):
    """Wrap per-process host values into global fully-replicated arrays.

    Every process must hold identical data (same seed / same files) —
    the multi-host equivalent of ``device_put(x, NamedSharding(mesh,
    P()))``. Used to stage a DeviceDataset once per host so a
    multi-process DP train step can consume it as a jit argument
    (tests/test_distributed.py runs this across a real 2-process
    cluster).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx])
        return x

    return jax.tree_util.tree_map(put, tree)
