"""Device-mesh utilities — the framework's NCCL/MPI equivalent.

The reference is strictly single-GPU (SURVEY §2.4: no tf.distribute, no
horovod). Here data parallelism is first-class: a 1-D ``jax.sharding.Mesh``
over all local devices, batches sharded on axis 0, parameters replicated.
Gradient all-reduce is inserted by XLA as ``psum`` over ICI when the jitted
train step consumes sharded batches with replicated params — no explicit
collectives needed (the scaling-book recipe: annotate shardings, let XLA
place the collectives).

Multi-host (DCN) extension: call ``jax.distributed.initialize()`` before
``make_mesh`` and the same code paths shard over the global device set;
the data loader shards file indices by ``jax.process_index()``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 across the mesh (per-device micro-batches)."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, PRNG keys, banks)."""
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place every array in the tree batch-sharded on the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def constrain_batch(tree: Any, mesh: Mesh,
                    axis_name: str = DATA_AXIS) -> Any:
    """In-jit sharding constraint: axis 0 over the data axis."""
    def _constrain(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(_constrain, tree)
