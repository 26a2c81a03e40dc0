"""Multi-host (DCN) path: 2-process jax.distributed CPU cluster test.

Spawns two fresh interpreters that each call
``initialize_distributed(coordinator, 2, pid)``, build a global mesh over
all processes' CPU devices, run a psum over DCN, and shard a work list by
``process_shard`` — the exact code path a pod slice would take
(SURVEY §2.4 TPU plan; VERDICT round-1 weak item #6).
"""

import os
import socket
import subprocess
import sys

import pytest

from speech_recognition_tpu.parallel.distributed import process_shard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, __REPO__)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from speech_recognition_tpu.parallel.distributed import (
    initialize_distributed, process_shard,
)
pid = int(sys.argv[1])
initialize_distributed(coordinator_address=sys.argv[2],
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
# global mesh over both processes' virtual CPU devices
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devices = jax.devices()
assert len(devices) == 4, devices  # 2 procs x 2 local
mesh = Mesh(np.array(devices), ("data",))
sharding = NamedSharding(mesh, P("data"))
# each process contributes its local slice of a global [4] array
local = jnp.full((2,), float(pid + 1))
garr = jax.make_array_from_single_device_arrays(
    (4,), sharding,
    [jax.device_put(local[i:i+1], d) for i, d in
     enumerate(jax.local_devices())])
total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(
    garr)
# global sum = 2*1 + 2*2 = 6 (cross-process collective over DCN)
np.testing.assert_allclose(np.asarray(total), 6.0)
# host-side work sharding
shard = process_shard(list(range(10)))
expected = list(range(10))[pid::2]
assert shard == expected, (shard, expected)
print(f"WORKER{pid}_OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    script = WORKER.replace("__REPO__", repr(REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid),
                          coordinator],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(tmp_path))
        for pid in (0, 1)
    ]
    outputs = []
    for pid, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=300)
        outputs.append(out.decode())
        assert proc.returncode == 0, \
            f"worker {pid} failed:\n{outputs[-1]}"
    assert "WORKER0_OK" in outputs[0]
    assert "WORKER1_OK" in outputs[1]


def test_process_shard_explicit():
    """process_shard with explicit index/count (no cluster needed)."""
    items = list(range(7))
    assert process_shard(items, 0, 2) == [0, 2, 4, 6]
    assert process_shard(items, 1, 2) == [1, 3, 5]
    assert process_shard(items, 2, 3) == [2, 5]
    # all shards partition the list
    all_items = sorted(sum((process_shard(items, i, 3) for i in range(3)),
                           []))
    assert all_items == items
