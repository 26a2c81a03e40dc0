"""BatchNorm semantics under data parallelism.

The trainer is pjit-style SPMD (one jitted program over a sharded
batch), so a BatchNorm mean over axis 0 reduces over the GLOBAL logical
batch — XLA inserts the cross-shard collective. That makes DP training
bit-for-bit reference-semantic (single-device global-batch statistics),
unlike pmap-era per-replica BN which would normalize over batch/8.
This test pins that property on an 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from speech_recognition_tpu.models.layers import BN_EPS, BN_MOMENTUM
from speech_recognition_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated_sharding,
)


class _BNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=BN_MOMENTUM, epsilon=BN_EPS)(x)


def test_bn_stats_are_global_batch_under_dp():
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest provisions 8 virtual CPU devices"
    mesh = make_mesh(devices[:8])

    rng = np.random.default_rng(0)
    # per-shard slices deliberately have different means so per-replica
    # statistics would differ measurably from global-batch statistics
    x = np.concatenate([
        rng.normal(loc=i, scale=1.0 + 0.2 * i, size=(4, 6))
        for i in range(8)]).astype(np.float32)

    module = _BNNet()
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def step(variables, x):
        out, updated = module.apply(variables, x, train=True,
                                    mutable=["batch_stats"])
        return out, updated["batch_stats"]

    # single-device reference
    out_ref, stats_ref = jax.jit(step)(variables, jnp.asarray(x))

    # 8-way sharded batch, replicated params
    x_sh = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    var_sh = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, replicated_sharding(mesh)), variables)
    out_dp, stats_dp = jax.jit(step)(var_sh, x_sh)

    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(stats_dp["BatchNorm_0"][k]),
            np.asarray(stats_ref["BatchNorm_0"][k]),
            rtol=2e-5, atol=2e-5)
