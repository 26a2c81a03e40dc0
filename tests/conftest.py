"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS to the axon TPU plugin, which ignores
env-var overrides, so we force the CPU platform through jax.config before
any backend initializes. XLA_FLAGS must also be set before first jax use.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache, shared across tests AND runs. Many tests
# build a fresh Trainer around the same tiny model, so the step program's
# HLO is identical across tests — the cache collapses those recompiles
# (different function objects miss jit's in-process cache but share one
# HLO key here). Keyed on serialized HLO + compile flags, so any code
# change that alters the program recompiles; only genuinely identical
# programs are reused. ~35% off the fast tier's wall on this 1-vCPU host.
_cache_dir = os.environ.get(
    "JAX_TEST_COMPILATION_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_test_cache"))
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"
