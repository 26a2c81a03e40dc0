"""Benchmark harness (replaces the Pi `benchmark_model` binary,
README.md:146-157): reports clips/sec and ms/step for the end-to-end
train step (sample+augment+frontend+fwd/bwd+update) and for inference.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import numpy as np


def _block(tree):
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready()
        if isinstance(x, jax.Array) else x, tree)


def benchmark_train(trainer, state, steps: int = 100,
                    warmup: int = 10):
    """Steady-state training throughput on the current devices.

    Per-step dispatch with async pipelining (the same shape as the real
    epoch loop); blocked on the final step's metrics so the full chain is
    measured. (A lax.scan variant was measured at 190 ms/step vs 1.4
    ms/step for this path on real v5e and deleted — see train/loop.py.)

    Returns ``(state, metrics_dict)`` — the train step donates its state
    buffer, so the caller must thread the returned state into any
    subsequent use instead of reusing the argument.
    """
    key = jax.random.PRNGKey(123)
    # keys precomputed like the production fit() loop (one split/epoch)
    keys = jax.random.split(key, warmup + steps)
    for i in range(warmup):
        state, metrics = trainer.train_step(state, keys[i])
    _block(metrics)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer.train_step(state, keys[warmup + i])
    _block(metrics)
    dt = time.perf_counter() - t0
    clips = steps * trainer.batch_size
    num_devices = len(jax.devices())
    return state, {
        "steps": steps,
        "batch_size": trainer.batch_size,
        "ms_per_step": 1000.0 * dt / steps,
        "clips_per_sec": clips / dt,
        "clips_per_sec_per_chip": clips / dt / num_devices,
    }


def traced_train_device_time(trainer, state, steps: int = 20,
                             warmup: int = 2):
    """Device-busy truth for the train step from a ``jax.profiler`` trace.

    Wall aggregates through the tunnel carry additive host/transport
    noise; the trace records how long the device actually ran each XLA
    module. NOTE: per-op trace instrumentation inflates device time
    ~2-3x vs untraced execution on this platform (see
    scripts/profile_step.py), so the traced number is an upper bound on
    true device time, useful as a sanity ceiling for wall claims.

    Returns ``(state, summary)`` where summary is
    ``{"device_ms_per_step", "device_clips_per_sec", "device_busy_ms",
    "modules"}`` or ``None`` if the platform produced no parsable trace
    (the caller should then fall back to wall time). The train step
    donates its state buffer — thread the returned state onward.
    """
    import tempfile

    from speech_recognition_tpu.utils.profiling import (
        summarize_trace, trace_context,
    )

    keys = jax.random.split(jax.random.PRNGKey(321), warmup + steps)
    for i in range(warmup):
        state, metrics = trainer.train_step(state, keys[i])
    _block(metrics)
    try:
        with tempfile.TemporaryDirectory() as td:
            with trace_context(td):
                for i in range(steps):
                    state, metrics = trainer.train_step(
                        state, keys[warmup + i])
                _block(metrics)
            summary = summarize_trace(td, num_steps=steps)
    except Exception:
        return state, None
    ms_per_step = summary["device_busy_ms"] / steps
    if ms_per_step <= 0.0:
        return state, None
    return state, {
        "device_ms_per_step": ms_per_step,
        "device_clips_per_sec": trainer.batch_size / ms_per_step * 1e3,
        "device_busy_ms": summary["device_busy_ms"],
        "modules": {k: round(v["ms_per_exec"], 4)
                    for k, v in summary["modules"].items()},
    }


def benchmark_inference(predictor, variables, batch_size: int = 384,
                        steps: int = 20, warmup: int = 3,
                        desired_samples: int = 16000) -> Dict[str, float]:
    import jax.numpy as jnp
    wav = jnp.asarray(
        np.random.default_rng(0).uniform(
            -0.1, 0.1, (batch_size, desired_samples)).astype(np.float32))
    for _ in range(warmup):
        probs = predictor.predict(variables, wav)
    probs.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        probs = predictor.predict(variables, wav)
    probs.block_until_ready()
    dt = time.perf_counter() - t0
    clips = steps * batch_size
    return {
        "ms_per_batch": 1000.0 * dt / steps,
        "clips_per_sec": clips / dt,
        "ms_per_clip": 1000.0 * dt / clips,
    }
