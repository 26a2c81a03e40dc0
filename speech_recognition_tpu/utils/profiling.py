"""Tracing / profiling (SURVEY §5 aux plan).

The reference's only observability is TensorBoard event files
(train.py:64). Here: `jax.profiler` trace capture (viewable in
TensorBoard/Perfetto/XProf) plus a lightweight step timer for
clips/sec/chip accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block.

    Usage:
        with trace_context("traces/step100"):
            state, m = trainer.train_step(state, key)
            jax.device_get(m)   # readback: forces execution INSIDE the
                                # capture window (block_until_ready does
                                # not — see export/benchmark.py)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, num_steps: Optional[int] = None) -> Dict:
    """Parse a ``trace_context`` capture into device-time truth.

    Reads the Chrome-trace json.gz that ``jax.profiler`` writes alongside
    the xplane and aggregates device busy time per XLA module and per op
    category. This is how wall-clock claims get corroborated on hardware
    where sub-10 ms wall timings are unreliable (docs/ROADMAP.md):
    module totals are device-side measurements, not host timing.

    Returns {"modules": {name: {"total_ms", "count", "ms_per_exec"}},
             "ops": {name: total_ms}, "device_busy_ms": float,
             "ms_per_step": float (if num_steps given)}.
    """
    import collections
    import glob
    import gzip
    import json
    import os

    paths = sorted(glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    threads = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def _named(track):
        return [e for e in events if e.get("ph") == "X"
                and threads.get((e["pid"], e.get("tid"))) == track]

    modules: Dict[str, Dict[str, float]] = {}
    mod_total = collections.Counter()
    mod_count = collections.Counter()
    for e in _named("XLA Modules"):
        name = e["name"].split(".")[0]
        mod_total[name] += e["dur"]
        mod_count[name] += 1
    for name in mod_total:
        modules[name] = {
            "total_ms": mod_total[name] / 1e3,
            "count": mod_count[name],
            "ms_per_exec": mod_total[name] / 1e3 / mod_count[name],
        }
    ops = collections.Counter()
    det_dur = collections.Counter()
    det_meta: Dict[str, Dict[str, str]] = {}
    for e in _named("XLA Ops"):
        ops[e["name"].split(".")[0]] += e["dur"]
        det_dur[e["name"]] += e["dur"]
        if e["name"] not in det_meta:
            args = e.get("args", {})
            det_meta[e["name"]] = {
                "source": args.get("source", ""),
                "category": args.get("hlo_category", ""),
                "flops": args.get("model_flops", ""),
            }
    busy_ms = sum(mod_total.values()) / 1e3
    detail = [dict(op=name, total_ms=d / 1e3, **det_meta[name])
              for name, d in det_dur.most_common(15)]
    out = {
        "modules": modules,
        "ops": {k: v / 1e3 for k, v in ops.most_common(20)},
        "detail": detail,
        "device_busy_ms": busy_ms,
    }
    if num_steps:
        out["ms_per_step"] = busy_ms / num_steps
    return out


class StepTimer:
    """Rolling step timing -> clips/sec/chip (the BASELINE.json metric)."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        mean = sum(self._times) / len(self._times)
        num_devices = max(1, len(jax.devices()))
        return {
            "ms_per_step": 1000.0 * mean,
            "clips_per_sec": self.batch_size / mean,
            "clips_per_sec_per_chip": self.batch_size / mean / num_devices,
        }
