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
            jax.block_until_ready(m)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


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
