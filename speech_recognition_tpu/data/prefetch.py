"""Host->device streaming prefetch (for corpora that exceed HBM).

The primary data path stages the whole corpus in HBM (device_bank.py).
When that is impossible (much larger corpora), this module streams: a
background thread decodes WAV batches with the native codec and
device_puts them while the accelerator computes, keeping a bounded queue
of batches in flight (the reference's equivalent is Keras' single
generator thread with a per-sample session call, train.py:69).

Multi-host: shard ``paths``/``labels`` by ``jax.process_index()`` before
constructing the loader, one loader per host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

from speech_recognition_tpu.data.wav import (
    INT16_DECODE_SCALE, decode_batch_int16,
)


class HostPrefetchLoader:
    """Random-batch streaming loader with double-buffered device upload."""

    def __init__(self, paths: Sequence[str], labels: np.ndarray,
                 is_silence: np.ndarray, batch_size: int,
                 desired_samples: int = 16000, prefetch: int = 2,
                 seed: int = 0, device=None):
        self.paths = list(paths)
        self.labels = np.asarray(labels, np.int32)
        self.is_silence = np.asarray(is_silence, bool)
        self.batch_size = batch_size
        self.desired_samples = desired_samples
        self.prefetch = max(1, prefetch)
        self.device = device
        self._rng = np.random.default_rng(seed)
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _produce(self):
        while not self._stop.is_set():
            idx = self._rng.integers(0, len(self.paths), self.batch_size)
            wav_i16 = decode_batch_int16(
                [self.paths[i] for i in idx], self.desired_samples)
            wav = wav_i16.astype(np.float32) / INT16_DECODE_SCALE
            batch = (
                jax.device_put(wav, self.device),
                jax.device_put(self.labels[idx], self.device),
                jax.device_put(self.is_silence[idx], self.device),
            )
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __enter__(self):
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        self._stop.set()
        # drain so the producer can exit a blocking put
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        if self._thread is not None:
            self._thread.join(timeout=5.0)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array, jax.Array]]:
        return self

    def __next__(self):
        if self._thread is None:
            raise RuntimeError("use as a context manager")
        return self._queue.get()
