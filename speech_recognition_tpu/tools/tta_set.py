"""Speed-TTA set builder (parity: create_tta_set.py).

Builds a parallel directory of 0.9x time-stretched test clips. Unlike the
reference's one-file-at-a-time librosa loop, clips are processed in
device-resident batches through the jitted phase vocoder.
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.data.wav import (
    decode_batch_int16, save_wav_file,
)
from speech_recognition_tpu.infer.submission import list_test_files
from speech_recognition_tpu.ops.stretch import slow_variant_keep_tail


def build_tta_set(test_dir: str, out_dir: str, rate: float = 0.9,
                  batch_size: int = 256, sample_rate: int = 16000,
                  num_samples: int = 16000) -> int:
    """Write slowed copies of every test WAV; returns count."""
    os.makedirs(out_dir, exist_ok=True)
    fns = list_test_files(test_dir)
    for start in range(0, len(fns), batch_size):
        chunk = fns[start:start + batch_size]
        pad = batch_size - len(chunk)
        # legacy 1/32767 scaling to mirror create_tta_set.py:17
        wav = decode_batch_int16(chunk, num_samples).astype(np.float32) \
            / 32767.0
        if pad:
            wav = np.pad(wav, ((0, pad), (0, 0)))
        slowed = np.asarray(
            slow_variant_keep_tail(jnp.asarray(wav), rate, num_samples))
        for i, fn in enumerate(chunk):
            save_wav_file(os.path.join(out_dir, os.path.basename(fn)),
                          np.clip(slowed[i], -1.0, 1.0), sample_rate)
    return len(fns)
