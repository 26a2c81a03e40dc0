"""Submission generation + probability exchange formats.

Parity with make_submission.py:34-213 and the team ensemble formats:
  * wanted-label CSV / all-label CSV / all-probability CSV
    (make_submission.py:198-212)
  * uint8 memmap probabilities, shape (N, 12), values prob*255
    truncated to uint8 exactly like the reference's memmap assignment
    (convert_from_see_v3_bugfix.py:107-110; byte-parity pinned by
    tests/test_reference_differential_tools.py)
  * Pi-style batch-1 CSV from the AOT artifact lives in export/.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from speech_recognition_tpu.data.wav import decode_batch_int16
from speech_recognition_tpu.labels import (
    map_to_valid, map_to_wanted, prepare_words_list, get_classes,
)

# Heng's 12-class submission order (create_pseudo_with_thresh.py:10-11)
AUDIO_NAMES = ["silence", "unknown", "yes", "no", "up", "down",
               "left", "right", "on", "off", "stop", "go"]


def list_test_files(test_dir: str) -> List[str]:
    """Sorted test WAVs (make_submission.py:35)."""
    return sorted(glob.glob(os.path.join(test_dir, "*.wav")))


def predict_directory(predictor, variables, test_dir: str,
                      batch_size: int = 384,
                      tta_dir: Optional[str] = None,
                      desired_samples: int = 16000,
                      progress: bool = False):
    """Run TTA inference over a directory of WAVs.

    Returns (basenames, probs [N, C]). The tail partial batch is padded to
    a full batch for a single compiled shape, then trimmed (the reference
    re-runs a ragged batch instead, make_submission.py:160-196).

    The host decode (native multithreaded WAV codec) is pipelined one
    batch ahead of the device, and device->host transfers are deferred to
    the end, so disk/decode, TPU compute, and readback all overlap — the
    reference's loop serializes per-file session decode with GPU predict
    (make_submission.py:86-144).
    """
    fns = list_test_files(test_dir)
    tta_fns = None
    if tta_dir is not None:
        tta_fns = [os.path.join(tta_dir, os.path.basename(f)) for f in fns]
    n = len(fns)
    starts = list(range(0, n, batch_size))

    import jax

    def decode_chunk(start):
        # packed int16 all the way to the device: the 1/32768 decode runs
        # in the predictor's XLA program (half the host->device bytes),
        # and the upload starts on this worker thread (device_put is
        # async) so transfer overlaps the previous batch's compute
        chunk = fns[start:start + batch_size]
        pad = batch_size - len(chunk)
        wav = decode_batch_int16(chunk, desired_samples)
        if pad:
            wav = np.pad(wav, ((0, pad), (0, 0)))
        slow = None
        if tta_fns is not None:
            slow_chunk = tta_fns[start:start + batch_size]
            slow = decode_batch_int16(slow_chunk, desired_samples)
            if pad:
                slow = np.pad(slow, ((0, pad), (0, 0)))
            slow = jax.device_put(slow)
        return jax.device_put(wav), slow, pad

    from concurrent.futures import ThreadPoolExecutor
    pending = []  # (device probs, pad) — converted after the loop
    with ThreadPoolExecutor(max_workers=1) as ex:
        depth = 2  # decode runs at most `depth` batches ahead
        futures = [ex.submit(decode_chunk, s) for s in starts[:depth]]
        for i, start in enumerate(starts):
            wav, slow, pad = futures[i].result()
            if i + depth < len(starts):
                futures.append(ex.submit(decode_chunk, starts[i + depth]))
            # async dispatch: the device computes while the pool decodes.
            # Bounded in-flight depth: without it a fast host could
            # enqueue hundreds of batches whose int16 inputs (~12 MB
            # each at batch 384) stay live in HBM until executed.
            probs = predictor.predict(variables, wav, slow)
            pending.append((probs, pad))
            if i >= 8:
                # convert the 8-batches-ago result (small: batch x
                # classes) — a real completion barrier; on platforms
                # where block_until_ready does not wait for remote
                # execution (export/benchmark.py) only a readback
                # bounds the in-flight queue
                pending[i - 8] = (np.asarray(pending[i - 8][0]),
                                  pending[i - 8][1])
            if progress:
                print(f"  {min(start + batch_size, n)}/{n}")
    all_probs = []
    for probs, pad in pending:
        probs = np.asarray(probs)
        all_probs.append(probs[:-pad] if pad else probs)
    basenames = [os.path.basename(f) for f in fns]
    return basenames, (np.concatenate(all_probs, axis=0)
                       if all_probs else np.zeros((0, 0)))


def write_submission_csvs(prefix: str, basenames: Sequence[str],
                          probs: np.ndarray, int2label: Dict[int, str],
                          wanted_words: Optional[Sequence[str]] = None,
                          ) -> Dict[str, str]:
    """Write the three reference CSVs (make_submission.py:198-212).

    Returns {kind: path}. ``prefix`` is a path prefix without extension.
    """
    if wanted_words is None:
        wanted_words = prepare_words_list(get_classes(wanted_only=True))
    preds = probs.argmax(axis=-1)
    labels_all = [map_to_valid(int2label[int(p)]) for p in preds]
    labels_wanted = [map_to_wanted(l, list(wanted_words))
                     for l in labels_all]
    paths = {}

    paths["wanted"] = f"{prefix}.csv"
    with open(paths["wanted"], "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fname", "label"])
        w.writerows(zip(basenames, labels_wanted))

    paths["all"] = f"{prefix}_all_labels.csv"
    with open(paths["all"], "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fname", "label"])
        w.writerows(zip(basenames, labels_all))

    paths["probs"] = f"{prefix}_all_labels_probs.csv"
    with open(paths["probs"], "w", newline="") as f:
        w = csv.writer(f)
        class_names = [int2label[i] for i in range(probs.shape[1])]
        w.writerow(["fname", "label"] + class_names)
        for bn, lab, row in zip(basenames, labels_all, probs):
            w.writerow([bn, lab] + [repr(float(v)) for v in row])
    return paths


def to_audio_names_order(probs: np.ndarray,
                         int2label: Dict[int, str]) -> np.ndarray:
    """Reorder model-order [N, 12] probabilities into the AUDIO_NAMES
    uint8-memmap exchange order.

    The 12-class MODEL order follows the reference's wanted-word list
    ('stop down off right up go on yes left no', classes.py:7), which
    is NOT the exchange order Heng's tools use (AUDIO_NAMES,
    create_pseudo_with_thresh.py:10-11) — only silence/unknown/'on'
    coincide. Writing a memmap without this reorder silently permutes
    every downstream consumer's labels (pseudo threshold, blending);
    found end-to-end when a 99.3%-accurate teacher produced
    25.7%-accurate pseudo labels.
    """
    model_labels = [map_to_valid(int2label[i])
                    for i in range(probs.shape[1])]
    idx = [model_labels.index(name) for name in AUDIO_NAMES]
    return probs[:, idx]


def write_uint8_memmap(path: str, probs: np.ndarray) -> None:
    """Team probability exchange format: uint8 memmap of prob*255
    (convert_from_see_v3_bugfix.py:107-110). Columns MUST already be in
    AUDIO_NAMES order — reorder model outputs with
    ``to_audio_names_order`` first."""
    mm = np.memmap(path, dtype="uint8", mode="w+", shape=probs.shape)
    mm[...] = (probs * 255).astype(np.uint8)
    mm.flush()


def read_uint8_memmap(path: str, num_rows: int,
                      num_classes: int = 12) -> np.ndarray:
    """Read back to float probabilities in [0, 1]
    (create_pseudo_with_thresh.py:15-18)."""
    mm = np.memmap(path, dtype="uint8", mode="r",
                   shape=(num_rows, num_classes))
    return np.asarray(mm, dtype=np.float32) / 255.0
