"""CLI integration: train -> submission -> freeze -> edge inference.

Reproduces the reference's full operator workflow (train.py ->
make_submission.py -> freeze_graph.py -> make_submission_on_rpi.py) on a
tiny synthetic corpus via the scripts' main() functions.
"""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from speech_recognition_tpu.data.wav import save_wav_file
from speech_recognition_tpu.labels import get_classes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_corpus(root):
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr) / sr
    freqs = {w: 300 + 150 * i
             for i, w in enumerate(get_classes(wanted_only=True))}
    freqs["cat"] = 2600
    train = root / "train" / "audio"
    for word, f in freqs.items():
        d = train / word
        d.mkdir(parents=True, exist_ok=True)
        for i in range(8):
            tone = rng.uniform(0.3, 0.8) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 6))
            save_wav_file(str(d / f"{word}s{i:02d}_nohash_0.wav"),
                          tone.astype(np.float32), sr)
    bg = train / "_background_noise_"
    bg.mkdir()
    save_wav_file(str(bg / "noise.wav"),
                  rng.normal(0, 0.05, sr * 2).astype(np.float32), sr)
    test = root / "test" / "audio"
    test.mkdir(parents=True)
    for i in range(6):
        f = list(freqs.values())[i % 3]
        save_wav_file(str(test / f"clip_{i:05d}.wav"),
                      (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32),
                      sr)
    return train, test


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # generous bound: each step takes ~60-90 s alone, but the suite may
    # share a single host core with other tests' compile jobs (or with
    # a concurrent TPU calibration run's host-side compiles)
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=1800)


@pytest.mark.slow
def test_full_cli_chain(tmp_path):
    train_dir, test_dir = _build_corpus(tmp_path)
    r = _run([f"{REPO}/scripts/train.py",
              "--data_dirs", str(train_dir),
              "--model", "conv_2d_fast",
              "--output_representation", "mfcc",
              "--num_log_mel_features", "40",
              "--epochs", "1", "--batch_size", "8",
              "--experiment", "it",
              "--silence_percentage", "10",
              "--unknown_percentage", "20",
              "--validation_percentage", "25"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    best = open(tmp_path / "checkpoints_it" / "BEST").read().strip()
    assert os.path.isdir(best)

    r = _run([f"{REPO}/scripts/make_submission.py",
              "--checkpoint", best,
              "--model", "conv_2d_fast",
              "--output_representation", "mfcc",
              "--num_log_mel_features", "40",
              "--window_size_ms", "30", "--window_stride_ms", "10",
              "--test_dir", str(test_dir),
              "--out_prefix", str(tmp_path / "sub"),
              "--wanted_only", "--batch_size", "4"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "sub.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6
    assert all(set(r) == {"fname", "label"} for r in rows)

    frozen = str(tmp_path / "frozen.jaxexport")
    r = _run([f"{REPO}/scripts/freeze.py",
              "--checkpoint_path", best,
              "--model", "conv_2d_fast",
              "--output_representation", "mfcc",
              "--num_log_mel_features", "40",
              "--wanted_only",
              "--frozen_path", frozen], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(frozen) > 1000

    r = _run([f"{REPO}/scripts/run_edge_inference.py",
              "--frozen_graph", frozen,
              "--test_data", str(test_dir),
              "--submission_fn", str(tmp_path / "rpi.csv"),
              "--benchmark"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "rpi.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6
    # --benchmark emits one benchmark_model-style JSON report line
    # (reference README.md:146-157)
    report = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["clips"] == 6
    assert report["artifact_bytes"] == os.path.getsize(frozen)
    assert report["avg_ms_per_sample"] > 0
    # peak-memory rows (VERDICT r4 item 5): process high-water mark is
    # always present; device_peak_bytes only where the backend exposes
    # allocator stats (TPU — not the CPU backend CI runs on)
    assert report["max_rss_bytes"] > 0

    # --- distillation loop (reference README.md:98-135):
    # ensemble probs -> threshold pseudo-labels -> retrain with mixing.
    # The 1-epoch model's confidence is arbitrary, so the test thresholds
    # at 0.08 < 1/12 (a 12-class softmax max is always >= 1/12, and the
    # uint8 quantization floor round(255/12)/255 = 0.0824 still clears
    # it) and groups silence 1-per-WAV: every clip deterministically
    # yields an output file, making this exercise plumbing, not luck.
    pseudo_dir = tmp_path / "pseudo"
    r = _run([f"{REPO}/scripts/pseudo_labels.py", "threshold",
              "--submission_csv", str(tmp_path / "sub.csv"),
              "--memmap", str(tmp_path / "sub_probs.uint8.memmap"),
              "--test_dir", str(test_dir),
              "--out_dir", str(pseudo_dir),
              "--prob_thresh", "0.08",
              "--silence_group", "1"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "pseudo labels created" in r.stdout
    copied = [f for d in pseudo_dir.iterdir() if d.is_dir()
              for f in os.listdir(d)]
    assert copied, "threshold pseudo-labeling copied nothing"

    r = _run([f"{REPO}/scripts/train.py",
              "--data_dirs", str(train_dir), str(pseudo_dir),
              "--model", "conv_2d_fast",
              "--output_representation", "mfcc",
              "--num_log_mel_features", "40",
              "--epochs", "1", "--batch_size", "8",
              "--experiment", "it2",
              "--pseudo_frequency", "0.5",
              "--silence_percentage", "10",
              "--unknown_percentage", "20",
              "--validation_percentage", "25"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    # pseudo partition was discovered (clips without _nohash_ -> pseudo)
    assert "pseudo" in r.stdout.lower()
