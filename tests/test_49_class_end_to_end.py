"""49-class path end-to-end (VERDICT r4 item 6).

The reference's 49-class experiment extends the 30 known words with 17
reversed-audio pseudo-classes (classes.py:16-23) — training dirs named
``new_<word-reversed>`` holding time-reversed clips — and maps the
49-wide probabilities back to the 12 competition classes with the
max-unknown + re-softmax head (freeze_graph_32_classes.py:49-69, width-
generalized). This test drives the full operator chain at width 49 on a
synthetic corpus: train --all_words --extend_reversed -> 49-wide
submission -> 49->12 convert tool -> 49->12 mapping head frozen into
the edge artifact -> batch-1 edge submission.
"""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

from speech_recognition_tpu.data.wav import load_wav_file, save_wav_file
from speech_recognition_tpu.labels import get_classes, prepare_words_list
from synth_corpus import SR, _word_signal_n, build_corpus_words

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_49_corpus(root):
    """30 known-word dirs + 17 ``new_*`` dirs of time-reversed clips."""
    words = get_classes(wanted_only=False)
    train = root / "train" / "audio"
    build_corpus_words(train, words, clips_per_word=4, seed=3)
    reversed_classes = [c for c in get_classes(extend_reversed=True)
                        if c.startswith("new_")]
    assert len(reversed_classes) == 17
    for rc in reversed_classes:
        source = rc[len("new_"):][::-1]  # new_owt -> two
        src_dir = train / source
        assert src_dir.is_dir(), f"{rc}: source word {source} missing"
        d = train / rc
        d.mkdir()
        for wav_name in sorted(os.listdir(src_dir)):
            clip = load_wav_file(str(src_dir / wav_name),
                                 desired_samples=SR)
            save_wav_file(str(d / wav_name), clip[::-1].copy(), SR)
    test = root / "test" / "audio"
    test.mkdir(parents=True)
    rng = np.random.default_rng(17)
    for i in range(12):
        sig = _word_signal_n(i % len(words), len(words), rng)
        save_wav_file(str(test / f"clip_{i:05d}.wav"), sig, SR)
    return train, test


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=1800)


@pytest.mark.slow
def test_49_class_cli_chain(tmp_path):
    train_dir, test_dir = _build_49_corpus(tmp_path)
    words_49 = prepare_words_list(get_classes(extend_reversed=True))
    assert len(words_49) == 49

    common = ["--output_representation", "mfcc",
              "--num_log_mel_features", "40",
              "--window_size_ms", "30", "--window_stride_ms", "10"]
    r = _run([f"{REPO}/scripts/train.py",
              "--data_dirs", str(train_dir),
              "--model", "conv_2d_fast", *common,
              "--epochs", "1", "--batch_size", "8",
              "--experiment", "it49",
              "--all_words", "--extend_reversed",
              "--silence_percentage", "10",
              "--unknown_percentage", "20",
              "--validation_percentage", "25"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    best = open(tmp_path / "checkpoints_it49" / "BEST").read().strip()
    assert os.path.isdir(best)

    # 49-wide submission: the all-probs CSV must carry all 49 classes
    r = _run([f"{REPO}/scripts/make_submission.py",
              "--checkpoint", best,
              "--model", "conv_2d_fast", *common,
              "--extend_reversed",
              "--test_dir", str(test_dir),
              "--out_prefix", str(tmp_path / "sub49"),
              "--batch_size", "4"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "sub49_all_labels_probs.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 12
    # reference format (make_submission.py:207-212): fname, label,
    # then one prob column per class — all 49 at this width
    assert set(rows[0]) == {"fname", "label", *words_49}
    # predicted all-labels may include reversed pseudo-classes; the
    # wanted CSV maps them to the 12-class space
    with open(tmp_path / "sub49.csv") as f:
        wanted_rows = list(csv.DictReader(f))
    valid = {c.strip("_") for c in prepare_words_list(
        get_classes(wanted_only=True))} | {"silence", "unknown"}
    assert all(r["label"] in valid for r in wanted_rows)

    # 49 -> 12 conversion tool (convert_from_see_v3_bugfix.py semantics
    # at width 49): uint8 memmap with one 12-wide row per clip
    mm = str(tmp_path / "sub49_probs.uint8.memmap")
    r = _run([f"{REPO}/scripts/pseudo_labels.py", "convert",
              "--probs_csv", str(tmp_path / "sub49_all_labels_probs.csv"),
              "--memmap", mm, "--extend_reversed"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(mm) == 12 * 12
    probs = np.memmap(mm, dtype=np.uint8, mode="r").reshape(12, 12)
    # every row quantized from a re-softmaxed distribution: sums ~255
    assert np.all(np.abs(probs.astype(np.int64).sum(1) - 255) <= 12)

    # freeze with the 49->12 mapping head baked in, then edge-infer
    frozen = str(tmp_path / "frozen49to12.jaxexport")
    r = _run([f"{REPO}/scripts/freeze.py",
              "--checkpoint_path", best,
              "--model", "conv_2d_fast", *common,
              "--extend_reversed", "--map_to_12",
              "--frozen_path", frozen], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run([f"{REPO}/scripts/run_edge_inference.py",
              "--frozen_graph", frozen,
              "--test_data", str(test_dir),
              "--submission_fn", str(tmp_path / "rpi49.csv")],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "rpi49.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 12
    assert all(r["label"] in valid for r in rows)
