"""docs/RECIPES.md is executable documentation: this test extracts its
fenced bash blocks and runs them VERBATIM (tiny knob overrides only) on
a synthetic tree shaped exactly like the Kaggle download — 30 word dirs
+ ``_background_noise_`` under ``train/audio``, a flat ``test/audio``
— proving the documented setup/210/106/195 command chains run end to
end (VERDICT r3 item 8: keep the real-data path turnkey).

Chain: setup verification -> 210 (12-class flagship -> TTA submission)
-> 106 (noise + agreement pseudo -> 32-class -> submission -> 32->12
convert) -> 195 (threshold pseudo -> edge train -> int8 freeze ->
batch-1 edge submission). The 210 run's outputs stand in for the three
agreement submissions (106) and the ensemble exchange files (195), the
same substitution the doc describes for a from-scratch reproduction.
"""

import csv
import os
import re
import subprocess

import numpy as np
import pytest

from speech_recognition_tpu.data.wav import save_wav_file
from speech_recognition_tpu.labels import get_classes
from synth_corpus import SR, _word_signal_n, build_corpus_words

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "RECIPES.md")


def _blocks():
    text = open(DOC).read()
    found = dict(re.findall(
        r"<!-- recipe:(\w+) -->\n```bash\n(.*?)```", text, re.S))
    assert set(found) == {"setup", "210", "106", "195"}, sorted(found)
    return found


def _kaggle_tree(root):
    """Kaggle layout: train/audio/<30 words>/ + _background_noise_,
    flat test/audio."""
    words = get_classes(wanted_only=False)
    assert len(words) == 30
    train = root / "train" / "audio"
    build_corpus_words(train, words, clips_per_word=4, seed=7)
    test = root / "test" / "audio"
    test.mkdir(parents=True)
    rng = np.random.default_rng(11)
    for i in range(24):
        sig = _word_signal_n(i % len(words), len(words), rng)
        save_wav_file(str(test / f"clip_{i:05d}.wav"), sig, SR)
    return root


def _run_block(block, workdir, env_overrides):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               **{k: str(v) for k, v in env_overrides.items()})
    env.pop("XLA_FLAGS", None)  # single CPU device: these are CLI runs
    r = subprocess.run(["bash", "-euo", "pipefail", "-c", block],
                       cwd=str(workdir), env=env, capture_output=True,
                       text=True, timeout=2400)
    assert r.returncode == 0, (
        f"block failed\n--- stdout ---\n{r.stdout[-3000:]}"
        f"\n--- stderr ---\n{r.stderr[-3000:]}")
    return r


@pytest.mark.slow
def test_recipes_doc_chain(tmp_path):
    blocks = _blocks()
    data_root = _kaggle_tree(tmp_path / "data")
    work = tmp_path / "work"
    work.mkdir()
    # scripts/ is referenced repo-relative in the doc; PYTHONPATH above
    # supplies the package for the symlinked copies
    os.symlink(os.path.join(REPO, "scripts"), work / "scripts")
    tiny = {
        "DATA_ROOT": data_root,
        "EPOCHS": 1, "BATCH": 8,
        "SILENCE_PCT": 10.0, "UNKNOWN_PCT": 20.0, "VAL_PCT": 25.0,
    }

    r = _run_block(blocks["setup"], work, tiny)
    # tiny counts print UNEXPECTED but the tree itself must verify
    assert "missing" not in r.stdout

    _run_block(blocks["210"], work, tiny)
    sub = work / "submission_210_tta_leftloud.csv"
    with open(sub) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 24 and set(rows[0]) == {"fname", "label"}
    all_labels = str(work / "submission_210_tta_leftloud_all_labels.csv")
    assert os.path.exists(all_labels)

    _run_block(blocks["106"], work, dict(
        tiny, SUB_A=all_labels, SUB_B=all_labels, SUB_C=all_labels))
    # colored noise landed in the background dir (generate_noise.py)
    bg = os.listdir(data_root / "train" / "audio" / "_background_noise_")
    assert any(c in f for f in bg
               for c in ("white", "pink", "blue", "brown", "violet"))
    with open(work / "REPR_submission_106_tta_leftloud.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 24
    mm = work / "submission_106_tta_leftloud_all_labels_probs.uint8.memmap"
    assert mm.stat().st_size == 24 * 12  # converted 32->12 uint8 rows

    _run_block(blocks["195"], work, dict(
        tiny,
        ENSEMBLE_CSV=str(sub),
        ENSEMBLE_MM=str(work / "submission_210_tta_leftloud_probs"
                        ".uint8.memmap"),
        # the 1-epoch stand-in teacher is barely confident; the uint8
        # floor round(255/12)/255=0.0824 always clears 0.08, making the
        # pseudo copy deterministic (production default stays 0.7)
        PROB_THRESH=0.08))
    with open(work / "rpi_submission_195.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 24
    frozen = work / "tf_files" / "frozen_195.jaxexport"
    assert frozen.stat().st_size > 1000
