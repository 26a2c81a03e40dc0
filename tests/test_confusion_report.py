"""ConfusionReport file output (parity: callbacks.py dual text reports)."""

import os

import numpy as np

from speech_recognition_tpu.train.metrics import ConfusionReport


def test_confusion_report_files(tmp_path):
    int2label = {0: "_silence_", 1: "_unknown_", 2: "stop", 3: "cat"}
    wanted = ["_silence_", "_unknown_", "stop"]
    report = ConfusionReport(int2label=int2label, wanted_words=wanted,
                             all_words=list(int2label.values()),
                             out_dir=str(tmp_path))
    conf = np.array([[5, 0, 0, 0],
                     [1, 3, 0, 0],
                     [0, 0, 4, 1],
                     [0, 1, 0, 2]], np.int64)
    logs = report.write(epoch=0, conf=conf, val_loss=0.5)
    assert abs(logs["val_categorical_accuracy"] - 14 / 17) < 1e-9
    assert logs["val_loss"] == 0.5
    assert 0 < logs["val_mean_categorical_accuracy_wanted"] <= 1
    all_txt = open(tmp_path / "confusion_matrix.txt").read()
    wanted_txt = open(tmp_path / "wanted_confusion_matrix.txt").read()
    assert "val_categorical_accuracy" in all_txt
    assert any(line.startswith("cat") for line in all_txt.splitlines())
    # 'cat' row collapsed into _unknown_ in the wanted view
    assert not any(line.startswith("cat")
                   for line in wanted_txt.splitlines())
    assert "_unknown_" in wanted_txt
    # appends across epochs (callbacks.py appends per epoch)
    report.write(epoch=1, conf=conf, val_loss=0.4)
    assert open(tmp_path / "confusion_matrix.txt").read().count(
        "val_categorical_accuracy") == 2
