"""Threshold-based pseudo labels incl. the silence-concat quirk
(create_pseudo_with_thresh.py:29-66)."""

import os

import numpy as np

from speech_recognition_tpu.data.wav import load_wav_file, save_wav_file
from speech_recognition_tpu.infer.submission import AUDIO_NAMES
from speech_recognition_tpu.tools.pseudo import pseudo_by_threshold


def test_threshold_pseudo_labels(tmp_path):
    rng = np.random.default_rng(0)
    test_dir = tmp_path / "test_audio"
    test_dir.mkdir()
    n = 12
    fnames = []
    probs = np.zeros((n, 12), np.float32)
    # 4 confident 'stop' clips, 6 confident 'silence', 2 low-confidence
    for i in range(n):
        fn = f"clip_{i:03d}.wav"
        fnames.append(fn)
        save_wav_file(str(test_dir / fn),
                      rng.uniform(-0.1, 0.1, 1600), 16000)
        if i < 4:
            probs[i, AUDIO_NAMES.index("stop")] = 0.95
        elif i < 10:
            probs[i, AUDIO_NAMES.index("silence")] = 0.9
        else:
            probs[i, AUDIO_NAMES.index("go")] = 0.5  # below threshold
        probs[i] += (1 - probs[i].sum()) / 12
    out = tmp_path / "pseudo"
    stats = pseudo_by_threshold(
        fnames, probs, str(test_dir), str(out), prob_thresh=0.7,
        silence_group=3, silence_gain=1.0 / 0.35)
    # 4 word copies + 2 silence groups (6 clips / 3)
    assert stats["created"] == 4 + 2
    assert stats["low_prob"] == 2
    assert sorted(os.listdir(out / "stop")) == [f"clip_{i:03d}.wav"
                                                for i in range(4)]
    bg = sorted(os.listdir(out / "_background_noise_"))
    assert bg == ["custom_silence_000001.wav", "custom_silence_000002.wav"]
    # concatenated (3 clips x 1600 samples) and amplified by /0.35
    w = load_wav_file(str(out / "_background_noise_" / bg[0]))
    assert w.shape == (4800,)
    assert np.abs(w).max() > 0.1  # amplified above the 0.1 input ceiling
