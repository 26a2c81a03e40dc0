"""Probability blending ensembler."""

import numpy as np

from speech_recognition_tpu.infer.submission import write_uint8_memmap
from speech_recognition_tpu.tools.blend import blend_memmaps, blend_probs
from speech_recognition_tpu.tools.pseudo import read_submission_csv


def test_blend_probs_modes():
    a = np.array([[0.8, 0.2], [0.4, 0.6]], np.float32)
    b = np.array([[0.6, 0.4], [0.2, 0.8]], np.float32)
    arith = blend_probs([a, b])
    np.testing.assert_allclose(arith, [[0.7, 0.3], [0.3, 0.7]], atol=1e-6)
    geo = blend_probs([a, b], mode="geometric")
    np.testing.assert_allclose(geo.sum(1), 1.0, atol=1e-6)
    # weights shift the blend toward the heavier model
    weighted = blend_probs([a, b], weights=[3.0, 1.0])
    assert weighted[0, 0] > arith[0, 0]


def test_blend_memmaps_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    n = 10
    fnames = [f"clip_{i}.wav" for i in range(n)]
    paths = []
    for k in range(3):
        p = rng.dirichlet(np.ones(12), size=n).astype(np.float32)
        path = str(tmp_path / f"m{k}.memmap")
        write_uint8_memmap(path, p)
        paths.append(path)
    out_csv = str(tmp_path / "blend.csv")
    out_mm = str(tmp_path / "blend.memmap")
    labels, probs = blend_memmaps(paths, fnames, out_csv, out_mm)
    assert len(labels) == n and probs.shape == (n, 12)
    got_fnames, got_labels = read_submission_csv(out_csv)
    assert got_fnames == fnames and got_labels == labels
    import os
    assert os.path.getsize(out_mm) == n * 12
