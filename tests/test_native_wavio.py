"""Native C++ batch decoder parity with the numpy codec."""

import os
import subprocess

import numpy as np
import pytest

from speech_recognition_tpu.data import wav as wavmod

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "speech_recognition_tpu", "native")


def _ensure_built():
    subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True,
                   check=False)
    return os.path.exists(os.path.join(NATIVE_DIR, "libwavio.so"))


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_native_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    lengths = [100, 16000, 20000]  # pad, exact, crop
    for i, n in enumerate(lengths):
        p = str(tmp_path / f"{i}.wav")
        wavmod.save_wav_file(p, rng.uniform(-0.9, 0.9, n), 16000)
        paths.append(p)
    # force native
    lib = wavmod._native_lib()
    assert lib is not None
    native = wavmod.decode_batch_int16(paths, 16000)
    # numpy reference path
    ref = np.zeros((3, 16000), np.int16)
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            ref[i] = wavmod.decode_wav_to_int16(f.read(), 16000)
    np.testing.assert_array_equal(native, ref)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_native_bad_file_raises_with_filename(tmp_path):
    """A corrupt file in a native batch raises a descriptive ValueError
    (the native decoder marks it -1; the numpy retry names the file) —
    never a silent zero row (tests/test_wav_robustness.py has the full
    malformed-input matrix)."""
    good = str(tmp_path / "good.wav")
    wavmod.save_wav_file(good, np.full(10, 0.5), 16000)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")
    import pytest
    with pytest.raises(ValueError, match="bad.wav"):
        wavmod.decode_batch_int16([bad, good], 100)
