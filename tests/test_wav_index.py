"""L1 tests: WAV codec golden bytes, SHA1 split stability, index building."""

import numpy as np
import pytest

from speech_recognition_tpu.data import wav as wavmod
from speech_recognition_tpu.data.index import (
    build_dataset_index, which_set,
)


def _make_wav(samples_i16, sample_rate=16000, channels=1):
    import struct
    raw = np.asarray(samples_i16, dtype="<i2").tobytes()
    header = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                sample_rate * 2 * channels, 2 * channels, 16)
    return header + fmt + b"data" + struct.pack("<I", len(raw)) + raw


def test_decode_scale_is_1_over_32768():
    data = _make_wav([0, 16384, -32768, 32767])
    audio, sr = wavmod.decode_wav_bytes(data)
    assert sr == 16000
    np.testing.assert_allclose(
        audio, [0.0, 0.5, -1.0, 32767.0 / 32768.0], rtol=0, atol=0)


def test_decode_pad_and_crop():
    data = _make_wav([100, 200, 300])
    audio, _ = wavmod.decode_wav_bytes(data, desired_samples=5)
    assert audio.shape == (5,)
    assert audio[3] == 0.0 and audio[4] == 0.0
    audio, _ = wavmod.decode_wav_bytes(data, desired_samples=2)
    assert audio.shape == (2,)
    np.testing.assert_allclose(audio * 32768.0, [100.0, 200.0])


def test_decode_multichannel_takes_first():
    interleaved = [10, -10, 20, -20, 30, -30]
    data = _make_wav(interleaved, channels=2)
    audio, _ = wavmod.decode_wav_bytes(data)
    np.testing.assert_allclose(audio * 32768.0, [10.0, 20.0, 30.0])


def test_encode_decode_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, size=1000).astype(np.float32)
    p = tmp_path / "x.wav"
    wavmod.save_wav_file(str(p), x, 16000)
    y = wavmod.load_wav_file(str(p))
    assert y.shape == (1000,)
    # error bound: 0.5 LSB quantization + the deliberate 32767-encode /
    # 32768-decode scale asymmetry (~3e-5 relative)
    assert np.max(np.abs(y - x)) < 1.0 / 16000


def test_decode_batch_fallback(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"{i}.wav"
        wavmod.save_wav_file(str(p), np.full(100, 0.25, np.float32), 16000)
        paths.append(str(p))
    out = wavmod.decode_batch_int16(paths, desired_samples=160)
    assert out.shape == (3, 160)
    assert out.dtype == np.int16
    assert (out[:, 100:] == 0).all()
    assert np.all(np.abs(out[:, :100].astype(np.int32) - 8192) <= 1)


# Golden file->partition pairs. Verified against the reference SHA1 rule:
# sha1(basename up to '_nohash_') % 2**27 scaled to [0, 100).
GOLDEN_SPLITS = [
    ("data/train/audio/yes/0a7c2a8d_nohash_0.wav", "training"),
    ("data/train/audio/yes/0a7c2a8d_nohash_7.wav", "training"),
    ("data/train/audio/no/0b40aa8e_nohash_0.wav", "training"),
    ("data/train/audio/unknown_unknown/anything.wav", "training"),
    ("data/heng_pseudo/yes/clip_000001.wav", "pseudo"),
]


def test_which_set_golden_and_rules():
    for path, expected in GOLDEN_SPLITS:
        assert which_set(path, 10.0, 0.0) == expected
    # speaker grouping: suffix after _nohash_ never changes the partition
    for suffix in range(10):
        a = which_set(f"x/word/spkr_nohash_{suffix}.wav", 10.0, 10.0)
        assert a == which_set("x/word/spkr_nohash_0.wav", 10.0, 10.0)


def test_which_set_percentage_boundaries():
    import hashlib
    name = "data/x/word/someone_nohash_1.wav"
    h = hashlib.sha1(b"someone").hexdigest()
    pct = (int(h, 16) % (2 ** 27)) * (100.0 / (2 ** 27 - 1))
    assert which_set(name, pct + 0.01, 0.0) == "validation"
    assert which_set(name, 0.0, pct + 0.01) == "testing"
    assert which_set(name, 0.0, 0.0) == "training"


def _fake_dataset(tmp_path, wanted=("stop", "go"), n_per=30, unknown=("cat",)):
    files = []
    for word in list(wanted) + list(unknown):
        d = tmp_path / word
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per):
            p = d / f"spk{i:04d}_nohash_0.wav"
            wavmod.save_wav_file(str(p), np.zeros(100, np.float32), 16000)
            files.append(str(p))
    return files


def test_build_index_structure(tmp_path):
    _fake_dataset(tmp_path)
    idx = build_dataset_index(
        data_dirs=[str(tmp_path)], silence_percentage=10.0,
        unknown_percentage=10.0, wanted_words=["stop", "go"],
        validation_percentage=20.0, testing_percentage=0.0)
    total = sum(idx.set_size(p) for p in ("training", "validation",
                                          "testing", "pseudo"))
    assert total > 60  # 60 wanted + silence + unknowns
    # silence & unknown present in training
    tr_labels = [e.label for e in idx.data_index["training"]]
    assert "_silence_" in tr_labels
    assert "cat" in tr_labels
    assert idx.word_to_index["cat"] == 1
    assert idx.word_to_index["stop"] == 2
    assert idx.word_to_index["go"] == 3
    # deterministic: same seed -> same order
    idx2 = build_dataset_index(
        data_dirs=[str(tmp_path)], silence_percentage=10.0,
        unknown_percentage=10.0, wanted_words=["stop", "go"],
        validation_percentage=20.0, testing_percentage=0.0)
    assert idx.files("training") == idx2.files("training")
    assert (idx.labels_array("training") == idx2.labels_array("training")).all()


def test_build_index_missing_wanted_raises(tmp_path):
    _fake_dataset(tmp_path, wanted=("stop",), unknown=())
    with pytest.raises(ValueError):
        build_dataset_index(
            data_dirs=[str(tmp_path)], silence_percentage=10.0,
            unknown_percentage=10.0, wanted_words=["stop", "zzz"],
            validation_percentage=10.0, testing_percentage=0.0)


def test_summary_runs(tmp_path):
    _fake_dataset(tmp_path)
    idx = build_dataset_index(
        data_dirs=[str(tmp_path)], silence_percentage=10.0,
        unknown_percentage=10.0, wanted_words=["stop", "go"],
        validation_percentage=20.0, testing_percentage=0.0)
    s = idx.summary()
    assert "_silence_" in s and "classes" in s
