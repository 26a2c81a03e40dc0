"""Malformed-WAV robustness: native C++ decoder vs numpy decoder.

The data layer ingests tens of thousands of on-disk files (and, in the
pseudo-label workflow, files written by other tools); a corrupt or
truncated file must surface a clear error — never crash the process or
silently become a zero clip (reference behavior: TF decode_wav raises).
"""

import os
import struct

import numpy as np
import pytest

from speech_recognition_tpu.data.wav import (
    decode_batch_int16, decode_wav_bytes, save_wav_file,
)
from speech_recognition_tpu.data.wav import _native_lib


def _valid_wav_bytes(n=64, rate=16000, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-3000, 3000, n * channels).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * channels * 2, channels * 2, 16)
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    return hdr + fmt + data


CORRUPT_CASES = {
    "empty": b"",
    "random_bytes": bytes(np.random.default_rng(1).integers(
        0, 256, 200).astype(np.uint8)),
    "riff_only": b"RIFF\x00\x00\x00\x00WAVE",
    "no_data_chunk": _valid_wav_bytes()[:20],
    "bad_magic": b"XIFF" + _valid_wav_bytes()[4:],
    "float_format": _valid_wav_bytes().replace(
        struct.pack("<IHH", 16, 1, 1), struct.pack("<IHH", 16, 3, 1), 1),
    "chunk_size_overflow": (b"RIFF\xff\xff\xff\xffWAVE"
                            b"junk" + struct.pack("<I", 0xFFFFFFF0)),
}


@pytest.mark.parametrize("name", sorted(CORRUPT_CASES))
def test_numpy_decoder_raises_on_corrupt(name):
    with pytest.raises(ValueError):
        decode_wav_bytes(CORRUPT_CASES[name], desired_samples=64)


@pytest.mark.parametrize("name", sorted(CORRUPT_CASES))
def test_batch_decode_corrupt_file_raises(tmp_path, name):
    """A corrupt file in a batch raises a descriptive error naming the
    file — on the native path (which marks it -1 and retries via numpy)
    and the numpy fallback alike."""
    good = tmp_path / "good.wav"
    good.write_bytes(_valid_wav_bytes())
    bad = tmp_path / "bad.wav"
    bad.write_bytes(CORRUPT_CASES[name])
    with pytest.raises(ValueError):
        decode_batch_int16([str(good), str(bad)], desired_samples=64)


def test_batch_decode_truncated_data_chunk(tmp_path):
    """data chunk claims more bytes than the file holds: both decoders
    clamp to what exists (TF decode_wav also tolerates this) and agree."""
    full = _valid_wav_bytes(n=64)
    truncated = full[:-40]  # drop 20 samples off the tail
    p = tmp_path / "trunc.wav"
    p.write_bytes(truncated)
    got = decode_batch_int16([str(p)], desired_samples=64)[0]
    want = np.frombuffer(full[44:44 + 128], dtype="<i2")[:44]
    np.testing.assert_array_equal(got[:44], want)
    np.testing.assert_array_equal(got[44:], np.zeros(20, np.int16))


def test_batch_decode_native_and_numpy_agree(tmp_path):
    """Valid files incl. stereo and odd-sized chunks decode identically
    through the native decoder and the pure-numpy parser."""
    lib = _native_lib()
    if lib is None:
        pytest.skip("native decoder not built")
    paths = []
    p1 = tmp_path / "mono.wav"
    p1.write_bytes(_valid_wav_bytes(n=100, seed=2))
    paths.append(str(p1))
    p2 = tmp_path / "stereo.wav"
    p2.write_bytes(_valid_wav_bytes(n=50, channels=2, seed=3))
    paths.append(str(p2))
    # odd-length data chunk (trailing pad byte)
    odd = _valid_wav_bytes(n=33, seed=4)
    p3 = tmp_path / "odd.wav"
    p3.write_bytes(odd + b"\x00")
    paths.append(str(p3))

    native = decode_batch_int16(paths, desired_samples=64)
    from speech_recognition_tpu.data.wav import decode_wav_to_int16
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            want = decode_wav_to_int16(f.read(), 64)
        np.testing.assert_array_equal(native[i], want, err_msg=p)


def test_partial_trailing_frame_truncated(tmp_path):
    """Multichannel data whose byte count is not a multiple of the
    frame size: decode_wav counts complete frames only — both decoders
    must drop the trailing partial frame (fuzzing found the numpy
    parser keeping its first sample)."""
    from speech_recognition_tpu.data.wav import decode_wav_to_int16
    # 7 int16 values as "stereo" = 3 complete frames + 1 orphan sample
    pcm = np.arange(1, 8, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000,
                                16000 * 4, 4, 16)
    data = hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    got = decode_wav_to_int16(data, 5)
    np.testing.assert_array_equal(got, np.array([1, 3, 5, 0, 0],
                                                np.int16))
    p = tmp_path / "partial.wav"
    p.write_bytes(data)
    native = decode_batch_int16([str(p)], desired_samples=5)[0]
    np.testing.assert_array_equal(native, got)
