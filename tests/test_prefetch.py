"""Host streaming prefetch loader."""

import numpy as np

from speech_recognition_tpu.data.prefetch import HostPrefetchLoader
from speech_recognition_tpu.data.wav import save_wav_file


def test_prefetch_loader_yields_batches(tmp_path):
    paths = []
    for i in range(10):
        p = str(tmp_path / f"{i}.wav")
        save_wav_file(p, np.full(100, (i + 1) / 20.0, np.float32), 16000)
        paths.append(p)
    labels = np.arange(10, dtype=np.int32) % 3
    silence = labels == 0
    with HostPrefetchLoader(paths, labels, silence, batch_size=4,
                            desired_samples=200, seed=1) as loader:
        for _ in range(3):
            wav, lab, sil = next(loader)
            assert wav.shape == (4, 200)
            # wire format is raw int16 (half the link bytes of f32);
            # the 1/32768 scale runs on-device in _stream_step
            assert wav.dtype == np.int16
            assert lab.shape == (4,) and sil.shape == (4,)
            w = np.asarray(wav)
            assert (np.abs(w[:, :100]) > 0).any()
            assert (w[:, 100:] == 0).all()


def test_prefetch_producer_error_propagates(tmp_path):
    """A corrupt file (or any producer failure) must surface in
    __next__ as an error naming the cause — never a silent hang."""
    import pytest
    good = str(tmp_path / "good.wav")
    save_wav_file(good, np.full(100, 0.5, np.float32), 16000)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav")
    labels = np.zeros(2, np.int32)
    with HostPrefetchLoader([bad, good], labels, labels == 1,
                            batch_size=4, desired_samples=200,
                            seed=0) as loader:
        with pytest.raises(RuntimeError, match="producer"):
            # a few pulls: the first batches may predate the bad draw
            for _ in range(50):
                next(loader)
