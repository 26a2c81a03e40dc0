"""Pseudo-partition flow: a second data dir of pseudo-labeled clips
(no ``_nohash_`` in names, like data/heng_pseudo) lands in the pseudo
partition and mixes into training draws at pseudo_frequency
(input_data.py:85-95,463-465; train.py:27-30)."""

import jax
import numpy as np

from speech_recognition_tpu.config import prepare_model_settings
from speech_recognition_tpu.data.device_bank import build_device_dataset
from speech_recognition_tpu.data.index import build_dataset_index
from speech_recognition_tpu.data.wav import save_wav_file


def test_pseudo_dir_partition_and_mixing(tmp_path):
    rng = np.random.default_rng(0)
    main = tmp_path / "main"
    pseudo = tmp_path / "heng_pseudo"
    for word in ("stop", "go"):
        d = main / word
        d.mkdir(parents=True)
        for i in range(20):
            save_wav_file(str(d / f"{word}{i:03d}_nohash_0.wav"),
                          rng.uniform(-0.2, 0.2, 1600), 16000)
        dp = pseudo / word
        dp.mkdir(parents=True)
        for i in range(10):
            # test-set style names, no _nohash_ -> pseudo partition
            save_wav_file(str(dp / f"clip_{word}_{i:05d}.wav"),
                          rng.uniform(-0.2, 0.2, 1600), 16000)

    settings = prepare_model_settings(
        label_count=4, output_representation="raw")
    index = build_dataset_index(
        data_dirs=[str(main), str(pseudo)],
        silence_percentage=0.0, unknown_percentage=0.0,
        wanted_words=["stop", "go"],
        validation_percentage=0.0, testing_percentage=0.0)
    assert index.set_size("pseudo") == 20
    assert index.set_size("training") == 40
    # pseudo entries carry their word labels
    labels = index.labels_array("pseudo")
    assert set(labels.tolist()) == {2, 3}

    ds = build_device_dataset(index, settings)
    # file_ids drawn with pseudo_frequency=1.0 come only from pseudo rows
    fids, _, _ = ds.sample_train_ids(jax.random.PRNGKey(0), 256,
                                     pseudo_frequency=1.0)
    pseudo_rows = set(np.asarray(ds.partitions["pseudo"].file_ids).tolist())
    assert set(np.asarray(fids).tolist()) <= pseudo_rows
    # and with 0.0, never from pseudo-only rows
    fids0, _, _ = ds.sample_train_ids(jax.random.PRNGKey(1), 256,
                                      pseudo_frequency=0.0)
    train_rows = set(np.asarray(
        ds.partitions["training"].file_ids).tolist())
    assert set(np.asarray(fids0).tolist()) <= train_rows
