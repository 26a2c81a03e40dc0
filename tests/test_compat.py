"""Reference-compatibility facade: AudioProcessor + data_gen."""

import numpy as np

from speech_recognition_tpu.compat import AudioProcessor, data_gen
from speech_recognition_tpu.config import prepare_model_settings
from speech_recognition_tpu.data.wav import save_wav_file


def _corpus(tmp_path):
    rng = np.random.default_rng(0)
    for word in ("stop", "go", "cat"):
        d = tmp_path / word
        d.mkdir(parents=True, exist_ok=True)
        for i in range(20):
            save_wav_file(str(d / f"{word}{i:03d}_nohash_0.wav"),
                          rng.uniform(-0.3, 0.3, 16000), 16000)
    bg = tmp_path / "_background_noise_"
    bg.mkdir()
    save_wav_file(str(bg / "n.wav"), rng.normal(0, 0.05, 48000), 16000)


def test_audio_processor_facade(tmp_path):
    _corpus(tmp_path)
    settings = prepare_model_settings(
        label_count=4, dct_coefficient_count=80, num_log_mel_features=40,
        output_representation="mfcc")
    ap = AudioProcessor(
        data_dirs=[str(tmp_path)], silence_percentage=10.0,
        unknown_percentage=30.0, wanted_words=["stop", "go"],
        validation_percentage=30.0, testing_percentage=0.0,
        model_settings=settings, output_representation="mfcc")
    assert ap.set_size("training") > 0
    assert ap.word_to_index["stop"] == 2
    x, y = ap.get_data(
        how_many=8, offset=0, background_frequency=0.3,
        background_volume_range=0.15, foreground_frequency=0.3,
        foreground_volume_range=0.15, time_shift_frequency=0.3,
        time_shift_range=[-500, 0], mode="training",
        pseudo_frequency=0.0, silence_volume_range=0.3)
    assert x.shape == (8, 98 * 40)
    assert y.shape == (8, 4)
    np.testing.assert_allclose(y.sum(1), 1.0)
    # deterministic validation: same offset -> same batch
    v1, _ = ap.get_data(4, 0, 0, 0, 0, 0, 0, [0, 0], "validation")
    v2, _ = ap.get_data(4, 0, 0, 0, 0, 0, 0, [0, 0], "validation")
    np.testing.assert_allclose(v1, v2)


def test_audio_processor_dict_settings(tmp_path):
    _corpus(tmp_path)
    # the reference passes the prepare_model_settings dict
    settings_dict = {
        "label_count": 4, "sample_rate": 16000, "desired_samples": 16000,
        "window_size_samples": 480, "window_stride_samples": 160,
        "spectrogram_length": 98, "spectrogram_frequencies": 257,
        "dct_coefficient_count": 80, "num_log_mel_features": 40,
        "fingerprint_size": 16000,
    }
    ap = AudioProcessor(
        data_dirs=[str(tmp_path)], silence_percentage=10.0,
        unknown_percentage=30.0, wanted_words=["stop", "go"],
        validation_percentage=30.0, testing_percentage=0.0,
        model_settings=settings_dict, output_representation="raw")
    x, y = ap.get_data(4, 0, 0, 0, 0, 0, 0, [0, 0], "validation")
    assert x.shape == (4, 16000)


def test_data_gen_facade(tmp_path):
    _corpus(tmp_path)
    settings = prepare_model_settings(
        label_count=4, output_representation="raw")
    ap = AudioProcessor(
        data_dirs=[str(tmp_path)], silence_percentage=10.0,
        unknown_percentage=30.0, wanted_words=["stop", "go"],
        validation_percentage=30.0, testing_percentage=0.0,
        model_settings=settings, output_representation="raw")
    gen = data_gen(ap, batch_size=4, mode="training",
                   pseudo_frequency=0.0)
    x, y = next(gen)
    assert x.shape == (4, 16000) and y.shape == (4, 4)
    x2, _ = next(gen)
    assert not np.allclose(x, x2)  # random training draws differ
    # validation generator walks deterministically and wraps
    vgen = data_gen(ap, batch_size=4, mode="validation")
    v1, _ = next(vgen)
    assert v1.shape == (4, 16000)
