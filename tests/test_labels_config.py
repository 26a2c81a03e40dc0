"""L0 tests: class catalogs, label maps, derived settings."""

from speech_recognition_tpu import labels
from speech_recognition_tpu.config import prepare_model_settings


def test_wanted_classes():
    classes = labels.get_classes(wanted_only=True)
    assert classes == ["stop", "down", "off", "right", "up",
                       "go", "on", "yes", "left", "no"]
    assert len(labels.get_classes()) == 30
    assert len(labels.get_classes(extend_reversed=True)) == 47


def test_words_list_prepends_specials():
    words = labels.prepare_words_list(["a", "b"])
    assert words == ["_silence_", "_unknown_", "a", "b"]


def test_int2label_roundtrip():
    i2l = labels.get_int2label(wanted_only=True)
    l2i = labels.get_label2int(wanted_only=True)
    assert len(i2l) == 12
    assert i2l[0] == "_silence_"
    assert i2l[1] == "_unknown_"
    assert i2l[2] == "stop"
    for i, l in i2l.items():
        assert l2i[l] == i


def test_build_word_to_index():
    wanted = ["stop", "go"]
    m = labels.build_word_to_index(["stop", "go", "cat", "dog"], wanted)
    assert m["stop"] == 2 and m["go"] == 3
    assert m["cat"] == 1 and m["dog"] == 1
    assert m["_silence_"] == 0


def test_label_mapping_helpers():
    assert labels.map_to_valid("_silence_") == "silence"
    assert labels.map_to_valid("_unknown_") == "unknown"
    assert labels.map_to_valid("stop") == "stop"
    wanted = ["stop", "go"]
    assert labels.map_to_wanted("cat", wanted) == "unknown"
    assert labels.map_to_wanted("stop", wanted) == "stop"
    assert labels.map_to_wanted("silence", wanted) == "silence"


def test_prepare_model_settings_train_recipe():
    # train.py:35-39 recipe: 30ms/10ms windows, 80 mel bins, 60 MFCCs.
    s = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    assert s.desired_samples == 16000
    assert s.window_size_samples == 480
    assert s.window_stride_samples == 160
    assert s.spectrogram_length == 98  # 1 + (16000-480)//160
    assert s.spectrogram_frequencies == 257
    assert s.fingerprint_size == 16000
    assert s.fft_length == 512


def test_prepare_model_settings_mfcc():
    s = prepare_model_settings(
        label_count=32, window_size_ms=25.0, window_stride_ms=15.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="mfcc")
    # make_submission.py:53-57 geometry: 1 + (16000-400)//240 = 66 frames
    assert s.window_size_samples == 400
    assert s.window_stride_samples == 240
    assert s.spectrogram_length == 66
    assert s.fingerprint_size == 60 * 66


def test_eval_augment_variant_zeroes_everything():
    # Silence clips are all-zero in eval — reference-correct behavior
    # (input_data.py:453 gates background mixing on training mode), so
    # the eval variant must not carry a live-looking silence volume.
    from speech_recognition_tpu.config import AugmentConfig
    cfg = AugmentConfig(pseudo_frequency=0.6)
    ev = cfg.eval_variant()
    assert ev.background_frequency == 0.0
    assert ev.foreground_frequency == 0.0
    assert ev.time_shift_frequency == 0.0
    assert ev.pseudo_frequency == 0.0
    assert ev.silence_volume_range == 0.0
    assert ev.silence_background_frequency == 0.0


def test_legacy_settings_match_reference_dict():
    """get_legacy_settings == the reference's frozen settings.py:1-11
    dict, field for field (executed from the reference source; skipped
    where the reference checkout is absent)."""
    import os
    import pytest
    if not os.path.exists("/root/reference/settings.py"):
        pytest.skip("reference checkout not available")
    src = open("/root/reference/settings.py").read()
    ns = {}
    exec(src, ns)
    ref = ns["get_settings"]()
    from speech_recognition_tpu.config import get_legacy_settings
    ours = get_legacy_settings()
    for k, v in ref.items():
        assert getattr(ours, k) == v, k
