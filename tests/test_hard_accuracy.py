"""The hard (shared-spectrum, alias-ceiling) accuracy benchmark.

Fast tests pin the corpus construction properties that create the
provable accuracy ceiling; the slow test runs a seeded reduced
training schedule and asserts the flagship lands in the calibrated
sensitive band — strictly below saturation (which is impossible by
construction) and well above chance. The full-resolution instrument is
scripts/calibrate_accuracy.py on TPU; its measured table lives in
docs/ACCURACY.md.
"""

import numpy as np
import pytest

from hard_corpus import (
    SHARED_TONES, SR, TONE_RATIO, WANTED, WORD_SEQS, build_hard_corpus,
    hard_clip,
)

ALIAS_PAIRS = [("yes", "go"), ("no", "stop"), ("up", "off"),
               ("right", "on"), ("down", "cat"), ("left", "bed")]


def test_inventory_is_geometric():
    ratios = np.diff(np.log(SHARED_TONES))
    np.testing.assert_allclose(ratios, np.log(TONE_RATIO), rtol=1e-12)


def test_every_word_shares_the_inventory():
    used = set()
    for seq in WORD_SEQS.values():
        assert len(seq) == 3
        used.update(seq)
    assert used == set(range(len(SHARED_TONES)))


def test_shift_alias_pairs_hold():
    # seq_B == seq_A + 1 elementwise: with the geometric inventory,
    # word B at pitch p/TONE_RATIO is an exact frequency alias of word
    # A at pitch p — the source of the Bayes ceiling.
    for a, b in ALIAS_PAIRS:
        assert tuple(i + 1 for i in WORD_SEQS[a]) == WORD_SEQS[b], (a, b)
    # every wanted word is in exactly one alias pair
    paired = [w for pair in ALIAS_PAIRS for w in pair]
    assert sorted(set(paired)) == sorted(paired)
    assert set(WANTED) <= set(paired)


def test_clip_well_formed():
    rng = np.random.default_rng(0)
    for word in ("yes", "go", "bed"):
        clip = hard_clip(word, rng)
        assert clip.shape == (SR,) and clip.dtype == np.float32
        assert np.abs(clip).max() <= 1.0
        assert float(np.mean(clip ** 2)) > 1e-5  # not silence


def test_alias_syllables_are_identical_audio():
    """Tone k at pitch p and tone k+1 at pitch p/TONE_RATIO synthesize
    the SAME waveform (same rng for phase/timbre) — the aliasing is
    real in the audio, not just in the index arithmetic."""
    from hard_corpus import _syllable
    p = 1.1
    a = _syllable(SHARED_TONES[1] * p, 4000, 0.5,
                  np.random.default_rng(3))
    b = _syllable(SHARED_TONES[2] * (p / TONE_RATIO), 4000, 0.5,
                  np.random.default_rng(3))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_flagship_lands_in_sensitive_band(tmp_path):
    """Reduced seeded schedule on the CPU mesh: the flagship must learn
    real temporal structure (well above the ~0.25 you get from
    silence/unknown priors + chance) yet CANNOT saturate — the corpus'
    alias overlap caps wanted-word accuracy near 0.86. An augmentation
    or numerics regression that destroys learning lands below the
    band; an assertion at 1.0 is impossible by construction."""
    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import build_device_dataset
    from speech_recognition_tpu.data.index import build_dataset_index
    from speech_recognition_tpu.train.loop import Trainer
    from speech_recognition_tpu.train.metrics import accuracy

    root = tmp_path / "audio"
    build_hard_corpus(root, clips_per_word=40, seed=3)
    index = build_dataset_index(
        data_dirs=[str(root)], silence_percentage=13.0,
        unknown_percentage=60.0, wanted_words=WANTED,
        validation_percentage=20.0, testing_percentage=0.0)
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    dataset = build_device_dataset(index, settings)
    trainer = Trainer(
        model_name="conv_1d_time_sliced_with_attention",
        settings=settings, dataset=dataset, augment=AugmentConfig(),
        batch_size=64, seed=0)
    state = trainer.init_state()
    state, history = trainer.fit(state, epochs=20,
                                 bn_recalibration_batches=12)
    accs = history["val_categorical_accuracy"]
    # calibrated band: this seeded reduced schedule (~180 steps) climbs
    # deterministically through the mid-learning region — CPU
    # calibration trajectory: 0.21 (prior) -> 0.29 @ep8 -> 0.33 @ep15
    # -> 0.38 @ep20; the full TPU schedule converges to ~0.88 against
    # the ~0.87-0.90 Bayes ceiling (docs/ACCURACY.md). The lower bound
    # proves real temporal learning above the 0.21-0.23
    # silence/unknown prior; the upper bound can never be rescued by
    # overfitting because saturation is impossible by construction.
    assert 0.31 <= max(accs) <= 0.97, accs
    assert accs[-1] >= 0.30, accs
