"""Augmentation: roll semantics, distribution properties, eval determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.config import AugmentConfig
from speech_recognition_tpu.data.device_bank import synthetic_device_dataset
from speech_recognition_tpu.ops import augment as aug


def test_roll_batch_matches_np_roll():
    # the reference's open TODO (input_data.py:345): tf_roll == np.roll
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((5, 100)).astype(np.float32)
    shifts = np.array([0, 3, -7, 99, -100], dtype=np.int32)
    got = np.asarray(aug.roll_batch(jnp.asarray(wav), jnp.asarray(shifts)))
    for b, s in enumerate(shifts):
        np.testing.assert_allclose(got[b], np.roll(wav[b], s))


def test_background_bank_crops_in_range():
    bank = aug.BackgroundBank.from_arrays(
        [np.arange(30000, dtype=np.float32),
         np.arange(50000, dtype=np.float32) + 1e6],
        min_length=16000)
    key = jax.random.PRNGKey(0)
    crops = np.asarray(aug.sample_background(key, bank, 64, 16000))
    assert crops.shape == (64, 16000)
    # each crop must be contiguous (diff == 1) and within a single clip
    diffs = np.diff(crops, axis=1)
    assert (diffs == 1).all()
    for row in crops:
        if row[0] >= 1e6:
            assert row[-1] < 1e6 + 50000
        else:
            assert row[-1] < 30000


def test_background_bank_rejects_short_clips():
    import pytest
    with pytest.raises(ValueError):
        aug.BackgroundBank.from_arrays([np.zeros(100)], min_length=16000)


def test_eval_mode_is_deterministic_and_neutral():
    wav = jnp.ones((4, 100))
    silence = jnp.array([True, False, False, True])
    cfg = AugmentConfig()
    out = aug.augment_batch(jax.random.PRNGKey(1), wav, silence, cfg,
                            background=None, training=False)
    out = np.asarray(out)
    # silence rows muted, others untouched
    assert (out[0] == 0).all() and (out[3] == 0).all()
    assert (out[1] == 1).all() and (out[2] == 1).all()


def test_training_distributions():
    batch = 4096
    wav = jnp.ones((batch, 64))
    silence = jnp.zeros((batch,), bool)
    cfg = AugmentConfig(background_frequency=0.5, background_volume_range=0.2,
                        foreground_frequency=0.5, foreground_volume_range=0.3,
                        time_shift_frequency=0.0, flip_frequency=0.25)
    fg, bg = aug.draw_volumes(jax.random.PRNGKey(2), silence, cfg, batch,
                              use_background=True)
    fg, bg = np.asarray(fg), np.asarray(bg)
    # flip: ~25% negative
    neg_frac = (fg < 0).mean()
    assert 0.2 < neg_frac < 0.3
    # foreground: ~50% exactly +-1 (no volume draw)
    exact1 = (np.abs(fg) == 1.0).mean()
    assert 0.45 < exact1 < 0.55
    assert np.abs(fg).max() <= 1.3 + 1e-6
    assert np.abs(fg).min() >= 0.7 - 1e-6
    # background volume: ~50% zero, rest uniform in [0, 0.2)
    zero_frac = (bg == 0).mean()
    assert 0.45 < zero_frac < 0.55
    assert bg.max() < 0.2


def test_silence_background_quirk():
    # silence rows that miss the background draw still get background
    # w.p. 0.9 with silence_volume_range (input_data.py:493-496)
    batch = 4096
    silence = jnp.ones((batch,), bool)
    cfg = AugmentConfig(background_frequency=0.0, silence_volume_range=0.4,
                        silence_background_frequency=0.9)
    fg, bg = aug.draw_volumes(jax.random.PRNGKey(3), silence, cfg, batch,
                              use_background=True)
    fg, bg = np.asarray(fg), np.asarray(bg)
    assert (fg == 0).all()  # silence is always muted
    nonzero = (bg > 0).mean()
    assert 0.85 < nonzero < 0.95
    assert bg.max() < 0.4


def test_augment_batch_composition():
    # background mixing: out = bg*vol + rolled(fg*vol)
    batch = 8
    wav = jnp.ones((batch, 16000)) * 0.5
    silence = jnp.zeros((batch,), bool)
    ds = synthetic_device_dataset()
    cfg = AugmentConfig(background_frequency=1.0,
                        background_volume_range=0.1,
                        foreground_frequency=0.0,
                        time_shift_frequency=0.0)
    out = aug.augment_batch(jax.random.PRNGKey(4), wav, silence, cfg,
                            background=ds.background, training=True)
    out = np.asarray(out)
    # foreground survives exactly (vol 1), bg adds bounded noise
    assert np.abs(out - 0.5).max() < 0.1 * 0.1 + 1e-6


def test_sampler_pseudo_frequency():
    ds = synthetic_device_dataset(num_train=64, num_pseudo=8)
    key = jax.random.PRNGKey(5)
    fids, labels, sil = ds.sample_train_ids(key, 4096, pseudo_frequency=0.5)
    fids = np.asarray(fids)
    # pseudo rows live at bank indices [80, 88)
    pseudo_frac = ((fids >= 64 + 16) & (fids < 64 + 16 + 8)).mean()
    assert 0.45 < pseudo_frac < 0.55
    assert labels.shape == (4096,) and sil.shape == (4096,)


def test_eval_ids_sequential():
    ds = synthetic_device_dataset(num_train=64, num_val=16)
    f0, l0, s0 = ds.eval_ids("validation", 0, 8)
    f1, _, _ = ds.eval_ids("validation", 8, 8)
    assert np.asarray(f0).tolist() == list(range(64, 72))
    assert np.asarray(f1).tolist() == list(range(72, 80))


def test_decode_scaling():
    ds = synthetic_device_dataset()
    wav = np.asarray(ds.decode(jnp.array([0, 1], dtype=jnp.int32)))
    bank = np.asarray(ds.wav_bank[:2]).astype(np.float32) / 32768.0
    np.testing.assert_allclose(wav, bank)


def test_center_crop_matches_reference_semantics():
    """center_crop (utils.py:76-84): integer-floor left edge, 1-D and
    2-D, exact passthrough at equal size."""
    from speech_recognition_tpu.ops.framing import center_crop
    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(center_crop(x, 4)),
                                  x[3:7])          # (10-4)//2 == 3
    np.testing.assert_array_equal(np.asarray(center_crop(x, 5)),
                                  x[2:7])          # odd remainder floors
    np.testing.assert_array_equal(np.asarray(center_crop(x, 10)), x)
    x2 = np.arange(20, dtype=np.float32).reshape(2, 10)
    np.testing.assert_array_equal(np.asarray(center_crop(x2, 4)),
                                  x2[:, 3:7])
    import pytest
    with pytest.raises(ValueError):
        center_crop(np.zeros((2, 3, 4)), 2)
