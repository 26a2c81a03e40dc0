"""Streaming trainer: HostPrefetchLoader -> Trainer.fit_streaming.

VERDICT r2 item 4: the host-sharded streaming loader must have a real
consumer so corpora that exceed HBM can train. The loader decodes WAVs
on a producer thread and uploads mesh-sharded batches; the trainer's
stream step runs device-side augmentation (background bank included),
the frontend, and the shared update step over the 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax

from speech_recognition_tpu.config import (
    AugmentConfig, prepare_model_settings,
)
from speech_recognition_tpu.data.device_bank import build_device_dataset
from speech_recognition_tpu.data.index import build_dataset_index
from speech_recognition_tpu.data.prefetch import HostPrefetchLoader
from speech_recognition_tpu.parallel.mesh import batch_sharding
from speech_recognition_tpu.train.loop import Trainer

from synth_corpus import build_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_corpus") / "audio"
    build_corpus(root, clips_per_word=6, seed=11)
    index = build_dataset_index(
        data_dirs=[str(root)], silence_percentage=10.0,
        unknown_percentage=30.0,
        wanted_words=["yes", "no", "up", "down", "left", "right", "on",
                      "off", "stop", "go"],
        validation_percentage=20.0, testing_percentage=0.0)
    return index


def _loader(index, trainer, batch_size):
    paths = index.files("training")
    return HostPrefetchLoader(
        paths, index.labels_array("training"),
        index.is_silence_array("training"),
        batch_size=batch_size, desired_samples=16000, seed=5,
        sharding=batch_sharding(trainer.mesh))


def test_fit_streaming_trains_and_evaluates(corpus):
    settings = prepare_model_settings(
        label_count=12, output_representation="mfcc",
        dct_coefficient_count=40, num_log_mel_features=40)
    # only validation is staged — the training corpus stays on the host
    val_ds = build_device_dataset(corpus, settings, modes=["validation"])
    assert "training" not in val_ds.partitions
    trainer = Trainer(model_name="simple", settings=settings,
                      dataset=val_ds, use_fused_augment=False,
                      augment=AugmentConfig(), batch_size=16)
    state = trainer.init_state()
    with _loader(corpus, trainer, 16) as loader:
        state, hist = trainer.fit_streaming(state, loader, steps=5)
    assert int(state.step) == 5
    assert np.isfinite(hist["loss"][-1])
    # the staged validation partition still evaluates
    conf, val_loss = trainer.evaluate(state)
    assert conf.sum() > 0 and np.isfinite(val_loss)


def test_stream_many_matches_sequential(corpus):
    """train_many_stream (scan over stacked host batches) must produce
    the same updates as sequential train_step_stream calls with the
    same keys/batches — it exists to amortize per-execution dispatch
    cost, not to change semantics."""
    settings = prepare_model_settings(
        label_count=12, output_representation="mfcc",
        dct_coefficient_count=40, num_log_mel_features=40)
    val_ds = build_device_dataset(corpus, settings, modes=["validation"])

    def make():
        tr = Trainer(model_name="simple", settings=settings,
                     dataset=val_ds, use_fused_augment=False,
                     augment=AugmentConfig(), batch_size=16)
        return tr, tr.init_state()

    # identical batch sequence for both paths
    t1, s1 = make()
    with _loader(corpus, t1, 16) as loader:
        batches = [next(loader) for _ in range(3)]
    keys = [jax.random.fold_in(jax.random.PRNGKey(77), i)
            for i in range(3)]
    for k, (wav, lab, sil) in zip(keys, batches):
        s1, m1 = t1.train_step_stream(s1, k, wav, lab, sil)

    import jax.numpy as jnp
    t2, s2 = make()
    s2, m2 = t2.train_many_stream(
        s2, jnp.stack(keys),
        jnp.stack([b[0] for b in batches]),
        jnp.stack([b[1] for b in batches]),
        jnp.stack([b[2] for b in batches]))
    assert m2["loss"].shape == (3,)
    assert int(s2.step) == 3
    np.testing.assert_allclose(float(m2["loss"][-1]), float(m1["loss"]),
                               rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_int16_wire_format_matches_prescaled_f32(corpus):
    """The loader ships raw int16 (half the link bytes); the stream
    step's on-device 1/32768 scale must be bit-identical to feeding
    host-prescaled f32 — same multiply, just on the other side of the
    link."""
    import jax.numpy as jnp

    from speech_recognition_tpu.data.wav import INT16_DECODE_SCALE

    settings = prepare_model_settings(
        label_count=12, output_representation="mfcc",
        dct_coefficient_count=40, num_log_mel_features=40)

    def make():
        tr = Trainer(model_name="simple", settings=settings,
                     dataset=None, batch_size=16)
        return tr, tr.init_state()

    t1, s1 = make()
    with _loader(corpus, t1, 16) as loader:
        wav_i16, lab, sil = next(loader)
    assert wav_i16.dtype == jnp.int16
    key = jax.random.PRNGKey(3)
    s1, m1 = t1.train_step_stream(s1, key, wav_i16, lab, sil)

    t2, s2 = make()
    wav_f32 = jnp.asarray(np.asarray(wav_i16), jnp.float32) \
        / INT16_DECODE_SCALE
    s2, m2 = t2.train_step_stream(s2, key, wav_f32, lab, sil)

    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_streaming_chunked_dispatch(corpus):
    """fit_streaming(steps_per_dispatch=K) with a non-multiple step
    count runs the tail and keeps the step counter exact."""
    settings = prepare_model_settings(
        label_count=12, output_representation="mfcc",
        dct_coefficient_count=40, num_log_mel_features=40)
    val_ds = build_device_dataset(corpus, settings, modes=["validation"])
    trainer = Trainer(model_name="simple", settings=settings,
                      dataset=val_ds, use_fused_augment=False,
                      augment=AugmentConfig(), batch_size=16)
    state = trainer.init_state()
    with _loader(corpus, trainer, 16) as loader:
        state, hist = trainer.fit_streaming(state, loader, steps=5,
                                            steps_per_dispatch=2)
    assert int(state.step) == 5
    assert np.isfinite(hist["loss"][-1])


def test_stream_step_without_any_dataset(corpus):
    # pure streaming: no DeviceDataset at all (background=None)
    settings = prepare_model_settings(
        label_count=12, output_representation="mfcc",
        dct_coefficient_count=40, num_log_mel_features=40)
    trainer = Trainer(model_name="simple", settings=settings,
                      dataset=None, batch_size=16)
    state = trainer.init_state()
    with _loader(corpus, trainer, 16) as loader:
        wav, labels, silence = next(loader)
        state, metrics = trainer.train_step_stream(
            state, jax.random.PRNGKey(0), wav, labels, silence)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # bank-path APIs refuse with a clear message instead of crashing
    with pytest.raises(ValueError, match="streaming"):
        trainer.train_step(state, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="DeviceDataset"):
        trainer.fit(state, epochs=1)
    with pytest.raises(ValueError, match="DeviceDataset"):
        trainer.evaluate(state)


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_streaming_bn_recalibration(corpus):
    # a BN model's running stats can be re-estimated from streamed
    # batches (short-schedule eval fix, mirroring the bank path)
    settings = prepare_model_settings(
        label_count=12, output_representation="mfcc",
        dct_coefficient_count=40, num_log_mel_features=40)
    val_ds = build_device_dataset(corpus, settings, modes=["validation"])
    trainer = Trainer(model_name="conv_2d_fast", settings=settings,
                      dataset=val_ds, use_fused_augment=False,
                      batch_size=16)
    state = trainer.init_state()
    with _loader(corpus, trainer, 16) as loader:
        state, _ = trainer.fit_streaming(state, loader, steps=3)
        recal = trainer.recalibrate_batch_stats_stream(
            state, loader, num_batches=4)
    # stats moved away from init (mean 0 / var 1)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(recal.batch_stats)
    deltas = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
              for a, b in zip(after, before)]
    assert max(deltas) > 1e-3
    conf, val_loss = trainer.evaluate(recal)
    assert np.isfinite(val_loss)


def test_streaming_loss_decreases(corpus):
    # sensitivity: 30 steps on the easy synthetic corpus must move loss
    settings = prepare_model_settings(
        label_count=12, output_representation="mfcc",
        dct_coefficient_count=40, num_log_mel_features=40)
    trainer = Trainer(model_name="simple", settings=settings,
                      dataset=None, batch_size=16)
    state = trainer.init_state()
    losses = []
    with _loader(corpus, trainer, 16) as loader:
        for step in range(30):
            wav, labels, silence = next(loader)
            state, metrics = trainer.train_step_stream(
                state, jax.random.fold_in(jax.random.PRNGKey(1), step),
                wav, labels, silence)
            losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
