"""Chunked bank storage == flat bank storage, end to end.

The doubled-chunk stack (ops/pallas/augment_kernel.double_bank layout)
can BE the DeviceDataset's only wav storage (chunked=True): training
reads it directly, eval reconstructs exact clips from the periodic
rows. These tests pin layout equivalence at every consumer: host/device
chunkers, decode, the train step, and a full evaluate() sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.config import (
    AugmentConfig, prepare_model_settings,
)
from speech_recognition_tpu.data.device_bank import (
    synthetic_device_dataset,
)
from speech_recognition_tpu.ops.pallas.augment_kernel import (
    decode_chunked, double_bank, double_bank_host, fg_chunks_per_clip,
)
from speech_recognition_tpu.train.loop import Trainer


def test_host_chunker_matches_device_chunker():
    rng = np.random.default_rng(0)
    for t in (256, 512, 1280, 16000):
        bank = rng.integers(-3000, 3000, (3, t), dtype=np.int16)
        np.testing.assert_array_equal(
            double_bank_host(bank),
            np.asarray(double_bank(jnp.asarray(bank))))


def test_host_chunker_block_boundaries():
    """The block-wise builder (bounded host RAM — no np.tile of the
    whole corpus) is exact for every block/clip-count relationship:
    block dividing n, not dividing, larger than n, and block 1."""
    rng = np.random.default_rng(2)
    for n, t, bc in [(5, 256, 2), (7, 1024, 3), (16, 512, 16),
                     (9, 128, 4), (4, 16000, 1), (3, 640, 100)]:
        bank = rng.integers(-30000, 30000, (n, t), dtype=np.int16)
        got = double_bank_host(bank, block_clips=bc)
        want = np.asarray(double_bank(jnp.asarray(bank)))
        np.testing.assert_array_equal(got, want)
        assert got.flags.c_contiguous


def test_decode_chunked_reconstructs_exact_clips():
    rng = np.random.default_rng(1)
    for t in (512, 1280, 16000):
        n = 5
        bank = rng.integers(-32768, 32767, (n, t), dtype=np.int16)
        chunks = jnp.asarray(double_bank_host(bank))
        fids = jnp.asarray([4, 0, 2], jnp.int32)
        got = np.asarray(decode_chunked(chunks, fids, t))
        want = bank[np.asarray(fids)].astype(np.float32) / 32768.0
        np.testing.assert_array_equal(got, want)


def test_dataset_decode_equivalence():
    kw = dict(num_train=12, num_val=4, num_pseudo=2,
              desired_samples=1280, background_len=4 * 1280)
    flat = synthetic_device_dataset(chunked=False, **kw)
    chnk = synthetic_device_dataset(chunked=True, **kw)
    # identical underlying clips: chunking happens after all RNG draws
    pc = fg_chunks_per_clip(flat.desired_samples)
    n = flat.wav_bank.shape[0]
    rebuilt = np.asarray(chnk.wav_bank).reshape(n, -1)[:, :1280]
    np.testing.assert_array_equal(rebuilt, np.asarray(flat.wav_bank))
    assert chnk.num_clips == n and flat.num_clips == n
    assert chnk.wav_bank.shape[0] == n * pc

    fids = jnp.asarray([0, 7, 3, 17], jnp.int32)
    np.testing.assert_array_equal(np.asarray(flat.decode(fids)),
                                  np.asarray(chnk.decode(fids)))
    w_f, l_f = flat.get_unprocessed_data("validation", 3)
    w_c, l_c = chnk.get_unprocessed_data("validation", 3)
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_c))
    np.testing.assert_array_equal(np.asarray(l_f), np.asarray(l_c))


@pytest.mark.parametrize("use_fused", [True, False])
@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_train_and_eval_equivalence(use_fused):
    """Same seeds, flat vs chunked bank: identical training metrics and
    identical evaluate() sweeps, on both augment paths."""
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=40,
        output_representation="mfcc")
    results = []
    for chunked in (False, True):
        ds = synthetic_device_dataset(
            num_train=24, num_val=16, num_pseudo=4, chunked=chunked)
        tr = Trainer(model_name="conv_2d_fast", settings=settings,
                     dataset=ds,
                     augment=AugmentConfig(pseudo_frequency=0.25),
                     batch_size=8, seed=7, use_fused_augment=use_fused,
                     compute_dtype="float32")
        state = tr.init_state()
        key = jax.random.PRNGKey(3)
        for i in range(2):
            state, m = tr.train_step(state, jax.random.fold_in(key, i))
        metrics = {k: float(v) for k, v in m.items()}
        conf, loss = tr.evaluate(state, mode="validation")
        results.append((metrics, conf, loss))
    (m_f, c_f, l_f), (m_c, c_c, l_c) = results
    assert m_f == m_c
    np.testing.assert_array_equal(c_f, c_c)
    assert l_f == l_c
