"""GRU numerics vs a numpy Keras-v1 reference; misc parity pieces."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.models.layers import GRU, BiGRU, hard_sigmoid
from speech_recognition_tpu.ops.framing import (
    center_crop, overlapping_frames, time_slice_stack,
)


def _np_keras_gru(x, w_in, b_in, u_zr, u_h, reverse=False):
    """Keras 2.1 GRU (reset_after=False, recurrent_activation
    hard_sigmoid): the reference's recurrent cell (model.py:148)."""
    def hs(v):
        return np.clip(0.2 * v + 0.5, 0.0, 1.0)
    b, t, _ = x.shape
    u = u_h.shape[0]
    if reverse:
        x = x[:, ::-1]
    h = np.zeros((b, u))
    for i in range(t):
        xw = x[:, i] @ w_in + b_in
        gh = h @ u_zr
        z = hs(xw[:, :u] + gh[:, :u])
        r = hs(xw[:, u:2 * u] + gh[:, u:])
        hh = np.tanh(xw[:, 2 * u:] + (r * h) @ u_h)
        h = z * h + (1 - z) * hh
    return h


def test_gru_matches_numpy_reference():
    rng = np.random.default_rng(0)
    b, t, c, u = 3, 7, 5, 4
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    module = GRU(units=u)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]
    got = np.asarray(module.apply(variables, jnp.asarray(x)))
    want = _np_keras_gru(x.astype(np.float64),
                         np.asarray(p["kernel"], np.float64),
                         np.asarray(p["bias"], np.float64),
                         np.asarray(p["recurrent_kernel_zr"], np.float64),
                         np.asarray(p["recurrent_kernel_h"], np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gru_reverse_and_sequences():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 3)).astype(np.float32))
    module = GRU(units=4, return_sequences=True, reverse=True)
    variables = module.init(jax.random.PRNGKey(0), x)
    seq = module.apply(variables, x)
    assert seq.shape == (2, 6, 4)
    # reversed GRU's first output in time equals its last scan state's
    # counterpart: sequence must not be all equal
    assert float(jnp.abs(seq[:, 0] - seq[:, -1]).max()) > 0


def test_bigru_concat():
    x = jnp.zeros((2, 5, 3))
    module = BiGRU(units=4)
    variables = module.init(jax.random.PRNGKey(0), x)
    out = module.apply(variables, x)
    assert out.shape == (2, 8)


def test_hard_sigmoid():
    x = jnp.asarray([-10.0, -2.5, 0.0, 2.5, 10.0])
    np.testing.assert_allclose(np.asarray(hard_sigmoid(x)),
                               [0.0, 0.0, 0.5, 1.0, 1.0])


def test_overlapping_frames_same_and_valid():
    x = jnp.arange(32, dtype=jnp.float32)[None, :]
    same = overlapping_frames(x, 8, 4, "SAME")
    assert same.shape == (1, 8, 8)
    valid = overlapping_frames(x, 8, 4, "VALID")
    assert valid.shape == (1, 7, 8)
    np.testing.assert_allclose(np.asarray(valid[0, 0]), np.arange(8))
    np.testing.assert_allclose(np.asarray(valid[0, 1]), np.arange(4, 12))
    # reference geometry: (16000, 40, 20, SAME) -> 800 frames
    big = overlapping_frames(jnp.zeros((1, 16000)), 40, 20, "SAME")
    assert big.shape == (1, 800, 40)


def test_time_slice_stack_matches_polyphase():
    x = np.arange(24, dtype=np.float32)[None, :]
    out = np.asarray(time_slice_stack(jnp.asarray(x), 4))
    # [b, j, i] = x[j*step + i]
    assert out.shape == (1, 6, 4)
    np.testing.assert_allclose(out[0, 2], [8, 9, 10, 11])


def test_center_crop():
    x = np.arange(10)
    np.testing.assert_array_equal(center_crop(x, 4), [3, 4, 5, 6])
    x2 = np.arange(20).reshape(2, 10)
    assert center_crop(x2, 4).shape == (2, 4)


def test_get_unprocessed_data():
    from speech_recognition_tpu.data.device_bank import (
        synthetic_device_dataset,
    )
    ds = synthetic_device_dataset(num_train=8, num_val=4)
    wav, labels = ds.get_unprocessed_data("validation", how_many=3)
    assert wav.shape == (3, 16000)
    assert labels.shape == (3,)
    # silence rows muted
    sil = np.asarray(ds.partitions["validation"].is_silence[:3])
    w = np.asarray(wav)
    for i, s in enumerate(sil):
        if s:
            assert (w[i] == 0).all()


def test_process_shard():
    from speech_recognition_tpu.parallel.distributed import process_shard
    items = list(range(10))
    s0 = process_shard(items, process_index=0, process_count=3)
    s1 = process_shard(items, process_index=1, process_count=3)
    s2 = process_shard(items, process_index=2, process_count=3)
    assert sorted(s0 + s1 + s2) == items
