"""Max-pool reformulation parity: the maximum-chain pooling must be
forward-identical to flax's reduce_window pooling (whose backward,
select-and-scatter, it replaces for TPU speed) and gradient-identical
wherever window maxima are unique."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from speech_recognition_tpu.models.layers import max_pool_1d, max_pool_2d


@pytest.mark.parametrize("pool,strides,padding", [
    (3, 2, "valid"), (3, 2, "same"), (3, 1, "same"), (2, 2, "valid"),
    (2, 2, "same"), (3, 3, "valid"), (5, 2, "same"),
])
@pytest.mark.parametrize("t", [16, 17, 99])
def test_max_pool_1d_matches_reduce_window(pool, strides, padding, t):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, t, 6)),
                    jnp.float32)
    got = max_pool_1d(x, pool, strides, padding)
    want = nn.max_pool(x, window_shape=(pool,), strides=(strides,),
                       padding=padding.upper())
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("pool,strides,padding", [
    ((2, 2), None, "valid"), ((2, 2), None, "same"),
    ((3, 2), (2, 1), "same"), ((2, 3), (2, 2), "valid"),
])
def test_max_pool_2d_matches_reduce_window(pool, strides, padding):
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 19, 13, 5)),
                    jnp.float32)
    got = max_pool_2d(x, pool, strides, padding)
    want = nn.max_pool(x, window_shape=tuple(pool),
                       strides=tuple(strides or pool),
                       padding=padding.upper())
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_max_pool_gradient_matches_on_unique_maxima():
    # distinct values => both formulations route the cotangent to the
    # window argmax; only exact ties may differ (documented)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.permutation(4 * 33 * 3).reshape(4, 33, 3),
                    jnp.float32)

    def f_new(x):
        return max_pool_1d(x, 3, 2, "same").sum()

    def f_ref(x):
        return nn.max_pool(x, window_shape=(3,), strides=(2,),
                           padding="SAME").sum()

    g_new = jax.grad(f_new)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


def test_max_pool_window_larger_than_input():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 2, 4)),
                    jnp.float32)
    got = max_pool_1d(x, 3, 2, "same")
    want = nn.max_pool(x, window_shape=(3,), strides=(2,), padding="SAME")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
