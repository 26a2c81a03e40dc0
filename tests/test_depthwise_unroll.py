"""The unrolled depthwise lowering must be a pure lowering change.

``layers.Conv`` routes small-kernel 1-D depthwise convolutions through
``_depthwise_conv1d_unrolled`` (shifted-slice FMAs) instead of
``lax.conv_general_dilated`` so XLA can fuse the tap chain into the
neighboring pointwise-conv fusions (the conv HLO is a fusion barrier;
the elementwise chain is not — docs/TPU_RUN.md roofline). These tests
pin that the two lowerings are the same function: same output shapes,
same values, same gradients, same parameter tree, across every
(stride, padding, dilation, dtype) combination the zoo uses — plus the
fallback conditions (2-D convs, grouped-but-not-depthwise convs, wide
kernels) which must keep taking the lax path untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import speech_recognition_tpu.models.layers as L


@pytest.fixture
def restore_flag():
    prev = L.DEPTHWISE_UNROLL
    yield
    L.DEPTHWISE_UNROLL = prev


def _both_paths(m, variables, x):
    L.DEPTHWISE_UNROLL = True
    y_unrolled = m.apply(variables, x)
    L.DEPTHWISE_UNROLL = False
    y_lax = m.apply(variables, x)
    return y_unrolled, y_lax


# every (kernel, stride, padding, dilation) the zoo's depthwise convs use
# (models/zoo.py DepthwiseConvBlock call sites), plus a dilated and a
# 5-tap case from the grouped/dilated families.
ZOO_CASES = [
    (397, 128, 3, 1, "VALID", 1),
    (399, 192, 3, 2, "SAME", 1),
    (99, 256, 3, 2, "SAME", 1),
    (97, 256, 3, 1, "VALID", 1),
    (47, 320, 3, 1, "VALID", 1),
    (9, 512, 3, 1, "VALID", 1),
    (100, 64, 5, 1, "SAME", 2),
    (61, 48, 7, 1, "SAME", 1),
]


@pytest.mark.parametrize("t,c,k,s,pad,dil", ZOO_CASES)
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_unrolled_matches_lax(restore_flag, t, c, k, s, pad, dil, dtype):
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (4, t, c), jnp.float32).astype(dtype)
    m = L.Conv(features=c, kernel_size=(k,), strides=(s,), padding=pad,
               kernel_dilation=(dil,), feature_group_count=c,
               use_bias=False)
    variables = m.init(key, x)
    y_unrolled, y_lax = _both_paths(m, variables, x)
    assert y_unrolled.shape == y_lax.shape
    assert y_unrolled.dtype == y_lax.dtype
    # both lowerings accumulate the taps in f32 from the same operands,
    # so they agree to reassociation error
    np.testing.assert_allclose(
        np.asarray(y_unrolled, np.float32), np.asarray(y_lax, np.float32),
        atol=1e-6 if dtype == "float32" else 1e-2)


def test_gradients_match(restore_flag):
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, 99, 256))
    m = L.Conv(features=256, kernel_size=(3,), strides=(2,),
               padding="SAME", feature_group_count=256, use_bias=False)
    variables = m.init(key, x)

    def loss(v, x):
        return (m.apply(v, x) ** 2).sum()

    L.DEPTHWISE_UNROLL = True
    g_unrolled = jax.grad(loss, argnums=(0, 1))(variables, x)
    L.DEPTHWISE_UNROLL = False
    g_lax = jax.grad(loss, argnums=(0, 1))(variables, x)
    for a, b in zip(jax.tree.leaves(g_unrolled), jax.tree.leaves(g_lax)):
        np.testing.assert_allclose(a, b, atol=3e-5)


def test_param_tree_unchanged(restore_flag):
    """The lowering must not move or reshape the 'kernel' param (twins,
    checkpoints, and keras_import all key off the flax Conv layout)."""
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 50, 64))
    m = L.Conv(features=64, kernel_size=(3,), feature_group_count=64,
               use_bias=False)
    L.DEPTHWISE_UNROLL = True
    v1 = m.init(key, x)
    L.DEPTHWISE_UNROLL = False
    v0 = m.init(key, x)
    assert jax.tree.structure(v1) == jax.tree.structure(v0)
    assert v1["params"]["kernel"].shape == (3, 1, 64)
    np.testing.assert_array_equal(v1["params"]["kernel"],
                                  v0["params"]["kernel"])


def test_fallback_paths_still_lax(restore_flag, monkeypatch):
    """2-D convs, non-depthwise grouped convs, and wide kernels must hit
    lax.conv_general_dilated even with the flag on."""
    calls = []
    real = jax.lax.conv_general_dilated

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(jax.lax, "conv_general_dilated", spy)
    L.DEPTHWISE_UNROLL = True
    key = jax.random.PRNGKey(0)

    with jax.disable_jit():
        # 2-D depthwise: lhs.ndim == 4 -> fallback
        m2d = L.Conv(features=8, kernel_size=(3, 3), feature_group_count=8,
                     use_bias=False)
        m2d.init(key, jnp.zeros((1, 9, 9, 8)))
        # grouped (groups < channels) -> fallback
        mg = L.Conv(features=32, kernel_size=(3,), feature_group_count=4,
                    use_bias=False)
        mg.init(key, jnp.zeros((1, 20, 32)))
        # wide kernel (> 8 taps) -> fallback
        mw = L.Conv(features=16, kernel_size=(11,), feature_group_count=16,
                    use_bias=False)
        mw.init(key, jnp.zeros((1, 40, 16)))
        assert len(calls) == 3

        # but the zoo's depthwise case does NOT call lax
        calls.clear()
        md = L.Conv(features=16, kernel_size=(3,), feature_group_count=16,
                    use_bias=False)
        md.init(key, jnp.zeros((1, 40, 16)))
        assert not calls


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_flagship_logits_invariant_under_lowering(restore_flag):
    """End-to-end: flagship logits are the same function under either
    lowering (f32, tight tolerance)."""
    from speech_recognition_tpu.models import build_model
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16000))
    m, _ = build_model("conv_1d_time_sliced_with_attention", num_classes=12)
    L.DEPTHWISE_UNROLL = True
    v = m.init({"params": key, "dropout": key}, x, train=False)
    y1 = m.apply(v, x, train=False)
    L.DEPTHWISE_UNROLL = False
    y0 = m.apply(v, x, train=False)
    np.testing.assert_allclose(y1, y0, atol=5e-5)
