"""Correctness of the experimental fused separable-block Pallas kernel.

The kernel (ops/pallas/experiments/separable_kernel.py) computes
relu6(a*x+b) -> depthwise conv -> pointwise conv -> (sum, sum-of-squares)
in one VMEM pass, with a hand-written Pallas VJP that recomputes the
prologue/depthwise chain instead of reloading stored intermediates.

It is NOT wired into the models: the microbenchmark on v5e measured it
2-3x SLOWER than XLA's conv-fusion pipeline at every flagship block
shape (docs/TPU_RUN.md "what didn't work" — XLA's separable-block
fusions sit near the HBM roofline and the hand kernel loses more to
Mosaic relayouts than it saves in bytes). These tests keep the
documented experiment honest: interpret-mode equivalence against the
lax twin for values, stats, and all five gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.ops.pallas.experiments.separable_kernel import (
    fused_separable_block, fused_separable_block_vjp, reference_block,
)

CASES = [
    # (T, Cin, Cout, stride, padding) — flagship trunk shapes (reduced T)
    (47, 128, 128, 1, "VALID"),
    (39, 128, 192, 2, "SAME"),
    (21, 256, 320, 2, "SAME"),
    (11, 384, 512, 2, "SAME"),
    (9, 512, 512, 1, "VALID"),
]


def _inputs(t, cin, cout, dtype="float32", batch=4):
    ks = jax.random.split(jax.random.PRNGKey(t * 7 + cin), 5)
    x = jax.random.normal(ks[0], (batch, t, cin), jnp.float32).astype(dtype)
    wdw = jax.random.normal(ks[1], (3, 1, cin)) * 0.2
    wpw = jax.random.normal(ks[2], (1, cin, cout)) * 0.1
    a = jax.random.uniform(ks[3], (cin,)) + 0.5
    b = jax.random.normal(ks[4], (cin,)) * 0.1
    return x, wdw, wpw, a, b


@pytest.mark.parametrize("t,cin,cout,s,pad", CASES)
@pytest.mark.parametrize("fold", [False, True])
def test_forward_matches_lax(t, cin, cout, s, pad, fold):
    x, wdw, wpw, a, b = _inputs(t, cin, cout)
    y, s1, s2 = fused_separable_block(
        x, wdw, wpw, a, b, stride=s, padding=pad, fold_weights=fold,
        interpret=True)
    yr, r1, r2 = reference_block(x, wdw, wpw, a, b, stride=s, padding=pad)
    assert y.shape == yr.shape
    np.testing.assert_allclose(y, yr, atol=2e-5)
    # stats are self-consistent with the kernel's own (rounded) y
    np.testing.assert_allclose(s1, np.asarray(y, np.float32).sum((0, 1)),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(
        s2, (np.asarray(y, np.float32) ** 2).sum((0, 1)),
        rtol=2e-5, atol=1e-4)


def test_forward_bf16_close():
    x, wdw, wpw, a, b = _inputs(39, 128, 192, dtype="bfloat16")
    y, _, _ = fused_separable_block(
        x, wdw, wpw, a, b, stride=2, padding="SAME", interpret=True)
    yr, _, _ = reference_block(x, wdw, wpw, a, b, stride=2, padding="SAME")
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32), atol=6e-2)


def test_no_prologue():
    x, wdw, wpw, _, _ = _inputs(23, 128, 128)
    y, _, _ = fused_separable_block(
        x, wdw, wpw, stride=1, padding="VALID", interpret=True)
    yr, _, _ = reference_block(x, wdw, wpw, stride=1, padding="VALID")
    np.testing.assert_allclose(y, yr, atol=2e-5)


@pytest.mark.parametrize("t,cin,cout,s,pad", CASES)
def test_vjp_matches_autodiff(t, cin, cout, s, pad):
    """The Pallas backward must equal jax.grad of the lax twin for all
    five inputs, including the cotangent path through the stats."""
    x, wdw, wpw, a, b = _inputs(t, cin, cout)
    yr, _, _ = reference_block(x, wdw, wpw, a, b, stride=s, padding=pad)
    ks = jax.random.split(jax.random.PRNGKey(99), 3)
    dy = jax.random.normal(ks[0], yr.shape)
    ds1 = jax.random.normal(ks[1], (cout,)) * 0.01
    ds2 = jax.random.normal(ks[2], (cout,)) * 0.001

    def loss(fn):
        def f(x, a, b, wdw, wpw):
            y, s1, s2 = fn(x, a, b, wdw, wpw)
            return (y * dy).sum() + (s1 * ds1).sum() + (s2 * ds2).sum()
        return f

    g_pallas = jax.grad(loss(
        lambda *ar: fused_separable_block_vjp(*ar, s, pad, True)),
        argnums=(0, 1, 2, 3, 4))(x, a, b, wdw, wpw)
    g_lax = jax.grad(loss(
        lambda x, a, b, wdw, wpw: reference_block(
            x, wdw, wpw, a, b, stride=s, padding=pad)),
        argnums=(0, 1, 2, 3, 4))(x, a, b, wdw, wpw)
    for name, gp, gl in zip(["dx", "da", "db", "dwdw", "dwpw"],
                            g_pallas, g_lax):
        scale = float(jnp.max(jnp.abs(gl))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gl), atol=5e-4 * scale,
            err_msg=name)
