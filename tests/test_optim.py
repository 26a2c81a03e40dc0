"""Optimizer-semantics parity (Keras 2.1.2 RMSprop, VERDICT r2 item 6).

Keras places epsilon OUTSIDE the sqrt (``p -= lr*g/(sqrt(a)+eps)``,
rmsprop.get_updates, consumed at reference model.py:770); optax puts it
inside (``g*rsqrt(a+eps)``). 17/25 zoo models use RMSprop, so the
trainer's transform is pinned here against an independent numpy
implementation of the Keras update.
"""

import numpy as np
import optax
import pytest

import jax.numpy as jnp

from speech_recognition_tpu.train.optim import (
    build_optimizer, get_learning_rate, keras_rmsprop, set_learning_rate,
)


def _np_keras_rmsprop(p0: np.ndarray, grads, lr: float,
                      rho: float = 0.9, eps: float = 1e-8) -> np.ndarray:
    p = p0.astype(np.float64).copy()
    a = np.zeros_like(p)
    for g in grads:
        g = g.astype(np.float64)
        a = rho * a + (1.0 - rho) * g * g
        p = p - lr * g / (np.sqrt(a) + eps)
    return p


def test_keras_rmsprop_matches_numpy_reference():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    # gradient magnitudes spanning 1e-4..1 so small-accumulator steps
    # (where epsilon placement matters most) are exercised
    grads = [(rng.normal(size=(5, 3))
              * 10.0 ** rng.uniform(-4, 0)).astype(np.float32)
             for _ in range(12)]

    tx = build_optimizer("rmsprop", learning_rate=1e-3)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    expect = _np_keras_rmsprop(p0, grads, lr=1e-3)
    np.testing.assert_allclose(np.asarray(params["w"]), expect,
                               rtol=1e-5, atol=1e-6)


def test_epsilon_is_outside_the_sqrt():
    # One step from a zero accumulator with a tiny gradient: the two
    # epsilon placements differ by orders of magnitude here.
    g, lr, rho, eps = 1e-6, 1.0, 0.9, 1e-8
    a = (1.0 - rho) * g * g
    keras_step = lr * g / (np.sqrt(a) + eps)          # ~3.07
    optax_step = lr * g / np.sqrt(a + eps)            # ~0.0099
    assert keras_step / optax_step > 100               # sanity: they differ

    tx = keras_rmsprop(lr, rho=rho, eps=eps)
    state = tx.init({"w": jnp.zeros(())})
    upd, _ = tx.update({"w": jnp.asarray(g, jnp.float32)}, state)
    np.testing.assert_allclose(-float(upd["w"]), keras_step, rtol=1e-5)


def test_learning_rate_stays_injectable():
    # ReduceLROnPlateau mutates the LR between epochs without recompiling
    tx = build_optimizer("rmsprop", 1e-3)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)
    updates, state = tx.update({"w": jnp.ones((2,))}, state, params)
    # step size reflects the new LR: g/(sqrt(0.1*g^2)+eps) ~ 1/sqrt(0.1)
    np.testing.assert_allclose(
        -float(updates["w"][0]), 5e-4 / (np.sqrt(0.1) + 1e-8), rtol=1e-5)
