"""Losses, optimizers, LR control (parity: reference compile recipes).

* ``smooth_cross_entropy`` — label-smoothed CE **from logits**. The
  reference feeds softmax probabilities through clip->log->another softmax
  (utils.py:87-108); taking log_softmax of logits is the numerically sound
  equivalent (documented divergence — identical gradients up to the
  reference's epsilon clipping).
* Keras-semantics optimizers: SGD+momentum and Adam via optax; RMSprop
  as a hand-rolled transform (``keras_rmsprop``) because optax's
  epsilon placement differs from Keras (see its docstring). LR is
  injected as a mutable hyperparameter so the ReduceLROnPlateau
  controller (train.py:62-63) can scale it between epochs without
  recompilation.
* L2 kernel regularization (the reference attaches l2(1e-5) to most conv/
  dense kernels) is added to the loss over kernel-named params so it flows
  through adaptive optimizers exactly like Keras.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def smooth_cross_entropy(logits: jax.Array, labels: jax.Array,
                         label_smoothing: float = 0.0) -> jax.Array:
    """Mean label-smoothed softmax CE. ``labels`` are int class ids."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) \
            + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits)
    return -(onehot * logp).sum(axis=-1).mean()


def l2_kernel_penalty(params: Any, scale: float) -> jax.Array:
    """scale * sum(kernel**2) over every param whose name contains
    'kernel' (Keras l2(scale) semantics, e.g. model.py:43,48-49)."""
    if scale == 0.0:
        return jnp.asarray(0.0)
    flat = jax.tree_util.tree_leaves_with_path(params)
    total = 0.0
    for path, leaf in flat:
        name = str(path[-1])
        if "kernel" in name:
            total = total + jnp.sum(jnp.square(leaf))
    return scale * total


class KerasRMSpropState(NamedTuple):
    nu: Any  # exponential moving average of squared gradients


def keras_rmsprop(learning_rate, rho: float = 0.9,
                  eps: float = 1e-8) -> optax.GradientTransformation:
    """RMSprop with exact Keras 2.1.2 epsilon placement.

    Keras (``rmsprop.get_updates``, consumed at reference model.py:770):

        a  <- rho * a + (1 - rho) * g**2
        p  <- p - lr * g / (sqrt(a) + eps)

    ``optax.rmsprop`` instead computes ``g * rsqrt(a + eps)`` — epsilon
    *inside* the sqrt — which diverges most when ``a`` is small (early
    steps, flat directions). 17 of the 25 zoo models train with RMSprop,
    so the exact form is implemented here (~15 lines) rather than
    documenting the divergence. Keras 2.1.2 hardcodes eps=1e-8 (the
    switch to K.epsilon()=1e-7 landed in 2.1.3). Pinned against a
    hand-rolled numpy reference in tests/test_optim.py.
    """

    def init_fn(params):
        return KerasRMSpropState(
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        nu = jax.tree_util.tree_map(
            lambda n, g: rho * n + (1.0 - rho) * jnp.square(g),
            state.nu, updates)
        scaled = jax.tree_util.tree_map(
            lambda g, n: -learning_rate * g / (jnp.sqrt(n) + eps),
            updates, nu)
        return scaled, KerasRMSpropState(nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(name: str, learning_rate: float,
                    momentum: float = 0.0) -> optax.GradientTransformation:
    """Keras-equivalent optimizer. Wrapped with inject_hyperparams so
    ``opt_state.hyperparams['learning_rate']`` is mutable at runtime."""
    name = name.lower()
    if name == "sgd":
        def make(learning_rate):
            return optax.sgd(learning_rate, momentum=momentum or None)
    elif name == "adam":
        def make(learning_rate):
            # Keras 2.1.2 defaults: beta_1=0.9, beta_2=0.999, eps=1e-8
            return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "rmsprop":
        def make(learning_rate):
            # Keras 2.1.2 RMSprop: rho=0.9, eps=1e-8 outside the sqrt
            return keras_rmsprop(learning_rate, rho=0.9, eps=1e-8)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with a new learning rate (functional update)."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hyper)


class ReduceLROnPlateau:
    """Host-side LR controller (parity: keras ReduceLROnPlateau as used in
    train.py:62-63: monitor val_categorical_accuracy, mode max, factor 0.5,
    patience 4, min_lr 1e-5)."""

    def __init__(self, factor: float = 0.5, patience: int = 4,
                 min_lr: float = 1e-5, mode: str = "max",
                 min_delta: float = 1e-4, verbose: bool = True):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.mode = mode
        self.min_delta = min_delta
        self.verbose = verbose
        self.best: Optional[float] = None
        self.wait = 0

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return value > self.best + self.min_delta
        return value < self.best - self.min_delta

    def update(self, value: float, current_lr: float) -> float:
        """Feed the monitored metric; returns the (possibly reduced) LR."""
        if self._improved(value):
            self.best = value
            self.wait = 0
            return current_lr
        self.wait += 1
        if self.wait >= self.patience:
            new_lr = max(current_lr * self.factor, self.min_lr)
            self.wait = 0
            if self.verbose and new_lr < current_lr:
                print(f"ReduceLROnPlateau: lr {current_lr:.2e} "
                      f"-> {new_lr:.2e}")
            return new_lr
        return current_lr
