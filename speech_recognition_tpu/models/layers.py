"""Reusable model blocks (flax.linen), TPU-native.

Design notes vs the reference (model.py):

  * DepthwiseConv1D is a real grouped `lax.conv_general_dilated`
    (``feature_group_count=channels``) instead of the reference's
    expand_dims -> DepthwiseConv2D(1, k) -> squeeze workaround
    (model.py:34-52) — fewer reshapes, same math, XLA tiles it onto the
    MXU/VPU directly.
  * Grouped convolutions use ``feature_group_count=g`` rather than
    per-group slicing + concat (model.py:651-693). BatchNorm is
    per-channel, so BN-after-concat equals per-group BN exactly.
  * Models emit *logits*; the softmax lives in the loss / inference head
    (numerically better than the reference's softmax-then-log loss,
    utils.py:87-108 — divergence documented there).
  * BatchNorm uses Keras defaults (momentum 0.99, eps 1e-3). Under data
    parallelism the trainer is pjit-style SPMD, so the batch-axis mean
    reduces over the GLOBAL batch (XLA inserts the collective):
    statistics are numerically equivalent to global-batch single-device/
    reference semantics at any mesh size (within float tolerance —
    cross-shard reduction order is not bit-exact; pinned to 2e-5 by
    tests/test_bn_dp.py). No per-replica divergence, no SyncBN knob
    needed.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

BN_MOMENTUM = 0.99
BN_EPS = 1e-3

# Optionally lower small-kernel 1-D depthwise convolutions to
# shifted-slice FMAs instead of lax.conv_general_dilated.
#
# MEASURED NEGATIVE on v5e — default OFF. Hypothesis was that the conv
# HLO is a fusion barrier (dw output round-trips HBM before the 1x1
# pointwise reads it) and an elementwise tap chain would fuse into the
# pointwise conv fusion. The flagship train-step profile says otherwise:
# 4.425 ms/step unrolled vs 3.066 baseline (scripts/profile_step.py,
# 2026-08-19). Two reasons, both visible in the trace: (a) XLA's
# convolution fusions were ALREADY absorbing the neighboring elementwise
# work (the baseline's `divide_add_fusion`/`convert_reduce_fusion` conv
# fusions carry the BN divides and stat reductions), so there was no
# barrier to remove; (b) the reformulation's pads — SAME-padding
# materialization forward, strided-slice transposes backward — surface
# as standalone `pad` HLOs (0.49 ms/step) plus bigger BN loop fusions
# that the conv path got for free. FROZEN negative experiment: kept
# (flag + tests) for re-measurement on future hardware only, no further
# tuning planned; see docs/TPU_RUN.md "what didn't work" and the
# quarantined kernels in ops/pallas/experiments/.
DEPTHWISE_UNROLL = os.environ.get("SRT_DEPTHWISE_UNROLL", "0") == "1"


def _depthwise_conv1d_unrolled(x: jax.Array, w: jax.Array, stride: int,
                               padding: str, dilation: int) -> jax.Array:
    """[B, T, C] depthwise 1-D conv as an unrolled tap chain.

    ``w`` is flax's grouped-conv kernel of shape (k, 1, C). Replicates
    lax string padding semantics ('SAME'/'VALID') exactly.
    """
    k = w.shape[0]
    t = x.shape[1]
    span = (k - 1) * dilation + 1
    if padding == "SAME":
        out = -(-t // stride)
        pad_total = max(0, (out - 1) * stride + span - t)
        lo = pad_total // 2
        if pad_total:
            x = jnp.pad(x, ((0, 0), (lo, pad_total - lo), (0, 0)))
    else:
        out = (t - span) // stride + 1
    last = (out - 1) * stride
    wf = w.astype(jnp.float32)
    acc = None
    for i in range(k):
        sl = jax.lax.slice_in_dim(
            x, i * dilation, i * dilation + last + 1, stride, axis=1)
        term = sl.astype(jnp.float32) * wf[i, 0]
        acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def _conv_general_dispatch(lhs, rhs, window_strides, padding, *,
                           lhs_dilation=None, rhs_dilation=None,
                           dimension_numbers=None, feature_group_count=1,
                           precision=None, **kwargs):
    """flax ``conv_general_dilated`` hook: unrolled path for 1-D
    depthwise convs, ``lax.conv_general_dilated`` for everything else."""
    rhs_dil = tuple(rhs_dilation) if rhs_dilation else (1,) * (lhs.ndim - 2)
    if (DEPTHWISE_UNROLL
            and lhs.ndim == 3
            and feature_group_count == lhs.shape[-1] > 1
            and rhs.shape[1] == 1 and rhs.shape[2] == lhs.shape[-1]
            and rhs.shape[0] <= 8
            and isinstance(padding, str) and padding in ("SAME", "VALID")
            and (not lhs_dilation or all(d == 1 for d in lhs_dilation))):
        return _depthwise_conv1d_unrolled(
            lhs, rhs, window_strides[0], padding, rhs_dil[0])
    return jax.lax.conv_general_dilated(
        lhs, rhs, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count, precision=precision,
        **kwargs)


def relu6(x: jax.Array) -> jax.Array:
    """K.relu(x, max_value=6) (model.py:30-31)."""
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def preprocess_mfcc(x: jax.Array) -> jax.Array:
    """(x + 0.8) / 7 clipped to [-5, 5] (model.py:13-16).

    Normalizes MFCC-space inputs using the dataset running stats the
    reference documents at train.py:14-16.
    """
    return jnp.clip((x + 0.8) / 7.0, -5.0, 5.0)


def preprocess_raw(x: jax.Array) -> jax.Array:
    """Identity on raw waveforms (model.py:19-21)."""
    return x


def _padding(p: str) -> str:
    return {"valid": "VALID", "same": "SAME"}[p.lower()]


class Conv(nn.Conv):
    """nn.Conv with Keras's glorot_uniform kernel default (the reference
    framework's initializer for every Conv layer) and the opt-in
    depthwise unrolled lowering (``_conv_general_dispatch``) — parameter
    tree and semantics are identical to nn.Conv; only the HLO emitted
    for 1-D depthwise convolutions differs, and only when
    ``SRT_DEPTHWISE_UNROLL=1`` (measured slower on v5e; see the
    DEPTHWISE_UNROLL note above)."""

    kernel_init: Callable = nn.initializers.glorot_uniform()
    conv_general_dilated: Any = staticmethod(_conv_general_dispatch)


class Dense(nn.Dense):
    """nn.Dense with Keras's glorot_uniform kernel default."""

    kernel_init: Callable = nn.initializers.glorot_uniform()


class ConvBN(nn.Module):
    """Conv(1D/2D) -> BatchNorm -> activation, the reference's workhorse
    (e.g. model.py:173-185). ``groups`` > 1 gives grouped convolution."""

    features: int
    kernel: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: str = "same"
    dilation: Optional[Sequence[int]] = None
    groups: int = 1
    use_bias: bool = False
    activation: Optional[Callable] = relu6
    use_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            features=self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.strides) if self.strides else None,
            padding=_padding(self.padding),
            kernel_dilation=tuple(self.dilation) if self.dilation else None,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class DepthwiseConvBlock(nn.Module):
    """Depthwise conv (+ optional BN/relu6) -> pointwise conv -> BN -> relu6.

    Parity with ``_depthwise_conv_block`` (model.py:34-52): the depthwise
    step carries stride/dilation/padding; the 1x1 pointwise projects to
    ``features``.
    """

    features: int
    kernel: int
    padding: str = "same"
    strides: int = 1
    dilation: int = 1
    use_bias: bool = False
    intermediate_activation: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = x.shape[-1]
        x = Conv(
            features=channels,
            kernel_size=(self.kernel,),
            strides=(self.strides,),
            padding=_padding(self.padding),
            kernel_dilation=(self.dilation,),
            feature_group_count=channels,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.intermediate_activation:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype)(x)
            x = relu6(x)
        x = Conv(features=self.features, kernel_size=(1,),
                    use_bias=self.use_bias, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype)(x)
        return relu6(x)


class GroupedDepthwiseBlock(nn.Module):
    """Grouped variant of DepthwiseConvBlock (model.py:999-1037).

    Depthwise over all channels + grouped pointwise == the reference's
    per-group depthwise blocks concatenated. Note: the reference's
    ``_grouped_context_conv`` accidentally convolves the *full* tensor for
    every group (model.py:1032,1368); we implement the intended grouped
    semantics — divergence flagged for parity evals.
    """

    features: int
    kernel: int
    groups: int
    padding: str = "same"
    strides: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = x.shape[-1]
        x = Conv(
            features=channels, kernel_size=(self.kernel,),
            strides=(self.strides,), padding=_padding(self.padding),
            kernel_dilation=(self.dilation,), feature_group_count=channels,
            use_bias=False, dtype=self.dtype)(x)
        x = Conv(features=self.features, kernel_size=(1,),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype)(x)
        return relu6(x)


def _max_pool_axis(x: jax.Array, pool: int, strides: int, padding: str,
                   axis: int) -> jax.Array:
    """Max pooling along one axis as a maximum-chain of strided slices.

    Forward-identical to ``lax.reduce_window(max)`` (flax nn.max_pool),
    but its VJP is a chain of elementwise selects instead of XLA's
    ``select-and-scatter`` — which profiling showed costs ~17% of a
    pool-heavy train step on TPU v5e (select-and-scatter does not
    vectorize well there). Tie handling in the *gradient* differs:
    equal maxima split the cotangent instead of winner-takes-first.
    Realistic ties are the relu6 clamp values feeding these pools, not
    random floats: ties at 0.0 are common but their split cotangent is
    killed upstream by the relu6 VJP (zero slope for pre-activations
    < 0), and ties at the 6.0 saturation are rare and likewise gated
    (zero slope past the clamp), so the training-dynamics effect of the
    split is negligible in practice.
    """
    t = x.shape[axis]
    if padding.upper() == "SAME":
        out = -(-t // strides)
        pad_total = max(0, (out - 1) * strides + pool - t)
        pad_lo = pad_total // 2
        pad_hi = pad_total - pad_lo
    else:
        out = (t - pool) // strides + 1
        pad_lo = pad_hi = 0
    if pad_lo or pad_hi:
        pads = [(0, 0, 0)] * x.ndim
        pads[axis] = (pad_lo, pad_hi, 0)
        x = jax.lax.pad(x, jnp.asarray(-jnp.inf, x.dtype), pads)

    def tap(i):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(i, i + (out - 1) * strides + 1, strides)
        return x[tuple(idx)]

    y = tap(0)
    for i in range(1, pool):
        y = jnp.maximum(y, tap(i))
    return y


def max_pool_1d(x: jax.Array, pool: int = 3, strides: int = 2,
                padding: str = "valid") -> jax.Array:
    return _max_pool_axis(x, pool, strides, padding, axis=1)


def avg_pool_1d(x: jax.Array, pool: int = 3, strides: int = 1,
                padding: str = "same") -> jax.Array:
    # count_include_pad=False: TF's AveragePooling1D divides by the
    # number of VALID (non-padded) window elements at the edges
    # (reference model.py:213 AveragePooling1D(3, strides=1, 'same'));
    # flax's default divides by the full window size — a boundary-frame
    # divergence caught by the TF-twin logits goldens.
    return nn.avg_pool(x, window_shape=(pool,), strides=(strides,),
                       padding=_padding(padding),
                       count_include_pad=False)


def max_pool_2d(x: jax.Array, pool=(2, 2), strides=None,
                padding: str = "valid") -> jax.Array:
    # separable: max over a rectangle == max over rows, then columns
    strides = strides or pool
    x = _max_pool_axis(x, pool[0], strides[0], padding, axis=1)
    return _max_pool_axis(x, pool[1], strides[1], padding, axis=2)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """GlobalAveragePooling over all non-(batch, channel) axes."""
    return x.mean(axis=tuple(range(1, x.ndim - 1)))


def global_max_pool(x: jax.Array) -> jax.Array:
    return x.max(axis=tuple(range(1, x.ndim - 1)))


def hard_sigmoid(x: jax.Array) -> jax.Array:
    """Keras hard_sigmoid: clip(0.2*x + 0.5, 0, 1)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


class GRU(nn.Module):
    """Keras-2.1-semantics GRU as a `lax.scan` (SURVEY §7 hard part 4).

    Matches the Keras v1 GRU cell (reset_after=False, recurrent_activation
    hard_sigmoid): z/r gates from input+state, candidate from input and
    r*state, new state = z*h + (1-z)*hh. ``dropout`` and
    ``recurrent_dropout`` follow Keras 2.1.2 variational semantics
    (model.py:148,973-974): three per-gate Bernoulli masks, each constant
    across timesteps, on the inputs and on the recurrent state
    respectively.
    """

    units: int
    return_sequences: bool = False
    reverse: bool = False
    dropout: float = 0.0
    recurrent_dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, C]
        u = self.units
        c = x.shape[-1]
        b = x.shape[0]
        # Explicit params (glorot input kernels, orthogonal recurrent
        # kernels per Keras defaults) so the recurrent step is plain jnp —
        # flax submodules cannot be invoked inside a raw lax.scan body.
        w_in = self.param("kernel", nn.initializers.glorot_uniform(),
                          (c, 3 * u))
        b_in = self.param("bias", nn.initializers.zeros, (3 * u,))
        u_zr = self.param("recurrent_kernel_zr",
                          nn.initializers.orthogonal(), (u, 2 * u))
        u_h = self.param("recurrent_kernel_h",
                         nn.initializers.orthogonal(), (u, u))

        def _masks(rate, shape, rng):
            keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
            return keep.astype(x.dtype) / (1.0 - rate)

        # Precompute input projections for all timesteps (one big matmul
        # that rides the MXU; the scan only does [B,H]x[H,H] updates).
        if train and self.dropout > 0.0:
            # per-gate input masks, constant over time (Keras
            # _generate_dropout_mask count=3)
            m = _masks(self.dropout, (3, b, 1, c), self.make_rng("dropout"))
            xw = jnp.concatenate(
                [(x * m[i]) @ w_in[:, i * u:(i + 1) * u] for i in range(3)],
                axis=-1) + b_in
        else:
            xw = x @ w_in + b_in  # [B, T, 3u]
        if train and self.recurrent_dropout > 0.0:
            rm = _masks(self.recurrent_dropout, (3, b, u),
                        self.make_rng("dropout"))
        else:
            rm = jnp.ones((3, b, u), dtype=x.dtype)
        if self.reverse:
            xw = jnp.flip(xw, axis=1)
        xw_t = jnp.swapaxes(xw, 0, 1)  # [T, B, 3u]

        def step(h, xw_step):
            z = hard_sigmoid(xw_step[..., :u] + (h * rm[0]) @ u_zr[:, :u])
            r = hard_sigmoid(xw_step[..., u:2 * u]
                             + (h * rm[1]) @ u_zr[:, u:])
            hh = jnp.tanh(xw_step[..., 2 * u:] + (r * (h * rm[2])) @ u_h)
            h_new = z * h + (1.0 - z) * hh
            return h_new, h_new

        h0 = jnp.zeros((b, u), dtype=xw.dtype)
        h_last, hs = jax.lax.scan(step, h0, xw_t)
        if self.return_sequences:
            hs = jnp.swapaxes(hs, 0, 1)
            return jnp.flip(hs, axis=1) if self.reverse else hs
        return h_last


class BiGRU(nn.Module):
    """Bidirectional(GRU(units)) with concat merge (model.py:148)."""

    units: int
    return_sequences: bool = False
    dropout: float = 0.0
    recurrent_dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fwd = GRU(self.units, self.return_sequences, reverse=False,
                  dropout=self.dropout,
                  recurrent_dropout=self.recurrent_dropout,
                  dtype=self.dtype)(x, train)
        bwd = GRU(self.units, self.return_sequences, reverse=True,
                  dropout=self.dropout,
                  recurrent_dropout=self.recurrent_dropout,
                  dtype=self.dtype)(x, train)
        return jnp.concatenate([fwd, bwd], axis=-1)


class AlphaDropout(nn.Module):
    """SELU-preserving dropout (Klambauer et al. 2017), parity with
    keras.layers.noise.AlphaDropout used by the SNN model (model.py:89)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        alpha = 1.6732632423543772
        scale = 1.0507009873554805
        alpha_p = -alpha * scale
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, x.shape)
        a = (1.0 - self.rate) * (1.0 + self.rate * alpha_p ** 2)
        a = jax.lax.rsqrt(a)
        b = -a * alpha_p * self.rate
        return a * jnp.where(keep, x, alpha_p) + b


class Residual1D(nn.Module):
    """Reference residual block (model.py:866-878): optional strided 1x1-BN
    shortcut, two depthwise blocks, max-pool, add.

    ``pool_size`` differs across the zoo: 3 for raw-waveform trunks
    (model.py:877), ``strides`` for the log-mfcc trunk (model.py:1440).
    ``pool_mode``='stride_on_first_conv' reproduces steffeNet's variant
    (model.py:1688-1699) where the stride sits on the first depthwise
    block and there is no pooling.
    """

    features: int
    kernel: int = 3
    strides: int = 1
    pool_size: int = 3
    pool_mode: str = "pool"  # 'pool' | 'pool_eq_stride' | 'stride_on_first_conv'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.strides != 1:
            residual = Conv(self.features, (1,), strides=(self.strides,),
                               padding="SAME", use_bias=False,
                               dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                    dtype=self.dtype)(residual)
        else:
            residual = x
        first_stride = (self.strides
                        if self.pool_mode == "stride_on_first_conv" else 1)
        x = DepthwiseConvBlock(self.features, self.kernel, padding="same",
                               strides=first_stride, dtype=self.dtype)(
                                   x, train)
        x = DepthwiseConvBlock(self.features, self.kernel, padding="same",
                               dtype=self.dtype)(x, train)
        if self.pool_mode == "pool":
            x = max_pool_1d(x, pool=3, strides=self.strides, padding="same")
        elif self.pool_mode == "pool_eq_stride":
            x = max_pool_1d(x, pool=self.strides, strides=self.strides,
                            padding="same")
        return x + residual
