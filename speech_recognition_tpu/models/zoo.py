"""The 25-model zoo + registry dispatcher (parity: model.py:79-1781).

Every reference Keras constructor has a flax.linen equivalent here with
the same architecture, input representation, and optimizer recipe. Two
deliberate divergences (documented per SURVEY §7 hard part 5):

  * Models emit **logits**; softmax lives in the loss / prediction head.
  * The reference's grouped-conv slicing bugs (model.py:1032,1368 convolve
    the full tensor per group; model.py:1382-1386 pass stale channel
    counts that silently drop channels) are replaced by the *intended*
    grouped semantics: ``feature_group_count=g`` over the actual channels,
    truncating to a divisible channel count when necessary (exactly what
    the reference's slicing achieves in its non-buggy call sites, e.g.
    conv_1d_spec's 257 -> 252 truncation at model.py:1306).

Input contract matches the reference: one flat float32 feature vector per
clip ([B, input_size]), or a (mfcc, raw) tuple for ``conv_1d_mfcc_and_raw``
(model.py:1654).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_recognition_tpu.models import layers as L
from speech_recognition_tpu.ops.framing import overlapping_frames


def _truncate_to_groups(x: jax.Array, groups: int) -> jax.Array:
    """Drop trailing channels so channels % groups == 0 (model.py:1306)."""
    c = x.shape[-1]
    keep = (c // groups) * groups
    return x[..., :keep] if keep != c else x


# ---------------------------------------------------------------------------
# Dense models
# ---------------------------------------------------------------------------


class SimpleModel(nn.Module):
    """Preprocess -> Dense softmax (model.py:102-113)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = L.preprocess_mfcc(x)
        return L.Dense(self.num_classes)(x)


class SNNModel(nn.Module):
    """SELU MLP with AlphaDropout (model.py:79-99)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = L.preprocess_mfcc(x)
        for hidden, rate in [(512, 0.1), (256, 0.1), (128, 0.1), (64, 0.05)]:
            x = L.Dense(hidden, kernel_init=nn.initializers.lecun_normal())(x)
            x = jax.nn.selu(x)
            x = L.AlphaDropout(rate)(x, train)
        return L.Dense(self.num_classes,
                        kernel_init=nn.initializers.lecun_normal())(x)


# ---------------------------------------------------------------------------
# Raw-waveform 1-D CNNs
# ---------------------------------------------------------------------------


class Conv1DSimple(nn.Module):
    """Depthwise reduce/context stack -> BiGRU(128) (model.py:116-156)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]  # [B, T, 1]
        x = L.DepthwiseConvBlock(32, 31, padding="valid", strides=16)(x, train)
        x = L.DepthwiseConvBlock(32, 3, padding="valid")(x, train)
        for hidden in [64, 96, 128, 160, 192, 224]:
            x = L.DepthwiseConvBlock(hidden, 3, padding="valid",
                                     strides=2)(x, train)
            x = L.DepthwiseConvBlock(hidden, 3, padding="valid")(x, train)
        x = L.BiGRU(128, dropout=0.2, recurrent_dropout=0.2)(x, train)
        return L.Dense(self.num_classes)(x)


class Conv1DInception(nn.Module):
    """1-D Inception trunk on raw audio (model.py:159-254)."""

    num_classes: int

    def _reduce(self, x, f, k, train, strides=2, padding="same"):
        return L.ConvBN(f, (k,), strides=(strides,), padding=padding)(x, train)

    def _context(self, x, f, k, train, padding="same", dilation=1):
        return L.ConvBN(f, (k,), padding=padding,
                        dilation=(dilation,))(x, train)

    def _inception(self, x, base, train):
        b1 = self._context(x, int(2 * base), 1, train)
        b5 = self._context(x, int(1.5 * base), 1, train)
        b5 = self._context(b5, int(2 * base), 5, train)
        b3 = self._context(x, int(2 * base), 1, train)
        b3 = self._context(b3, int(3 * base), 3, train)
        b3 = self._context(b3, int(3 * base), 3, train)
        bp = L.avg_pool_1d(x, 3, 1, "same")
        bp = self._context(bp, base, 1, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def _reduce_inception(self, x, base, strides, train):
        b3 = self._reduce(x, int(6 * base), 3, train, strides, "valid")
        bd = self._context(x, base, 1, train)
        bd = self._context(bd, int(1.5 * base), 3, train)
        bd = self._reduce(bd, int(1.5 * base), 3, train, strides, "valid")
        bp = L.max_pool_1d(x, 3, strides, "valid")
        return jnp.concatenate([b3, bd, bp], axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]
        # stem (model.py:187-200): valid convs down to ~120 frames
        for f, k, s in [(32, 5, 4), (64, 3, 2), (128, 3, 2), (256, 3, 2),
                        (384, 3, 2), (512, 3, 2)]:
            x = self._reduce(x, f, k, train, s, "valid")
            x = self._context(x, f, 3, train, "valid")
        x = self._inception(x, 32, train)
        x = self._inception(x, 16, train)
        x = self._reduce_inception(x, 32, 2, train)
        x = self._inception(x, 32, train)
        x = self._inception(x, 32, train)
        x = self._reduce_inception(x, 64, 2, train)
        x = self._inception(x, 64, train)
        x = self._inception(x, 64, train)
        x = self._reduce_inception(x, 96, 2, train)
        x = self._inception(x, 96, train)
        x = self._inception(x, 96, train)
        x = nn.Dropout(0.15, deterministic=not train)(x)
        x = L.Conv(self.num_classes, (14,), padding="VALID")(x)
        return x.reshape(x.shape[0], -1)


class _StackedLadder(nn.Module):
    """Conv+BN+relu6 / MaxPool ladder used by conv_1d_time_stacked and
    conv_1d_heavy (model.py:257-309,409-467)."""

    num_classes: int
    stack_shape: Tuple[int, int]
    widths: Sequence[int]
    heavy_head: bool = False
    head_kernel: int = 5
    dropout: float = 0.3

    def _reduce(self, x, f, k, train):
        x = L.ConvBN(f, (k,), padding="valid")(x, train)
        return L.max_pool_1d(x, 3, 2, "valid")

    def _context(self, x, f, k, train):
        return L.ConvBN(f, (k,), padding="valid")(x, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, *self.stack_shape)
        x = self._context(x, 32, 1, train)
        for w in self.widths:
            x = self._reduce(x, w, 3, train)
            x = self._context(x, w, 3, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.heavy_head:
            x = L.ConvBN(128, (self.head_kernel,), padding="valid")(x, train)
            x = nn.Dropout(0.1, deterministic=not train)(x)
            x = L.Conv(self.num_classes, (1,), use_bias=False,
                        padding="VALID")(x)
        else:
            x = L.Conv(self.num_classes, (self.head_kernel,),
                        padding="VALID")(x)
        return x.reshape(b, -1)


def conv_1d_time_stacked(num_classes):
    return _StackedLadder(num_classes, (800, 20),
                          [48, 96, 128, 160, 192, 256])


def conv_1d_heavy(num_classes):
    return _StackedLadder(num_classes, (1600, 10),
                          [48, 96, 128, 160, 192, 256, 320], heavy_head=True)


class InceptionD1(nn.Module):
    """Dilated Inception on [800, 20] stacking (model.py:312-406)."""

    num_classes: int

    def _reduce(self, x, f, k, train, strides=2, padding="same"):
        x = L.ConvBN(f, (k,), padding=padding)(x, train)
        return L.max_pool_1d(x, 3, strides, padding)

    def _context(self, x, f, k, train, padding="same", dilation=1):
        return L.ConvBN(f, (k,), padding=padding,
                        dilation=(dilation,))(x, train)

    def _inception(self, x, base, train, dilation=1):
        b1 = self._context(x, int(2 * base), 1, train)
        b5 = self._context(x, int(1.5 * base), 1, train)
        b5 = self._context(b5, int(2 * base), 3, train, dilation=2)
        b3 = self._context(x, int(2 * base), 1, train)
        b3 = self._context(b3, int(3 * base), 3, train, dilation=dilation)
        b3 = self._context(b3, int(3 * base), 3, train, dilation=dilation)
        bp = L.avg_pool_1d(x, 3, 1, "same")
        bp = self._context(bp, base, 1, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def _reduce_inception(self, x, base, strides, train):
        b3 = self._reduce(x, int(6 * base), 3, train, strides)
        bd = self._context(x, base, 1, train)
        bd = self._context(bd, int(1.5 * base), 3, train)
        bd = self._reduce(bd, int(1.5 * base), 3, train, strides)
        bp = L.max_pool_1d(x, 3, strides, "same")
        return jnp.concatenate([b3, bd, bp], axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, 800, 20)
        x = self._context(x, 32, 1, train)
        for f in (64, 128, 256):
            x = self._reduce(x, f, 3, train, padding="valid")
            x = self._context(x, f, 3, train, padding="valid")
        x = self._inception(x, 32, train, dilation=2)
        x = self._inception(x, 32, train, dilation=2)
        x = self._reduce_inception(x, 32, 2, train)
        x = self._inception(x, 32, train, dilation=2)
        x = self._inception(x, 32, train)
        x = self._reduce_inception(x, 32, 2, train)
        x = self._inception(x, 32, train)
        x = self._inception(x, 32, train)
        x = self._reduce_inception(x, 32, 2, train)
        x = self._inception(x, 32, train)
        x = self._inception(x, 32, train)
        x = self._reduce_inception(x, 32, 2, train)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = L.Conv(self.num_classes, (6,), padding="VALID")(x)
        return x.reshape(b, -1)


class Conv1DGru(nn.Module):
    """Strided depthwise stem -> dense head (model.py:470-512)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]
        for f, k, s in [(128, 63, 16), (256, 31, 4), (384, 15, 4),
                        (448, 7, 4), (512, 5, 2)]:
            x = L.DepthwiseConvBlock(f, k, padding="same", strides=s)(x, train)
        x = L.DepthwiseConvBlock(512, 8, padding="valid")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = L.relu6(L.Dense(256)(x))
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class Conv1DFast(nn.Module):
    """Learned-filterbank stem + grouped convs (model.py:642-713)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]
        x = L.Conv(252, (479,), strides=(160,), padding="VALID",
                    use_bias=False)(x)
        x = L.ConvBN(300, (15,), strides=(2,), padding="valid",
                     groups=6)(x, train)
        x = L.ConvBN(360, (7,), strides=(2,), padding="valid",
                     groups=5)(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class Conv1DTimeSliced(nn.Module):
    """Framed depthwise reduce ladder + GAP head (model.py:716-772)."""

    num_classes: int
    filter_mult: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.filter_mult
        x = overlapping_frames(x, 40, 20, "SAME")
        x = L.ConvBN(32 * fm, (3,), strides=(2,), padding="valid")(x, train)
        x = L.DepthwiseConvBlock(64 * fm, 3, padding="valid")(x, train)
        for w in (128, 192, 256, 320, 384, 512):
            x = L.DepthwiseConvBlock(w * fm, 3, padding="same",
                                     strides=2)(x, train)
            x = L.DepthwiseConvBlock(w * fm, 3, padding="valid")(x, train)
        x = L.global_avg_pool(x)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = L.relu6(L.Dense(256 * fm, use_bias=False)(x))
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return L.Dense(self.num_classes, use_bias=False)(x)


class Conv1DTimeSlicedWithAttention(nn.Module):
    """The train.py flagship (model.py:775-838): 128-wide framed depthwise
    ladder, learned softmax attention over the 9 remaining frames,
    max+avg-pool fusion. Trained with label smoothing 0.1."""

    num_classes: int
    filter_mult: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.filter_mult
        x = overlapping_frames(x, 40, 20, "SAME")
        x = L.ConvBN(128 * fm, (3,), strides=(2,), padding="valid")(x, train)
        x = L.DepthwiseConvBlock(128 * fm, 3, padding="valid")(x, train)
        for w in (192, 256, 320, 384, 512):
            x = L.DepthwiseConvBlock(w * fm, 3, padding="same",
                                     strides=2)(x, train)
            x = L.DepthwiseConvBlock(w * fm, 3, padding="valid")(x, train)
        # x: [B, 9, 512*fm]
        att = nn.Dropout(0.4, deterministic=not train)(
            x.reshape(x.shape[0], -1))
        att = L.Dense(9)(att)
        att = jax.nn.softmax(att, axis=-1)[..., None]  # [B, 9, 1]
        attended = x * att
        x_max = L.global_max_pool(attended)
        x_avg = L.global_avg_pool(x)
        x = jnp.concatenate([x_max, x_avg], axis=-1)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        return L.Dense(self.num_classes, use_bias=False)(x)


class Conv1DResidual(nn.Module):
    """Deep residual depthwise trunk (model.py:841-908)."""

    num_classes: int
    filter_mult: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.filter_mult
        x = overlapping_frames(x, 40, 20, "SAME")
        x = L.ConvBN(64 * fm, (3,), strides=(2,), padding="valid")(x, train)
        x = L.Residual1D(128 * fm, 3, strides=2)(x, train)
        x = L.Residual1D(256 * fm, 3, strides=2)(x, train)
        for _ in range(8):
            x = L.Residual1D(256 * fm, 3)(x, train)
        x = L.Residual1D(512 * fm, 3, strides=2)(x, train)
        x = L.Residual1D(728 * fm, 3, strides=2)(x, train)
        x = L.Residual1D(728 * fm, 3, strides=2)(x, train)
        # The head blocks CREATE AFTER the Residual1D trunk but natural-
        # sort BEFORE it; checkpoint import takes creation order from the
        # explicit manifest (models/keras_order.py), not from names.
        x = L.DepthwiseConvBlock(1024 * fm, 3, padding="same",
                                 strides=2)(x, train)
        x = L.DepthwiseConvBlock(1024 * fm, 3, padding="valid")(x, train)
        x = L.global_avg_pool(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class XceptionWithAttention(nn.Module):
    """Residual trunk + softmax-over-time attention + BiGRU(192)
    (model.py:911-983)."""

    num_classes: int
    filter_mult: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.filter_mult
        x = overlapping_frames(x, 40, 20, "SAME")
        x = L.ConvBN(64 * fm, (3,), strides=(2,), padding="valid")(x, train)
        x = L.Residual1D(128 * fm, 3, strides=2)(x, train)
        x = L.Residual1D(256 * fm, 3, strides=2)(x, train)
        for _ in range(8):
            x = L.Residual1D(256 * fm, 3)(x, train)
        x = L.Residual1D(384 * fm, 3, strides=2)(x, train)
        att = L.DepthwiseConvBlock(1, 5, padding="same")(x, train)
        att = jax.nn.softmax(att, axis=1)  # over time (model.py:971)
        x = x * att
        x = L.BiGRU(192, dropout=0.2, recurrent_dropout=0.2)(x, train)
        return L.Dense(self.num_classes)(x)


class Conv1DTimeSlicedGroup(nn.Module):
    """Dual-resolution grouped depthwise branches (model.py:986-1077)."""

    num_classes: int

    def _ladder(self, x, train, extra_ctx):
        for w in (64, 128, 160, 192, 224):
            x = L.GroupedDepthwiseBlock(w, 3, 4, padding="valid",
                                        strides=2)(
                _truncate_to_groups(x, 4), train)
            x = L.GroupedDepthwiseBlock(w, 3, 2, padding="valid")(
                _truncate_to_groups(x, 2), train)
        if extra_ctx:  # x500 branch only (model.py:1050 vs :1062)
            x = L.GroupedDepthwiseBlock(224, 3, 2, padding="valid")(
                _truncate_to_groups(x, 2), train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x500 = self._ladder(x.reshape(b, 500, 32), train, extra_ctx=True)
        x400 = self._ladder(x.reshape(b, 400, 40), train, extra_ctx=False)
        x400 = jnp.pad(x400, ((0, 0), (1, 0), (0, 0)))  # ZeroPadding1D((1,0))
        x = jnp.concatenate([x500, x400], axis=-1)
        x = nn.Dropout(0.15, deterministic=not train)(x)
        x = L.Conv(128, (8,), padding="VALID")(x)
        x = x.reshape(b, -1)
        x = nn.Dropout(0.05, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class Conv1DMultiTimeSliced(nn.Module):
    """Three polyphase resolutions, multi-tap concat (model.py:1080-1156)."""

    num_classes: int

    def _reduce(self, x, f, k, train):
        x = L.DepthwiseConvBlock(f, k, padding="valid")(x, train)
        return L.max_pool_1d(x, 3, 2, "same")

    def _context(self, x, f, k, train):
        return L.DepthwiseConvBlock(f, k, padding="valid")(x, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        xs4 = x.reshape(b, 4000, 4)
        for f in (16, 32, 48, 64, 96, 128, 160):
            xs4 = self._reduce(xs4, f, 3, train)
        xs4 = self._context(xs4, 160, 3, train)
        xs4a = self._context(xs4, 64, 28, train)
        xs4 = self._reduce(xs4, 192, 3, train)
        xs4 = self._context(xs4, 192, 3, train)
        xs4b = self._context(xs4, 64, 11, train)

        xs5 = x.reshape(b, 3200, 5)
        for f in (16, 32, 48, 64, 96, 128, 160):
            xs5 = self._reduce(xs5, f, 3, train)
        xs5 = self._context(xs5, 160, 3, train)
        xs5a = self._context(xs5, 64, 22, train)
        xs5 = self._reduce(xs5, 192, 3, train)
        xs5 = self._context(xs5, 192, 3, train)
        xs5b = self._context(xs5, 64, 8, train)

        xs25 = x.reshape(b, 640, 25)
        for f in (32, 48, 64, 96, 128):
            xs25 = self._reduce(xs25, f, 3, train)
        xs25 = self._context(xs25, 128, 3, train)
        xs25 = self._context(xs25, 64, 17, train)

        x = jnp.concatenate([xs4a, xs4b, xs5a, xs5b, xs25], axis=-1)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = L.DepthwiseConvBlock(128, 1, padding="valid")(x, train)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = L.Conv(self.num_classes, (1,), padding="VALID")(x)
        return x.reshape(b, -1)


class Conv1DLearnedSpec(nn.Module):
    """6 parallel learned filterbanks -> grouped conv ladder
    (model.py:1159-1246)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x[..., None]
        banks = []
        for k in (479, 383, 319, 255, 191, 161):
            banks.append(L.Conv(40, (k,), strides=(160,), padding="SAME",
                                 use_bias=False)(x))
        x = jnp.concatenate(banks, axis=-1)  # [B, 100, 240]
        for w in (300, 360, 420, 480):
            x = L.ConvBN(w, (3,), strides=(2,), padding="valid", groups=3)(
                _truncate_to_groups(x, 3), train)
            x = L.ConvBN(w, (3,), padding="valid", groups=2)(
                _truncate_to_groups(x, 2), train)
        x = x.reshape(b, -1)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class Conv1DSpec(nn.Module):
    """Grouped conv ladder on the linear spectrogram (model.py:1249-1323).

    Input: flat [B, 98*257]; the 257 bins are sliced to 252 for the
    4-way grouping exactly like the reference (model.py:1306)."""

    num_classes: int
    time_size: int = 98
    frequency_size: int = 257

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, self.time_size, self.frequency_size)
        if self.frequency_size == 257:
            x = x[..., :252]  # explicit 252-bin slice (model.py:1306)
        for w in (300, 360, 420, 480):
            x = L.ConvBN(w, (3,), strides=(2,), padding="valid", groups=4)(
                _truncate_to_groups(x, 4), train)
            x = L.ConvBN(w, (3,), padding="valid", groups=3)(
                _truncate_to_groups(x, 3), train)
        x = x.reshape(b, -1)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class Conv1DTopDown(nn.Module):
    """Wide stem, decreasing-width grouped depthwise ladder
    (model.py:1326-1397)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x[..., None]
        x = L.Conv(480, (479,), strides=(160,), padding="VALID")(x)
        for w in (420, 360, 300, 240):
            x = L.GroupedDepthwiseBlock(w, 3, 3, padding="valid",
                                        strides=2)(
                _truncate_to_groups(x, 3), train)
            x = L.GroupedDepthwiseBlock(w, 3, 2, padding="valid")(
                _truncate_to_groups(x, 2), train)
        x = x.reshape(b, -1)
        x = nn.Dropout(0.05, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


# ---------------------------------------------------------------------------
# Feature-space models (mfcc / spec inputs)
# ---------------------------------------------------------------------------


class Conv2DModel(nn.Module):
    """TF-tutorial 2-D conv on MFCC fingerprints (model.py:515-544)."""

    num_classes: int
    time_size: int = 98
    frequency_size: int = 40

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, self.time_size, self.frequency_size, 1)
        x = L.preprocess_mfcc(x)
        x = L.Conv(64, (20, 8), padding="SAME")(x)
        x = nn.relu(x)
        x = L.max_pool_2d(x)
        x = L.Conv(128, (10, 4), padding="SAME")(x)
        x = nn.relu(x)
        x = L.max_pool_2d(x)
        x = x.reshape(b, -1)
        return L.Dense(self.num_classes)(x)


class Conv2DMobile(nn.Module):
    """Strided conv-BN-relu6 pairs + GAP (model.py:547-594)."""

    num_classes: int
    time_size: int = 98
    frequency_size: int = 40

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, self.time_size, self.frequency_size, 1)
        x = L.preprocess_mfcc(x)
        for f in (32, 64, 128, 256):
            x = L.ConvBN(f, (3, 3), strides=(2, 2), padding="same",
                         use_bias=True)(x, train)
            x = L.ConvBN(f, (3, 3), padding="same", use_bias=True)(x, train)
            x = nn.Dropout(0.05, deterministic=not train)(x)
        x = L.global_avg_pool(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class Conv2DFast(nn.Module):
    """Dilated conv + pool x4, GAP (model.py:597-639).

    ``head`` is an ablation hook (docs/ACCURACY.md: does the GAP head —
    which averages away what is left of temporal order — explain the
    collapse-to-prior on the alias-ceiling corpus?): "gap" is the
    reference-exact default; "flatten" keeps the 6x2 post-pool grid.
    """

    num_classes: int
    time_size: int = 98
    frequency_size: int = 40
    head: str = "gap"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, self.time_size, self.frequency_size, 1)
        x = L.preprocess_mfcc(x)
        specs = [(16, (11, 5), (2, 1)), (32, (5, 3), (2, 1)),
                 (64, (3, 3), (1, 1)), (128, (3, 3), (1, 1))]
        for f, k, d in specs:
            x = L.ConvBN(f, k, padding="same", dilation=d, use_bias=True,
                         activation=nn.relu)(x, train)
            x = L.max_pool_2d(x)
        if self.head == "flatten":
            x = x.reshape(b, -1)
        else:
            x = L.global_avg_pool(x)
        return L.Dense(self.num_classes)(x)


class _ResidualFeatureTrunk(nn.Module):
    """Shared trunk of conv_1d_log_mfcc / conv_1d_spectrogram
    (model.py:1400-1561): Conv1D stem, 10 residual blocks, softmax-over-
    time attention, GAP."""

    num_classes: int
    time_size: int
    frequency_size: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, self.time_size, self.frequency_size)
        x = L.ConvBN(64, (3,), padding="valid")(x, train)
        plan = [(64, 1), (64, 1), (128, 2), (128, 1), (192, 2), (192, 1),
                (192, 1), (256, 2), (256, 1), (256, 1)]
        for f, s in plan:
            x = L.Residual1D(f, 3, strides=s,
                             pool_mode="pool_eq_stride")(x, train)
        # The attention block's [3,1,256] depthwise kernel shares a
        # (kind, shape) group with the trunk's f=256 blocks; checkpoint
        # import takes creation order from the explicit manifest
        # (models/keras_order.py), not from module names.
        att = L.DepthwiseConvBlock(1, 3, padding="same")(x, train)
        att = jax.nn.softmax(att, axis=1)
        x = x * att
        x = L.global_avg_pool(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class Conv1DMfccAndRaw(nn.Module):
    """Two-input fusion model (model.py:1564-1660). Call with a tuple
    (mfcc_flat, raw)."""

    num_classes: int
    time_size: int = 98
    frequency_size: int = 60
    frame_length: int = 480
    frame_step: int = 160

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x_mfcc, x_raw = inputs
        b = x_mfcc.shape[0]
        x_mfcc = x_mfcc.reshape(b, self.time_size, self.frequency_size)
        x_mfcc = L.ConvBN(64, (3,), padding="valid")(x_mfcc, train)
        x_raw = overlapping_frames(x_raw, self.frame_length,
                                   self.frame_step, "VALID")
        x_raw = L.ConvBN(96, (3,), padding="valid")(x_raw, train)
        x = jnp.concatenate([x_mfcc, x_raw], axis=-1)
        plan = [(160, 1), (160, 1), (192, 2), (192, 1), (256, 2), (256, 1),
                (320, 2), (320, 1), (384, 2), (384, 1)]
        for f, s in plan:
            x = L.Residual1D(f, 3, strides=s, pool_mode="pool")(x, train)
        x = L.global_avg_pool(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return L.Dense(self.num_classes)(x)


class SteffeNet(nn.Module):
    """Conv stem + strided residual pairs + max/avg fusion
    (model.py:1663-1726). Trained with label smoothing 0.1."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]
        x = L.ConvBN(256, (75,), strides=(50,), padding="same")(x, train)
        x = L.DepthwiseConvBlock(256, 3, padding="same")(x, train)
        for nh in (320, 384, 512, 768, 1024, 1536):
            x = L.Residual1D(nh, 3, strides=2,
                             pool_mode="stride_on_first_conv")(x, train)
            x = L.Residual1D(nh, 3, pool_mode="stride_on_first_conv")(x, train)
        x = jnp.concatenate([L.global_max_pool(x), L.global_avg_pool(x)],
                            axis=-1)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return L.Dense(self.num_classes, use_bias=False)(x)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Everything the trainer needs for one zoo entry: the module factory,
    its input representation, and the compile recipe the reference baked
    into each constructor (optimizer, LR, label smoothing)."""

    name: str
    build: Callable[..., nn.Module]
    representation: str            # raw | spec | mfcc | mfcc_and_raw
    optimizer: str                 # sgd | adam | rmsprop
    learning_rate: float
    momentum: float = 0.0
    label_smoothing: float = 0.0
    l2_reg: float = 1e-5           # kernel regularizer strength


def _spec(name, build, rep, opt, lr, momentum=0.0, smoothing=0.0):
    return ModelSpec(name=name, build=build, representation=rep,
                     optimizer=opt, learning_rate=lr, momentum=momentum,
                     label_smoothing=smoothing)


MODEL_REGISTRY: Dict[str, ModelSpec] = {s.name: s for s in [
    _spec("simple", SimpleModel, "mfcc", "sgd", 0.01, momentum=0.9),
    _spec("snn", SNNModel, "mfcc", "sgd", 0.01, momentum=0.9),
    _spec("conv_1d_simple", Conv1DSimple, "raw", "adam", 1e-3),
    _spec("inception", Conv1DInception, "raw", "adam", 1e-3),
    _spec("conv_1d_time_stacked", conv_1d_time_stacked, "raw", "adam", 3e-4),
    _spec("inception_d1", InceptionD1, "raw", "adam", 1e-3),
    _spec("conv_1d_heavy", conv_1d_heavy, "raw", "adam", 3e-4),
    _spec("conv_1d_gru", Conv1DGru, "raw", "rmsprop", 1e-3),
    _spec("conv_2d", Conv2DModel, "mfcc", "sgd", 1e-3, momentum=0.9),
    _spec("conv_2d_mobile", Conv2DMobile, "mfcc", "sgd", 1e-3, momentum=0.95),
    _spec("conv_2d_fast", Conv2DFast, "mfcc", "sgd", 1e-3, momentum=0.9),
    _spec("conv_1d_fast", Conv1DFast, "raw", "rmsprop", 3e-3),
    _spec("conv_1d_time_sliced", Conv1DTimeSliced, "raw", "rmsprop", 1e-3),
    _spec("conv_1d_time_sliced_with_attention", Conv1DTimeSlicedWithAttention,
          "raw", "rmsprop", 1e-3, smoothing=0.1),
    _spec("conv_1d_residual", Conv1DResidual, "raw", "rmsprop", 1e-4),
    _spec("xception_with_attention", XceptionWithAttention, "raw",
          "rmsprop", 5e-4),
    _spec("conv_1d_time_sliced_group", Conv1DTimeSlicedGroup, "raw",
          "rmsprop", 1e-3),
    _spec("conv_1d_multi_time_sliced", Conv1DMultiTimeSliced, "raw",
          "rmsprop", 3e-3),
    _spec("conv_1d_learned_spec", Conv1DLearnedSpec, "raw", "rmsprop", 2e-3),
    _spec("conv_1d_spec", Conv1DSpec, "spec", "rmsprop", 2e-3),
    _spec("conv_1d_top_down", Conv1DTopDown, "raw", "rmsprop", 3e-3),
    _spec("conv_1d_log_mfcc", _ResidualFeatureTrunk, "mfcc", "rmsprop", 6e-4),
    _spec("conv_1d_spectrogram", _ResidualFeatureTrunk, "spec",
          "rmsprop", 3e-4),
    _spec("conv_1d_mfcc_and_raw", Conv1DMfccAndRaw, "mfcc_and_raw",
          "rmsprop", 5e-4),
    _spec("steffeNet", SteffeNet, "raw", "rmsprop", 1e-3, smoothing=0.1),
]}


def build_model(model_type: str, num_classes: int = 11,
                **settings: Any) -> Tuple[nn.Module, ModelSpec]:
    """Instantiate a zoo model (parity: speech_model, model.py:1729-1781).

    ``settings`` carries feature geometry for the models that need it
    (spectrogram_length, num_log_mel_features, spectrogram_frequencies,
    desired_samples, window_*_samples) — threaded exactly like the
    reference's **model_settings (train.py:50-54). ``model_kwargs``
    (a dict inside settings) is passed to the module constructor last —
    the hook for non-reference ablation fields like Conv2DFast.head.
    """
    spec = MODEL_REGISTRY.get(model_type)
    if spec is None:
        raise ValueError(f"Invalid model: {model_type}")
    kwargs: Dict[str, Any] = {"num_classes": num_classes}
    t = settings.get("spectrogram_length")
    if model_type in ("conv_1d_log_mfcc",):
        kwargs.update(time_size=t or 65,
                      frequency_size=settings.get("num_log_mel_features", 40))
    elif model_type in ("conv_1d_spectrogram",):
        kwargs.update(time_size=t or 65,
                      frequency_size=settings.get(
                          "spectrogram_frequencies", 257))
    elif model_type == "conv_1d_spec":
        kwargs.update(time_size=t or 98,
                      frequency_size=settings.get(
                          "spectrogram_frequencies", 257))
    elif model_type in ("conv_2d", "conv_2d_mobile", "conv_2d_fast"):
        # the tutorial-era models hardcode 98x40 (model.py:526-527); honor
        # explicit geometry when provided
        kwargs.update(time_size=t or 98,
                      frequency_size=settings.get("num_log_mel_features", 40))
    elif model_type == "conv_1d_mfcc_and_raw":
        kwargs.update(
            time_size=t or 65,
            frequency_size=settings.get("num_log_mel_features", 40),
            frame_length=settings.get("window_size_samples", 480),
            frame_step=settings.get("window_stride_samples", 160))
    kwargs.update(settings.get("model_kwargs") or {})
    module = spec.build(**kwargs)
    return module, spec


def speech_model(model_type: str, input_size: int, num_classes: int = 11,
                 **settings: Any) -> Tuple[nn.Module, ModelSpec]:
    """Reference-signature dispatcher (model.py:1729). ``input_size`` is
    implied by the representation + settings on TPU; kept for parity."""
    del input_size
    return build_model(model_type, num_classes, **settings)
