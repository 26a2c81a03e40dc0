"""Signal framing ops (TPU-native overlapping_time_slice_stack).

The reference frames raw waveforms with ``tf.extract_image_patches``
(model.py:67-76) and strided reshapes (model.py:55-62). Here framing is a
single static gather — XLA turns it into an efficient HBM read with no
data duplication until the consuming matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def same_pad_amount(length: int, ksize: int, stride: int):
    """TF 'SAME' asymmetric padding (left, right) for a 1-D window."""
    out = -(-length // stride)  # ceil
    pad_total = max((out - 1) * stride + ksize - length, 0)
    left = pad_total // 2
    return left, pad_total - left


def overlapping_frames(x: jax.Array, ksize: int, stride: int,
                       padding: str = "SAME") -> jax.Array:
    """[B, T] -> [B, frames, ksize] overlapping frames.

    Parity with ``overlapping_time_slice_stack`` (model.py:67-76), i.e.
    tf.extract_image_patches semantics for both SAME and VALID padding.
    """
    t = x.shape[-1]
    if padding.upper() == "SAME":
        left, right = same_pad_amount(t, ksize, stride)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(left, right)])
        t = t + left + right
    num_frames = 1 + (t - ksize) // stride
    idx = (np.arange(num_frames)[:, None] * stride +
           np.arange(ksize)[None, :]).astype(np.int32)
    return x[..., jnp.asarray(idx)]


def center_crop(data, desired_size: int = 16000):
    """Center crop 1-D/2-D arrays to ``desired_size`` (utils.py:76-84)."""
    if data.ndim == 1:
        left = (data.shape[0] - desired_size) // 2
        return data[left:left + desired_size]
    if data.ndim == 2:
        left = (data.shape[1] - desired_size) // 2
        return data[:, left:left + desired_size]
    raise ValueError(f"Invalid tensor shape: {list(data.shape)}")


def time_slice_stack(x: jax.Array, step: int) -> jax.Array:
    """[B, T] -> [B, T//step, step] polyphase stack (model.py:55-62).

    Equivalent to stacking x[:, i::step] slices channel-wise, which for
    contiguous memory is just a reshape.
    """
    b, t = x.shape
    return x.reshape(b, t // step, step)
