"""Fused separable-conv block Pallas kernel (depthwise -> pointwise).

The flagship trunk (models/zoo.py::Conv1DTimeSlicedWithAttention, parity
with model.py:775-838) is a ladder of DepthwiseConvBlocks: depthwise
k=3 conv -> 1x1 pointwise conv -> BatchNorm -> relu6. The train step is
HBM-bound (docs/TPU_RUN.md roofline: arithmetic intensity 23.6 vs the
v5e ridge ~240), and XLA's fusion already absorbs the elementwise
neighbors into its conv fusions — the one traffic XLA cannot remove is
the depthwise *intermediate*: the dw conv fusion writes [B, T, C] to
HBM and the pointwise fusion reads it straight back. This kernel
computes the pair in one pass per batch tile: the depthwise tap chain
runs on the VPU over VMEM-resident rows, feeds the MXU pointwise matmul
directly, and the intermediate never leaves VMEM.

Optional fusions riding the same pass (both required to break even —
a custom call is a fusion barrier, so whatever the kernel does not
absorb becomes a separate XLA pass that the conv fusions used to get
for free):

  * prologue: per-channel affine + relu6 (the PREVIOUS block's
    BatchNorm apply, folded to a = scale/sqrt(var+eps), b = offset-mean*a)
    applied to x as it is read;
  * epilogue: per-channel sum and sum-of-squares of the block's raw
    output (this block's BatchNorm batch statistics), accumulated
    across the batch grid in VMEM scratch — XLA's stat reduction then
    never re-reads y.

Numerics mirror the XLA path: inputs/weights in the compute dtype
(bf16 on TPU), tap products and matmul accumulation in f32, outputs
rounded to the compute dtype, statistics taken on the *rounded* output
(what flax BatchNorm sees).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _out_len(t: int, k: int, stride: int, padding: str,
             dilation: int = 1) -> Tuple[int, int]:
    """(output length, lo pad) under lax string padding semantics."""
    span = (k - 1) * dilation + 1
    if padding == "SAME":
        out = -(-t // stride)
        pad_total = max(0, (out - 1) * stride + span - t)
        return out, pad_total // 2
    return (t - span) // stride + 1, 0


def _dec3(xp, tap, t_out, stride):
    """Rows tap, tap+stride, ... along axis 1 of ``xp`` [TB, Tp, C].

    Mosaic rejects strided vector slices, so stride-2 decimation is a
    contiguous slice + middle-dim split (layout-preserving)."""
    if stride == 1:
        return jax.lax.slice_in_dim(xp, tap, tap + t_out, 1, axis=1)
    tb, tp, c = xp.shape
    need = t_out * stride
    sl = jax.lax.slice_in_dim(
        xp, tap, tap + min((t_out - 1) * stride + 1, tp - tap), 1, axis=1)
    if sl.shape[1] < need:
        sl = jnp.concatenate(
            [sl, jnp.zeros((tb, need - sl.shape[1], c), sl.dtype)], axis=1)
    return sl.reshape(tb, t_out, stride, c)[:, :, 0]


def _pad_time(x3, pad_lo, hi):
    """Zero-pad axis 1 of [TB, T, C] by (pad_lo, hi)."""
    if not pad_lo and hi <= 0:
        return x3
    tb, _, c = x3.shape
    zrow = jnp.zeros((tb, max(pad_lo, hi, 1), c), x3.dtype)
    return jnp.concatenate(
        ([zrow[:, :pad_lo]] if pad_lo else []) + [x3]
        + ([zrow[:, :hi]] if hi > 0 else []), axis=1)


def _kernel(x_ref, a_ref, b_ref, wdw_ref, wpw_ref,
            y_ref, s1_ref, s2_ref,
            acc1, acc2,
            *, k, stride, pad_lo, t_in, t_out, prologue, emit_stats,
            batch_tile, out_dtype, fold_weights):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    if emit_stats:
        @pl.when(i == 0)
        def _init():
            acc1[:] = jnp.zeros_like(acc1)
            acc2[:] = jnp.zeros_like(acc2)

    x3 = x_ref[:]                                  # [TB, T, Cin]
    if prologue:
        # affine + relu6 in the compute dtype — same arithmetic the
        # flax BatchNorm(dtype=bf16) apply would do
        a = a_ref[0].astype(out_dtype)
        b = b_ref[0].astype(out_dtype)
        x3 = jnp.clip(x3 * a + b, jnp.asarray(0, out_dtype),
                      jnp.asarray(6, out_dtype))
    hi = (t_out - 1) * stride + k - t_in - pad_lo
    xp3 = _pad_time(x3, pad_lo, hi)

    if fold_weights:
        # y = sum_i dec(xp, i) @ (diag(wdw_i) @ wpw): no depthwise VPU
        # pass at all — the tap chain rides the MXU on pre-folded
        # [k, Cin, Cout] weights (built outside in f32).
        w = wpw_ref[:]                             # [k, Cin, Cout]
        y = None
        for tap in range(k):
            sl = _dec3(xp3, tap, t_out, stride)    # [TB, t_out, Cin]
            term = _mm(sl, w[tap])
            y = term if y is None else y + term
    else:
        wdw = wdw_ref[:].astype(out_dtype)         # [k, Cin]
        wpw = wpw_ref[:]                           # [Cin, Cout]
        dw = None
        for tap in range(k):
            term = _dec3(xp3, tap, t_out, stride) * wdw[tap]
            dw = term if dw is None else dw + term
        y = _mm(dw, wpw)                           # [TB, t_out, Cout] f32
    y = y.astype(out_dtype)
    y_ref[:] = y

    if emit_stats:
        # per-channel sum / sum-of-squares on the MXU: ones-contraction
        # over (TB, t_out); squares in compute dtype, accumulation f32
        acc1[:] += _ones_contract(y)[None, :]
        acc2[:] += _ones_contract(y * y)[None, :]

    if emit_stats:
        @pl.when(i == n - 1)
        def _emit():
            s1_ref[:] = acc1[:]
            s2_ref[:] = acc2[:]


def _pick_batch_tile(batch: int, t_in: int, cin: int, cout: int,
                     itemsize: int) -> int:
    """Largest power-of-two tile whose working set stays well under VMEM.

    Counts the tile-wide temporaries the kernel actually holds: ~3
    input-sized compute-dtype buffers (x, padded x, dw taps), the f32
    matmul output plus its rounded copy, and double-buffered I/O blocks
    managed by the pipeline. Over-allocation does not fail gracefully —
    the TPU compiler subprocess just dies — so stay conservative."""
    for tile in (16, 8, 4, 2, 1):
        if batch % tile:
            continue
        t_out = t_in  # upper bound
        vmem = (tile * t_in * cin * itemsize * 5          # x/xp/dw + i/o
                + tile * t_out * cout * (4 + 3 * itemsize))
        if vmem < 6 * 1024 * 1024:
            return tile
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("stride", "padding", "emit_stats", "fold_weights",
                     "interpret"))
def fused_separable_block(x: jax.Array,          # [B, T, Cin]
                          w_dw: jax.Array,       # [k, 1, Cin] (flax layout)
                          w_pw: jax.Array,       # [1, Cin, Cout]
                          a: Optional[jax.Array] = None,   # [Cin] f32
                          b: Optional[jax.Array] = None,   # [Cin] f32
                          *, stride: int = 1, padding: str = "VALID",
                          emit_stats: bool = True,
                          fold_weights: bool = True,
                          interpret: bool = False):
    """relu6(a*x+b) -> depthwise k-tap conv -> 1x1 pointwise, one pass.

    Returns ``(y, s1, s2)`` with ``y: [B, To, Cout]`` in ``x.dtype`` and
    ``s1/s2: [Cout] f32`` the per-channel sum and sum-of-squares of
    ``y`` over (batch, time) — exactly what BatchNorm's batch statistics
    need. If ``a`` is None the prologue is the identity (the block input
    is already activated). With ``emit_stats=False`` returns just ``y``.

    ``fold_weights=True`` computes ``y = sum_i dec(x, i) @ W_i`` with
    ``W_i = diag(wdw_i) @ wpw`` pre-folded in f32 — the depthwise tap
    chain becomes k MXU matmuls instead of VPU passes (k x the matmul
    FLOPs, but the step is VPU/HBM-bound, not MXU-bound). Numerically
    this never rounds the depthwise intermediate to the compute dtype;
    the non-folded path mirrors the XLA lowering's rounding exactly.
    """
    batch, t_in, cin = x.shape
    k = w_dw.shape[0]
    cout = w_pw.shape[-1]
    t_out, pad_lo = _out_len(t_in, k, stride, padding)
    prologue = a is not None
    out_dtype = x.dtype

    batch_tile = _pick_batch_tile(batch, t_in, cin, cout,
                                  jnp.dtype(out_dtype).itemsize)
    grid = batch // batch_tile

    wdw2 = w_dw.reshape(k, cin).astype(out_dtype)
    if fold_weights:
        wpw2 = (w_dw.reshape(k, cin, 1).astype(jnp.float32)
                * w_pw.reshape(1, cin, cout).astype(jnp.float32)
                ).astype(out_dtype)                # [k, Cin, Cout]
        wpw_spec = pl.BlockSpec((k, cin, cout), lambda *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        wpw2 = w_pw.reshape(cin, cout).astype(out_dtype)
        wpw_spec = pl.BlockSpec((cin, cout), lambda *_: (0, 0),
                                memory_space=pltpu.VMEM)
    if prologue:
        a2 = a.reshape(1, cin).astype(jnp.float32)
        b2 = b.reshape(1, cin).astype(jnp.float32)
    else:
        a2 = jnp.zeros((1, cin), jnp.float32)
        b2 = jnp.zeros((1, cin), jnp.float32)

    kernel = functools.partial(
        _kernel, k=k, stride=stride, pad_lo=pad_lo, t_in=t_in,
        t_out=t_out, prologue=prologue, emit_stats=emit_stats,
        batch_tile=batch_tile, out_dtype=out_dtype,
        fold_weights=fold_weights)

    out_shapes = [jax.ShapeDtypeStruct((batch, t_out, cout), out_dtype),
                  jax.ShapeDtypeStruct((1, cout), jnp.float32),
                  jax.ShapeDtypeStruct((1, cout), jnp.float32)]
    full = lambda *_: (0, 0)
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((batch_tile, t_in, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin), full, memory_space=pltpu.VMEM),
            wpw_spec,
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, t_out, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), full, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, cout), jnp.float32),
            pltpu.VMEM((1, cout), jnp.float32),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(x, a2, b2, wdw2, wpw2)
    if emit_stats:
        return y, s1.reshape(cout), s2.reshape(cout)
    return y


def _flat2(v3):
    """[TB, T, C] -> [TB*T, C] (leading-dim merge, layout-preserving)."""
    tb, t, c = v3.shape
    return v3.reshape(tb * t, c)


def _mm(a3, w):
    """[TB, T, Cin] @ [Cin, Cout] -> [TB, T, Cout] f32 via one flattened
    MXU matmul (Mosaic only takes plain 2-D dot dimension numbers)."""
    tb, t, _ = a3.shape
    out = jax.lax.dot_general(
        _flat2(a3), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(tb, t, w.shape[-1])


def _ones_contract(v3, *_unused):
    """f32 [C] sum of v3 [TB, T, C] over (TB, T) via an MXU
    ones-contraction (exact f32 accumulation of the elements)."""
    v2 = _flat2(v3)
    ones = jnp.ones((1, v2.shape[0]), v3.dtype)
    return jax.lax.dot_general(
        ones, v2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]


def _bwd_kernel(x_ref, y_ref, dy_ref, ds1_ref, ds2_ref, a_ref, b_ref,
                wdw_ref, wpw_ref,
                dx_ref, dwdw_ref, dwpw_ref, da_ref, db_ref,
                acc_wdw, acc_wpw, acc_da, acc_db,
                *, k, stride, pad_lo, t_in, t_out, prologue,
                batch_tile, cdtype):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_wdw[:] = jnp.zeros_like(acc_wdw)
        acc_wpw[:] = jnp.zeros_like(acc_wpw)
        acc_da[:] = jnp.zeros_like(acc_da)
        acc_db[:] = jnp.zeros_like(acc_db)

    wdw = wdw_ref[:].astype(cdtype)                  # [k, Cin]
    wpw = wpw_ref[:]                                  # [Cin, Cout]
    ds1 = ds1_ref[:].astype(jnp.float32)              # [1, Cout]
    ds2 = ds2_ref[:].astype(jnp.float32)
    cin = x_ref.shape[-1]
    t_pad = (t_out - 1) * stride + k                  # padded input length
    hi = t_pad - t_in - pad_lo

    x3 = x_ref[:]                                     # [TB, T, Cin]
    if prologue:
        a = a_ref[0].astype(cdtype)
        b = b_ref[0].astype(cdtype)
        pre3 = x3 * a + b
        xin3 = jnp.clip(pre3, jnp.asarray(0, cdtype),
                        jnp.asarray(6, cdtype))
    else:
        xin3 = x3
    xp3 = _pad_time(xin3, pad_lo, hi)                 # [TB, Tp, Cin]

    # recompute the depthwise output (needed for the pointwise grad)
    dw3 = None
    for tap in range(k):
        term = _dec3(xp3, tap, t_out, stride) * wdw[tap]
        dw3 = term if dw3 is None else dw3 + term     # [TB, To, Cin]

    # total output cotangent incl. the stats outputs:
    # s1 = sum(y), s2 = sum(y^2)  =>  dy += ds1 + 2*y*ds2
    y3 = y_ref[:].astype(jnp.float32)                 # rounded y (residual)
    dy3f = dy_ref[:].astype(jnp.float32) + ds1[0] + 2.0 * y3 * ds2[0]
    dy3 = dy3f.astype(cdtype)                         # [TB, To, Cout]

    # pointwise grads — one flattened contraction each
    acc_wpw[:] += jax.lax.dot_general(
        _flat2(dw3), _flat2(dy3), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [Cin, Cout]
    ddw3 = jax.lax.dot_general(
        _flat2(dy3), wpw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(
            batch_tile, t_out, cin).astype(cdtype)    # [TB, To, Cin]

    # depthwise kernel grads: tap i sees xp rows i, i+s, ...
    for tap in range(k):
        prod = _dec3(xp3, tap, t_out, stride) * ddw3
        acc_wdw[tap, :] += _ones_contract(prod)

    # transpose conv: dxp[:, i + s*t] += wdw[i] * ddw[:, t]
    if stride == 1:
        z = ddw3
    else:
        z = jnp.concatenate(
            [ddw3[:, :, None, :],
             jnp.zeros((batch_tile, t_out, stride - 1, cin), ddw3.dtype)],
            axis=2).reshape(batch_tile, t_out * stride, cin)
        z = z[:, :(t_out - 1) * stride + 1]
    zl = z.shape[1]
    dxp = None
    for tap in range(k):
        tail = t_pad - tap - zl
        piece = z * wdw[tap]
        if tail < 0:
            piece = piece[:, :zl + tail]
        parts = []
        if tap:
            parts.append(jnp.zeros((batch_tile, tap, cin), piece.dtype))
        parts.append(piece)
        if tail > 0:
            parts.append(jnp.zeros((batch_tile, tail, cin), piece.dtype))
        piece = jnp.concatenate(parts, axis=1) if len(parts) > 1 \
            else parts[0]
        dxp = piece if dxp is None else dxp + piece
    dxin3 = jax.lax.slice_in_dim(dxp, pad_lo, pad_lo + t_in, 1, axis=1)

    if prologue:
        zero = jnp.asarray(0, cdtype)
        mask = jnp.logical_and(pre3 > zero, pre3 < jnp.asarray(6, cdtype))
        dpre3 = jnp.where(mask, dxin3, zero)
        dx_ref[:] = (dpre3 * a).astype(dx_ref.dtype)
        acc_da[:] += _ones_contract(dpre3 * x3)[None, :]
        acc_db[:] += _ones_contract(dpre3)[None, :]
    else:
        dx_ref[:] = dxin3.astype(dx_ref.dtype)

    @pl.when(i == n - 1)
    def _emit():
        dwdw_ref[:] = acc_wdw[:]
        dwpw_ref[:] = acc_wpw[:]
        da_ref[:] = acc_da[:]
        db_ref[:] = acc_db[:]


def _fused_block_bwd_pallas(x, y, dy, ds1, ds2, a, b, w_dw, w_pw, *,
                            stride, padding, prologue, interpret):
    batch, t_in, cin = x.shape
    k = w_dw.shape[0]
    cout = w_pw.shape[-1]
    t_out, pad_lo = _out_len(t_in, k, stride, padding)
    cdtype = x.dtype

    batch_tile = _pick_batch_tile(batch, t_in, cin, cout,
                                  jnp.dtype(cdtype).itemsize)
    # bwd keeps ~2x the row temporaries of fwd; halve the tile
    batch_tile = max(1, batch_tile // 2) if batch % max(
        1, batch_tile // 2) == 0 else batch_tile
    grid = batch // batch_tile

    wdw2 = w_dw.reshape(k, cin).astype(cdtype)
    wpw2 = w_pw.reshape(cin, cout).astype(cdtype)
    a2 = (a if a is not None else jnp.zeros((cin,))).reshape(1, cin) \
        .astype(jnp.float32)
    b2 = (b if b is not None else jnp.zeros((cin,))).reshape(1, cin) \
        .astype(jnp.float32)
    ds1_2 = ds1.reshape(1, cout).astype(jnp.float32)
    ds2_2 = ds2.reshape(1, cout).astype(jnp.float32)

    kernel = functools.partial(
        _bwd_kernel, k=k, stride=stride, pad_lo=pad_lo, t_in=t_in,
        t_out=t_out, prologue=prologue, batch_tile=batch_tile,
        cdtype=cdtype)
    full = lambda *_: tuple(0 for _ in range(2))
    out_shapes = [
        jax.ShapeDtypeStruct((batch, t_in, cin), cdtype),      # dx
        jax.ShapeDtypeStruct((k, cin), jnp.float32),           # dwdw
        jax.ShapeDtypeStruct((cin, cout), jnp.float32),        # dwpw
        jax.ShapeDtypeStruct((1, cin), jnp.float32),           # da
        jax.ShapeDtypeStruct((1, cin), jnp.float32),           # db
    ]
    dx, dwdw, dwpw, da, db = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((batch_tile, t_in, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, t_out, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, t_out, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, t_in, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), full, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, cin), jnp.float32),
            pltpu.VMEM((cin, cout), jnp.float32),
            pltpu.VMEM((1, cin), jnp.float32),
            pltpu.VMEM((1, cin), jnp.float32),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(x, y, dy, ds1_2, ds2_2, a2, b2, wdw2, wpw2)
    return dx, dwdw, dwpw, da.reshape(cin), db.reshape(cin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_separable_block_vjp(x, a, b, w_dw, w_pw,
                              stride, padding, interpret):
    """Differentiable fused block: like :func:`fused_separable_block`
    (prologue always on — `a`/`b` required) but with a hand-written
    Pallas backward that recomputes the prologue/depthwise chain in
    VMEM instead of reloading stored intermediates from HBM.

    Returns ``(y, s1, s2)``; cotangents flow to all five tensor inputs.
    """
    return fused_separable_block(x, w_dw, w_pw, a, b, stride=stride,
                                 padding=padding, emit_stats=True,
                                 interpret=interpret)


def _vjp_fwd(x, a, b, w_dw, w_pw, stride, padding, interpret):
    out = fused_separable_block(x, w_dw, w_pw, a, b, stride=stride,
                                padding=padding, emit_stats=True,
                                interpret=interpret)
    return out, (x, a, b, w_dw, w_pw, out[0])


def _vjp_bwd(stride, padding, interpret, res, cts):
    x, a, b, w_dw, w_pw, y = res
    dy, ds1, ds2 = cts
    dx, dwdw, dwpw, da, db = _fused_block_bwd_pallas(
        x, y, dy, ds1, ds2, a, b, w_dw, w_pw, stride=stride,
        padding=padding, prologue=True, interpret=interpret)
    return (dx,
            da.astype(a.dtype), db.astype(b.dtype),
            dwdw.reshape(w_dw.shape).astype(w_dw.dtype),
            dwpw.reshape(w_pw.shape).astype(w_pw.dtype))


fused_separable_block_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def reference_block(x, w_dw, w_pw, a=None, b=None, *, stride=1,
                    padding="VALID"):
    """jnp twin of :func:`fused_separable_block` for equivalence tests."""
    if a is not None:
        x = jnp.clip(x.astype(jnp.float32) * a + b, 0.0, 6.0).astype(x.dtype)
    cin = x.shape[-1]
    dw = jax.lax.conv_general_dilated(
        x, w_dw.astype(x.dtype), (stride,), padding,
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=cin)
    y = jax.lax.conv_general_dilated(
        dw, w_pw.astype(x.dtype), (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1)), jnp.sum(yf * yf, axis=(0, 1))
