"""Generate TF-twin logits-parity goldens (VERDICT r2 item 2).

Param-count equality cannot catch count-preserving wiring errors
(swapped inception branches, attention on the wrong tensor, pool
placement). This script builds tf.keras twins of ALL 25 reference
constructors (model.py:79-1781; per-model reference lines in each twin's
docstring) — written here against the REFERENCE architecture (not against the flax
zoo), with deterministic weights drawn by tests/goldens/model_twins_lib
(BN statistics randomized so same-shaped weight misassignment changes
logits), and records each twin's logits on fixed inputs. The twins end
in linear heads (logits) because the flax zoo's documented divergence is
softmax-in-the-loss.

tests/test_model_twins.py rebuilds each twin's Keras-2.1.2-layout h5
from the recorded structure + seed (TF-free), imports it with
export/keras_import.py, and asserts flax logits match the stored TF
logits — pinning wiring AND exercising the importer on real branchy
checkpoints (keras_import's equal-shape ordering hazard).

Run manually to (re)generate ``model_twin_goldens.npz``:

    python tests/goldens/generate_model_twin_goldens.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from model_twins_lib import draw_weights, structure_to_json  # noqa: E402

SEED = 20260817


def keras2_hard_sigmoid(x):
    """Keras 2.1.2 hard_sigmoid: clip(0.2x + 0.5, 0, 1). Keras 3 changed
    the definition, so the GRU twin must pass the old one explicitly."""
    from keras import ops as K
    return K.clip(0.2 * x + 0.5, 0.0, 1.0)


_registered = False


def _register_serializables():
    # Bidirectional clones its inner layer through config serialization,
    # so the custom recurrent activation must be registered by name.
    global _registered
    if not _registered:
        import keras
        keras.saving.register_keras_serializable(
            package="twins")(keras2_hard_sigmoid)
        _registered = True


class Twin:
    """Collects weighted keras layers in creation order (the order the
    Keras-2 h5 layout will use)."""

    def __init__(self):
        import keras
        self.keras = keras
        self.records = []  # (name, layer, [(wname, kind), ...])

    def track(self, layer, kinds=None, wrecs=None):
        name = (f"layer_{len(self.records):03d}_"
                f"{layer.__class__.__name__.lower()}")
        if wrecs is None:
            wrecs = [(f"{name}/{k}:0", k) for k in kinds]
        self.records.append((name, layer, wrecs))
        return layer

    # -- building blocks ---------------------------------------------------

    def conv1d(self, x, f, k, strides=1, padding="valid", use_bias=False,
               dilation=1):
        layer = self.keras.layers.Conv1D(
            f, k, strides=strides, padding=padding, use_bias=use_bias,
            dilation_rate=dilation)
        kinds = ["kernel"] + (["bias"] if use_bias else [])
        return self.track(layer, kinds)(x)

    def conv2d(self, x, f, k, padding="same", use_bias=True,
               activation=None, strides=1, dilation=1):
        layer = self.keras.layers.Conv2D(
            f, k, padding=padding, use_bias=use_bias,
            activation=activation, strides=strides,
            dilation_rate=dilation)
        kinds = ["kernel"] + (["bias"] if use_bias else [])
        return self.track(layer, kinds)(x)

    def dense(self, x, units, use_bias=True, activation=None):
        layer = self.keras.layers.Dense(units, use_bias=use_bias,
                                        activation=activation)
        kinds = ["kernel"] + (["bias"] if use_bias else [])
        return self.track(layer, kinds)(x)

    def bn(self, x):
        layer = self.keras.layers.BatchNormalization(momentum=0.99,
                                                     epsilon=1e-3)
        return self.track(
            layer, ["gamma", "beta", "moving_mean", "moving_variance"])(x)

    def relu6(self, x):
        return self.keras.layers.ReLU(max_value=6.0)(x)

    def dw_block(self, x, filters, k, padding="same", strides=1,
                 dilation=1):
        """_depthwise_conv_block (model.py:34-52): expand_dims ->
        DepthwiseConv2D((1, k)) -> squeeze -> pointwise Conv1D -> BN ->
        relu6 (no intermediate activation in any twin call site)."""
        keras = self.keras
        from keras import ops as K
        x = keras.layers.Lambda(lambda v: K.expand_dims(v, 1))(x)
        dw = keras.layers.DepthwiseConv2D(
            (1, k), padding=padding, strides=strides,
            dilation_rate=(1, dilation), use_bias=False)
        x = self.track(dw, ["depthwise_kernel"])(x)
        x = keras.layers.Lambda(lambda v: K.squeeze(v, 1))(x)
        x = self.conv1d(x, filters, 1, use_bias=False)
        x = self.bn(x)
        return self.relu6(x)

    def frame_same(self, x, ksize, stride, padding="SAME"):
        """overlapping_time_slice_stack(x, ksize, stride, padding)
        (model.py:67-76): [B, T] -> [B, frames, ksize]."""
        t = int(x.shape[1])
        if padding.upper() == "SAME":
            out = -(-t // stride)
            pad_total = max((out - 1) * stride + ksize - t, 0)
        else:
            out = (t - ksize) // stride + 1
            pad_total = 0
        left = pad_total // 2
        right = pad_total - left
        idx = (np.arange(out)[:, None] * stride
               + np.arange(ksize)[None, :]).astype("int32")

        def fn(v):
            from keras import ops as K
            if left or right:
                v = K.pad(v, ((0, 0), (left, right)))
            return K.take(v, idx, axis=1)

        return self.keras.layers.Lambda(fn)(x)

    def preprocess(self, x):
        """Preprocess (model.py:13-16): (x + 0.8)/7 clipped to [-5, 5]."""
        from keras import ops as K
        return self.keras.layers.Lambda(
            lambda v: K.clip((v + 0.8) / 7.0, -5.0, 5.0))(x)

    def convbn(self, x, f, k, strides=1, padding="valid", use_bias=False,
               dilation=1, activation="relu6"):
        """Conv1D -> BN -> activation (the reference's plain conv block)."""
        x = self.conv1d(x, f, k, strides=strides, padding=padding,
                        use_bias=use_bias, dilation=dilation)
        x = self.bn(x)
        if activation == "relu6":
            return self.relu6(x)
        return self.keras.layers.Activation(activation)(x)

    def grouped_convbn(self, x, f, k, g, strides=1, padding="valid"):
        """Reference grouped conv (model.py:651-693): per-group slice ->
        Conv1D -> BN -> relu6 -> concat. Recorded as ONE merged layer
        (kernel concat on the output axis, BN params concat on the
        channel axis) — exactly the flax grouped-conv + single-BN
        layout, which is mathematically identical because BN is
        per-channel."""
        keras = self.keras
        c = int(x.shape[-1])
        cg, fg = c // g, f // g
        convs, bns, outs = [], [], []
        for i in range(g):
            sl = keras.layers.Lambda(
                lambda v, i=i: v[:, :, i * cg:(i + 1) * cg])(x)
            conv = keras.layers.Conv1D(fg, k, strides=strides,
                                       padding=padding, use_bias=False)
            bn = keras.layers.BatchNormalization(momentum=0.99,
                                                 epsilon=1e-3)
            outs.append(keras.layers.ReLU(max_value=6.0)(bn(conv(sl))))
            convs.append(conv)
            bns.append(bn)
        merged = keras.layers.Concatenate()(outs)
        name = f"layer_{len(self.records):03d}_groupedconvbn"
        wrecs = [(f"{name}/{kind}:0", kind)
                 for kind in ("kernel", "gamma", "beta", "moving_mean",
                              "moving_variance")]
        self.records.append((name, ("group", convs, bns), wrecs))
        return merged

    def residual_block(self, x, f, k, strides=1):
        """_residual_block (model.py:866-878 / :937-949)."""
        keras = self.keras
        if strides != 1:
            res = self.conv1d(x, f, 1, strides=strides, padding="same",
                              use_bias=False)
            res = self.bn(res)
        else:
            res = x
        y = self.dw_block(x, f, k, padding="same")
        y = self.dw_block(y, f, k, padding="same")
        y = keras.layers.MaxPooling1D(3, strides=strides,
                                      padding="same")(y)
        return keras.layers.Add()([y, res])

    def residual_block_eqpool(self, x, f, k, strides=1):
        """log-mfcc/spectrogram `_residual_block` (model.py:1429-1441):
        MaxPool1D(pool_size=strides) — identity when strides == 1."""
        keras = self.keras
        if strides != 1:
            res = self.conv1d(x, f, 1, strides=strides, padding="same",
                              use_bias=False)
            res = self.bn(res)
        else:
            res = x
        y = self.dw_block(x, f, k, padding="same")
        y = self.dw_block(y, f, k, padding="same")
        if strides != 1:
            y = keras.layers.MaxPooling1D(strides, strides=strides,
                                          padding="same")(y)
        return keras.layers.Add()([y, res])

    def residual_block_steffe(self, x, f, k, strides=1):
        """steffeNet `_residual_block` (model.py:1688-1699): the stride
        sits on the first depthwise block; no pooling."""
        keras = self.keras
        if strides != 1:
            res = self.conv1d(x, f, 1, strides=strides, padding="same",
                              use_bias=False)
            res = self.bn(res)
        else:
            res = x
        y = self.dw_block(x, f, k, padding="same", strides=strides)
        y = self.dw_block(y, f, k, padding="same")
        return keras.layers.Add()([y, res])

    def grouped_dw_block(self, x, f, k, g, padding="valid", strides=1,
                         dilation=1):
        """Reference grouped depthwise block (model.py:999-1017 and the
        *intended* semantics of :1019-1037 — the zoo's documented
        divergence replaces the full-tensor-per-group bug): per-group
        slice -> _depthwise_conv_block -> concat. Recorded as ONE merged
        layer matching the flax GroupedDepthwiseBlock layout: depthwise
        kernels concat on the channel axis, pointwise kernels concat on
        the output axis, BN params concat on the channel axis (exact —
        depthwise is per-channel and BN is per-channel)."""
        keras = self.keras
        from keras import ops as K
        c = int(x.shape[-1])
        assert c % g == 0 and f % g == 0, (c, f, g)
        cg, fg = c // g, f // g
        dws, pws, bns, outs = [], [], [], []
        for i in range(g):
            sl = keras.layers.Lambda(
                lambda v, i=i: v[:, :, i * cg:(i + 1) * cg])(x)
            sl = keras.layers.Lambda(lambda v: K.expand_dims(v, 1))(sl)
            dw = keras.layers.DepthwiseConv2D(
                (1, k), padding=padding, strides=strides,
                dilation_rate=(1, dilation), use_bias=False)
            sl = dw(sl)
            sl = keras.layers.Lambda(lambda v: K.squeeze(v, 1))(sl)
            pw = keras.layers.Conv1D(fg, 1, use_bias=False)
            bn = keras.layers.BatchNormalization(momentum=0.99,
                                                 epsilon=1e-3)
            outs.append(keras.layers.ReLU(max_value=6.0)(bn(pw(sl))))
            dws.append(dw)
            pws.append(pw)
            bns.append(bn)
        merged = keras.layers.Concatenate()(outs) if g > 1 else outs[0]
        name = f"layer_{len(self.records):03d}_groupeddw"
        wrecs = [(f"{name}/{kind}:0", kind)
                 for kind in ("depthwise_kernel", "kernel", "gamma",
                              "beta", "moving_mean", "moving_variance")]
        self.records.append((name, ("gdw", dws, pws, bns), wrecs))
        return merged

    # -- weight I/O --------------------------------------------------------

    def _group_weights(self, convs, bns):
        ks = [c.get_weights()[0] for c in convs]
        bws = [b.get_weights() for b in bns]
        return [np.concatenate(ks, axis=-1)] + [
            np.concatenate([bw[j] for bw in bws], axis=0)
            for j in range(4)]

    def _gdw_weights(self, dws, pws, bns):
        dk = np.concatenate([d.get_weights()[0] for d in dws], axis=2)
        pk = np.concatenate([p.get_weights()[0] for p in pws], axis=-1)
        bws = [b.get_weights() for b in bns]
        return [dk, pk] + [np.concatenate([bw[j] for bw in bws], axis=0)
                           for j in range(4)]

    def structure(self):
        out = []
        for name, layer, wrecs in self.records:
            if isinstance(layer, tuple) and layer[0] == "group":
                ws = self._group_weights(layer[1], layer[2])
            elif isinstance(layer, tuple) and layer[0] == "gdw":
                ws = self._gdw_weights(layer[1], layer[2], layer[3])
            else:
                ws = layer.get_weights()
            assert len(ws) == len(wrecs), \
                (name, len(ws), [k for _, k in wrecs])
            out.append((name, [(wname, kind, list(w.shape))
                               for (wname, kind), w in zip(wrecs, ws)]))
        return out

    def set_weights(self, flat):
        it = iter(flat)
        for _name, layer, wrecs in self.records:
            ws = [next(it) for _ in wrecs]
            if isinstance(layer, tuple) and layer[0] == "group":
                _tag, convs, bns = layer
                g = len(convs)
                kernel = ws[0]
                fg = kernel.shape[-1] // g
                for i, conv in enumerate(convs):
                    conv.set_weights([kernel[..., i * fg:(i + 1) * fg]])
                cg = ws[1].shape[0] // g
                for i, bn in enumerate(bns):
                    bn.set_weights([w[i * cg:(i + 1) * cg]
                                    for w in ws[1:]])
            elif isinstance(layer, tuple) and layer[0] == "gdw":
                _tag, dws, pws, bns = layer
                g = len(dws)
                dk, pk = ws[0], ws[1]
                cg = dk.shape[2] // g
                fg = pk.shape[-1] // g
                for i, dw in enumerate(dws):
                    dw.set_weights([dk[:, :, i * cg:(i + 1) * cg, :]])
                for i, pw in enumerate(pws):
                    pw.set_weights([pk[..., i * fg:(i + 1) * fg]])
                fb = pk.shape[-1] // g
                for i, bn in enumerate(bns):
                    bn.set_weights([w[i * fb:(i + 1) * fb]
                                    for w in ws[2:]])
            else:
                layer.set_weights(ws)


# ---------------------------------------------------------------------------
# The four twins
# ---------------------------------------------------------------------------


def twin_flagship(num_classes=12):
    """conv_1d_time_sliced_with_attention (model.py:775-838), linear head."""
    import keras
    from keras import ops as K
    t = Twin()
    inp = keras.Input((16000,))
    x = t.frame_same(inp, 40, 20)
    x = t.conv1d(x, 128, 3, strides=2, use_bias=False)  # default 'valid'
    x = t.bn(x)
    x = t.relu6(x)
    x = t.dw_block(x, 128, 3, padding="valid")
    for w in (192, 256, 320, 384, 512):
        x = t.dw_block(x, w, 3, padding="same", strides=2)
        x = t.dw_block(x, w, 3, padding="valid")
    att = keras.layers.Flatten()(x)                      # Dropout inert
    att = t.dense(att, 9, use_bias=True, activation="softmax")
    att = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(att)
    attended = keras.layers.Multiply()([x, att])
    x_max = keras.layers.GlobalMaxPooling1D()(attended)
    x_avg = keras.layers.GlobalAveragePooling1D()(x)
    x = keras.layers.Concatenate()([x_max, x_avg])
    x = t.dense(x, num_classes, use_bias=False)          # logits
    return keras.Model(inp, x), t


def twin_inception(num_classes=12):
    """conv_1d_inception (model.py:159-254), linear head."""
    import keras
    from keras import ops as K
    t = Twin()

    def reduce_conv(x, f, k, strides=2, padding="same"):
        x = t.conv1d(x, f, k, strides=strides, padding=padding,
                     use_bias=False)
        x = t.bn(x)
        return t.relu6(x)

    def context_conv(x, f, k, padding="same"):
        x = t.conv1d(x, f, k, padding=padding, use_bias=False)
        x = t.bn(x)
        return t.relu6(x)

    def inception_block(x, base):
        b1 = context_conv(x, int(2 * base), 1)
        b5 = context_conv(x, int(1.5 * base), 1)
        b5 = context_conv(b5, int(2 * base), 5)
        b3 = context_conv(x, int(2 * base), 1)
        b3 = context_conv(b3, int(3 * base), 3)
        b3 = context_conv(b3, int(3 * base), 3)
        bp = keras.layers.AveragePooling1D(3, strides=1, padding="same")(x)
        bp = context_conv(bp, base, 1)
        return keras.layers.Concatenate()([b1, b5, b3, bp])

    def reduce_inception(x, base, strides):
        b3 = reduce_conv(x, int(6 * base), 3, strides, "valid")
        bd = context_conv(x, base, 1)
        bd = context_conv(bd, int(1.5 * base), 3)
        bd = reduce_conv(bd, int(1.5 * base), 3, strides, "valid")
        bp = keras.layers.MaxPooling1D(3, strides=strides)(x)
        return keras.layers.Concatenate()([b3, bd, bp])

    inp = keras.Input((16000,))
    x = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(inp)
    for f, k, s in [(32, 5, 4), (64, 3, 2), (128, 3, 2), (256, 3, 2),
                    (384, 3, 2), (512, 3, 2)]:
        x = reduce_conv(x, f, k, s, "valid")
        x = context_conv(x, f, 3, "valid")
    x = inception_block(x, 32)
    x = inception_block(x, 16)
    x = reduce_inception(x, 32, 2)
    x = inception_block(x, 32)
    x = inception_block(x, 32)
    x = reduce_inception(x, 64, 2)
    x = inception_block(x, 64)
    x = inception_block(x, 64)
    x = reduce_inception(x, 96, 2)
    x = inception_block(x, 96)
    x = inception_block(x, 96)
    x = t.conv1d(x, num_classes, 14, padding="valid", use_bias=True)
    x = keras.layers.Flatten()(x)                        # logits
    return keras.Model(inp, x), t


def twin_conv_1d_simple(num_classes=12):
    """conv_1d_simple (BiGRU, model.py:116-156), linear head."""
    import keras
    from keras import ops as K
    _register_serializables()
    t = Twin()
    inp = keras.Input((16000,))
    x = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(inp)
    x = t.dw_block(x, 32, 31, padding="valid", strides=16)
    x = t.dw_block(x, 32, 3, padding="valid")
    for nh in (64, 96, 128, 160, 192, 224):
        x = t.dw_block(x, nh, 3, padding="valid", strides=2)
        x = t.dw_block(x, nh, 3, padding="valid")
    bi = keras.layers.Bidirectional(keras.layers.GRU(
        128, recurrent_activation=keras2_hard_sigmoid, reset_after=False))
    wrecs = [(f"{d}/{k}:0", k) for d in ("fwd", "bwd")
             for k in ("kernel", "recurrent_kernel", "bias")]
    x = t.track(bi, wrecs=wrecs)(x)
    x = t.dense(x, num_classes, use_bias=True)           # logits
    return keras.Model(inp, x), t


def twin_conv_2d(num_classes=12):
    """conv_2d (model.py:515-544, the TF-tutorial conv), linear head."""
    import keras
    from keras import ops as K
    t = Twin()
    inp = keras.Input((3920,))
    x = keras.layers.Reshape((98, 40, 1))(inp)
    x = keras.layers.Lambda(
        lambda v: K.clip((v + 0.8) / 7.0, -5.0, 5.0))(x)  # Preprocess
    x = t.conv2d(x, 64, (20, 8), padding="same", activation="relu")
    x = keras.layers.MaxPooling2D()(x)
    x = t.conv2d(x, 128, (10, 4), padding="same", activation="relu")
    x = keras.layers.MaxPooling2D()(x)
    x = keras.layers.Flatten()(x)
    x = t.dense(x, num_classes, use_bias=True)           # logits
    return keras.Model(inp, x), t


def twin_conv_1d_fast(num_classes=12):
    """conv_1d_fast (model.py:642-713): bare learned-filterbank stem +
    grouped convs, linear head."""
    import keras
    from keras import ops as K
    t = Twin()
    inp = keras.Input((16000,))
    x = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(inp)
    x = t.conv1d(x, 252, 479, strides=160, use_bias=False)  # no BN/act
    x = t.grouped_convbn(x, 300, 15, 6, strides=2)
    x = t.grouped_convbn(x, 360, 7, 5, strides=2)
    x = keras.layers.Flatten()(x)                            # Dropout inert
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_1d_residual(num_classes=12):
    """conv_1d_residual (model.py:841-908), linear head."""
    import keras
    t = Twin()
    inp = keras.Input((16000,))
    x = t.frame_same(inp, 40, 20)
    x = t.conv1d(x, 64, 3, strides=2, use_bias=False)
    x = t.bn(x)
    x = t.relu6(x)
    x = t.residual_block(x, 128, 3, strides=2)
    x = t.residual_block(x, 256, 3, strides=2)
    for _ in range(8):
        x = t.residual_block(x, 256, 3)
    x = t.residual_block(x, 512, 3, strides=2)
    x = t.residual_block(x, 728, 3, strides=2)
    x = t.residual_block(x, 728, 3, strides=2)
    x = t.dw_block(x, 1024, 3, padding="same", strides=2)  # _reduce_block
    x = t.dw_block(x, 1024, 3, padding="valid")
    x = keras.layers.GlobalAveragePooling1D()(x)
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_xception_with_attention(num_classes=12):
    """xception_with_attention (model.py:911-983): residual trunk +
    softmax-over-time attention + BiGRU(192), linear head."""
    import keras
    from keras import ops as K
    _register_serializables()
    t = Twin()
    inp = keras.Input((16000,))
    x = t.frame_same(inp, 40, 20)
    x = t.conv1d(x, 64, 3, strides=2, use_bias=False)
    x = t.bn(x)
    x = t.relu6(x)
    x = t.residual_block(x, 128, 3, strides=2)
    x = t.residual_block(x, 256, 3, strides=2)
    for _ in range(8):
        x = t.residual_block(x, 256, 3)
    x = t.residual_block(x, 384, 3, strides=2)
    att = t.dw_block(x, 1, 5, padding="same")
    att = keras.layers.Lambda(
        lambda v: keras.activations.softmax(v, axis=1))(att)
    x = keras.layers.Multiply()([x, att])
    bi = keras.layers.Bidirectional(keras.layers.GRU(
        192, recurrent_activation=keras2_hard_sigmoid, reset_after=False))
    wrecs = [(f"{d}/{k}:0", k) for d in ("fwd", "bwd")
             for k in ("kernel", "recurrent_kernel", "bias")]
    x = t.track(bi, wrecs=wrecs)(x)
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_simple(num_classes=12):
    """simple (model.py:102-113): Preprocess -> Dense, linear head."""
    import keras
    t = Twin()
    inp = keras.Input((3920,))
    x = t.preprocess(inp)
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_snn(num_classes=12):
    """snn (model.py:79-99): SELU MLP, AlphaDropout inert at inference,
    linear head."""
    import keras
    t = Twin()
    inp = keras.Input((3920,))
    x = t.preprocess(inp)
    for hidden in (512, 256, 128, 64):
        x = t.dense(x, hidden, use_bias=True, activation="selu")
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def _stacked_ladder_twin(t, inp, stack_shape, widths):
    """conv_1d_time_stacked / conv_1d_heavy shared ladder
    (model.py:257-309, 409-467)."""
    import keras
    x = keras.layers.Reshape(stack_shape)(inp)
    x = t.convbn(x, 32, 1)                                  # _context_conv k=1
    for w in widths:
        x = t.convbn(x, w, 3)                               # _reduce_conv
        x = t.keras.layers.MaxPooling1D(3, strides=2, padding="valid")(x)
        x = t.convbn(x, w, 3)                               # _context_conv
    return x


def twin_conv_1d_time_stacked(num_classes=12):
    """conv_1d_time_stacked (model.py:257-309), linear head."""
    import keras
    t = Twin()
    inp = keras.Input((16000,))
    x = _stacked_ladder_twin(t, inp, (800, 20),
                             (48, 96, 128, 160, 192, 256))
    x = t.conv1d(x, num_classes, 5, use_bias=True)           # logits
    x = keras.layers.Flatten()(x)
    return keras.Model(inp, x), t


def twin_conv_1d_heavy(num_classes=12):
    """conv_1d_heavy (model.py:409-467), linear head."""
    import keras
    t = Twin()
    inp = keras.Input((16000,))
    x = _stacked_ladder_twin(t, inp, (1600, 10),
                             (48, 96, 128, 160, 192, 256, 320))
    x = t.convbn(x, 128, 5)
    x = t.conv1d(x, num_classes, 1, use_bias=False)          # logits
    x = keras.layers.Flatten()(x)
    return keras.Model(inp, x), t


def twin_inception_d1(num_classes=12):
    """inception_d1 (model.py:312-406): dilated Inception on [800, 20],
    linear head."""
    import keras
    t = Twin()

    def reduce_conv(x, f, k, strides=2, padding="same"):
        x = t.convbn(x, f, k, padding=padding)
        return keras.layers.MaxPooling1D(3, strides=strides,
                                         padding=padding)(x)

    def context_conv(x, f, k, padding="same", dilation=1):
        return t.convbn(x, f, k, padding=padding, dilation=dilation)

    def inception_block(x, base, dilation=1):
        b1 = context_conv(x, int(2 * base), 1)
        b5 = context_conv(x, int(1.5 * base), 1)
        b5 = context_conv(b5, int(2 * base), 3, dilation=2)
        b3 = context_conv(x, int(2 * base), 1)
        b3 = context_conv(b3, int(3 * base), 3, dilation=dilation)
        b3 = context_conv(b3, int(3 * base), 3, dilation=dilation)
        bp = keras.layers.AveragePooling1D(3, strides=1, padding="same")(x)
        bp = context_conv(bp, base, 1)
        return keras.layers.Concatenate()([b1, b5, b3, bp])

    def reduce_inception(x, base, strides):
        b3 = reduce_conv(x, int(6 * base), 3, strides)
        bd = context_conv(x, base, 1)
        bd = context_conv(bd, int(1.5 * base), 3)
        bd = reduce_conv(bd, int(1.5 * base), 3, strides)
        bp = keras.layers.MaxPooling1D(3, strides=strides,
                                       padding="same")(x)
        return keras.layers.Concatenate()([b3, bd, bp])

    inp = keras.Input((16000,))
    x = keras.layers.Reshape((800, 20))(inp)
    x = context_conv(x, 32, 1)
    for f in (64, 128, 256):
        x = reduce_conv(x, f, 3, padding="valid")
        x = context_conv(x, f, 3, padding="valid")
    x = inception_block(x, 32, dilation=2)
    x = inception_block(x, 32, dilation=2)
    x = reduce_inception(x, 32, 2)
    x = inception_block(x, 32, dilation=2)
    x = inception_block(x, 32)
    x = reduce_inception(x, 32, 2)
    x = inception_block(x, 32)
    x = inception_block(x, 32)
    x = reduce_inception(x, 32, 2)
    x = inception_block(x, 32)
    x = inception_block(x, 32)
    x = reduce_inception(x, 32, 2)
    x = t.conv1d(x, num_classes, 6, use_bias=True)           # logits
    x = keras.layers.Flatten()(x)
    return keras.Model(inp, x), t


def twin_conv_1d_gru(num_classes=12):
    """conv_1d_gru (model.py:470-512): strided depthwise stem + dense
    head (no GRU despite the name), linear head."""
    import keras
    from keras import ops as K
    t = Twin()
    inp = keras.Input((16000,))
    x = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(inp)
    for f, k, s in [(128, 63, 16), (256, 31, 4), (384, 15, 4),
                    (448, 7, 4), (512, 5, 2)]:
        x = t.dw_block(x, f, k, padding="same", strides=s)
    x = t.dw_block(x, 512, 8, padding="valid")
    x = keras.layers.Flatten()(x)                            # Dropout inert
    x = t.dense(x, 256, use_bias=True)
    x = t.relu6(x)
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_2d_mobile(num_classes=12):
    """conv_2d_mobile (model.py:547-594), linear head."""
    import keras
    t = Twin()
    inp = keras.Input((3920,))
    x = keras.layers.Reshape((98, 40, 1))(inp)
    x = t.preprocess(x)
    for f in (32, 64, 128, 256):
        x = t.conv2d(x, f, (3, 3), padding="same", use_bias=True,
                     strides=2)
        x = t.bn(x)
        x = t.relu6(x)
        x = t.conv2d(x, f, (3, 3), padding="same", use_bias=True)
        x = t.bn(x)
        x = t.relu6(x)                                       # Dropout inert
    x = keras.layers.GlobalAveragePooling2D()(x)
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_2d_fast(num_classes=12):
    """conv_2d_fast (model.py:597-639), linear head."""
    import keras
    t = Twin()
    inp = keras.Input((3920,))
    x = keras.layers.Reshape((98, 40, 1))(inp)
    x = t.preprocess(x)
    for f, k, d in [(16, (11, 5), (2, 1)), (32, (5, 3), (2, 1)),
                    (64, (3, 3), (1, 1)), (128, (3, 3), (1, 1))]:
        x = t.conv2d(x, f, k, padding="same", use_bias=True, dilation=d)
        x = t.bn(x)
        x = keras.layers.Activation("relu")(x)
        x = keras.layers.MaxPooling2D()(x)
    x = keras.layers.GlobalAveragePooling2D()(x)
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_1d_time_sliced(num_classes=12):
    """conv_1d_time_sliced (model.py:716-772) — the flagship's trunk
    without attention, linear head."""
    import keras
    t = Twin()
    inp = keras.Input((16000,))
    x = t.frame_same(inp, 40, 20)
    x = t.conv1d(x, 32, 3, strides=2, use_bias=False)
    x = t.bn(x)
    x = t.relu6(x)
    x = t.dw_block(x, 64, 3, padding="valid")
    for w in (128, 192, 256, 320, 384, 512):
        x = t.dw_block(x, w, 3, padding="same", strides=2)
        x = t.dw_block(x, w, 3, padding="valid")
    x = keras.layers.GlobalAveragePooling1D()(x)
    x = t.dense(x, 256, use_bias=False)
    x = t.relu6(x)
    x = t.dense(x, num_classes, use_bias=False)              # logits
    return keras.Model(inp, x), t


def twin_conv_1d_time_sliced_group(num_classes=12):
    """conv_1d_time_sliced_group (model.py:986-1077): dual-resolution
    grouped depthwise branches, linear head. Context convs follow the
    zoo's documented intended-grouping semantics (the reference's
    :1032 bug convolves the full tensor per group); the x400 ladder
    groups over its actual 40 channels (the reference's :1053
    num_channels=32 silently drops 8)."""
    import keras
    t = Twin()

    def ladder(x, extra_ctx):
        for w in (64, 128, 160, 192, 224):
            x = t.grouped_dw_block(x, w, 3, 4, padding="valid", strides=2)
            x = t.grouped_dw_block(x, w, 3, 2, padding="valid")
        if extra_ctx:
            x = t.grouped_dw_block(x, 224, 3, 2, padding="valid")
        return x

    inp = keras.Input((16000,))
    x500 = ladder(keras.layers.Reshape((500, 32))(inp), extra_ctx=True)
    x400 = ladder(keras.layers.Reshape((400, 40))(inp), extra_ctx=False)
    x400 = keras.layers.ZeroPadding1D(padding=(1, 0))(x400)
    x = keras.layers.Concatenate()([x500, x400])             # Dropout inert
    x = t.conv1d(x, 128, 8, use_bias=True)
    x = keras.layers.Flatten()(x)
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_1d_multi_time_sliced(num_classes=12):
    """conv_1d_multi_time_sliced (model.py:1080-1156): three polyphase
    resolutions with multi-tap concat, linear head."""
    import keras
    t = Twin()

    def reduce(x, f, k):
        x = t.dw_block(x, f, k, padding="valid")
        return keras.layers.MaxPooling1D(3, strides=2, padding="same")(x)

    def context(x, f, k):
        return t.dw_block(x, f, k, padding="valid")

    inp = keras.Input((16000,))
    xs4 = keras.layers.Reshape((4000, 4))(inp)
    for f in (16, 32, 48, 64, 96, 128, 160):
        xs4 = reduce(xs4, f, 3)
    xs4 = context(xs4, 160, 3)
    xs4a = context(xs4, 64, 28)
    xs4 = reduce(xs4, 192, 3)
    xs4 = context(xs4, 192, 3)
    xs4b = context(xs4, 64, 11)

    xs5 = keras.layers.Reshape((3200, 5))(inp)
    for f in (16, 32, 48, 64, 96, 128, 160):
        xs5 = reduce(xs5, f, 3)
    xs5 = context(xs5, 160, 3)
    xs5a = context(xs5, 64, 22)
    xs5 = reduce(xs5, 192, 3)
    xs5 = context(xs5, 192, 3)
    xs5b = context(xs5, 64, 8)

    xs25 = keras.layers.Reshape((640, 25))(inp)
    for f in (32, 48, 64, 96, 128):
        xs25 = reduce(xs25, f, 3)
    xs25 = context(xs25, 128, 3)
    xs25 = context(xs25, 64, 17)

    x = keras.layers.Concatenate()([xs4a, xs4b, xs5a, xs5b, xs25])
    x = context(x, 128, 1)                                   # Dropouts inert
    x = t.conv1d(x, num_classes, 1, use_bias=True)           # logits
    x = keras.layers.Flatten()(x)
    return keras.Model(inp, x), t


def twin_conv_1d_learned_spec(num_classes=12):
    """conv_1d_learned_spec (model.py:1159-1246): 6 parallel learned
    filterbanks + grouped conv ladder, linear head."""
    import keras
    from keras import ops as K
    t = Twin()
    inp = keras.Input((16000,))
    x = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(inp)
    banks = [t.conv1d(x, 40, k, strides=160, padding="same",
                      use_bias=False)
             for k in (479, 383, 319, 255, 191, 161)]
    x = keras.layers.Concatenate()(banks)
    for w in (300, 360, 420, 480):
        x = t.grouped_convbn(x, w, 3, 3, strides=2)
        x = t.grouped_convbn(x, w, 3, 2)
    x = keras.layers.Flatten()(x)                            # Dropout inert
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_1d_spec(num_classes=12):
    """conv_1d_spec (model.py:1249-1323): grouped conv ladder on the
    linear spectrogram (257 -> 252 slice at :1306), linear head."""
    import keras
    t = Twin()
    inp = keras.Input((98 * 257,))
    x = keras.layers.Reshape((98, 257))(inp)
    x = keras.layers.Lambda(lambda v: v[:, :, :252])(x)
    for w in (300, 360, 420, 480):
        x = t.grouped_convbn(x, w, 3, 4, strides=2)
        x = t.grouped_convbn(x, w, 3, 3)
    x = keras.layers.Flatten()(x)                            # Dropout inert
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_1d_top_down(num_classes=12):
    """conv_1d_top_down (model.py:1326-1397): wide biased stem +
    decreasing-width grouped depthwise ladder, linear head. Grouping
    follows the zoo's documented intended semantics (the reference's
    :1368 full-tensor bug and :1382-1386 stale channel counts are not
    reproduced)."""
    import keras
    from keras import ops as K
    t = Twin()
    inp = keras.Input((16000,))
    x = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(inp)
    x = t.conv1d(x, 480, 479, strides=160, use_bias=True)
    for w in (420, 360, 300, 240):
        x = t.grouped_dw_block(x, w, 3, 3, padding="valid", strides=2)
        x = t.grouped_dw_block(x, w, 3, 2, padding="valid")
    x = keras.layers.Flatten()(x)                            # Dropout inert
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def _residual_feature_trunk_twin(num_classes, time_size, frequency_size):
    """conv_1d_log_mfcc / conv_1d_spectrogram shared trunk
    (model.py:1400-1561): Conv1D stem, 10 pool_eq_stride residual
    blocks, softmax-over-time attention, GAP, linear head."""
    import keras
    t = Twin()
    inp = keras.Input((time_size * frequency_size,))
    x = keras.layers.Reshape((time_size, frequency_size))(inp)
    x = t.convbn(x, 64, 3)
    for f, s in [(64, 1), (64, 1), (128, 2), (128, 1), (192, 2),
                 (192, 1), (192, 1), (256, 2), (256, 1), (256, 1)]:
        x = t.residual_block_eqpool(x, f, 3, strides=s)
    att = t.dw_block(x, 1, 3, padding="same")
    att = keras.layers.Lambda(
        lambda v: keras.activations.softmax(v, axis=1))(att)
    x = keras.layers.Multiply()([x, att])
    x = keras.layers.GlobalAveragePooling1D()(x)             # Dropout inert
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model(inp, x), t


def twin_conv_1d_log_mfcc(num_classes=12):
    return _residual_feature_trunk_twin(num_classes, 65, 40)


def twin_conv_1d_spectrogram(num_classes=12):
    return _residual_feature_trunk_twin(num_classes, 65, 257)


def twin_conv_1d_mfcc_and_raw(num_classes=12):
    """conv_1d_mfcc_and_raw (model.py:1564-1660): two-input fusion
    (mfcc stem + VALID-framed raw stem -> concat -> residual trunk),
    linear head. Geometry: spectrogram_length=98 so both stems emit 96
    frames (the reference's default 65 would fail its own Concatenate)."""
    import keras
    t = Twin()
    inp_mfcc = keras.Input((98 * 40,))
    x_mfcc = keras.layers.Reshape((98, 40))(inp_mfcc)
    x_mfcc = t.convbn(x_mfcc, 64, 3)
    inp_raw = keras.Input((16000,))
    x_raw = t.frame_same(inp_raw, 480, 160, padding="VALID")
    x_raw = t.convbn(x_raw, 96, 3)
    x = keras.layers.Concatenate()([x_mfcc, x_raw])
    for f, s in [(160, 1), (160, 1), (192, 2), (192, 1), (256, 2),
                 (256, 1), (320, 2), (320, 1), (384, 2), (384, 1)]:
        x = t.residual_block(x, f, 3, strides=s)
    x = keras.layers.GlobalAveragePooling1D()(x)             # Dropout inert
    x = t.dense(x, num_classes, use_bias=True)               # logits
    return keras.Model([inp_mfcc, inp_raw], x), t


def twin_steffenet(num_classes=12):
    """steffeNet (model.py:1663-1726): conv stem + stride-on-first-conv
    residual pairs + max/avg fusion, linear head."""
    import keras
    from keras import ops as K
    t = Twin()
    inp = keras.Input((16000,))
    x = keras.layers.Lambda(lambda v: K.expand_dims(v, -1))(inp)
    x = t.conv1d(x, 256, 75, strides=50, padding="same", use_bias=False)
    x = t.bn(x)
    x = t.relu6(x)
    x = t.dw_block(x, 256, 3, padding="same")
    for nh in (320, 384, 512, 768, 1024, 1536):
        x = t.residual_block_steffe(x, nh, 3, strides=2)
        x = t.residual_block_steffe(x, nh, 3)
    x_max = keras.layers.GlobalMaxPooling1D()(x)
    x_avg = keras.layers.GlobalAveragePooling1D()(x)
    x = keras.layers.Concatenate()([x_max, x_avg])           # Dropout inert
    x = t.dense(x, num_classes, use_bias=False)              # logits
    return keras.Model(inp, x), t


# input specs: ("flat", size) | ("pair", (mfcc_size, raw_size)), with a
# value-range tag per entry
TWINS = {
    "conv_1d_time_sliced_with_attention": (twin_flagship, ("flat", 16000, "raw")),
    "inception": (twin_inception, ("flat", 16000, "raw")),
    "conv_1d_simple": (twin_conv_1d_simple, ("flat", 16000, "raw")),
    "conv_2d": (twin_conv_2d, ("flat", 3920, "mfcc")),
    "conv_1d_fast": (twin_conv_1d_fast, ("flat", 16000, "raw")),
    "conv_1d_residual": (twin_conv_1d_residual, ("flat", 16000, "raw")),
    "xception_with_attention": (twin_xception_with_attention,
                                ("flat", 16000, "raw")),
    "simple": (twin_simple, ("flat", 3920, "mfcc")),
    "snn": (twin_snn, ("flat", 3920, "mfcc")),
    "conv_1d_time_stacked": (twin_conv_1d_time_stacked,
                             ("flat", 16000, "raw")),
    "conv_1d_heavy": (twin_conv_1d_heavy, ("flat", 16000, "raw")),
    "inception_d1": (twin_inception_d1, ("flat", 16000, "raw")),
    "conv_1d_gru": (twin_conv_1d_gru, ("flat", 16000, "raw")),
    "conv_2d_mobile": (twin_conv_2d_mobile, ("flat", 3920, "mfcc")),
    "conv_2d_fast": (twin_conv_2d_fast, ("flat", 3920, "mfcc")),
    "conv_1d_time_sliced": (twin_conv_1d_time_sliced,
                            ("flat", 16000, "raw")),
    "conv_1d_time_sliced_group": (twin_conv_1d_time_sliced_group,
                                  ("flat", 16000, "raw")),
    "conv_1d_multi_time_sliced": (twin_conv_1d_multi_time_sliced,
                                  ("flat", 16000, "raw")),
    "conv_1d_learned_spec": (twin_conv_1d_learned_spec,
                             ("flat", 16000, "raw")),
    "conv_1d_spec": (twin_conv_1d_spec, ("flat", 98 * 257, "spec")),
    "conv_1d_top_down": (twin_conv_1d_top_down, ("flat", 16000, "raw")),
    "conv_1d_log_mfcc": (twin_conv_1d_log_mfcc, ("flat", 65 * 40, "mfcc")),
    "conv_1d_spectrogram": (twin_conv_1d_spectrogram,
                            ("flat", 65 * 257, "spec")),
    "conv_1d_mfcc_and_raw": (twin_conv_1d_mfcc_and_raw,
                             ("pair", (98 * 40, 16000), "mfcc")),
    "steffeNet": (twin_steffenet, ("flat", 16000, "raw")),
}


def _draw(rng, size, range_tag):
    if range_tag == "raw":
        return rng.uniform(-0.5, 0.5, (2, size)).astype(np.float32)
    if range_tag == "spec":
        return rng.uniform(0.0, 5.0, (2, size)).astype(np.float32)
    return rng.uniform(-15.0, 15.0, (2, size)).astype(np.float32)


def make_input(spec, rng):
    kind = spec[0]
    if kind == "pair":
        (mfcc_size, raw_size), tag = spec[1], spec[2]
        return [_draw(rng, mfcc_size, tag), _draw(rng, raw_size, "raw")]
    _kind, size, tag = spec
    return _draw(rng, size, tag)


def main(only=None):
    path = os.path.join(HERE, "model_twin_goldens.npz")
    out = {}
    if only and os.path.exists(path):
        out = dict(np.load(path))  # incremental regeneration
    for name, (builder, spec) in TWINS.items():
        if only and name not in only:
            continue
        model, t = builder()
        structure = t.structure()
        weights = draw_weights(structure, SEED)
        t.set_weights(weights)
        import zlib
        rng = np.random.default_rng(SEED + zlib.crc32(name.encode()))
        x = make_input(spec, rng)
        logits = np.asarray(model(x, training=False))
        n_params = int(sum(w.size for w in weights))
        print(f"{name}: {n_params} weights in {len(structure)} layers, "
              f"logits {logits.shape} "
              f"[{logits.min():.3f}, {logits.max():.3f}]", flush=True)
        if spec[0] == "pair":
            out[f"{name}_input_mfcc"] = x[0]
            out[f"{name}_input_raw"] = x[1]
        else:
            out[f"{name}_input"] = x
        out[f"{name}_logits"] = logits.astype(np.float32)
        out[f"{name}_structure"] = np.frombuffer(
            structure_to_json(structure).encode(), dtype=np.uint8)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)/1e3:.1f} kB)")


def _cli():
    only = set(sys.argv[1:]) or None
    return main(only)


if __name__ == "__main__":
    sys.exit(_cli())
