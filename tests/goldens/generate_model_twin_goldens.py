"""Generate TF-twin logits-parity goldens (VERDICT r2 item 2).

Param-count equality cannot catch count-preserving wiring errors
(swapped inception branches, attention on the wrong tensor, pool
placement). This script builds tf.keras twins of four representative
reference constructors —

  * conv_1d_time_sliced_with_attention  (model.py:775-838, the flagship)
  * inception                           (model.py:159-254)
  * conv_1d_simple                      (BiGRU, model.py:116-156)
  * conv_2d                             (model.py:515-544)

— written here against the REFERENCE architecture (not against the flax
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
               activation=None):
        layer = self.keras.layers.Conv2D(
            f, k, padding=padding, use_bias=use_bias,
            activation=activation)
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

    def frame_same(self, x, ksize, stride):
        """overlapping_time_slice_stack(x, ksize, stride, 'SAME')
        (model.py:67-76): [B, T] -> [B, frames, ksize]."""
        t = int(x.shape[1])
        out = -(-t // stride)
        pad_total = max((out - 1) * stride + ksize - t, 0)
        left = pad_total // 2
        right = pad_total - left
        idx = (np.arange(out)[:, None] * stride
               + np.arange(ksize)[None, :]).astype("int32")

        def fn(v):
            from keras import ops as K
            v = K.pad(v, ((0, 0), (left, right)))
            return K.take(v, idx, axis=1)

        return self.keras.layers.Lambda(fn)(x)

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

    # -- weight I/O --------------------------------------------------------

    def _group_weights(self, convs, bns):
        ks = [c.get_weights()[0] for c in convs]
        bws = [b.get_weights() for b in bns]
        return [np.concatenate(ks, axis=-1)] + [
            np.concatenate([bw[j] for bw in bws], axis=0)
            for j in range(4)]

    def structure(self):
        out = []
        for name, layer, wrecs in self.records:
            if isinstance(layer, tuple) and layer[0] == "group":
                ws = self._group_weights(layer[1], layer[2])
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


TWINS = {
    "conv_1d_time_sliced_with_attention": (twin_flagship, "raw"),
    "inception": (twin_inception, "raw"),
    "conv_1d_simple": (twin_conv_1d_simple, "raw"),
    "conv_2d": (twin_conv_2d, "mfcc"),
    "conv_1d_fast": (twin_conv_1d_fast, "raw"),
    "conv_1d_residual": (twin_conv_1d_residual, "raw"),
    "xception_with_attention": (twin_xception_with_attention, "raw"),
}


def make_input(rep: str, rng) -> np.ndarray:
    if rep == "raw":
        return rng.uniform(-0.5, 0.5, (2, 16000)).astype(np.float32)
    return rng.uniform(-15.0, 15.0, (2, 3920)).astype(np.float32)


def main():
    out = {}
    for name, (builder, rep) in TWINS.items():
        model, t = builder()
        structure = t.structure()
        weights = draw_weights(structure, SEED)
        t.set_weights(weights)
        import zlib
        rng = np.random.default_rng(SEED + zlib.crc32(name.encode()))
        x = make_input(rep, rng)
        logits = np.asarray(model(x, training=False))
        n_params = int(sum(w.size for w in weights))
        print(f"{name}: {n_params} weights in {len(structure)} layers, "
              f"logits {logits.shape} "
              f"[{logits.min():.3f}, {logits.max():.3f}]")
        out[f"{name}_input"] = x
        out[f"{name}_logits"] = logits.astype(np.float32)
        out[f"{name}_structure"] = np.frombuffer(
            structure_to_json(structure).encode(), dtype=np.uint8)
    path = os.path.join(HERE, "model_twin_goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)/1e3:.1f} kB)")


if __name__ == "__main__":
    sys.exit(main())
