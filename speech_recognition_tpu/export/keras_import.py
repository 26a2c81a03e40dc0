"""Keras HDF5 checkpoint importer (migration path for reference users).

The reference ships trained Keras 2.1.2 ``.hdf5`` checkpoints
(train.py:65-68; e.g. ``checkpoints_106/ep-062-vl-0.1815.hdf5``). This
loads one into the matching flax zoo model by *ordered shape matching*:
Keras stores weights in layer-creation order, and the zoo reproduces the
reference architectures layer-for-layer in the same order, so walking
both sequences and matching transformed shapes reconstructs the
correspondence without name heuristics.

Weight-layout transforms handled:
  * Conv1D/Conv2D kernels: Keras [k..., in, out] == flax [k..., in, out]
  * DepthwiseConv2D(1, k): Keras [1, k, C, 1] -> flax depthwise Conv1D
    kernel [k, 1, C]
  * Dense, biases, BatchNorm gamma/beta: identical layouts
  * BatchNorm moving_mean/variance -> batch_stats collection
  * GRU: kernel [in, 3u] (z|r|h, Keras v1 gate order == ours);
    recurrent_kernel [u, 3u] -> split recurrent_kernel_zr [u, 2u] +
    recurrent_kernel_h [u, u]

Matching guarantees (stated precisely): every source weight must be
consumed exactly once by a (kind, shape)-compatible slot, and within
each (kind, shape) group assignment is order-preserving — the i-th flax
slot of a group gets the i-th Keras weight of that group. Flax slot
order comes from the model's explicit creation-order manifest
(``models/keras_order.py``; pass ``module_order=`` for every zoo-model
import) — a module path missing from the manifest (e.g. after a rename)
raises instead of silently transposing a same-shape group. Same-kind
same-shape groups whose assignment relies on this order congruence are
additionally reported via ``warnings.warn``, and the TF-twin logits
goldens (tests/test_model_twins.py) pin end-to-end correctness for the
branchy architectures (inception and friends) where the hazard is real.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]


def read_keras_weights(h5_path: str) -> List[Tuple[str, str, np.ndarray]]:
    """[(layer_name, weight_name, array)] in Keras storage order."""
    import h5py
    out = []
    with h5py.File(h5_path, "r") as f:
        group = f["model_weights"] if "model_weights" in f else f
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in group.attrs["layer_names"]]
        for layer in layer_names:
            g = group[layer]
            weight_names = [n.decode() if isinstance(n, bytes) else n
                            for n in g.attrs.get("weight_names", [])]
            for wn in weight_names:
                out.append((layer, wn, np.asarray(g[wn])))
    return out


def _ordered_leaves(tree: Any, prefix: Tuple[str, ...] = (),
                    order_index: Dict[str, int] = None):
    """Depth-first leaves in slot-assignment order.

    With ``order_index`` (module path -> creation position, from
    models/keras_order.py), module children at every level walk in
    creation order and an unknown module path fails loudly — a renamed
    module can no longer silently transpose a same-shape group. Leaf
    arrays keep numeric-aware name order (kinds disambiguate them).
    Without it, all keys natural-sort (flax names modules
    Conv_0..Conv_10; plain sorting would misorder them) — the legacy
    behavior for bare-layer imports that have no manifest.
    """
    if not (isinstance(tree, dict) or hasattr(tree, "items")):
        yield prefix, tree
        return
    keys = list(tree.keys())
    if order_index is None:
        ordered = sorted(keys, key=_natural_key)
    else:
        dict_keys = [k for k in keys if hasattr(tree[k], "keys")]
        unknown = [k for k in dict_keys
                   if "/".join(prefix + (str(k),)) not in order_index]
        if unknown:
            raise ValueError(
                f"module path(s) {unknown} under "
                f"{'/'.join(prefix) or '<root>'} not in the Keras "
                "creation-order manifest — regenerate it with `python "
                "-m speech_recognition_tpu.models.keras_order` after "
                "renaming/adding zoo modules")
        # modules in creation order, then leaf arrays; capitals sort
        # before lowercase so this matches the legacy order wherever
        # creation order == natural order
        ordered = sorted(
            dict_keys,
            key=lambda k: order_index["/".join(prefix + (str(k),))])
        ordered += sorted((k for k in keys if k not in dict_keys),
                          key=_natural_key)
    for k in ordered:
        yield from _ordered_leaves(tree[k], prefix + (str(k),),
                                   order_index)


def _transform(layer: str, weight_name: str,
               arr: np.ndarray) -> List[Tuple[str, np.ndarray]]:
    """Keras array -> [(slot_kind, array)] in assignment order."""
    wn = weight_name.rsplit("/", 1)[-1].split(":")[0]
    if "depthwise" in wn and arr.ndim == 4 and arr.shape[0] == 1 \
            and arr.shape[-1] == 1:
        # [1, k, C, 1] -> [k, 1, C]
        return [("kernel", arr[0, :, :, 0][:, None, :])]
    if wn == "recurrent_kernel":
        u = arr.shape[0]
        return [("recurrent_kernel_zr", arr[:, :2 * u]),
                ("recurrent_kernel_h", arr[:, 2 * u:])]
    if wn == "gamma":
        return [("scale", arr)]
    if wn == "beta":
        # distinct kind from plain layer bias: a BN beta must never be
        # matched to a same-length Conv/Dense/GRU bias slot (real hazard:
        # conv_1d_gru's Dense(256) bias vs its [256] BN betas)
        return [("beta", arr)]
    if wn == "moving_mean":
        return [("mean", arr)]
    if wn == "moving_variance":
        return [("var", arr)]
    return [(wn, arr)]


def import_keras_hdf5(h5_path: str, variables: Dict[str, Any],
                      module_order: Sequence[str] = None,
                      ) -> Dict[str, Any]:
    """Load a Keras checkpoint into initialized flax ``variables``.

    ``module_order`` — the model's creation-order manifest
    (``models.keras_order.creation_order(name)``) — pins slot order to
    Keras layer-creation order explicitly; pass it for every zoo-model
    import. Without it, slot order falls back to natural module-name
    sort (sufficient only for single-layer imports).

    Returns new variables ({'params': ..., 'batch_stats': ...}) with
    every leaf replaced by the corresponding Keras weight.
    """
    sources: List[Tuple[str, str, np.ndarray]] = []
    for layer, wn, arr in read_keras_weights(h5_path):
        for kind, t in _transform(layer, wn, arr):
            sources.append((layer, kind, t))

    order_index = (None if module_order is None
                   else {p: i for i, p in enumerate(module_order)})

    # target slots: params + batch_stats, module-order
    param_slots = list(_ordered_leaves(variables.get("params", {}),
                                       order_index=order_index))
    stat_slots = list(_ordered_leaves(variables.get("batch_stats", {}),
                                      order_index=order_index))

    def kind_of(path: Tuple[str, ...]) -> str:
        # flax BatchNorm stores beta as 'bias'; reclassify so BN betas
        # and plain biases form disjoint matching groups (see _transform)
        if path[-1] == "bias" and len(path) >= 2 \
                and path[-2].startswith("BatchNorm"):
            return "beta"
        return path[-1]

    assigned: Dict[Tuple[str, ...], np.ndarray] = {}
    used = [False] * len(sources)
    for path, leaf in param_slots + stat_slots:
        want_kind = kind_of(path)
        want_shape = tuple(leaf.shape)
        hit = None
        for i, (layer, kind, arr) in enumerate(sources):
            if used[i]:
                continue
            if kind == want_kind and tuple(arr.shape) == want_shape:
                hit = i
                break
        if hit is None:
            raise ValueError(
                f"no unused Keras weight matches {'/'.join(path)} "
                f"kind={want_kind} shape={want_shape}")
        assigned[path] = sources[hit][2]
        used[hit] = True

    leftovers = [f"{layer}/{kind}{list(arr.shape)}"
                 for (layer, kind, arr), u in zip(sources, used) if not u]
    if leftovers:
        raise ValueError(f"unconsumed Keras weights: {leftovers}")

    # surface the groups where assignment relied on order congruence
    import collections
    group_sizes = collections.Counter(
        (kind, tuple(arr.shape)) for _, kind, arr in sources)
    ambiguous = sorted(f"{kind}{list(shape)}x{n}"
                       for (kind, shape), n in group_sizes.items()
                       if n > 1)
    if ambiguous:
        import warnings
        warnings.warn(
            "keras_import matched these same-kind same-shape weight "
            f"groups by storage order: {ambiguous} — correct iff the "
            "checkpoint's creation order matches the flax module order "
            "(pinned for the zoo by tests/test_model_twins.py)",
            stacklevel=2)

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict) or hasattr(tree, "items"):
            return {k: rebuild(tree[k], prefix + (str(k),))
                    for k in tree.keys()}
        import jax.numpy as jnp
        return jnp.asarray(assigned[prefix], dtype=tree.dtype)

    out = {"params": rebuild(variables.get("params", {}))}
    if variables.get("batch_stats"):
        out["batch_stats"] = rebuild(variables["batch_stats"])
    return out
