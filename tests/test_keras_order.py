"""Keras creation-order manifests (models/keras_order.py).

The manifest replaces the old module-NAME ordering hacks
(``za_head_reduce``/``zz_attention``, VERDICT r4 weak #4): checkpoint
import orders flax slots by the pinned manifest, and a renamed module
fails loudly instead of silently transposing a same-shape weight group.
"""

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tpu.export.keras_import import import_keras_hdf5
from speech_recognition_tpu.models import MODEL_REGISTRY, build_model
from speech_recognition_tpu.models.keras_order import (
    creation_order, derive_creation_order,
)
from speech_recognition_tpu.models.keras_order_manifest import (
    KERAS_CREATION_ORDER,
)

# The models where creation order and natural-sort order DIFFER — the
# ones the naming hacks used to cover. Their manifests are the actual
# load-bearing fix; checked fast, every round.
ORDER_SENSITIVE = ("conv_1d_residual", "conv_1d_log_mfcc",
                   "conv_1d_spectrogram")


def test_manifest_covers_registry():
    assert set(KERAS_CREATION_ORDER) == set(MODEL_REGISTRY)


@pytest.mark.parametrize("name", ORDER_SENSITIVE)
def test_manifest_matches_fresh_derivation(name):
    assert creation_order(name) == derive_creation_order(name)


@pytest.mark.parametrize("name", ORDER_SENSITIVE)
def test_creation_order_differs_from_natural_sort(name):
    """These manifests must encode MORE than natural sort — the head /
    attention blocks create after the Residual1D trunk but sort before
    it. If this ever starts passing under plain sort, the manifest
    machinery has stopped being load-bearing and a regression elsewhere
    could hide."""
    order = creation_order(name)
    top = [p for p in order if "/" not in p]
    assert top != sorted(
        top, key=lambda s: [int(x) if x.isdigit() else x
                            for x in __import__("re").split(r"(\d+)", s)])


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_manifest_matches_fresh_derivation_all(name):
    assert creation_order(name) == derive_creation_order(name)


def test_unknown_model_raises():
    with pytest.raises(ValueError, match="manifest"):
        creation_order("nope")


def test_renamed_module_fails_loudly(tmp_path):
    """A module name not in the manifest must raise, not silently
    reshuffle same-shape assignment."""
    module, _ = build_model("simple", num_classes=12)
    variables = module.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 3920)), train=False)
    params = dict(variables["params"])
    # simulate a future rename of a zoo module
    renamed = {("MyDense_%d" % i if k.startswith("Dense") else k): v
               for i, (k, v) in enumerate(params.items())}
    p = str(tmp_path / "ckpt.hdf5")
    with h5py.File(p, "w") as f:
        g = f.create_group("model_weights")
        g.attrs["layer_names"] = np.array([b"dense_1"])
        lg = g.create_group("dense_1")
        lg.attrs["weight_names"] = np.array(
            [b"dense_1/kernel:0", b"dense_1/bias:0"])
        lg.create_dataset("dense_1/kernel:0",
                          data=np.zeros((3920, 12), np.float32))
        lg.create_dataset("dense_1/bias:0",
                          data=np.zeros((12,), np.float32))
    with pytest.raises(ValueError, match="creation-order manifest"):
        import_keras_hdf5(p, {"params": renamed},
                          module_order=creation_order("simple"))
    # sanity: the un-renamed tree imports fine with the same manifest
    loaded = import_keras_hdf5(p, {"params": params},
                               module_order=creation_order("simple"))
    assert "params" in loaded
