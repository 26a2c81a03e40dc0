"""TF-free helpers shared by the twin-golden generator and its test.

A "twin structure" is a JSON-able list of layer records
``[layer_name, [[weight_name, kind, shape], ...]]`` captured from a
tf.keras twin of a reference model (generate_model_twin_goldens.py).
Given the structure and a seed, ``draw_weights`` deterministically
produces every weight array, and ``write_keras2_h5`` lays them out in
the Keras-2.1.2 checkpoint format the reference ships
(train.py:65-68) — so the parity test can rebuild the exact h5 the
TF twin used without importing TensorFlow.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

import numpy as np

Structure = List[Tuple[str, List[Tuple[str, str, List[int]]]]]


def draw_weights(structure: Structure, seed: int) -> List[np.ndarray]:
    """Deterministic weight values, one array per (layer, weight) record.

    Kernels get glorot-scale noise (keeps activations in range through
    deep trunks); BatchNorm statistics get distinct non-degenerate
    values so any misassignment of same-shaped weights changes logits
    (an init-valued BN — mean 0 / var 1 everywhere — would mask wiring
    errors).
    """
    rng = np.random.default_rng(seed)
    out = []
    for _layer, weights in structure:
        for _wname, kind, shape in weights:
            shape = tuple(shape)
            if kind in ("kernel", "depthwise_kernel", "recurrent_kernel"):
                fan_in = int(np.prod(shape[:-1])) or 1
                fan_out = int(shape[-1])
                std = np.sqrt(2.0 / (fan_in + fan_out))
                arr = rng.normal(0.0, std, shape)
            elif kind == "gamma":
                arr = rng.uniform(0.8, 1.25, shape)
            elif kind == "beta":
                arr = rng.normal(0.0, 0.1, shape)
            elif kind == "moving_mean":
                arr = rng.normal(0.0, 0.1, shape)
            elif kind == "moving_variance":
                arr = rng.uniform(0.7, 1.4, shape)
            elif kind == "bias":
                arr = rng.normal(0.0, 0.05, shape)
            else:
                raise ValueError(f"unknown weight kind {kind!r}")
            out.append(arr.astype(np.float32))
    return out


def write_keras2_h5(path: str, structure: Structure,
                    weights: List[np.ndarray]) -> None:
    """Write weights in the Keras-2.1.2 hdf5 layout ``read_keras_weights``
    expects: top-level ``layer_names`` attr, per-layer groups with
    ``weight_names`` attrs."""
    import h5py

    flat = iter(weights)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode() for name, _ in structure])
        for name, wrecs in structure:
            g = f.create_group(name)
            wnames = [wname.encode() for wname, _, _ in wrecs]
            g.attrs["weight_names"] = np.array(wnames)
            for wname, _kind, shape in wrecs:
                arr = next(flat)
                assert list(arr.shape) == list(shape), (wname, arr.shape,
                                                       shape)
                g.create_dataset(wname, data=arr)


def structure_from_json(s: str) -> Structure:
    return json.loads(s)


def structure_to_json(structure: Structure) -> str:
    return json.dumps(structure)
