"""Validation metrics (parity: callbacks.py).

Confusion matrices accumulate on device (scatter-add) and render to the
same dual text reports the reference writes (`confusion_matrix.txt` for
all words, `wanted_confusion_matrix.txt` for the wanted-collapsed view,
callbacks.py:45-83). ``log_loss`` matches callbacks.py:6-10.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def log_loss_from_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE (the reference computes it from clipped probs,
    callbacks.py:6-10; from logits this is exact)."""
    logp = jax.nn.log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def confusion_matrix(labels: jax.Array, preds: jax.Array,
                     num_classes: int) -> jax.Array:
    """[C, C] counts, rows = true, cols = predicted."""
    conf = jnp.zeros((num_classes, num_classes), jnp.int32)
    return conf.at[labels, preds].add(1)


def per_class_accuracies(conf: np.ndarray) -> np.ndarray:
    """Row-normalized diagonal; empty rows count 0 (callbacks.py:27-37)."""
    sums = conf.sum(axis=1)
    accs = np.where(sums > 0, np.diag(conf) / np.maximum(sums, 1), 0.0)
    return accs.astype(np.float32)


def accuracy(conf: np.ndarray) -> float:
    return float(np.trace(conf)) / max(1, int(conf.sum()))


def collapse_to_wanted(conf: np.ndarray, int2label: Dict[int, str],
                       wanted_words: Sequence[str]) -> np.ndarray:
    """Merge all non-wanted classes into `_unknown_` (callbacks.py:63-65).

    Returns a confusion matrix over the wanted words list order
    (_silence_, _unknown_, wanted...).
    """
    wanted_set = set(wanted_words)
    # target index mapping: keep wanted (incl. specials), else unknown (1)
    labels_sorted = [int2label[i] for i in range(conf.shape[0])]
    remap = {}
    kept = [w for w in wanted_words]
    kept_index = {w: i for i, w in enumerate(kept)}
    for i, lab in enumerate(labels_sorted):
        remap[i] = kept_index[lab] if lab in wanted_set \
            else kept_index["_unknown_"]
    out = np.zeros((len(kept), len(kept)), dtype=conf.dtype)
    for i in range(conf.shape[0]):
        for j in range(conf.shape[1]):
            out[remap[i], remap[j]] += conf[i, j]
    return out


def render_confusion(conf: np.ndarray, names: List[str]) -> str:
    """Plain-text table comparable to pandas_ml's output."""
    width = max(8, max(len(n) for n in names) + 1)
    header = " " * width + "".join(f"{n:>{width}}" for n in names)
    lines = [header]
    for i, n in enumerate(names):
        row = f"{n:<{width}}" + "".join(
            f"{int(conf[i, j]):>{width}d}" for j in range(len(names)))
        lines.append(row)
    return "\n".join(lines)


class TensorBoardCallback:
    """Streams every numeric epoch metric to a TensorBoard event file
    (observability parity with the reference's TensorBoard callback,
    train.py:64 / shipped logs_106/ event files).

    Steps are epochs, matching Keras' per-epoch scalar cadence.
    """

    def __init__(self, logdir: str):
        from speech_recognition_tpu.utils.tb_events import TBEventWriter
        self.writer = TBEventWriter(logdir)

    def on_epoch_end(self, epoch, state, logs):
        scalars = {k: float(v) for k, v in logs.items()
                   if isinstance(v, (int, float)) and np.isfinite(v)}
        self.writer.add_scalars(epoch, scalars)
        self.writer.flush()
        return None

    def close(self):
        self.writer.close()


class ConfusionReport:
    """Per-epoch validation report writer (parity: ConfusionMatrixCallback
    callbacks.py:13-83). Call ``write(epoch, conf, logs)`` after each
    validation sweep; the metric dict it returns feeds checkpointing and
    ReduceLROnPlateau exactly like the reference's logs injection
    (callbacks.py:80-83)."""

    def __init__(self, int2label: Dict[int, str],
                 wanted_words: Sequence[str],
                 all_words: Sequence[str],
                 out_dir: str = "."):
        import os
        self.int2label = dict(int2label)
        self.wanted_words = list(wanted_words)
        self.all_words = list(all_words)
        self.all_path = os.path.join(out_dir, "confusion_matrix.txt")
        self.wanted_path = os.path.join(out_dir,
                                        "wanted_confusion_matrix.txt")
        for p in (self.all_path, self.wanted_path):
            open(p, "w").close()

    def write(self, epoch: int, conf: np.ndarray,
              val_loss: float) -> Dict[str, float]:
        accs = per_class_accuracies(conf)
        acc = accuracy(conf)
        wanted_conf = collapse_to_wanted(conf, self.int2label,
                                         self.wanted_words)
        wanted_accs = per_class_accuracies(wanted_conf)
        acc_line = ("\n[%03d]: val_categorical_accuracy: %.2f, "
                    "val_mean_categorical_accuracy_wanted: %.2f"
                    % (epoch, acc, wanted_accs.mean()))
        names = [self.int2label[i] for i in range(conf.shape[0])]
        with open(self.all_path, "a") as f:
            f.write(acc_line + "\n")
            f.write(render_confusion(conf, names))
        with open(self.wanted_path, "a") as f:
            f.write(acc_line + "\n")
            f.write(render_confusion(wanted_conf, self.wanted_words))
        return {
            "val_loss": float(val_loss),
            "val_categorical_accuracy": float(acc),
            "val_mean_categorical_accuracy_all": float(accs.mean()),
            "val_mean_categorical_accuracy_wanted": float(wanted_accs.mean()),
        }
