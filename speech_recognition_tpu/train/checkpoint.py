"""Checkpoint / resume via orbax (SURVEY §5 aux plan).

The reference relies on Keras best-only HDF5 checkpoints with manual
recovery (train.py:65-68, README recovery notes); runs were declared
non-reproducible because no seeds were stored. Here a checkpoint carries
params, BatchNorm stats, optimizer state, the step counter, and the PRNG
seed material, so training resumes bit-exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from speech_recognition_tpu.train.loop import TrainState


def _to_pytree(state: TrainState, extra: Optional[Dict[str, Any]] = None):
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if extra:
        tree["extra"] = extra
    return tree


def save_checkpoint(path: str, state: TrainState,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a full training checkpoint to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_pytree(state, extra), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into the structure of ``state`` (from ``Trainer.init_state``)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = _to_pytree(state)
    restored = ckptr.restore(path, template)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"])


class BestCheckpoint:
    """Best-only checkpoint callback (parity: ModelCheckpoint
    monitor=val_categorical_accuracy mode=max, train.py:65-68)."""

    def __init__(self, directory: str,
                 monitor: str = "val_categorical_accuracy",
                 mode: str = "max", verbose: bool = True):
        self.directory = directory
        self.monitor = monitor
        self.mode = mode
        self.best: Optional[float] = None
        self.verbose = verbose
        os.makedirs(directory, exist_ok=True)

    def on_epoch_end(self, epoch: int, state: TrainState,
                     logs: Dict[str, Any]):
        value = float(logs[self.monitor])
        improved = (self.best is None or
                    (value > self.best if self.mode == "max"
                     else value < self.best))
        if improved:
            self.best = value
            path = os.path.abspath(os.path.join(
                self.directory,
                "ep-%03d-vl-%.4f" % (epoch, float(logs.get("val_loss", 0)))))
            save_checkpoint(path, state)
            with open(os.path.join(self.directory, "BEST"), "w") as f:
                f.write(path)
            if self.verbose:
                print(f"checkpoint: {self.monitor}={value:.4f} -> {path}")
        return None


class PlateauCallback:
    """Adapter wiring ReduceLROnPlateau into the fit loop."""

    def __init__(self, controller,
                 monitor: str = "val_categorical_accuracy"):
        self.controller = controller
        self.monitor = monitor

    def on_epoch_end(self, epoch: int, state: TrainState,
                     logs: Dict[str, Any]):
        from speech_recognition_tpu.train.optim import (
            get_learning_rate, set_learning_rate)
        current = get_learning_rate(state.opt_state)
        new_lr = self.controller.update(float(logs[self.monitor]), current)
        if new_lr != current:
            return state.replace(
                opt_state=set_learning_rate(state.opt_state, new_lr))
        return None
