#!/usr/bin/env python
"""Keras HDF5 -> orbax checkpoint migration CLI.

The missing on-ramp for reference users: brings a reference-era Keras
checkpoint (the train.py:65-68 artifacts, e.g.
``checkpoints_106/ep-062-vl-0.1815.hdf5``) into this framework. Weights
are imported into the matching flax zoo model
(``export/keras_import.py`` — depthwise/GRU/BN layout transforms, zoo
storage order pinned by tests/test_model_twins.py) and written as a
full orbax checkpoint (step 0, fresh optimizer state) usable by
``scripts/train.py --resume``, ``scripts/evaluate.py``,
``scripts/make_submission.py`` and ``scripts/freeze.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hdf5", required=True,
                   help="Keras checkpoint written by the reference's "
                        "ModelCheckpoint (train.py:65-68)")
    p.add_argument("--out", required=True,
                   help="orbax checkpoint directory to create")
    p.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    p.add_argument("--output_representation", default="raw")
    p.add_argument("--wanted_only", action="store_true")
    p.add_argument("--extend_reversed", action="store_true")
    p.add_argument("--window_size_ms", type=float, default=30.0)
    p.add_argument("--window_stride_ms", type=float, default=10.0)
    p.add_argument("--dct_coefficient_count", type=int, default=80)
    p.add_argument("--num_log_mel_features", type=int, default=60)
    args = p.parse_args()

    import jax
    from flax import core
    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import (
        synthetic_device_dataset,
    )
    from speech_recognition_tpu.export.keras_import import import_keras_hdf5
    from speech_recognition_tpu.labels import get_classes, prepare_words_list
    from speech_recognition_tpu.models.keras_order import creation_order
    from speech_recognition_tpu.train.checkpoint import save_checkpoint
    from speech_recognition_tpu.train.loop import Trainer

    words = prepare_words_list(get_classes(
        wanted_only=args.wanted_only,
        extend_reversed=args.extend_reversed))
    settings = prepare_model_settings(
        label_count=len(words),
        window_size_ms=args.window_size_ms,
        window_stride_ms=args.window_stride_ms,
        dct_coefficient_count=args.dct_coefficient_count,
        num_log_mel_features=args.num_log_mel_features,
        output_representation=args.output_representation)
    trainer = Trainer(model_name=args.model, settings=settings,
                      dataset=synthetic_device_dataset(
                          num_classes=len(words)),
                      augment=AugmentConfig(), batch_size=8)
    state = trainer.init_state()
    variables = {"params": state.params,
                 "batch_stats": state.batch_stats}
    loaded = import_keras_hdf5(args.hdf5, variables,
                               module_order=creation_order(args.model))
    freeze = (core.freeze if isinstance(state.params, core.FrozenDict)
              else (lambda t: t))
    state = state.replace(
        params=freeze(loaded["params"]),
        batch_stats=freeze(loaded.get("batch_stats",
                                      state.batch_stats)))
    save_checkpoint(args.out, state)
    n_params = sum(int(a.size) for a in
                   jax.tree_util.tree_leaves(state.params))
    n_stats = sum(int(a.size) for a in
                  jax.tree_util.tree_leaves(state.batch_stats))
    print(f"Imported {os.path.basename(args.hdf5)} -> {args.out} "
          f"(model={args.model}, {n_params} params, "
          f"{n_stats} BN statistics; step 0, fresh optimizer state)")


if __name__ == "__main__":
    main()
