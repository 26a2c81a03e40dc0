#!/usr/bin/env python
"""Batched TTA submission generation (parity: make_submission.py:34-213).

Loads a checkpoint, runs left+loud TTA (optionally speed TTA against a
pre-built slow set), and writes the wanted-label CSV, all-label CSV,
probability CSV, and the uint8 memmap exchange file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    p.add_argument("--test_dir", default="data/test/audio")
    p.add_argument("--tta_dir", default="",
                   help="pre-built slow set for speed TTA "
                        "(scripts/create_tta_set.py)")
    p.add_argument("--out_prefix", default="submission")
    p.add_argument("--output_representation", default="raw")
    p.add_argument("--batch_size", type=int, default=384)
    p.add_argument("--wanted_only", action="store_true")
    p.add_argument("--extend_reversed", action="store_true")
    p.add_argument("--window_size_ms", type=float, default=25.0)
    p.add_argument("--window_stride_ms", type=float, default=15.0)
    p.add_argument("--dct_coefficient_count", type=int, default=80)
    p.add_argument("--num_log_mel_features", type=int, default=60)
    p.add_argument("--no_tta", action="store_true")
    p.add_argument("--data_parallel", default="auto",
                   choices=["auto", "on", "off"],
                   help="shard the sweep over a device mesh (auto = "
                        "multi-chip accelerator hosts only)")
    return p.parse_args()


def main():
    args = parse_args()
    from speech_recognition_tpu.config import prepare_model_settings
    from speech_recognition_tpu.data.device_bank import synthetic_device_dataset
    from speech_recognition_tpu.infer.submission import (
        predict_directory, to_audio_names_order, write_submission_csvs,
        write_uint8_memmap,
    )
    from speech_recognition_tpu.infer.tta import (
        Predictor, TTAConfig, variables_from_state,
    )
    from speech_recognition_tpu.labels import (
        get_classes, get_int2label, prepare_words_list,
    )
    from speech_recognition_tpu.train.checkpoint import restore_checkpoint
    from speech_recognition_tpu.train.loop import Trainer
    from speech_recognition_tpu.config import AugmentConfig

    classes = get_classes(wanted_only=args.wanted_only,
                          extend_reversed=args.extend_reversed)
    words = prepare_words_list(classes)
    settings = prepare_model_settings(
        label_count=len(words),
        window_size_ms=args.window_size_ms,
        window_stride_ms=args.window_stride_ms,
        dct_coefficient_count=args.dct_coefficient_count,
        num_log_mel_features=args.num_log_mel_features,
        output_representation=args.output_representation)
    # a trainer gives us the module + state template for restore
    trainer = Trainer(model_name=args.model, settings=settings,
                      dataset=synthetic_device_dataset(
                          num_classes=len(words)),
                      augment=AugmentConfig(),
                      batch_size=args.batch_size)
    state = restore_checkpoint(args.checkpoint, trainer.init_state())
    tta = TTAConfig(use_tta=not args.no_tta,
                    use_speed_tta=bool(args.tta_dir))
    # multi-chip accelerator hosts: shard the sweep data-parallel.
    # 'auto' stays off on CPU (virtual-device test meshes would only
    # add compile time); force with --data_parallel on.
    import jax
    mesh = None
    use_dp = (args.data_parallel == "on"
              or (args.data_parallel == "auto"
                  and jax.default_backend() != "cpu"))
    if (use_dp and len(jax.devices()) > 1
            and args.batch_size % len(jax.devices()) == 0):
        from speech_recognition_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    predictor = Predictor(trainer.module, settings,
                          trainer.representation, tta, mesh=mesh)
    variables = variables_from_state(state)
    basenames, probs = predict_directory(
        predictor, variables, args.test_dir,
        batch_size=args.batch_size,
        tta_dir=args.tta_dir or None, progress=True)
    int2label = get_int2label(wanted_only=args.wanted_only,
                              extend_reversed=args.extend_reversed)
    paths = write_submission_csvs(args.out_prefix, basenames, probs,
                                  int2label)
    mm = f"{args.out_prefix}_probs.uint8.memmap"
    if probs.shape[1] == 12:
        # the exchange format's column order is AUDIO_NAMES, not the
        # model's class order (see to_audio_names_order)
        write_uint8_memmap(mm, to_audio_names_order(probs, int2label))
        paths["memmap"] = mm
    print("wrote:", paths)


if __name__ == "__main__":
    main()
