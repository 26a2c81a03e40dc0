#!/usr/bin/env python
"""AOT export CLI (parity: freeze_graph.py / freeze_graph_32_classes.py).

Exports a checkpoint as a serialized StableHLO artifact: waveform
[1, 16000] f32 -> class probabilities. ``--map_to_12`` adds the 32->12
max-unknown + re-softmax head (freeze_graph_32_classes.py:55-69).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument("--frozen_path", default="tpu_files/frozen.jaxexport")
    p.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    p.add_argument("--output_representation", default="raw")
    p.add_argument("--wanted_only", action="store_true")
    p.add_argument("--extend_reversed", action="store_true")
    p.add_argument("--map_to_12", action="store_true")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--weight_dtype", default="float32",
                   choices=["float32", "int8"],
                   help="int8 = per-channel weight-only quantization "
                        "(~3.6x smaller artifact, f32 compute)")
    p.add_argument("--window_size_ms", type=float, default=30.0)
    p.add_argument("--window_stride_ms", type=float, default=10.0)
    p.add_argument("--dct_coefficient_count", type=int, default=80)
    p.add_argument("--num_log_mel_features", type=int, default=60)
    args = p.parse_args()

    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import (
        synthetic_device_dataset,
    )
    from speech_recognition_tpu.export.aot import (
        export_inference, save_exported,
    )
    from speech_recognition_tpu.infer.tta import variables_from_state
    from speech_recognition_tpu.labels import get_classes, prepare_words_list
    from speech_recognition_tpu.train.checkpoint import restore_checkpoint
    from speech_recognition_tpu.train.loop import Trainer

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
    trainer = Trainer(model_name=args.model, settings=settings,
                      dataset=synthetic_device_dataset(
                          num_classes=len(words)),
                      augment=AugmentConfig(), batch_size=8)
    state = restore_checkpoint(args.checkpoint_path, trainer.init_state())
    artifact = export_inference(
        trainer.module, trainer.frontend, trainer.representation,
        variables_from_state(state),
        desired_samples=settings.desired_samples,
        batch_size=args.batch_size,
        map_to_12=args.map_to_12,
        extend_reversed=args.extend_reversed,
        weight_dtype=args.weight_dtype)
    os.makedirs(os.path.dirname(args.frozen_path) or ".", exist_ok=True)
    save_exported(args.frozen_path, artifact)
    print(f"Wrote frozen artifact to: {args.frozen_path} "
          f"({len(artifact)} bytes)")


if __name__ == "__main__":
    main()
