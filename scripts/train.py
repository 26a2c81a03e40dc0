#!/usr/bin/env python
"""Training entrypoint (parity: reference train.py:22-75, as a typed CLI).

Defaults reproduce the model-210 recipe: conv_1d_time_sliced_with_attention,
raw representation, batch 384, silence 13% / unknown 60% / val 10% /
test 0%, pseudo_frequency 0.6, 100 epochs, ReduceLROnPlateau + best
checkpointing + per-epoch confusion reports. The experiment id drives
artifact directories (checkpoints_<id>/, logs_<id>/) like the reference's
hardcoded paths (train.py:64-66).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dirs", nargs="+",
                   default=["data/train/audio"],
                   help="dataset roots; add a pseudo dir like the "
                        "reference's data/heng_pseudo (train.py:27-30)")
    p.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    p.add_argument("--experiment", default="210")
    p.add_argument("--output_representation", default="raw",
                   choices=["raw", "spec", "mfcc", "mfcc_and_raw"])
    p.add_argument("--batch_size", type=int, default=384)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--wanted_only", action="store_true", default=True)
    p.add_argument("--all_words", dest="wanted_only", action="store_false")
    p.add_argument("--extend_reversed", action="store_true")
    p.add_argument("--window_size_ms", type=float, default=30.0)
    p.add_argument("--window_stride_ms", type=float, default=10.0)
    p.add_argument("--dct_coefficient_count", type=int, default=80)
    p.add_argument("--num_log_mel_features", type=int, default=60)
    p.add_argument("--silence_percentage", type=float, default=13.0)
    p.add_argument("--unknown_percentage", type=float, default=60.0)
    p.add_argument("--validation_percentage", type=float, default=10.0)
    p.add_argument("--testing_percentage", type=float, default=0.0)
    p.add_argument("--pseudo_frequency", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="bfloat16 = mixed-precision forward/backward "
                        "(f32 master weights); auto = bfloat16 on TPU, "
                        "float32 elsewhere")
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="chained train steps per XLA dispatch (lax.scan);"
                        " >1 amortizes per-execution dispatch/transport"
                        " cost with identical update semantics")
    p.add_argument("--bn_recalibration_batches", type=int, default=0,
                   help="re-estimate BatchNorm stats over N fresh batches "
                        "before each validation sweep (recommended for "
                        "schedules under ~1000 total steps, where the "
                        "Keras-parity momentum 0.99 hasn't converged)")
    p.add_argument("--resume", default="",
                   help="checkpoint directory to resume from")
    p.add_argument("--stream", action="store_true",
                   help="host-streaming data path for corpora that "
                        "exceed HBM (~115k clips/GB staged): training "
                        "batches are decoded + uploaded by a background "
                        "thread (data/prefetch.py) while the device "
                        "computes; only the validation partition and "
                        "background bank are staged. Multi-host: each "
                        "process streams its process_shard of the "
                        "training files.")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import build_device_dataset
    from speech_recognition_tpu.data.index import build_dataset_index
    from speech_recognition_tpu.labels import (
        get_classes, get_int2label, prepare_words_list,
    )
    from speech_recognition_tpu.train.checkpoint import (
        BestCheckpoint, PlateauCallback, restore_checkpoint,
    )
    from speech_recognition_tpu.train.loop import Trainer
    from speech_recognition_tpu.train.metrics import ConfusionReport
    from speech_recognition_tpu.train.optim import ReduceLROnPlateau

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

    print(f"devices: {jax.devices()}")
    print("indexing dataset...")
    index = build_dataset_index(
        data_dirs=args.data_dirs,
        silence_percentage=args.silence_percentage,
        unknown_percentage=args.unknown_percentage,
        wanted_words=classes,
        validation_percentage=args.validation_percentage,
        testing_percentage=args.testing_percentage)
    print(index.summary())
    if args.stream:
        # stage ONLY validation (+ background); the training corpus
        # stays on the host and streams (VERDICT r2 item 4)
        print("staging validation partition to device memory...")
        dataset = build_device_dataset(index, settings,
                                       modes=["validation"])
    else:
        print("staging dataset to device memory...")
        dataset = build_device_dataset(index, settings)

    trainer = Trainer(
        model_name=args.model, settings=settings, dataset=dataset,
        augment=AugmentConfig(pseudo_frequency=args.pseudo_frequency),
        batch_size=args.batch_size, seed=args.seed,
        compute_dtype=args.compute_dtype,
        use_fused_augment=False if args.stream else None)
    state = trainer.init_state()
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    # class ids map 1:1 onto the words list (unknown words all share id 1)
    int2label = dict(enumerate(words))
    report = ConfusionReport(
        int2label=int2label,
        wanted_words=prepare_words_list(get_classes(wanted_only=True)),
        all_words=words)

    class ReportCallback:
        def on_epoch_end(self, epoch, state, logs):
            metrics = report.write(epoch, logs["confusion"],
                                   logs["val_loss"])
            logs.update(metrics)
            printable = {k: round(v, 4) for k, v in logs.items()
                         if isinstance(v, (int, float))}
            print(f"[ep {epoch:03d}] {printable}")
            with open(f"logs_{args.experiment}.jsonl", "a") as f:
                f.write(json.dumps(printable) + "\n")
            return None

    from speech_recognition_tpu.train.metrics import TensorBoardCallback
    callbacks = [
        ReportCallback(),
        PlateauCallback(ReduceLROnPlateau(factor=0.5, patience=4,
                                          min_lr=1e-5, mode="max")),
        BestCheckpoint(f"checkpoints_{args.experiment}"),
        # reference parity: TensorBoard(log_dir='logs_210') (train.py:64)
        TensorBoardCallback(f"logs_{args.experiment}"),
    ]
    steps = args.steps_per_epoch or None
    from speech_recognition_tpu.train.metrics import accuracy
    if args.stream:
        import time

        import numpy as np

        from speech_recognition_tpu.data.prefetch import HostPrefetchLoader
        from speech_recognition_tpu.parallel.distributed import process_shard
        from speech_recognition_tpu.parallel.mesh import batch_sharding
        from speech_recognition_tpu.train.loop import TrainState
        spe = steps or max(
            1, index.set_size("training") // args.batch_size)
        paths = index.files("training")
        labels = index.labels_array("training")
        silence = index.is_silence_array("training")
        shard = np.array(process_shard(list(range(len(paths)))))
        loader = HostPrefetchLoader(
            [paths[i] for i in shard], labels[shard], silence[shard],
            batch_size=args.batch_size,
            desired_samples=settings.desired_samples,
            seed=args.seed,
            sharding=batch_sharding(trainer.mesh))
        with loader:
            for epoch in range(args.epochs):
                t0 = time.time()
                state, h = trainer.fit_streaming(
                    state, loader, spe,
                    steps_per_dispatch=args.steps_per_dispatch)
                logs = {k: v[-1] for k, v in h.items()}
                logs["epoch_time_s"] = time.time() - t0
                if args.bn_recalibration_batches:
                    state = trainer.recalibrate_batch_stats_stream(
                        state, loader, args.bn_recalibration_batches)
                conf, val_loss = trainer.evaluate(state)
                logs["val_loss"] = val_loss
                logs["val_categorical_accuracy"] = accuracy(conf)
                logs["confusion"] = conf
                for cb in callbacks:
                    result = cb.on_epoch_end(epoch, state, logs)
                    if isinstance(result, TrainState):
                        state = result
    else:
        state, history = trainer.fit(
            state, epochs=args.epochs, steps_per_epoch=steps,
            callbacks=callbacks,
            bn_recalibration_batches=args.bn_recalibration_batches,
            steps_per_dispatch=args.steps_per_dispatch)
        if args.bn_recalibration_batches:
            state = trainer.recalibrate_batch_stats(
                state, args.bn_recalibration_batches)
    conf, val_loss = trainer.evaluate(state)
    print(f"final: val_loss={val_loss:.4f} val_acc={accuracy(conf):.4f}")


if __name__ == "__main__":
    main()
