#!/usr/bin/env python
"""Accuracy calibration on the shared-spectrum hard corpus.

Runs one model through the reference training recipe on the
tests/hard_corpus.py benchmark (classes share one tone inventory and
differ in temporal order; SNR sweep keeps accuracy off the 1.0
ceiling) and prints one JSON line with the accuracy record. Used to
produce the docs/ACCURACY.md table and the bands asserted by
tests/test_hard_accuracy.py, and to quantify bf16-vs-f32,
Pallas-vs-jnp augment, BN recalibration, and int8-PTQ deltas on a task
that can actually fail.
"""

import argparse
import hashlib
import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    p.add_argument("--clips_per_word", type=int, default=100)
    p.add_argument("--corpus_seed", type=int, default=0)
    p.add_argument("--snr_lo", type=float, default=2.0)
    p.add_argument("--snr_hi", type=float, default=12.0)
    p.add_argument("--pitch_span_l", type=float, default=1.4,
                   help="pitch span in inventory steps; >1 creates the "
                        "alias-overlap Bayes ceiling (hard_corpus.py)")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--disable_pallas", action="store_true",
                   help="force the jnp augment path (sets "
                        "SRT_DISABLE_PALLAS_AUGMENT)")
    p.add_argument("--bn_recalibration_batches", type=int, default=16)
    p.add_argument("--no_bn_recal", dest="bn_recalibration_batches",
                   action="store_const", const=0)
    p.add_argument("--eval_int8", action="store_true",
                   help="also export f32 + int8 weight-only AOT "
                        "artifacts and report their validation accuracy "
                        "delta")
    p.add_argument("--output_representation", default="auto",
                   help="'auto' = the model's registry representation "
                        "(raw/spec/mfcc/mfcc_and_raw)")
    p.add_argument("--model_kwargs", default=None,
                   help="JSON dict of extra module-constructor kwargs "
                        "for ablations, e.g. '{\"head\": \"flatten\"}' "
                        "on conv_2d_fast")
    p.add_argument("--learning_rate", type=float, default=None,
                   help="override the registry recipe's LR (ablations)")
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="chained steps per XLA dispatch (identical "
                        "updates; amortizes per-execution transport "
                        "cost — see export/benchmark.py)")
    return p.parse_args()


def corpus_dir(args) -> pathlib.Path:
    tag = hashlib.sha1(
        f"{args.clips_per_word}|{args.corpus_seed}|{args.snr_lo}|"
        f"{args.snr_hi}|{args.pitch_span_l}|v2".encode()).hexdigest()[:10]
    return pathlib.Path(f"/tmp/srt_hard_corpus_{tag}/audio")


def main():
    args = parse_args()
    if args.disable_pallas:
        os.environ["SRT_DISABLE_PALLAS_AUGMENT"] = "1"
    from hard_corpus import WANTED, build_hard_corpus

    import numpy as np

    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import build_device_dataset
    from speech_recognition_tpu.data.index import build_dataset_index
    from speech_recognition_tpu.labels import prepare_words_list
    from speech_recognition_tpu.train.checkpoint import PlateauCallback
    from speech_recognition_tpu.train.loop import Trainer
    from speech_recognition_tpu.train.optim import ReduceLROnPlateau

    root = corpus_dir(args)
    if not root.exists():
        print(f"building hard corpus at {root}...", file=sys.stderr)
        build_hard_corpus(root, clips_per_word=args.clips_per_word,
                          seed=args.corpus_seed,
                          snr_db_range=(args.snr_lo, args.snr_hi),
                          pitch_span_l=args.pitch_span_l)
    if args.output_representation == "auto":
        from speech_recognition_tpu.models.zoo import MODEL_REGISTRY
        args.output_representation = (
            MODEL_REGISTRY[args.model].representation)
    words = prepare_words_list(WANTED)
    settings = prepare_model_settings(
        label_count=len(words), window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation=args.output_representation)
    index = build_dataset_index(
        data_dirs=[str(root)], silence_percentage=13.0,
        unknown_percentage=60.0, wanted_words=WANTED,
        validation_percentage=20.0, testing_percentage=0.0)
    dataset = build_device_dataset(index, settings)
    trainer = Trainer(
        model_name=args.model, settings=settings, dataset=dataset,
        augment=AugmentConfig(), batch_size=args.batch_size,
        seed=args.seed, compute_dtype=args.compute_dtype,
        model_kwargs=json.loads(args.model_kwargs) if args.model_kwargs
        else None,
        learning_rate=args.learning_rate)
    state = trainer.init_state()
    steps = args.steps_per_epoch or None
    accs, losses = [], []

    class Collect:
        def on_epoch_end(self, epoch, state, logs):
            accs.append(logs["val_categorical_accuracy"])
            losses.append(logs["val_loss"])
            print(f"[ep {epoch:02d}] val_acc={accs[-1]:.4f} "
                  f"val_loss={losses[-1]:.4f} "
                  f"train_acc={logs['categorical_accuracy']:.4f}",
                  file=sys.stderr)
            return None

    # the reference recipe's LR controller (train.py:62-63) so the final
    # accuracy converges to a stable value instead of wandering
    plateau = PlateauCallback(ReduceLROnPlateau(
        factor=0.5, patience=4, min_lr=1e-5, mode="max"))
    state, _ = trainer.fit(
        state, epochs=args.epochs, steps_per_epoch=steps,
        callbacks=[Collect(), plateau],
        bn_recalibration_batches=args.bn_recalibration_batches,
        steps_per_dispatch=args.steps_per_dispatch)
    record = {
        "model": args.model,
        "representation": args.output_representation,
        "compute_dtype": trainer.compute_dtype,
        "pallas_augment": bool(trainer._use_pallas_augment),
        "bn_recal": args.bn_recalibration_batches,
        "clips_per_word": args.clips_per_word,
        "snr_db": [args.snr_lo, args.snr_hi],
        "pitch_span_l": args.pitch_span_l,
        "epochs": args.epochs,
        **({"model_kwargs": json.loads(args.model_kwargs)}
           if args.model_kwargs else {}),
        **({"learning_rate": args.learning_rate}
           if args.learning_rate else {}),
        "val_acc_final": round(accs[-1], 4),
        "val_acc_best": round(max(accs), 4),
        "val_loss_final": round(losses[-1], 4),
    }

    if args.eval_int8:
        import jax.numpy as jnp

        from speech_recognition_tpu.export.aot import (
            export_inference, load_exported,
        )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        val_wav, val_labels = dataset.get_unprocessed_data("validation")
        val_wav = np.asarray(val_wav)
        val_labels = np.asarray(val_labels)
        accs_by_dtype = {}
        for dtype in ("float32", "int8"):
            data = export_inference(
                trainer.module, trainer.frontend, trainer.representation,
                variables, batch_size=64, weight_dtype=dtype)
            fn = load_exported(data)
            preds = []
            for i in range(0, len(val_wav) - 63, 64):
                probs = np.asarray(fn(jnp.asarray(val_wav[i:i + 64])))
                preds.append(probs.argmax(-1))
            preds = np.concatenate(preds)
            accs_by_dtype[dtype] = float(
                (preds == val_labels[:len(preds)]).mean())
        record["aot_f32_acc"] = round(accs_by_dtype["float32"], 4)
        record["aot_int8_acc"] = round(accs_by_dtype["int8"], 4)
        record["int8_delta"] = round(
            accs_by_dtype["int8"] - accs_by_dtype["float32"], 4)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
