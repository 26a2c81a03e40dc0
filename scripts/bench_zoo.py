#!/usr/bin/env python
"""Per-model train-step throughput sweep.

Measures steady-state end-to-end training throughput (sample + decode +
augment + features + fwd/bwd + update, one XLA program) for a set of zoo
models — one per architectural family by default — and prints a JSON
line per model plus a markdown table to stderr.

The reference trains every model at ~450 clips/s on its K80 regardless
of family (the per-sample feed_dict loop dominates, input_data.py:457);
here the data path is shared and the model decides the ceiling.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one representative per family (SURVEY.md §2.2), all four representations
DEFAULT_MODELS = [
    "conv_1d_time_sliced_with_attention",  # flagship: framed depthwise
    "conv_1d_residual",                    # deep residual raw trunk
    "conv_1d_multi_time_sliced",           # multi-rate reshape branches
    "conv_1d_fast",                        # learned filterbank + grouped
    "inception",                           # inception blocks
    "steffeNet",                           # wide strided residual
    "conv_1d_gru",                         # strided depthwise stem
    "conv_2d_fast",                        # log-mel 2-D CNN (mfcc)
    "conv_1d_log_mfcc",                    # mfcc residual attention
    "conv_1d_spec",                        # linear spectrogram
    "conv_1d_mfcc_and_raw",                # two-input fusion
    "snn",                                 # SELU MLP (mfcc)
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="*", default=DEFAULT_MODELS)
    p.add_argument("--batch_size", type=int, default=384)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--steps_per_dispatch", type=int, default=25,
                   help="chained steps per XLA execution (amortizes "
                        "per-dispatch transport cost; see "
                        "export/benchmark.py)")
    p.add_argument("--trace", action="store_true",
                   help="also record traced device-busy ms/step per "
                        "model (jax.profiler; adds a short traced run)")
    args = p.parse_args()

    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import (
        synthetic_device_dataset,
    )
    from speech_recognition_tpu.export.benchmark import benchmark_train
    from speech_recognition_tpu.train.loop import Trainer

    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    dataset = synthetic_device_dataset(
        num_train=8192, num_val=256, num_pseudo=256,
        num_background=6, background_len=16000 * 30)

    rows = []
    for name in args.models:
        trainer = Trainer(model_name=name, settings=settings,
                          dataset=dataset,
                          augment=AugmentConfig(pseudo_frequency=0.6),
                          batch_size=args.batch_size)
        state = trainer.init_state()
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(
            state.params))
        state, r = benchmark_train(
            trainer, state, steps=args.steps, warmup=args.warmup,
            steps_per_dispatch=args.steps_per_dispatch)
        row = {"model": name, "params": int(n_params),
               "representation": trainer.representation,
               "ms_per_step": round(r["ms_per_step"], 3),
               "clips_per_sec": round(r["clips_per_sec"], 1),
               "vs_k80_450": round(r["clips_per_sec"] / 450.0, 1)}
        if args.trace:
            from speech_recognition_tpu.export.benchmark import (
                traced_train_device_time,
            )
            state, tr = traced_train_device_time(trainer, state, steps=10)
            if tr:
                row["traced_device_ms_per_step"] = round(
                    tr["device_ms_per_step"], 4)
        rows.append(row)
        print(json.dumps(row), flush=True)
        del trainer, state

    print("\n| model | repr | params | ms/step | clips/s | vs K80 |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['model']} | {r['representation']} | {r['params']:,} "
              f"| {r['ms_per_step']} | {r['clips_per_sec']:,} "
              f"| {r['vs_k80_450']}x |", file=sys.stderr)


if __name__ == "__main__":
    main()
