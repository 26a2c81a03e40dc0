#!/usr/bin/env python
"""Edge-style batch-1 inference from a frozen artifact
(parity: make_submission_on_rpi.py:26-121).

Loads the AOT artifact (no framework model code needed), walks a test
directory one clip at a time, and writes the submission CSV with the
``_``-stripped labels the competition harness expected
(make_submission_on_rpi.py:109-110).
"""

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frozen_graph", required=True)
    p.add_argument("--test_data", default="data/test/audio")
    p.add_argument("--submission_fn", default="rpi_submission.csv")
    p.add_argument("--legacy_scale", action="store_true",
                   help="use the Pi script's 1/32767 scaling "
                        "(make_submission_on_rpi.py:97) instead of "
                        "decode_wav's 1/32768")
    p.add_argument("--benchmark", action="store_true",
                   help="after the sweep, print a benchmark_model-style "
                        "report (reference README.md:146-157): artifact "
                        "bytes, avg batch-1 ms/sample (end-to-end incl. "
                        "WAV decode, and model-only), and the "
                        "competition edge budget check (<5,000,000 "
                        "bytes, <175 ms/sample)")
    args = p.parse_args()

    import numpy as np
    from speech_recognition_tpu.data.wav import load_wav_file
    from speech_recognition_tpu.export.aot import load_exported
    from speech_recognition_tpu.infer.submission import list_test_files

    classes = ("_silence_ _unknown_ stop down off right up go on yes "
               "left no").split()
    fn = load_exported(args.frozen_graph)
    scale = 32767.0 if args.legacy_scale else 32768.0
    files = list_test_files(args.test_data)
    if args.benchmark and files:
        # compile + cache warmup outside the timed sweep (the reference's
        # benchmark_model likewise reports steady-state averages)
        warm = load_wav_file(files[0], desired_samples=16000, scale=scale)
        np.asarray(fn(warm[None, :]))
    rows = []
    decode_s = model_s = 0.0
    t_sweep = time.perf_counter()
    for path in files:
        t0 = time.perf_counter()
        wav = load_wav_file(path, desired_samples=16000, scale=scale)
        t1 = time.perf_counter()
        probs = np.asarray(fn(wav[None, :]))
        model_s += time.perf_counter() - t1
        decode_s += t1 - t0
        label = classes[int(probs.argmax())].strip("_")
        rows.append((os.path.basename(path), label))
    sweep_s = time.perf_counter() - t_sweep
    with open(args.submission_fn, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fname", "label"])
        w.writerows(rows)
    print(f"wrote {len(rows)} predictions to {args.submission_fn}")
    if args.benchmark and rows:
        n = len(rows)
        size = os.path.getsize(args.frozen_graph)
        ms = 1000.0 * sweep_s / n
        report = {
            "artifact_bytes": size,
            "clips": n,
            "avg_ms_per_sample": round(ms, 3),
            "avg_model_ms": round(1000.0 * model_s / n, 3),
            "avg_decode_ms": round(1000.0 * decode_s / n, 3),
            "size_budget_5000000": bool(size < 5_000_000),
            "latency_budget_175ms": bool(ms < 175.0),
        }
        # Peak memory, next to the reference's benchmark_model "max
        # memory 2,180,436 bytes" row (README.md:155-157). Two numbers
        # because they measure different things: max_rss_bytes is this
        # PROCESS's high-water mark (includes the Python + JAX runtime,
        # so it upper-bounds what the reference's bare graph-runner
        # reported); device_peak_bytes is the accelerator-side
        # high-water mark when the backend exposes allocator stats
        # (TPU does; CPU returns nothing).
        import resource
        ru = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        report["max_rss_bytes"] = int(ru) * 1024  # Linux: KiB
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
            if peak is not None:
                report["device_peak_bytes"] = int(peak)
        except Exception:
            pass
        print(json.dumps(report))


if __name__ == "__main__":
    main()
