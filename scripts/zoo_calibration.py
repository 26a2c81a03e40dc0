#!/usr/bin/env python
"""Reduced-schedule accuracy calibration across the whole zoo
(VERDICT r3 item 2: every model family gets a calibration number).

Runs scripts/calibrate_accuracy.py for every registry model (or
--models) on the alias-ceiling corpus at a reduced schedule, one fresh
interpreter per model, appending records to a resumable JSONL and
printing a markdown table for docs/ACCURACY.md. The representation
comes from the registry (calibrate_accuracy --output_representation
auto), like the reference's per-model input choice (model.py:1729-1781).
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="*", default=None,
                   help="default: all registry models")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--clips_per_word", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=str(REPO / "docs" / "sweeps" /
                                        "zoo_calibration.jsonl"))
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--extra", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from speech_recognition_tpu.models.zoo import MODEL_REGISTRY
    models = args.models or list(MODEL_REGISTRY)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = {}
    if out.exists():
        for line in out.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                done[(rec["model"], rec["epochs"],
                      rec["clips_per_word"])] = rec

    for model in models:
        key = (model, args.epochs, args.clips_per_word)
        if key in done:
            print(f"skip (cached): {model}", file=sys.stderr)
            continue
        cmd = [sys.executable, str(REPO / "scripts" /
                                   "calibrate_accuracy.py"),
               "--model", model, "--epochs", str(args.epochs),
               "--clips_per_word", str(args.clips_per_word),
               "--seed", str(args.seed), *args.extra]
        print(f"run: {model}", file=sys.stderr)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.timeout)
        except subprocess.TimeoutExpired:
            rec = {"model": model, "epochs": args.epochs,
                   "clips_per_word": args.clips_per_word,
                   "error": f"timeout {args.timeout}s"}
            with out.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            done[key] = rec
            continue
        rec = None
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.strip().startswith("{"):
                rec = json.loads(line)
                break
        if proc.returncode != 0 or rec is None:
            rec = {"model": model, "epochs": args.epochs,
                   "clips_per_word": args.clips_per_word,
                   "error": f"rc={proc.returncode}: "
                            f"{proc.stderr[-400:]}"}
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        done[key] = rec
        if "error" in rec:
            print(f"  -> ERROR {rec['error'][:200]}", file=sys.stderr)
        else:
            print(f"  -> final {rec['val_acc_final']:.4f} "
                  f"best {rec['val_acc_best']:.4f}", file=sys.stderr)

    print("| model | representation | val acc final | val acc best |")
    print("|---|---|---|---|")
    for model in models:
        rec = done[(model, args.epochs, args.clips_per_word)]
        if "error" in rec:
            print(f"| {model} | — | error | error |")
        else:
            print(f"| {model} | {rec.get('representation', '?')} "
                  f"| {rec['val_acc_final']:.4f} "
                  f"| {rec['val_acc_best']:.4f} |")


if __name__ == "__main__":
    main()
