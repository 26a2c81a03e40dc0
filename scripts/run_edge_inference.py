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
import os
import sys

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
    args = p.parse_args()

    import numpy as np
    from speech_recognition_tpu.data.wav import load_wav_file
    from speech_recognition_tpu.export.aot import load_exported
    from speech_recognition_tpu.infer.submission import list_test_files

    classes = ("_silence_ _unknown_ stop down off right up go on yes "
               "left no").split()
    fn = load_exported(args.frozen_graph)
    scale = 32767.0 if args.legacy_scale else 32768.0
    rows = []
    for path in list_test_files(args.test_data):
        wav = load_wav_file(path, desired_samples=16000, scale=scale)
        probs = np.asarray(fn(wav[None, :]))
        label = classes[int(probs.argmax())].strip("_")
        rows.append((os.path.basename(path), label))
    with open(args.submission_fn, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fname", "label"])
        w.writerows(rows)
    print(f"wrote {len(rows)} predictions to {args.submission_fn}")


if __name__ == "__main__":
    main()
