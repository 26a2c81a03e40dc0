#!/usr/bin/env python
"""Speed-TTA set builder (parity: create_tta_set.py:9-26)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test_dir", default="data/test/audio")
    p.add_argument("--out_dir", default="data/tta_test/audio")
    p.add_argument("--rate", type=float, default=0.9)
    p.add_argument("--batch_size", type=int, default=256)
    args = p.parse_args()
    from speech_recognition_tpu.tools.tta_set import build_tta_set
    n = build_tta_set(args.test_dir, args.out_dir, rate=args.rate,
                      batch_size=args.batch_size)
    print(f"wrote {n} stretched clips to {args.out_dir}")


if __name__ == "__main__":
    main()
