#!/usr/bin/env python
"""Colored-noise background generation (parity: generate_noise.py:7-17)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--noise_dir",
                   default="data/train/audio/_background_noise_")
    p.add_argument("--colors", nargs="+",
                   default=["blue", "brown", "violet"])
    p.add_argument("--seconds", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    from speech_recognition_tpu.data.noise import (
        generate_background_noise_files,
    )
    paths = generate_background_noise_files(
        args.noise_dir, colors=args.colors, seconds=args.seconds,
        seed=args.seed)
    print("Done!", paths)


if __name__ == "__main__":
    main()
