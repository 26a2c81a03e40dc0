#!/usr/bin/env python
"""Dataset preparation & verification (the reference's
maybe_download_and_extract is just an exists-check, input_data.py:177-180;
this does the actual staging + sanity counts for the Kaggle layout).

Expects the Kaggle TensorFlow Speech Recognition Challenge archives (or
an already-extracted tree). No network access is attempted.
"""

import argparse
import os
import sys
import tarfile
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_TRAIN_FILES = 64_727       # train.py:21
EXPECTED_TEST_FILES = 158_538       # convert_from_see_v3_bugfix.py:66


def extract(archive: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    if archive.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(archive) as tf:
            tf.extractall(dest, filter="data")
    elif archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(dest)
    else:
        raise ValueError(f"unknown archive format: {archive}")


def verify(data_root: str) -> bool:
    ok = True
    train_dir = os.path.join(data_root, "train", "audio")
    test_dir = os.path.join(data_root, "test", "audio")
    if os.path.isdir(train_dir):
        n = sum(len([f for f in files if f.endswith(".wav")])
                for _, _, files in os.walk(train_dir))
        bg = os.path.join(train_dir, "_background_noise_")
        n_bg = len([f for f in os.listdir(bg)
                    if f.endswith(".wav")]) if os.path.isdir(bg) else 0
        n -= n_bg
        status = "OK" if n == EXPECTED_TRAIN_FILES else "UNEXPECTED"
        print(f"train: {n} labeled wavs (+{n_bg} background) "
              f"[{status}; reference: {EXPECTED_TRAIN_FILES}]")
        ok &= n > 0
        from speech_recognition_tpu.labels import get_classes
        missing = [w for w in get_classes(wanted_only=False)
                   if not os.path.isdir(os.path.join(train_dir, w))]
        if missing:
            print(f"missing word dirs: {missing}")
            ok = False
    else:
        print(f"train dir missing: {train_dir}")
        ok = False
    if os.path.isdir(test_dir):
        n = len([f for f in os.listdir(test_dir) if f.endswith(".wav")])
        status = "OK" if n == EXPECTED_TEST_FILES else "UNEXPECTED"
        print(f"test: {n} wavs [{status}; reference: "
              f"{EXPECTED_TEST_FILES}]")
    else:
        print(f"test dir missing: {test_dir} (needed only for submission)")
    return ok


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_archive", default="",
                   help="train.7z/.tar.gz/.zip to extract")
    p.add_argument("--test_archive", default="")
    p.add_argument("--data_root", default="data")
    args = p.parse_args()
    if args.train_archive:
        extract(args.train_archive, args.data_root)
    if args.test_archive:
        extract(args.test_archive, args.data_root)
    sys.exit(0 if verify(args.data_root) else 1)


if __name__ == "__main__":
    main()
