#!/usr/bin/env python
"""Inference throughput benchmark — the full-test-set prediction path.

Reference baselines (BASELINE.md): the K80 predicts the 158,538-clip
test set in ~4 min without TTA (~660 clips/s); the Raspberry Pi frozen
graph does batch-1 in ~134 min (~19.7 clips/s).

Two numbers are reported:
  * device: the jitted TTA predictor alone (left+loud folded into one
    program), synthetic device-resident batches — the compute ceiling.
  * end_to_end: predict_directory over a real on-disk WAV tree (native
    C++ batch decode pipelined with device compute), i.e. what
    scripts/make_submission.py actually runs.

Usage: python scripts/bench_infer.py [--num_files 15360] [--no_tta]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_TEST_CLIPS = 158_538  # convert_from_see_v3_bugfix.py:66


def build_test_dir(root: str, num_files: int, sr: int = 16000) -> str:
    """Synthetic test tree: tones + noise, int16 WAVs like Kaggle's."""
    import numpy as np
    from speech_recognition_tpu.data.wav import save_wav_file
    d = os.path.join(root, "audio")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    for i in range(num_files):
        f = 200.0 + (i % 37) * 90.0
        clip = (0.4 * np.sin(2 * np.pi * f * t)
                + rng.normal(0, 0.02, sr)).astype(np.float32)
        save_wav_file(os.path.join(d, f"clip_{i:06d}.wav"), clip, sr)
    return d


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    p.add_argument("--batch_size", type=int, default=384)
    p.add_argument("--num_files", type=int, default=15_360,
                   help="on-disk WAVs for the end-to-end leg")
    p.add_argument("--no_tta", action="store_true")
    p.add_argument("--keep_dir", default="",
                   help="reuse/keep this test tree instead of a tmp one")
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

    from speech_recognition_tpu.config import prepare_model_settings
    from speech_recognition_tpu.export.benchmark import benchmark_inference
    from speech_recognition_tpu.infer.submission import predict_directory
    from speech_recognition_tpu.infer.tta import Predictor, TTAConfig
    from speech_recognition_tpu.models import build_model

    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    module, spec = build_model(args.model, num_classes=12)
    if spec.representation != "raw":
        raise SystemExit("bench_infer supports raw-representation models")
    import jax.numpy as jnp
    wav0 = jnp.zeros((2, settings.desired_samples), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)}, wav0,
                            train=False)
    tta = TTAConfig(use_tta=not args.no_tta)
    predictor = Predictor(module, settings, spec.representation, tta)

    dev = benchmark_inference(predictor, variables,
                              batch_size=args.batch_size,
                              steps=50, warmup=5,
                              desired_samples=settings.desired_samples)

    test_root = args.keep_dir or os.path.join("/tmp", "srt_bench_infer")
    test_dir = os.path.join(test_root, "audio")
    import glob
    existing = len(glob.glob(os.path.join(test_dir, "*.wav")))
    if existing != args.num_files:
        if args.keep_dir and existing:
            # never rmtree a user-supplied directory (it was asked to be
            # kept); only the default /tmp tree is auto-rebuilt
            raise SystemExit(
                f"--keep_dir tree has {existing} WAVs but "
                f"--num_files={args.num_files}; pass a matching "
                "--num_files or clean the directory yourself")
        shutil.rmtree(test_dir, ignore_errors=True)
        print(f"building {args.num_files}-file test tree...",
              file=sys.stderr)
        test_dir = build_test_dir(test_root, args.num_files)
    # warm the compiled shapes (incl. the padded tail batch), then time
    _ = predict_directory(predictor, variables, test_dir,
                          batch_size=args.batch_size)
    t0 = time.perf_counter()
    basenames, probs = predict_directory(predictor, variables, test_dir,
                                         batch_size=args.batch_size)
    dt = time.perf_counter() - t0
    assert len(basenames) == args.num_files and probs.shape[1] == 12
    e2e_cps = args.num_files / dt
    full_set_min = REFERENCE_TEST_CLIPS / e2e_cps / 60.0

    print(json.dumps({
        "tta": not args.no_tta,
        "device_clips_per_sec": round(dev["clips_per_sec"], 1),
        "device_ms_per_clip": round(dev["ms_per_clip"], 4),
        "end_to_end_clips_per_sec": round(e2e_cps, 1),
        "end_to_end_files": args.num_files,
        "projected_158538_clip_minutes": round(full_set_min, 2),
        "k80_no_tta_minutes": 4.0,
    }))
    if not args.keep_dir:
        shutil.rmtree(test_root, ignore_errors=True)


if __name__ == "__main__":
    main()
