#!/usr/bin/env python
"""Streaming-mode training throughput (VERDICT r4 item 9).

Measures ``Trainer.fit_streaming`` end to end — HostPrefetchLoader
producer thread decoding on-disk WAVs with the native codec and
uploading while the device computes — on the flagship recipe
(conv_1d_time_sliced_with_attention, raw representation, batch 384,
device-side augmentation with a background bank). This is the >HBM
path: the bank path (bench.py) stages the whole corpus in device
memory; this one never does, so the measured number is bounded by
host decode + upload overlap, not device compute.

The corpus is synthetic on-disk WAVs — decode cost is identical to
real Speech Commands clips (same RIFF shape, same sample count), and
steady-state throughput is corpus-size independent (random sampling
with replacement; a genuinely >page-cache corpus adds disk latency
that belongs to the storage, not the framework).

Timing rides fit_streaming's own honest-sync protocol: the history
readback forces the full step chain before the clips/s timestamp
(export/benchmark.py module doc — block_until_ready does not wait for
remote execution on the axon tunnel).

Prints one JSON line to stdout; diagnostics to stderr.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_disk_corpus(root: str, num_clips: int, seed: int = 0):
    """Write ``num_clips`` one-second int16 WAVs; return paths+labels."""
    import numpy as np

    from speech_recognition_tpu.data.wav import save_wav_file

    rng = np.random.default_rng(seed)
    paths = []
    for i in range(num_clips):
        sig = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
        p = os.path.join(root, f"clip_{i:06d}.wav")
        save_wav_file(p, sig, 16000)
        paths.append(p)
    labels = rng.integers(2, 12, num_clips).astype(np.int32)
    silence = labels == 2
    return paths, labels, silence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_clips", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=384)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--steps_per_dispatch", type=int, default=25)
    ap.add_argument("--prefetch", type=int, default=4)
    ap.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    args = ap.parse_args()
    if args.steps % args.steps_per_dispatch:
        ap.error("steps must be a multiple of steps_per_dispatch")

    import jax
    import numpy as np

    # same persistent compile cache as bench.py — the streamed scan
    # program is large and compiles in minutes over the tunnel
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import BackgroundBank
    from speech_recognition_tpu.data.prefetch import HostPrefetchLoader
    from speech_recognition_tpu.train.loop import Trainer

    t0 = time.time()
    tmp = tempfile.mkdtemp(prefix="stream_bench_")
    paths, labels, silence = build_disk_corpus(tmp, args.num_clips)
    print(f"corpus: {args.num_clips} clips on disk "
          f"({time.time() - t0:.0f}s to write)", file=sys.stderr)

    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    rng = np.random.default_rng(1)
    bg = [rng.uniform(-0.1, 0.1, 16000 * 60).astype(np.float32)
          for _ in range(6)]
    trainer = Trainer(
        model_name=args.model, settings=settings, dataset=None,
        background=BackgroundBank.from_arrays(bg, 16000),
        augment=AugmentConfig(), batch_size=args.batch_size)
    state = trainer.init_state()

    def loader():
        from speech_recognition_tpu.parallel.mesh import batch_sharding
        return HostPrefetchLoader(
            paths, labels, silence, batch_size=args.batch_size,
            desired_samples=16000, prefetch=args.prefetch, seed=7,
            sharding=batch_sharding(trainer.mesh))

    spd = args.steps_per_dispatch
    with loader() as ld:
        # warmup: compile the scanned stream program outside the timing
        state, _ = trainer.fit_streaming(state, ld, steps=spd,
                                         steps_per_dispatch=spd)
        print(f"warmup done ({time.time() - t0:.0f}s total)",
              file=sys.stderr)
        t1 = time.time()
        state, hist = trainer.fit_streaming(
            state, ld, steps=args.steps, steps_per_dispatch=spd)
        wall = time.time() - t1

    clips_per_sec = hist["clips_per_sec"][0]

    # bottleneck attribution: time the two host-side legs standalone.
    # (1) native batch decode on this host; (2) raw int16 device_put
    # (the wire leg — on the axon tunnel this is the bound, on a TPU VM
    # PCIe makes it negligible and decode binds).
    from speech_recognition_tpu.data.wav import decode_batch_int16
    bidx = np.arange(args.batch_size) % args.num_clips
    bpaths = [paths[i] for i in bidx]
    t = time.time()
    for _ in range(3):
        wav_i16 = decode_batch_int16(bpaths, 16000)
    decode_cps = 3 * args.batch_size / (time.time() - t)
    dev = jax.devices()[0]

    def put_synced(arr):
        # a 1-element readback forces the transfer to complete —
        # block_until_ready does not guarantee completion on the axon
        # tunnel (export/benchmark.py module doc); the extra RTT is
        # ~2% of an upload at this size
        x = jax.device_put(arr, dev)
        np.asarray(x[0, :1])
        return x

    put_synced(wav_i16)  # warm the path
    t = time.time()
    for _ in range(3):
        put_synced(wav_i16)
    upload_s = (time.time() - t) / 3
    upload_mbps = wav_i16.nbytes / upload_s / 1e6
    upload_cps = args.batch_size / upload_s

    diag = {
        "host_decode_clips_per_sec": round(decode_cps, 1),
        "upload_int16_MB_per_sec": round(upload_mbps, 1),
        "upload_bound_clips_per_sec": round(upload_cps, 1),
        "ms_per_step": round(wall / args.steps * 1e3, 3),
        "wall_s": round(wall, 2),
        "steps": args.steps,
        "steps_per_dispatch": spd,
        "batch_size": args.batch_size,
        "corpus_clips_on_disk": args.num_clips,
        "prefetch_depth": args.prefetch,
        "compute_dtype": trainer.compute_dtype,
        "model": args.model,
        "final_loss": round(float(hist["loss"][-1]), 4),
        "backend": __import__("jax").default_backend(),
    }
    print(f"diagnostics: {json.dumps(diag)}", file=sys.stderr)
    print(json.dumps({
        "metric": "stream_train_clips_per_sec",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / 450.0, 2),
    }))


if __name__ == "__main__":
    main()
