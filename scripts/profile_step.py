#!/usr/bin/env python
"""Capture a device trace of the training step and print device-time truth.

Replaces guessing from wall clocks (unreliable under the tunnel / on
shared hosts): runs warmup + N traced steps of the flagship recipe,
then aggregates the trace into per-module and per-op device time.

Reference numbers on one v5e chip (batch 384, bf16): train step ~3.1 ms
device-busy, of which the fused Pallas decode+augment kernel is 0.14 ms
(~5%) — the model forward/backward dominates. Honest (readback-synced)
wall sits above device busy: ~4.2 ms/step at 25 steps/dispatch, ~9.1
ms/step with per-step dispatch through the tunnel. (A round-2 note here
claimed tracing inflates device time 2-3x over a 1.2-1.4 ms untraced
wall; that wall was measured with block_until_ready, which does not
wait for remote execution — see export/benchmark.py. Per-op
instrumentation does add some overhead, so traced busy is still a mild
upper bound on pure device time.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="conv_1d_time_sliced_with_attention")
    p.add_argument("--batch_size", type=int, default=384)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--trace_dir", default="traces/train_step")
    p.add_argument("--compute_dtype", default="auto")
    args = p.parse_args()

    import jax
    from speech_recognition_tpu.config import (
        AugmentConfig, prepare_model_settings,
    )
    from speech_recognition_tpu.data.device_bank import (
        synthetic_device_dataset,
    )
    from speech_recognition_tpu.train.loop import Trainer
    from speech_recognition_tpu.utils.profiling import (
        summarize_trace, trace_context,
    )

    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    dataset = synthetic_device_dataset(
        num_train=8192, num_val=256, num_pseudo=256,
        num_background=6, background_len=16000 * 30)
    trainer = Trainer(model_name=args.model, settings=settings,
                      dataset=dataset,
                      augment=AugmentConfig(pseudo_frequency=0.6),
                      batch_size=args.batch_size,
                      compute_dtype=args.compute_dtype)
    state = trainer.init_state()
    key = jax.random.PRNGKey(0)
    for i in range(args.warmup):
        state, m = trainer.train_step(state, jax.random.fold_in(key, i))
    float(jax.device_get(m["loss"]))  # real sync (not block_until_ready
    # — it does not wait for remote execution; export/benchmark.py)
    with trace_context(args.trace_dir):
        for i in range(args.steps):
            state, m = trainer.train_step(
                state, jax.random.fold_in(key, 10_000 + i))
        # readback so every step executes inside the capture window
        float(jax.device_get(m["loss"]))

    summary = summarize_trace(args.trace_dir, num_steps=args.steps)
    print(f"device busy: {summary['device_busy_ms']:.2f} ms over "
          f"{args.steps} steps -> {summary['ms_per_step']:.3f} ms/step "
          f"(device-busy time; honest wall = chained-readback "
          f"aggregates, see export/benchmark.py)")
    print("modules:")
    for name, st in sorted(summary["modules"].items(),
                           key=lambda kv: -kv[1]["total_ms"]):
        print(f"  {name[:56]:<56s} {st['total_ms']:9.2f} ms "
              f"x{st['count']:<4d} {st['ms_per_exec']:8.3f} ms/exec")
    print("top ops:")
    for name, ms in list(summary["ops"].items())[:10]:
        print(f"  {name[:56]:<56s} {ms:9.2f} ms")
    print("top individual ops (source-attributed):")
    for d in summary["detail"][:12]:
        src = d["source"].replace("/root/repo/", "")
        print(f"  {d['op'][:34]:<34s} {d['total_ms']:8.2f} ms  "
              f"{d['category'][:22]:<22s} {src}")


if __name__ == "__main__":
    main()
