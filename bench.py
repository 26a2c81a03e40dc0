"""Benchmark entrypoint — prints ONE JSON line.

Metric of record (BASELINE.md): end-to-end training clips/sec for the
flagship recipe (train.py:22-75: conv_1d_time_sliced_with_attention,
batch 384, raw representation, full on-device augmentation incl.
background mixing). Baseline: ~450 clips/s on the reference's K80.

Runs on whatever accelerator jax exposes (the driver provides one real
TPU chip). Uses a synthetic device-resident dataset so the benchmark
measures the compute path, not disk I/O (the real data path stages the
whole corpus into HBM once at startup, so steady-state behavior matches).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K80_BASELINE_CLIPS_PER_SEC = 450.0


def main():
    import jax
    # persistent compile cache: the train-step program is large and the
    # bench host may have few cores; cache across runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
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
        num_train=4096, num_val=256, num_pseudo=256,
        num_classes=12, background_len=16000 * 30)
    trainer = Trainer(
        model_name="conv_1d_time_sliced_with_attention",
        settings=settings, dataset=dataset,
        augment=AugmentConfig(pseudo_frequency=0.6),
        batch_size=384)
    state = trainer.init_state()
    result = benchmark_train(trainer, state, steps=100, warmup=10)
    value = result["clips_per_sec"]
    print(json.dumps({
        "metric": "train_clips_per_sec",
        "value": round(value, 1),
        "unit": "clips/s",
        "vs_baseline": round(value / K80_BASELINE_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
