#!/usr/bin/env python
"""Static per-model report: params, bytes, forward FLOPs, edge budget.

The static half of the Pi `benchmark_model` report the reference relied
on (README.md:146-157: FLOPs estimate, memory, model size; the
competition's special-prize budget was <5,000,000 bytes and <1.25M
weights, README.md:14). The dynamic half (throughput/latency) lives in
scripts/bench_zoo.py and export/benchmark.py.

Prints one JSON line per model on stdout and a markdown table on
stderr. Runs on any backend (FLOPs come from XLA's cost analysis of
the compiled forward, which is backend-independent arithmetic).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def model_info(name: str, settings, batch_size: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    from speech_recognition_tpu.models import build_model
    from speech_recognition_tpu.ops.frontend import Frontend

    module, spec = build_model(
        name, num_classes=settings.label_count,
        spectrogram_length=settings.spectrogram_length,
        num_log_mel_features=settings.num_log_mel_features,
        spectrogram_frequencies=settings.spectrogram_frequencies,
        desired_samples=settings.desired_samples,
        window_size_samples=settings.window_size_samples,
        window_stride_samples=settings.window_stride_samples)
    frontend = Frontend(settings)
    wav = jnp.zeros((batch_size, settings.desired_samples), jnp.float32)
    x = frontend.features(wav, spec.representation)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    n_params = sum(int(a.size) for a in
                   jax.tree_util.tree_leaves(variables["params"]))
    n_stats = sum(int(a.size) for a in jax.tree_util.tree_leaves(
        variables.get("batch_stats", {})))

    flops = None
    try:
        lowered = jax.jit(
            lambda v, x: module.apply(v, x, train=False)).lower(
            variables, x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost:
            flops = float(cost.get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort
        print(f"{name}: cost_analysis unavailable: {e}", file=sys.stderr)

    f32_bytes = (n_params + n_stats) * 4
    info = {
        "model": name,
        "representation": spec.representation,
        "optimizer": spec.optimizer,
        "params": n_params,
        "batch_stats": n_stats,
        "f32_bytes": f32_bytes,
        # competition special-prize budget (README.md:14)
        "fits_pi_budget": bool(n_params < 1_250_000
                               and f32_bytes < 5_000_000),
    }
    if flops is not None:
        info["forward_flops_per_clip"] = flops / batch_size
    return info


def main():
    from speech_recognition_tpu.config import prepare_model_settings
    from speech_recognition_tpu.models import MODEL_REGISTRY

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="*", default=[],
                   help="model names; default: all 25")
    p.add_argument("--label_count", type=int, default=12)
    p.add_argument("--window_size_ms", type=float, default=30.0)
    p.add_argument("--window_stride_ms", type=float, default=10.0)
    p.add_argument("--dct_coefficient_count", type=int, default=80)
    p.add_argument("--num_log_mel_features", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=1,
                   help="batch for the FLOPs measurement (per-clip "
                        "FLOPs are normalized by it)")
    args = p.parse_args()

    names = args.models or sorted(MODEL_REGISTRY)
    settings = prepare_model_settings(
        label_count=args.label_count,
        window_size_ms=args.window_size_ms,
        window_stride_ms=args.window_stride_ms,
        dct_coefficient_count=args.dct_coefficient_count,
        num_log_mel_features=args.num_log_mel_features,
        output_representation="raw")

    rows = []
    for name in names:
        info = model_info(name, settings, batch_size=args.batch_size)
        rows.append(info)
        print(json.dumps(info), flush=True)

    print("\n| model | repr | params | f32 bytes | MFLOP/clip | Pi? |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        mf = r.get("forward_flops_per_clip")
        print(f"| {r['model']} | {r['representation']} | "
              f"{r['params']:,} | {r['f32_bytes']:,} | "
              f"{mf / 1e6:,.1f} |" if mf else
              f"| {r['model']} | {r['representation']} | "
              f"{r['params']:,} | {r['f32_bytes']:,} | — |",
              file=sys.stderr, end="")
        print(f" {'yes' if r['fits_pi_budget'] else 'no'} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
