#!/usr/bin/env python
"""Microbenchmark: fused separable-block Pallas kernel vs the XLA
conv-fusion pipeline, per flagship trunk block shape (batch 384, bf16).

This is the measurement gate that decided AGAINST wiring
ops/pallas/experiments/separable_kernel.py into the models — see docs/TPU_RUN.md
"what didn't work". Timing is the honest chained-readback protocol
(one scan-of-K program per variant; the probe carry forces every
iteration; final jax.device_get is the only sync). Each variant pays
the same extra probe-add pass, so deltas are comparable.

Usage: python scripts/bench_separable_kernel.py [K-iterations]
Writes one JSON line per block config to stdout-adjacent JSONL.
"""
import sys, time, functools, json, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from speech_recognition_tpu.ops.pallas.experiments.separable_kernel import (
    fused_separable_block, reference_block)

B = 384
K = int(sys.argv[1]) if len(sys.argv) > 1 else 200
CFGS = [
    (399, 128, 128, 1, "VALID"),
    (397, 128, 192, 2, "SAME"),
    (199, 192, 192, 1, "VALID"),
    (197, 192, 256, 2, "SAME"),
    (99, 256, 256, 1, "VALID"),
    (97, 256, 320, 2, "SAME"),
    (49, 320, 320, 1, "VALID"),
    (47, 320, 384, 2, "SAME"),
    (24, 384, 384, 1, "VALID"),
    (22, 384, 512, 2, "SAME"),
    (11, 512, 512, 1, "VALID"),
]

key = jax.random.PRNGKey(0)
tot = {}
for (T, Cin, Cout, s, pad) in CFGS:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x0 = jax.random.normal(k1, (B, T, Cin), jnp.float32).astype(jnp.bfloat16)
    wdw = (jax.random.normal(k2, (3, 1, Cin), jnp.float32) * 0.2).astype(jnp.bfloat16)
    wpw = (jax.random.normal(k3, (1, Cin, Cout), jnp.float32) * 0.1).astype(jnp.bfloat16)
    a = jax.random.uniform(k4, (Cin,)) + 0.5
    b = jax.random.normal(k5, (Cin,)) * 0.1

    def scan_of(fn):
        @jax.jit
        def run(x0, probe0):
            def body(probe, _):
                x = x0 + (probe * 1e-30).astype(x0.dtype)
                y, s1, s2 = fn(x)
                return (y.astype(jnp.float32).mean() + s1.sum() * 1e-9
                        + s2.sum() * 1e-9), None
            probe, _ = jax.lax.scan(body, probe0, None, length=K)
            return probe
        return run

    variants = {
        "xla": scan_of(functools.partial(
            reference_block, w_dw=wdw, w_pw=wpw, a=a, b=b,
            stride=s, padding=pad)),
        "fuse": scan_of(functools.partial(
            fused_separable_block, w_dw=wdw, w_pw=wpw, a=a, b=b,
            stride=s, padding=pad, fold_weights=False)),
        "fold": scan_of(functools.partial(
            fused_separable_block, w_dw=wdw, w_pw=wpw, a=a, b=b,
            stride=s, padding=pad, fold_weights=True)),
    }
    res = {}
    for name, fn in variants.items():
        try:
            p = float(jax.device_get(fn(x0, jnp.float32(0.0))))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                p = float(jax.device_get(fn(x0, jnp.float32(1.0))))
                dt = (time.perf_counter() - t0) / K * 1e3
                best = min(best, dt)
        except Exception as e:
            best = float("nan")
            print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        res[name] = best
        tot[name] = tot.get(name, 0.0) + best
    print(f"T={T:4d} {Cin:3d}->{Cout:3d} s{s} {pad:5s}: " +
          "  ".join(f"{n} {v:7.4f}" for n, v in res.items()), flush=True)
    with open(os.environ.get("SEPBLOCK_JSONL", "/tmp/sepblock_results.jsonl"), "a") as jf:
        jf.write(json.dumps(dict(T=T, Cin=Cin, Cout=Cout, s=s, pad=pad, **res)) + "\n")
print("TOTAL: " + "  ".join(f"{n} {v:.4f} ms" for n, v in tot.items()))
