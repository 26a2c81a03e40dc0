"""Edge deployment budgets (reference README.md:14,146-157).

The competition's Raspberry-Pi special prize required a frozen artifact
under 5,000,000 bytes serving one clip in <175 ms; the reference's
frozen_195.pb measured 4,870,144 bytes / 58 ms. These tests enforce the
same budgets on our AOT-exported StableHLO artifact for the Pi-class
model family and report batch-1 latency for the record.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.config import prepare_model_settings
from speech_recognition_tpu.export.aot import export_inference, load_exported
from speech_recognition_tpu.models import build_model
from speech_recognition_tpu.ops.frontend import Frontend

ARTIFACT_BYTE_BUDGET = 5_000_000   # README.md:14 "<5,000,000 bytes"
PARAM_BUDGET = 1_250_000           # README.md:14 "<1.25M weights"


@pytest.fixture(scope="module")
def flagship_artifact():
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    module, spec = build_model("conv_1d_time_sliced_with_attention",
                               num_classes=12)
    wav = jnp.zeros((1, 16000), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)}, wav,
                            train=False)
    front = Frontend(settings)
    artifact = export_inference(module, front, spec.representation,
                                variables, batch_size=1)
    return artifact, variables


def test_param_budget(flagship_artifact):
    _, variables = flagship_artifact
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n < PARAM_BUDGET, f"{n:,} params exceeds the Pi budget"


def test_artifact_size_budget(flagship_artifact):
    artifact, _ = flagship_artifact
    size = len(artifact)
    print(f"exported artifact: {size:,} bytes "
          f"(budget {ARTIFACT_BYTE_BUDGET:,}; reference frozen_195.pb "
          f"was 4,870,144)")
    assert size < ARTIFACT_BYTE_BUDGET


def test_batch1_latency_report(flagship_artifact):
    """Batch-1 inference works and its latency is recorded. The 175 ms
    competition bound was measured on a Raspberry Pi 3; we report (not
    assert) the number for this host since CI hardware varies."""
    artifact, _ = flagship_artifact
    fn = load_exported(artifact)
    wav = jnp.zeros((1, 16000), jnp.float32)
    probs = np.asarray(fn(wav))
    assert probs.shape == (1, 12)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-4)
    # warm then time; per-call readback is the honest per-clip latency
    # (block_until_ready does not wait for remote execution on the
    # tunnel platform — see export/benchmark.py)
    for _ in range(3):
        np.asarray(fn(wav))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        np.asarray(fn(wav))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"batch-1 latency: {ms:.2f} ms/clip on {jax.default_backend()} "
          f"(reference Pi 3: 58 ms)")
    assert ms < 10_000  # sanity only
    # peak memory for the record, next to the reference's benchmark_model
    # max memory 2,180,436 bytes (README.md:155-157): process RSS
    # high-water (includes the Python+JAX runtime, an upper bound on the
    # bare graph-runner figure) and, where the backend exposes allocator
    # stats, the device-side peak
    import resource
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    print(f"edge memory: max_rss={rss:,} bytes"
          + (f", device_peak={peak:,} bytes" if peak else "")
          + " (reference benchmark_model max memory: 2,180,436)")
    assert rss > 0


@pytest.fixture(scope="module")
def int8_artifact():
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    module, spec = build_model("conv_1d_time_sliced_with_attention",
                               num_classes=12)
    wav = jnp.zeros((1, 16000), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)}, wav,
                            train=False)
    front = Frontend(settings)
    artifact = export_inference(module, front, spec.representation,
                                variables, batch_size=1,
                                weight_dtype="int8")
    return artifact, variables


def test_int8_artifact_size(flagship_artifact, int8_artifact):
    """Weight-only int8 PTQ beats the f32 artifact ~3.6x and crushes the
    5 MB Pi budget (reference frozen_195.pb: 4,870,144 bytes)."""
    f32_artifact, _ = flagship_artifact
    q_artifact, _ = int8_artifact
    print(f"int8 artifact: {len(q_artifact):,} bytes "
          f"(f32: {len(f32_artifact):,})")
    assert len(q_artifact) < 2_000_000
    assert len(q_artifact) < len(f32_artifact) / 2.5


def test_int8_artifact_probs_close_to_f32(int8_artifact):
    """Per-channel int8 weight error is <=1/254 of the channel max;
    output probabilities stay close to the f32 program's."""
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")
    module, spec = build_model("conv_1d_time_sliced_with_attention",
                               num_classes=12)
    artifact, variables = int8_artifact
    fn_q = load_exported(artifact)
    front = Frontend(settings)
    rng = np.random.default_rng(11)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 16000)).astype(np.float32))
    probs_q = np.asarray(fn_q(wav))
    logits = module.apply(variables, wav, train=False)
    probs_f = np.asarray(jax.nn.softmax(logits, axis=-1))
    assert probs_q.shape == probs_f.shape == (1, 12)
    np.testing.assert_allclose(probs_q.sum(), 1.0, atol=1e-4)
    np.testing.assert_allclose(probs_q, probs_f, atol=0.05)


def test_quantize_weights_roundtrip_error_bound():
    from speech_recognition_tpu.export.aot import quantize_weights_int8
    rng = np.random.default_rng(5)
    w = rng.normal(size=(7, 9, 64)).astype(np.float32)
    tree = {"k": jnp.asarray(w), "bias": jnp.zeros((64,), jnp.float32)}
    leaves, treedef = quantize_weights_int8(tree, min_size=64)
    rebuilt = jax.tree_util.tree_unflatten(
        treedef, [q.astype(np.float32) * s if s is not None else q
                  for q, s in leaves])
    # bias untouched, kernel within half a quantization step per channel
    assert rebuilt["bias"].dtype == np.float32
    step = np.max(np.abs(w), axis=(0, 1)) / 127.0
    err = np.max(np.abs(np.asarray(rebuilt["k"]) - w), axis=(0, 1))
    assert np.all(err <= step / 2 + 1e-7)


def test_artifact_roundtrip_deterministic(flagship_artifact):
    """Same input -> identical probs through the serialized artifact."""
    artifact, _ = flagship_artifact
    fn = load_exported(artifact)
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 16000)).astype(np.float32))
    a = np.asarray(fn(wav))
    b = np.asarray(fn(wav))
    np.testing.assert_array_equal(a, b)
