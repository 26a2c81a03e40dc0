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
    # warm then time
    for _ in range(3):
        jax.block_until_ready(fn(wav))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        jax.block_until_ready(fn(wav))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"batch-1 latency: {ms:.2f} ms/clip on {jax.default_backend()} "
          f"(reference Pi 3: 58 ms)")
    assert ms < 10_000  # sanity only


def test_artifact_roundtrip_deterministic(flagship_artifact):
    """Same input -> identical probs through the serialized artifact."""
    artifact, _ = flagship_artifact
    fn = load_exported(artifact)
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 16000)).astype(np.float32))
    a = np.asarray(fn(wav))
    b = np.asarray(fn(wav))
    np.testing.assert_array_equal(a, b)
