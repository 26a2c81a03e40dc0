"""The benchmark harness's sync protocol (export/benchmark.py).

On the tunneled TPU platform ``block_until_ready`` does not wait for
remote execution, so the harness must (a) force completion through a
``device_get`` of a computed value and (b) keep the timed work on one
dependency chain ending in that value. These tests pin the protocol
mechanics on the CPU mesh: chunked dispatch equals per-step dispatch,
warmup always covers the chunked executable, and the inference probe
chains independent batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.config import (
    AugmentConfig, prepare_model_settings,
)
from speech_recognition_tpu.data.device_bank import synthetic_device_dataset
from speech_recognition_tpu.export.benchmark import (
    benchmark_inference, benchmark_train,
)
from speech_recognition_tpu.train.loop import Trainer


def _trainer():
    settings = prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=40,
        output_representation="mfcc")
    ds = synthetic_device_dataset(num_train=64, num_val=32, num_pseudo=8)
    return Trainer(model_name="conv_2d_fast", settings=settings,
                   dataset=ds, augment=AugmentConfig(pseudo_frequency=0.25),
                   batch_size=16)


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_benchmark_train_chunked_dispatch():
    trainer = _trainer()
    state = trainer.init_state()
    # warmup=2 with steps_per_dispatch=5 must round warmup UP (compile
    # stays out of the timed region) and still count exactly `steps`
    state, r = benchmark_train(trainer, state, steps=10, warmup=2,
                               steps_per_dispatch=5)
    assert r["steps"] == 10
    assert r["steps_per_dispatch"] == 5
    assert int(state.step) == 15  # 5 warm (rounded up) + 10 timed
    assert np.isfinite(r["final_loss"])
    assert r["clips_per_sec"] > 0


def test_benchmark_train_rejects_non_multiple():
    trainer = _trainer()
    state = trainer.init_state()
    try:
        benchmark_train(trainer, state, steps=10, warmup=2,
                        steps_per_dispatch=3)
    except ValueError:
        return
    raise AssertionError("steps=10, steps_per_dispatch=3 must raise")


def test_benchmark_inference_probe_chains_batches():
    class DummyPredictor:
        calls = 0

        def predict(self, variables, wav):
            DummyPredictor.calls += 1
            return jnp.ones((wav.shape[0], 12)) / 12.0

    r = benchmark_inference(DummyPredictor(), {}, batch_size=4,
                            steps=5, warmup=1, desired_samples=128)
    assert DummyPredictor.calls == 6  # warmup + steps all executed
    assert r["clips_per_sec"] > 0
    assert r["ms_per_batch"] > 0


def test_roofline_diag_attribution():
    """bench.py's roofline math: which wall the program leans on, and
    the fusion ratio against the no-fusion traffic ceiling."""
    import bench

    # depthwise-ish profile: low arithmetic intensity -> memory-bound
    d = bench.roofline_diag(flops=132e9, bytes_accessed=5.58e9,
                            device_ms=3.64)
    assert d["roofline_bound"] == "memory"
    assert abs(d["arithmetic_intensity_flops_per_byte"] - 23.66) < 0.02
    assert d["nofusion_memory_ms"] > d["compute_lightspeed_ms"]
    # measured busy below the no-fusion ceiling => fusion saved traffic
    assert 0 < d["fusion_traffic_ratio"] < 1

    # matmul-tower profile: intensity above the ridge -> compute-bound
    d = bench.roofline_diag(flops=1e12, bytes_accessed=1e9)
    assert d["roofline_bound"] == "compute"
    assert "fusion_traffic_ratio" not in d


def test_cost_per_step_reports_flops_and_bytes():
    """XLA cost analysis feeds the roofline; both terms must be real
    on the compiled train step (CPU backend also reports them)."""
    import bench

    trainer = _trainer()
    state = trainer.init_state()
    flops, bytes_accessed = bench._cost_per_step(trainer, state)
    assert flops > 0
    assert bytes_accessed > 0
    # a train step that computed fewer flops than it moved operand
    # bytes/10 would mean the lowering lost the model entirely
    assert flops / bytes_accessed > 0.1

def test_acc_band_verdict_logic():
    """The per-round accuracy signal flags only multi-seed departures:
    all seeds below the band floor (real regression) or all above the
    ceiling (corpus lost its alias ambiguity) — never a single outlier
    seed inside an honest noise band."""
    import bench

    band = (0.80, 0.97)
    assert not bench.acc_band_verdict([0.86, 0.88], band)   # in band
    assert not bench.acc_band_verdict([0.78, 0.85], band)   # one low seed
    assert bench.acc_band_verdict([0.70, 0.75], band)       # all below
    assert bench.acc_band_verdict([0.99, 0.995], band)      # all above
    assert not bench.acc_band_verdict([0.95, 0.99], band)   # one high seed
    # the shipped band, when set, must be sane: floor < ceiling, both
    # inside (0, 1), and wide enough to hold the measured spread
    if bench.ACC_BAND:
        lo, hi = bench.ACC_BAND
        assert 0.0 < lo < hi <= 1.0
        assert hi - lo >= 0.02
