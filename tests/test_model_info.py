"""scripts/model_info.py — static benchmark_model-style report."""

import sys

import pytest

from speech_recognition_tpu.config import prepare_model_settings

sys.path.insert(0, "scripts")
from model_info import model_info  # noqa: E402


def _settings():
    return prepare_model_settings(
        label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
        dct_coefficient_count=80, num_log_mel_features=60,
        output_representation="raw")


def test_flagship_report():
    info = model_info("conv_1d_time_sliced_with_attention", _settings())
    # golden count (tests/test_zoo.py derivation chain) and the
    # competition budget the reference's Pi entry had to clear
    assert info["params"] == 1_191_433
    assert info["fits_pi_budget"] is True
    assert info["f32_bytes"] < 5_000_000
    assert info.get("forward_flops_per_clip", 0) > 1e7
    assert info["representation"] == "raw"
    assert info["optimizer"] == "rmsprop"


@pytest.mark.slow  # >10s on a 1-vCPU host; fast tier keeps sibling coverage
def test_over_budget_model_flagged():
    info = model_info("steffeNet", _settings())
    assert info["fits_pi_budget"] is False
    assert info["params"] > 1_250_000
