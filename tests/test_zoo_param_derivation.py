"""Architecture equivalence: param counts derived from the reference's
layer arithmetic must match the flax implementations.

``zoo_param_derivation.py`` computes each model's expected parameter
count by mirroring the Keras layer math of reference model.py (pure
arithmetic — it never touches our modules). The chain

    derived (reference arithmetic) == GOLDEN table == flax init count

holds for all 25 models: this file pins derived == GOLDEN, and
tests/test_zoo.py::test_model_forward pins GOLDEN == flax for every
registry entry.
"""

import pytest

from speech_recognition_tpu.models import MODEL_REGISTRY
from test_zoo_param_goldens import GOLDEN_PARAM_COUNTS
from zoo_param_derivation import DERIVED_PARAM_COUNTS


def test_derivations_cover_registry():
    assert set(DERIVED_PARAM_COUNTS) == set(MODEL_REGISTRY)


@pytest.mark.parametrize("name", sorted(DERIVED_PARAM_COUNTS))
def test_derived_matches_golden(name):
    assert DERIVED_PARAM_COUNTS[name] == GOLDEN_PARAM_COUNTS[name], (
        f"{name}: derived-from-reference {DERIVED_PARAM_COUNTS[name]:,} != "
        f"golden {GOLDEN_PARAM_COUNTS[name]:,}")


def test_pi_param_budget():
    """The Pi-class distilled net must fit <1.25M weights / <5e6 bytes
    (reference README.md:14). The flagship (model 210 recipe) and the
    conv_1d_time_sliced family it distills into both qualify at
    filter_mult=1 within rounding of the budget."""
    assert DERIVED_PARAM_COUNTS["conv_1d_time_sliced_with_attention"] \
        < 1_250_000
    flagship_bytes = \
        DERIVED_PARAM_COUNTS["conv_1d_time_sliced_with_attention"] * 4
    assert flagship_bytes < 5_000_000
