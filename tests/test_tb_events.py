"""TensorBoard event writer: format validation.

The writer hand-encodes TFRecord framing + Event/Summary protos
(reference-parity observability: train.py:64 TensorBoard callback). The
strongest check runs TF's own reader over our output when TF is in the
image; the roundtrip test keeps coverage without it.
"""

import numpy as np
import pytest

from speech_recognition_tpu.utils.tb_events import (
    TBEventWriter, crc32c, masked_crc32c, read_scalar_events,
)


def test_crc32c_known_vectors():
    # canonical CRC32C check values (RFC 3720 §B.4)
    assert crc32c(b"") == 0x00000000
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"123456789") == 0xE3069283


def test_masked_crc_differs():
    assert masked_crc32c(b"123456789") != crc32c(b"123456789")


def test_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 2.5, "accuracy": 0.125})
    w.add_scalars(2, {"loss": 2.25, "lr": 1e-3})
    w.close()
    events = list(read_scalar_events(w.path))
    assert events[0][0] == 1
    np.testing.assert_allclose(events[0][1]["loss"], 2.5)
    np.testing.assert_allclose(events[0][1]["accuracy"], 0.125)
    assert events[1][0] == 2
    np.testing.assert_allclose(events[1][1]["lr"], 1e-3, rtol=1e-6)


def test_tf_reader_loads_our_events(tmp_path):
    """TensorBoard compatibility proven with TF's own TFRecord reader +
    Event proto parser."""
    tf = pytest.importorskip("tensorflow")
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(7, {"loss": 1.5, "val_categorical_accuracy": 0.75})
    w.add_scalars(8, {"loss": 1.25})
    w.close()

    from tensorflow.core.util import event_pb2
    records = list(tf.data.TFRecordDataset(w.path))
    events = [event_pb2.Event.FromString(r.numpy()) for r in records]
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 7
    got = {v.tag: v.simple_value for v in events[1].summary.value}
    np.testing.assert_allclose(got["loss"], 1.5)
    np.testing.assert_allclose(got["val_categorical_accuracy"], 0.75)
    assert events[2].step == 8


def test_none_and_empty_scalars_skipped(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"a": None})
    w.add_scalars(2, {})
    w.add_scalars(3, {"b": 1.0})
    w.close()
    events = list(read_scalar_events(w.path))
    assert len(events) == 1 and events[0][0] == 3
