"""Tests for train/tb_events.py — the dependency-free TensorBoard event
writer (reference parity: Lightning's TB logger, models.py:65)."""

import struct

import numpy as np
import pytest

from mri_interpolation_tpu.train.tb_events import (TBEventWriter, _crc32c,
                                                   export_scalars_jsonl,
                                                   read_event_file)


def test_crc32c_known_vectors():
    # published Castagnoli test vectors (RFC 3720 appendix B.4 style)
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"\xff" * 32) == 0x62A8AB43


def test_writer_roundtrip(tmp_path):
    with TBEventWriter(str(tmp_path), wall_time=1000.0) as w:
        w.add_scalar("train_loss", 0.5, step=1, wall_time=1001.0)
        w.add_scalar("train_loss", 0.25, step=2, wall_time=1002.0)
        w.add_scalar("eval/psnr", 30.5, step=2, wall_time=1002.5)
        path = w.path
    events = list(read_event_file(path))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[0]["wall_time"] == 1000.0
    assert [e["step"] for e in events[1:]] == [1, 2, 2]
    assert events[1]["scalars"] == [("train_loss", 0.5)]
    assert events[3]["scalars"][0][0] == "eval/psnr"
    np.testing.assert_allclose(events[3]["scalars"][0][1], 30.5, rtol=1e-6)


def test_corrupt_payload_detected(tmp_path):
    with TBEventWriter(str(tmp_path), wall_time=0.0) as w:
        w.add_scalar("x", 1.0, step=1, wall_time=1.0)
        path = w.path
    data = bytearray(open(path, "rb").read())
    data[-6] ^= 0xFF                      # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="crc"):
        list(read_event_file(path))


def test_varint_large_step(tmp_path):
    with TBEventWriter(str(tmp_path), wall_time=0.0) as w:
        w.add_scalar("x", 1.0, step=3_000_000_000, wall_time=1.0)
        path = w.path
    events = list(read_event_file(path))
    assert events[1]["step"] == 3_000_000_000


def test_export_scalars_jsonl(tmp_path):
    from mri_interpolation_tpu.train.scalars import ScalarLogger

    jsonl = str(tmp_path / "scalars.jsonl")
    with ScalarLogger(jsonl) as log:
        log.log_epoch_losses(0, 0, np.asarray([1.0, 0.5, 0.25]))
        log.log(3, "eval_psnr", 28.0)
    out = export_scalars_jsonl(jsonl, str(tmp_path / "tb"), wall_time=42.0)
    events = list(read_event_file(out))
    assert events[0]["file_version"] == "brain.Event:2"
    scalar_events = events[1:]
    assert len(scalar_events) == 4
    assert scalar_events[0]["scalars"] == [("train_loss", 1.0)]
    assert scalar_events[3]["scalars"] == [("eval_psnr", 28.0)]
    assert all(e["wall_time"] == 42.0 for e in scalar_events)


def test_tfrecord_framing_exact(tmp_path):
    # byte-level check of the TFRecord frame: length header + masked crcs
    with TBEventWriter(str(tmp_path), wall_time=0.0) as w:
        path = w.path
    data = open(path, "rb").read()
    (ln,) = struct.unpack_from("<Q", data, 0)
    assert len(data) == 12 + ln + 4       # exactly one framed record
