"""AVI/MJPEG container (multimodal5): exact per-frame roundtrip on the
animated flat-tile fixture, RIFF-discipline negatives. Pure-Python;
Spark plumbing is covered by the gated query."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oracledb_datapump_spark.operators.multimodal5 import (
    _avi_dims,
    _avi_fps,
    _avi_n_frames,
    _frame_pixels,
    avi_decode_mjpeg,
    avi_encode_mjpeg,
)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000))
def test_container_and_frames_roundtrip(doc_id):
    v = avi_decode_mjpeg(avi_encode_mjpeg(doc_id))
    assert (v["width"], v["height"]) == _avi_dims(doc_id)
    assert v["n_frames"] == _avi_n_frames(doc_id)
    assert v["fps"] == _avi_fps(doc_id)
    for f, px in enumerate(v["frames"]):
        assert px == _frame_pixels(doc_id, f)


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="RIFF"):
        avi_decode_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="RIFF"):
        avi_decode_mjpeg(b"\x89PNG" + b"\x00" * 32)


def test_truncated_raises():
    raw = avi_encode_mjpeg(5)
    with pytest.raises(ValueError, match="truncated|length mismatch"):
        avi_decode_mjpeg(raw[:-30])


def test_header_movi_frame_count_crosscheck():
    raw = bytearray(avi_encode_mjpeg(5))
    i = raw.index(b"avih") + 8  # payload start; dwTotalFrames at +16
    raw[i + 16 : i + 20] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="frame count mismatch"):
        avi_decode_mjpeg(bytes(raw))


def test_zero_frame_video_rejected():
    raw = bytearray(avi_encode_mjpeg(4))
    i = raw.index(b"avih") + 8
    raw[i + 16 : i + 20] = struct.pack("<I", 0)
    # zero declared frames must be loud even before the movi crosscheck
    with pytest.raises(ValueError, match="zero frames|mismatch"):
        avi_decode_mjpeg(bytes(raw))


def test_non_mjpeg_stream_rejected():
    raw = bytearray(avi_encode_mjpeg(3))
    i = raw.index(b"strh") + 8
    raw[i + 4 : i + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPG"):
        avi_decode_mjpeg(bytes(raw))
