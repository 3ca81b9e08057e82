"""Baseline JPEG codec (multimodal4): exact roundtrip on the flat-tile
fixture, honest lossiness off it, entropy-layer negatives. Pure-Python;
the Spark plumbing is covered by the gated query via
tests/test_queries_oracle.py."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oracledb_datapump_spark.operators.multimodal4 import (
    _jpeg_bytes,
    _jpeg_dims,
    _jpeg_pixels,
    jpeg_decode_gray,
    jpeg_encode_gray,
)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000))
def test_flat_tile_roundtrip_exact(doc_id):
    w, h, out = jpeg_decode_gray(_jpeg_bytes(doc_id))
    assert (w, h) == _jpeg_dims(doc_id)
    assert out == _jpeg_pixels(doc_id)


def test_codec_is_honestly_lossy():
    """A gradient (non-flat blocks, odd values) must NOT roundtrip
    exactly — a codec that is lossless on arbitrary input is not
    doing quantized-DCT JPEG."""
    grad = [[(x * 7 + y * 5) % 256 for x in range(16)] for y in range(16)]
    _, _, out = jpeg_decode_gray(jpeg_encode_gray(grad))
    assert out != grad
    # …but it must stay CLOSE (quantization error, not garbage)
    worst = max(
        abs(out[y][x] - grad[y][x]) for y in range(16) for x in range(16)
    )
    assert worst <= 60, f"decode error {worst} is corruption, not loss"


def test_dc_differential_coding_is_exercised():
    # tiles differ within every image, so the DC diff stream has
    # nonzero entries — the property that makes a one-symbol Huffman
    # mis-decode cascade into the gate
    px = _jpeg_pixels(1)
    levels = {px[y][x] for y in range(len(px)) for x in range(len(px[0]))}
    assert len(levels) >= 4


def test_bad_soi_raises():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode_gray(b"\x89PNG" + b"\x00" * 32)


def test_truncated_raises():
    raw = _jpeg_bytes(7)
    with pytest.raises(ValueError, match="truncated|desync|exhausted"):
        jpeg_decode_gray(raw[:40])  # inside the DQT payload
    # cut the entropy stream: keep headers, drop most of the scan
    i = raw.index(b"\xff\xda")
    with pytest.raises(ValueError):
        jpeg_decode_gray(raw[: i + 10] + b"\xff\xd9")


def test_corrupted_entropy_stream_is_loud_or_wrong():
    """Flipping bits inside the scan must either raise (invalid code /
    overflow) or change decoded pixels — never silently return the
    original image."""
    raw = bytearray(_jpeg_bytes(3))
    import struct

    i = raw.index(b"\xff\xda")
    (ln,) = struct.unpack(">H", bytes(raw[i + 2 : i + 4]))
    scan_start = i + 2 + ln
    good = jpeg_decode_gray(bytes(raw))[2]
    raw[scan_start] ^= 0x55
    try:
        bad = jpeg_decode_gray(bytes(raw))[2]
        assert bad != good
    except ValueError:
        pass  # loud failure is equally acceptable


def test_unsupported_dims_and_variant():
    with pytest.raises(ValueError, match="multiples of 8"):
        jpeg_encode_gray([[0] * 12 for _ in range(8)])
    # rewrite SOF0 to claim 3 components → unsupported variant
    raw = bytearray(_jpeg_bytes(2))
    i = raw.index(b"\xff\xc0")
    raw[i + 9] = 3
    with pytest.raises(ValueError, match="unsupported"):
        jpeg_decode_gray(bytes(raw))
