"""PNG codec (multimodal3): stdlib-zlib encode/decode roundtrip, filter
coverage, and the failure modes the r10 verdict asked to pin (corrupted
CRC, truncated IDAT) plus filter-dispatch negatives. Pure-Python — the
Spark-side plumbing is covered by the gated query via
tests/test_queries_oracle.py like every other operator."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oracledb_datapump_spark.operators.multimodal3 import (
    PNG_SIG,
    _chunk,
    _filter_scanline,
    _png_bytes,
    _png_decode,
    _png_dims,
    _png_pixel,
    _unfilter_scanline,
)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000))
def test_roundtrip_lossless(doc_id):
    w, h, lines, filters = _png_decode(_png_bytes(doc_id))
    assert (w, h) == _png_dims(doc_id)
    for y, line in enumerate(lines):
        for x in range(w):
            assert tuple(line[3 * x : 3 * x + 3]) == _png_pixel(doc_id, x, y)


def test_all_five_filters_exercised():
    # heights are >= 5 and the encoder cycles y % 5, so EVERY image uses
    # every filter type — a decoder that ignores the filter byte cannot
    # return the right pixels, and this asserts the fixture keeps it so
    for doc_id in range(10):
        _, _, _, filters = _png_decode(_png_bytes(doc_id))
        assert filters == {0, 1, 2, 3, 4}


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=4),
    st.binary(min_size=9, max_size=30),
    st.binary(min_size=30, max_size=30),
)
def test_filter_unfilter_inverse(ftype, raw, prior):
    raw = raw[: len(prior)]
    prior = prior[: len(raw)]
    filtered = _filter_scanline(ftype, raw, prior)
    assert _unfilter_scanline(ftype, filtered, prior) == raw


def test_corrupted_crc_raises():
    raw = bytearray(_png_bytes(42))
    raw[30] ^= 0xFF  # inside IHDR payload → stored CRC no longer matches
    with pytest.raises(ValueError, match="CRC mismatch"):
        _png_decode(bytes(raw))


def test_truncated_idat_raises():
    raw = _png_bytes(42)
    with pytest.raises(ValueError, match="truncated"):
        _png_decode(raw[:-20])
    # cutting mid-chunk-header is also loud
    with pytest.raises(ValueError, match="truncated"):
        _png_decode(raw[: len(PNG_SIG) + 3])


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        _png_decode(b"GIF89a" + b"\x00" * 64)


def test_invalid_filter_type_raises():
    # hand-build a 1x1 PNG whose single scanline claims filter type 9
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    stream = bytes([9, 1, 2, 3])
    raw = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        _png_decode(raw)


def test_tampered_filter_byte_diverges():
    """Flipping one filter byte (Sub→Up on row 1) must change the decoded
    pixels — proof the decoder dispatches on the byte instead of assuming
    a fixed filter."""
    doc_id = 7
    w, h = _png_dims(doc_id)
    stride = w * 3
    good = _png_decode(_png_bytes(doc_id))[2]
    # rebuild the stream with row 1's filter byte lying (data unchanged)
    stream = bytearray()
    prior = bytes(stride)
    for y in range(h):
        raw = bytes(v for x in range(w) for v in _png_pixel(doc_id, x, y))
        ftype = y % 5
        stream.append(2 if y == 1 else ftype)  # lie: Sub(1) → Up(2)
        stream += _filter_scanline(ftype, raw, prior)
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    tampered = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _chunk(b"IEND", b"")
    )
    bad = _png_decode(tampered)[2]
    assert bad != good


def test_unsupported_variant_raises():
    # grayscale (color type 0) is outside the fixture contract
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    raw = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 5])))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        _png_decode(raw)
