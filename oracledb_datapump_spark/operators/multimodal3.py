"""Multimodal, part 3: REAL PNG codec — the first COMPRESSED format.

Round-10 closed WAV/BMP with stdlib ``wave``/``struct``; the r10 verdict
(Next round #3) pointed out PNG needs no external library either: the
container is chunked (length ‖ type ‖ data ‖ CRC32), the pixel stream is
a zlib deflate of filtered scanlines, and both zlib and crc32 are stdlib.
This module implements the full encode → bytes → decode roundtrip from
the public PNG specification (RFC 2083 / W3C PNG):

* ``_png_bytes`` emits a valid 8-bit truecolor (color type 2) PNG whose
  scanline filters CYCLE through all five types (None/Sub/Up/Average/
  Paeth, one per row, ``y % 5`` — heights are ≥ 5 so every image uses
  every filter). A decoder with any filter-dispatch bug CANNOT pass.
* ``_png_decode`` parses the signature, walks the chunks verifying every
  CRC32, concatenates multi-IDAT payloads, inflates, and reverses the
  per-scanline filters (Paeth predictor per the spec).

THE GATE PINS THE CODEC the same way as multimodal2: the DuckDB oracle
recomputes the channel means from the pixel FORMULA in pure SQL (it
never sees the bytes), so the hash only matches if filtering, deflate,
chunk framing and CRC all roundtrip losslessly. Negative tests pin the
failure modes: a corrupted CRC, a truncated IDAT, and a tampered filter
byte each raise/diverge loudly (tests/test_png_codec.py).

JPEG/MP3/H.264 stay env-blocked behind multimodal.py's guard (their
entropy coders genuinely need external libs). At 100 TB the shape is
unchanged: payload bytes stay inside one Arrow batch per executor task,
only the (doc_id, features) rows shuffle.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from ..functions.partitioning import widen_small_scan

PNG_SIG = b"\x89PNG\r\n\x1a\n"
BPP = 3  # 8-bit truecolor, no alpha


def _png_dims(doc_id: int) -> tuple[int, int]:
    # height ≥ 5 ⇒ the y%5 filter cycle uses ALL five filter types
    return 6 + doc_id % 4, 5 + doc_id % 3


def _png_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    return (
        (doc_id * 3 + x * 5 + y * 11) % 256,
        (doc_id * 7 + x * 13 + y * 3) % 256,
        (doc_id * 11 + x + y * 17) % 256,
    )


def _paeth(a: int, b: int, c: int) -> int:
    # per-spec predictor: nearest of left/up/up-left to a+b-c, ties
    # broken left → up → up-left
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(ftype: int, raw: bytes, prior: bytes) -> bytes:
    out = bytearray()
    for i, v in enumerate(raw):
        left = raw[i - BPP] if i >= BPP else 0
        up = prior[i]
        upleft = prior[i - BPP] if i >= BPP else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth(left, up, upleft)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def _unfilter_scanline(ftype: int, data: bytes, prior: bytes) -> bytes:
    if ftype > 4:
        raise ValueError(f"invalid PNG filter type {ftype}")
    out = bytearray()
    for i, v in enumerate(data):
        left = out[i - BPP] if i >= BPP else 0
        up = prior[i]
        upleft = prior[i - BPP] if i >= BPP else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth(left, up, upleft)
        out.append((v + pred) & 0xFF)
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _png_bytes(doc_id: int) -> bytes:
    w, h = _png_dims(doc_id)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    stream = bytearray()
    prior = bytes(w * BPP)
    for y in range(h):
        raw = bytes(
            v for x in range(w) for v in _png_pixel(doc_id, x, y)
        )
        ftype = y % 5  # exercise every filter type in every image
        stream.append(ftype)
        stream += _filter_scanline(ftype, raw, prior)
        prior = raw
    idat = zlib.compress(bytes(stream), 6)
    # split IDAT in two so the decoder's multi-chunk concatenation is
    # exercised on every payload, not just large ones
    cut = max(1, len(idat) // 2)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat[:cut])
        + _chunk(b"IDAT", idat[cut:])
        + _chunk(b"IEND", b"")
    )


def _png_decode(raw: bytes) -> tuple[int, int, list[bytes], set[int]]:
    """(width, height, scanlines, filter_types_seen); every chunk CRC is
    verified, multi-IDAT concatenated, filters reversed per the spec."""
    if raw[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = None
    idat = bytearray()
    seen_end = False
    while pos < len(raw):
        if pos + 8 > len(raw):
            raise ValueError("truncated PNG: chunk header cut short")
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(raw):
            raise ValueError(f"truncated PNG: {ctype!r} data cut short")
        (crc,) = struct.unpack(
            ">I", raw[pos + 8 + length : pos + 12 + length]
        )
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"PNG CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit truecolor, "
                    "no interlace)"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = True
        pos += 12 + length
    if w is None or not seen_end:
        raise ValueError("truncated PNG: missing IHDR/IEND")
    stream = zlib.decompress(bytes(idat))
    stride = w * BPP
    if len(stream) != h * (1 + stride):
        raise ValueError("PNG pixel stream length mismatch")
    lines: list[bytes] = []
    filters: set[int] = set()
    prior = bytes(stride)
    for y in range(h):
        base = y * (1 + stride)
        ftype = stream[base]
        filters.add(ftype)
        line = _unfilter_scanline(
            ftype, stream[base + 1 : base + 1 + stride], prior
        )
        lines.append(line)
        prior = line
    return w, h, lines, filters


def synth_png_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, png): real zlib-deflated PNG bytes per document,
    generated executor-side (mapInPandas) from the doc_id formula."""
    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    # r16: widen the 1-partition fixture scan so the Arrow-batched
    # Python decode/synth below runs at session width (guide §2.2/§4;
    # no-op at any scale where the scan is already wide)
    ids = widen_small_scan(ids)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "png": [_png_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return ids.mapInPandas(gen, "doc_id long, png binary")


def image_decode_features_png(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, width, height, mean_r, mean_g, mean_b, n_filter_kinds):
    REAL PNG decode — chunk walk with CRC32 verification, multi-IDAT
    inflate, all-five-filter reversal — over the synthetic corpus,
    Arrow-batched. ``n_filter_kinds`` (always 5: heights ≥ 5 cycle the
    full filter set) is the sentinel that the decoder actually
    dispatched on the filter byte rather than assuming filter 0. The
    oracle recomputes every feature from the generator formula in pure
    SQL — hash equality pins deflate ∘ filter ∘ chunk-framing as
    lossless."""
    media = synth_png_table(spark, sf_dir)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["png"]):
                w, h, lines, filters = _png_decode(bytes(payload))
                sr = sg = sb = 0
                for line in lines:
                    for x in range(w):
                        sr += line[3 * x]
                        sg += line[3 * x + 1]
                        sb += line[3 * x + 2]
                n = w * h
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        sr // n,
                        sg // n,
                        sb // n,
                        len(filters),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "n_filter_kinds",
                ],
            )

    return media.mapInPandas(
        op,
        "doc_id long, width long, height long, mean_r long, mean_g long, "
        "mean_b long, n_filter_kinds long",
    ).orderBy("doc_id")


IMAGE_DECODE_FEATURES_PNG_SQL = """
WITH dims AS (
  SELECT doc_id,
         6 + doc_id % 4 AS w,
         5 + doc_id % 3 AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         (doc_id * 3 + x.i * 5 + y.i * 11) % 256 AS r,
         (doc_id * 7 + x.i * 13 + y.i * 3) % 256 AS g,
         (doc_id * 11 + x.i + y.i * 17) % 256 AS b
  FROM dims,
       UNNEST(range(w)) AS x(i),
       UNNEST(range(h)) AS y(i)
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(SUM(r) // COUNT(*) AS BIGINT) AS mean_r,
       CAST(SUM(g) // COUNT(*) AS BIGINT) AS mean_g,
       CAST(SUM(b) // COUNT(*) AS BIGINT) AS mean_b,
       CAST(5 AS BIGINT) AS n_filter_kinds
FROM px
GROUP BY doc_id, w, h
ORDER BY doc_id
"""
