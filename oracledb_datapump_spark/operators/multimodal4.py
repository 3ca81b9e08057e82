"""Multimodal, part 4: REAL baseline JPEG codec — entropy coding and
the full DCT path, stdlib only.

PNG (multimodal3) closed the "compressed container" gap with zlib; JPEG
closes the "entropy-coded, transform-domain" gap with nothing but
``math`` and bit arithmetic, implemented from the public ITU T.81 spec:

* encoder: level shift → 8×8 FDCT → Annex-K luminance quantization →
  zigzag → DC differential + AC run-length/EOB symbols → canonical
  Huffman (Annex K tables) → byte-stuffed entropy stream inside a real
  marker container (SOI/DQT/SOF0/DHT/SOS/EOI);
* decoder: marker walk, DQT/DHT/SOF0 parse, canonical Huffman rebuild,
  entropy decode with byte unstuffing, dezigzag, dequantize, separable
  float IDCT, level shift + clamp.

JPEG is LOSSY, so the WAV/BMP/PNG formula-oracle trick needs one extra
idea: the synthetic corpus is built from FLAT 8×8 tiles whose levels
are all EVEN. A constant block has zero AC energy and DC = 8·(v−128);
with Q[0,0] = 16 the quantized DC is (v−128)/2 — exact for even v — so
quantize∘FDCT∘IDCT∘dequantize is the identity ON THIS CORPUS and the
DuckDB oracle can recompute every decoded feature from the tile
formula. The codec itself stays honestly lossy (the negative test
feeds it a non-tile-aligned gradient and pins that pixels DO change),
and the entropy layer is fully exercised: tiles differ within each
image, so DC differential coding, multiple Huffman categories, and
byte stuffing all appear in every payload.

At 100 TB the shape is the multimodal contract: payload bytes live in
one Arrow batch per executor task (mapInPandas), only (doc_id,
features) rows shuffle.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from ..functions.partitioning import widen_small_scan

# Annex K (ITU T.81) luminance quantization table, zigzag order
STD_QUANT_LUMA = [
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
]
# Annex K DC/AC luminance Huffman specs: (BITS[1..16], HUFFVAL)
STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_VALS = list(range(12))
STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

ZIGZAG = [  # natural index of each zigzag position
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), per the T.81 canonical construction."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG: entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("truncated JPEG: bad byte stuffing")
                self.pos += 1  # skip the stuffed 0x00
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _fdct(block: list[int]) -> list[float]:
    if min(block) == max(block):
        # exact identity, not an approximation: every non-DC basis
        # function sums to zero against a constant block, and
        # F(0,0) = ¼·(1/√2)²·64·v = 8·v
        return [8.0 * block[0]] + [0.0] * 63
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[8 * x + y] * _COS[u][x] * _COS[v][y]
            out[8 * u + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[int]:
    if not any(coef[1:]):
        # exact identity for a DC-only block: every pixel is ¼·½·F(0,0)
        v = max(0, min(255, round(coef[0] / 8) + 128))
        return [v] * 64
    out = []
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += _C[u] * _C[v] * coef[8 * u + v] * _COS[u][x] * _COS[v][y]
            out.append(max(0, min(255, round(0.25 * s) + 128)))
    return out


def _category(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length()


def _value_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1  # ones'-complement form


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def jpeg_encode_gray(pixels: list[list[int]]) -> bytes:
    """Baseline sequential grayscale JPEG of a row-major pixel grid
    whose dims are multiples of 8 (the fixture contract; general
    padding is out of scope and rejected loudly)."""
    h, w = len(pixels), len(pixels[0])
    if h % 8 or w % 8:
        raise ValueError("jpeg_encode_gray: dims must be multiples of 8")
    dc_codes = _canonical_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _canonical_codes(STD_AC_BITS, STD_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = [
                pixels[by * 8 + x][bx * 8 + y] - 128
                for x in range(8)
                for y in range(8)
            ]
            coef = _fdct(block)
            quant = [
                int(round(coef[ZIGZAG[k]] / STD_QUANT_LUMA[k]))
                for k in range(64)
            ]
            diff = quant[0] - prev_dc
            prev_dc = quant[0]
            cat = _category(diff)
            code, ln = dc_codes[cat]
            bw.write(code, ln)
            if cat:
                bw.write(_value_bits(diff, cat), cat)
            run = 0
            last_nz = max((k for k in range(1, 64) if quant[k]), default=0)
            for k in range(1, last_nz + 1):
                if quant[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat = _category(quant[k])
                code, ln = ac_codes[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(_value_bits(quant[k], cat), cat)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    dqt = _marker(0xFFDB, bytes([0]) + bytes(STD_QUANT_LUMA))
    sof = _marker(
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    dht = _marker(
        0xFFC4,
        bytes([0x00]) + bytes(STD_DC_BITS) + bytes(STD_DC_VALS)
        + bytes([0x10]) + bytes(STD_AC_BITS) + bytes(STD_AC_VALS),
    )
    sos = _marker(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bw.flush() + b"\xff\xd9"
    )


def jpeg_decode_gray(raw: bytes) -> tuple[int, int, list[list[int]]]:
    """(width, height, pixels) — full baseline decode: marker walk,
    canonical Huffman rebuild from the DHT payload, entropy decode,
    dezigzag, dequantize, IDCT. Grayscale non-interleaved only (the
    encoder's contract); anything else fails loudly."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtab: list[int] | None = None
    dc_dec = ac_dec = None
    w = h = None
    scan: bytes | None = None
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        tag = raw[pos + 1]
        if tag == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        payload = raw[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("truncated JPEG: marker payload cut short")
        if tag == 0xDB:
            if payload[0] & 0xF0:
                raise ValueError("only 8-bit quant tables supported")
            qtab = list(payload[1:65])
        elif tag == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or ncomp != 1 or payload[7] != 0x11:
                raise ValueError(
                    "unsupported JPEG variant (need 8-bit grayscale 1x1)"
                )
            if h % 8 or w % 8:
                raise ValueError("dims must be multiples of 8")
        elif tag == 0xC4:
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                if tc_th == 0x00:
                    dc_dec = _decode_table(bits, vals)
                elif tc_th == 0x10:
                    ac_dec = _decode_table(bits, vals)
                else:
                    raise ValueError("unsupported Huffman table id")
                p += 17 + nv
        elif tag == 0xDA:
            scan_start = pos + 2 + length
            end = raw.rindex(b"\xff\xd9")
            scan = raw[scan_start:end]
            pos = end
            continue
        pos += 2 + length
    if qtab is None or dc_dec is None or ac_dec is None or w is None:
        raise ValueError("truncated JPEG: missing DQT/DHT/SOF")
    if scan is None:
        raise ValueError("truncated JPEG: missing scan data")

    br = _BitReader(scan)

    def read_symbol(table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("invalid JPEG Huffman code")

    pixels = [[0] * w for _ in range(h)]
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            zz = [0] * 64
            cat = read_symbol(dc_dec)
            prev_dc += _extend(br.read_bits(cat), cat)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = read_symbol(ac_dec)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                cat = sym & 0x0F
                if k > 63:
                    raise ValueError("JPEG AC index overflow")
                zz[k] = _extend(br.read_bits(cat), cat)
                k += 1
            coef = [0.0] * 64
            for kk in range(64):
                coef[ZIGZAG[kk]] = zz[kk] * qtab[kk]
            blk = _idct(coef)
            for x in range(8):
                for y in range(8):
                    pixels[by * 8 + x][bx * 8 + y] = blk[8 * x + y]
    return w, h, pixels


# ---------------------------------------------------------------------------
# the gated operator: flat-tile corpus whose lossy roundtrip is exact
# ---------------------------------------------------------------------------


def _jpeg_dims(doc_id: int) -> tuple[int, int]:
    return 8 * (2 + doc_id % 3), 8 * (2 + doc_id % 2)  # (w, h) px


def _tile_level(doc_id: int, tx: int, ty: int) -> int:
    # EVEN levels only: quantized DC = (v-128)/2 is exact, so the lossy
    # pipeline reconstructs the tile bit-for-bit (module docstring)
    return 2 * ((doc_id * 7 + tx * 3 + ty * 5) % 128)


def _jpeg_pixels(doc_id: int) -> list[list[int]]:
    w, h = _jpeg_dims(doc_id)
    return [
        [_tile_level(doc_id, x // 8, y // 8) for x in range(w)]
        for y in range(h)
    ]


def _jpeg_bytes(doc_id: int) -> bytes:
    return jpeg_encode_gray(_jpeg_pixels(doc_id))


def synth_jpeg_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, jpeg): real baseline-JPEG bytes per document, generated
    executor-side from the tile formula."""
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
                    "jpeg": [_jpeg_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return ids.mapInPandas(gen, "doc_id long, jpeg binary")


def image_decode_features_jpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, width, height, n_blocks, mean_luma, n_levels): REAL
    baseline-JPEG decode — canonical Huffman rebuild, DC differential +
    AC RLE entropy decode with byte unstuffing, dequantize, IDCT — over
    the synthetic flat-tile corpus, Arrow-batched. The oracle
    recomputes every feature from the TILE FORMULA in pure SQL (it
    never sees bytes); equality holds because the fixture makes the
    lossy pipeline exact (module docstring) — so the hash pins the
    whole entropy layer: one mis-decoded Huffman symbol shifts every
    later DC diff and breaks the gate."""
    media = synth_jpeg_table(spark, sf_dir)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["jpeg"]):
                w, h, px = jpeg_decode_gray(bytes(payload))
                flat = [v for row in px for v in row]
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        (w // 8) * (h // 8),
                        sum(flat) // len(flat),
                        len(set(flat)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_blocks",
                    "mean_luma",
                    "n_levels",
                ],
            )

    return media.mapInPandas(
        op,
        "doc_id long, width long, height long, n_blocks long, "
        "mean_luma long, n_levels long",
    ).orderBy("doc_id")


IMAGE_DECODE_FEATURES_JPEG_SQL = """
WITH dims AS (
  SELECT doc_id,
         8 * (2 + doc_id % 3) AS w,
         8 * (2 + doc_id % 2) AS h
  FROM documents
), tiles AS (
  SELECT doc_id, w, h,
         2 * ((doc_id * 7 + tx.i * 3 + ty.i * 5) % 128) AS lvl
  FROM dims,
       UNNEST(range(w // 8)) AS tx(i),
       UNNEST(range(h // 8)) AS ty(i)
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(lvl * 64) // (w * h) AS BIGINT) AS mean_luma,
       CAST(COUNT(DISTINCT lvl) AS BIGINT) AS n_levels
FROM tiles
GROUP BY doc_id, w, h
ORDER BY doc_id
"""
