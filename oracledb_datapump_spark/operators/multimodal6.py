"""Multimodal, part 6: perceptual-hash image dedup over the REAL BMP
codec.

dHash (difference hash) is the standard cheap perceptual fingerprint
for image dedup at corpus scale: grayscale, compare each pixel to its
right neighbor, pack the bits. Here it runs over multimodal2's
synthetic-but-VALID 24-bit BMP corpus with the REAL decoder (struct
header parse, bottom-up rows, BGR order, row padding) inside
Arrow-batched ``mapInPandas`` — and the DuckDB oracle recomputes every
hash from the pixel FORMULA in pure SQL, so the gate only passes if
encode → bytes → decode → luma → gradient bits is lossless end to end.

- ``image_dhash_groups`` — exact perceptual dedup: group the corpus by
  its {DHASH_BITS}-bit dHash (hash-groupBy — the scale-safe first
  stage of any image dedup pipeline), keep the min doc_id as survivor.
- ``image_dhash_hamming_curve`` — the consecutive-id Hamming-distance
  histogram (an O(n) pair set, the same consecutive-pair audit shape
  jl_distortion_report uses): how far apart neighboring images' hashes
  sit. Pins ``bit_count``/XOR cross-engine and gives the
  threshold-picking curve a near-dup pass would calibrate against.

At 100 TB: payload bytes stay inside one Arrow batch per executor and
never shuffle — only the 30-bit hashes do; the group stage is one
integer groupBy, and a Hamming NEAR-dup pass would band the hash bits
into buckets exactly like minhash-LSH (documented, not duplicated —
dedup.py owns the banding pattern).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal2 import BMP_H, BMP_W, synth_media_table

#: dHash geometry: one bit per horizontal neighbor pair.
DHASH_BITS = (BMP_W - 1) * BMP_H
#: integer luma weights (ITU-R 601 milli-weights, floor-divided).
LUMA_R, LUMA_G, LUMA_B = 299, 587, 114


def _dhash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dhash_q): REAL BMP decode → integer luma → horizontal
    gradient bits packed little-endian (bit index y·(W−1)+x)."""
    media = synth_media_table(spark, sf_dir).select("doc_id", "bmp")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bmp"]):
                raw = bytes(payload)
                magic, _, _, _, off = struct.unpack("<2sIHHI", raw[:14])
                assert magic == b"BM"
                (hsz, w, h, _, bpp) = struct.unpack("<IiiHH", raw[14:30])
                assert hsz == 40 and bpp == 24 and h > 0
                row_len = w * 3
                stride = row_len + (4 - row_len % 4) % 4
                gray = [[0] * w for _ in range(h)]
                for y in range(h):
                    base = off + (h - 1 - y) * stride
                    for x in range(w):
                        b_, g_, r_ = raw[base + 3 * x : base + 3 * x + 3]
                        gray[y][x] = (
                            LUMA_R * r_ + LUMA_G * g_ + LUMA_B * b_
                        ) // 1000
                dh = 0
                for y in range(h):
                    for x in range(w - 1):
                        if gray[y][x + 1] > gray[y][x]:
                            dh |= 1 << (y * (w - 1) + x)
                rows.append((int(doc_id), dh))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash_q"])

    return media.mapInPandas(op, "doc_id long, dhash_q long")


_DHASH_SQL_CTE = f"""
gray AS (
  SELECT doc_id, x.i AS x, y.i AS y,
         (((doc_id + x.i * 3 + y.i * 7) % 256) * {LUMA_R}
          + ((doc_id * 5 + x.i * 11 + y.i) % 256) * {LUMA_G}
          + ((doc_id * 9 + x.i + y.i * 13) % 256) * {LUMA_B}) // 1000 AS g
  FROM documents,
       UNNEST(range({BMP_W})) AS x(i),
       UNNEST(range({BMP_H})) AS y(i)
),
dh AS (
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN b.g > a.g
                       THEN 1 << (a.y * {BMP_W - 1} + a.x)
                       ELSE 0 END) AS BIGINT) AS dhash_q
  FROM gray a JOIN gray b
    ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
  GROUP BY a.doc_id
)
"""


def image_dhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dhash_q, n_images, keep_doc_id): exact perceptual dedup groups
    by the {DHASH_BITS}-bit dHash, min doc_id as the survivor — the
    image twin of dedup_exact's md5 groups, except the key comes out
    of a REAL codec + luma + gradient pipeline (the oracle recomputes
    it from the pixel formula, so the hash pins the whole path).

    Scale shape: mapInPandas decode (payload bytes never shuffle), one
    integer groupBy over 30-bit keys."""
    return (
        _dhash_frame(spark, sf_dir)
        .groupBy("dhash_q")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .select(
            F.col("dhash_q").cast("long"),
            F.col("n_images").cast("long"),
            F.col("keep_doc_id").cast("long"),
        )
        .orderBy("dhash_q")
    )


IMAGE_DHASH_GROUPS_SQL = f"""
WITH {_DHASH_SQL_CTE.strip()}
SELECT dhash_q, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM dh
GROUP BY dhash_q
ORDER BY dhash_q
"""


def image_dhash_hamming_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hamming, n_pairs): Hamming-distance histogram between each
    image's dHash and its id-successor's — the O(n) consecutive-pair
    audit (jl_distortion_report's pair shape) that calibrates a
    near-dup threshold before anyone pays for a banded Hamming join.

    Scale shape: one decode pass, one self-join on doc_id+1 (both
    sides the 2-column hash frame), one ≤{DHASH_BITS}+1-row groupBy."""
    dh = _dhash_frame(spark, sf_dir)
    a = dh.alias("a")
    b = dh.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("dhash_q").alias("next_q"),
    ).alias("b")
    return (
        a.join(b, "doc_id")
        .select(
            F.expr("bit_count(dhash_q ^ next_q)").cast("long").alias(
                "hamming"
            )
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            F.col("hamming").cast("long"), F.col("n_pairs").cast("long")
        )
        .orderBy("hamming")
    )


IMAGE_DHASH_HAMMING_SQL = f"""
WITH {_DHASH_SQL_CTE.strip()}
SELECT CAST(bit_count(xor(a.dhash_q, b.dhash_q)) AS BIGINT) AS hamming,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM dh a JOIN dh b ON b.doc_id = a.doc_id + 1
GROUP BY 1
ORDER BY hamming
"""
