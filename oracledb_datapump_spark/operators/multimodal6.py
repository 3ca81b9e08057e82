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


#: Hamming banding for NEAR-dup: 3 bands × 10 bits over the 30-bit
#: dHash. Pigeonhole: any pair within Hamming ≤ 2 differs in at most 2
#: bands, so it collides on at least one — banding is RECALL-COMPLETE
#: at the verify threshold, exactly like minhash-LSH's band guarantee.
DHASH_BANDS, DHASH_BAND_BITS = 3, 10
#: verify threshold (bits) — the banding above is complete for ≤ 2.
DHASH_HAMMING_T = 2
#: hot-bucket cap (dedup.py's max_bucket_size posture): a band value
#: shared by a mega-cluster of near-identical images would fan out
#: quadratically; buckets larger than this are dropped from candidate
#: generation (their members still pair through their OTHER bands
#: unless those are equally hot — the standard LSH frequency-cap
#: trade, applied identically in both engines).
DHASH_BUCKET_CAP = 64


def image_dhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming): perceptual NEAR-dup image pairs —
    dHash Hamming distance ≤ {DHASH_HAMMING_T} — found by banded
    bucket-join, never all-pairs: the 30-bit hash splits into
    {DHASH_BANDS} bands of {DHASH_BAND_BITS} bits, candidates collide
    on ≥ 1 band (pigeonhole-complete at the threshold), buckets above
    {DHASH_BUCKET_CAP} members are frequency-capped, and only
    candidates pay the popcount verify. This is the near-dup pass
    image_dhash_groups documented as future work — the image twin of
    dedup_minhash_verified's band→bucket→verify shape.

    Scale shape: payload bytes never shuffle (one mapInPandas decode);
    the band explode is 3 rows per image of (10-bit val, doc_id); the
    bucket join is an integer-key shuffle bounded by the cap; verify
    is one XOR+popcount per candidate."""
    dh = _dhash_frame(spark, sf_dir)
    bands = dh.select(
        "doc_id",
        "dhash_q",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.expr(
                            f"(dhash_q >> {k * DHASH_BAND_BITS})"
                            f" & {(1 << DHASH_BAND_BITS) - 1}"
                        ).alias("val"),
                    )
                    for k in range(DHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "dhash_q", "bv.band", "bv.val")
    sizes = bands.groupBy("band", "val").agg(
        F.count(F.lit(1)).alias("bn")
    )
    capped = bands.join(
        sizes.filter(
            (F.col("bn") > 1) & (F.col("bn") <= DHASH_BUCKET_CAP)
        ),
        ["band", "val"],
    )
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.dhash_q").alias("ha"),
            F.col("b.dhash_q").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(ha ^ hb)").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= DHASH_HAMMING_T)
        .select(
            F.col("doc_a").cast("long"),
            F.col("doc_b").cast("long"),
            "hamming",
        )
        .orderBy("doc_a", "doc_b")
    )


IMAGE_DHASH_NEAR_SQL = f"""
WITH {_DHASH_SQL_CTE.strip()},
bands AS (
  SELECT doc_id, dhash_q, k.i AS band,
         (dhash_q >> (k.i * {DHASH_BAND_BITS}))
           & {(1 << DHASH_BAND_BITS) - 1} AS val
  FROM dh, UNNEST(range({DHASH_BANDS})) AS k(i)
),
sizes AS (
  SELECT band, val, COUNT(*) AS bn FROM bands GROUP BY 1, 2
),
capped AS (
  SELECT b.* FROM bands b
  JOIN sizes s ON s.band = b.band AND s.val = b.val
  WHERE s.bn > 1 AND s.bn <= {DHASH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.dhash_q AS ha, b.dhash_q AS hb
  FROM capped a JOIN capped b
    ON b.band = a.band AND b.val = a.val AND a.doc_id < b.doc_id
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {DHASH_HAMMING_T}
ORDER BY doc_a, doc_b
"""
