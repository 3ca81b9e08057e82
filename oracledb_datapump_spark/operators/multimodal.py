"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

Design (SURVEY.md §7.2 M5 / task brief): image/audio/video travel as
BinaryType columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas functions over
``mapInPandas``. The imaging/audio libraries are not in this container, so
the *codec* step is stubbed (NotImplementedError behind ``strict=True``,
deterministic fake otherwise) while everything Spark-side — schema,
partitioning, UDF signature, batch shape — is real and tested.

At 100 TB: binary payloads dominate partition size; cap
``spark.sql.files.maxPartitionBytes`` and avoid wide shuffles of payload
columns — extract features first (drops payload), shuffle features only.
mapInPandas streams Arrow record batches, so peak executor memory is one
batch, not one partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_histogram", T.ArrayType(T.LongType()), True),
        T.StructField("head_digest", T.StringType(), True),
    ]
)

HIST_BINS = 16


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a media-shaped table from ``documents`` (the container
    ships no real image fixtures): payload = utf-8 bytes of the text,
    metadata struct populated. In production this column comes from the
    ingestion job (S3 object bytes or pointers)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes, strict: bool = True):
    """Codec stub. Real implementation would be PIL/libvips; neither ships
    in this container."""
    if strict:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass strict=False for the deterministic fake"
        )
    # deterministic fake "image": 4x4 grid of byte-derived intensities
    data = (payload or b"\x00")[:16].ljust(16, b"\x00")
    return [[data[r * 4 + c] for c in range(4)] for r in range(4)]


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column:
    byte histogram ({HIST_BINS} bins) + head digest. Pure-Python payload
    math that built-ins can't express → mapInPandas (the sanctioned slow
    path; one pass, payload column dropped on output)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        shift = 8 - HIST_BINS.bit_length() + 1  # byte >> shift == bin
        for pdf in batches:
            hists = []
            digests = []
            nbytes = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                # vectorized per-byte binning (a Python loop here costs
                # ~10× on megabyte payloads)
                hists.append(
                    np.bincount(arr >> shift, minlength=HIST_BINS).tolist()
                )
                digests.append(hashlib.md5(b[:64]).hexdigest())
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": nbytes,
                    "byte_histogram": hists,
                    "head_digest": digests,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: media plumbing end-to-end (binary column → Arrow
    batches → features), ordered for stable comparison. The histogram is
    serialized comma-joined (raw array columns break the driver's
    comparator); :func:`extract_features` keeps the real array form."""
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.array_join(
            F.transform("byte_histogram", lambda v: v.cast("string")), ","
        ).alias("hist_str"),
        "head_digest",
    ).orderBy("doc_id")


# Oracle twin: valid because the fixture payloads are ASCII (1 char = 1
# byte, ord(char) = byte value, bin = byte // 16 = byte*16//256).
MEDIA_FEATURES_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       array_to_string(list_transform(range({HIST_BINS}), bin -> CAST(CAST(len(list_filter(
            range(1, length(text)+1),
            i -> ord(substr(text, CAST(i AS INT), 1)) // {256 // HIST_BINS} = bin)) AS BIGINT) AS VARCHAR)
       ), ',') AS hist_str,
       md5(substr(text, 1, 64)) AS head_digest
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# resize (thumbnail) plumbing
# ---------------------------------------------------------------------------

THUMB_SRC = 4  # fake-decode grid is 4x4
THUMB_OUT = 2  # average-pooled to 2x2


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, thumb_str): decode → {THUMB_SRC}x{THUMB_SRC} grid →
    average-pool to {THUMB_OUT}x{THUMB_OUT} (integer division), emitted
    comma-joined. Exercises the real resize plumbing — Arrow batches in,
    payload dropped on output, fixed-size feature out — with the codec
    stubbed (decode_image fake; a real build swaps in PIL/libvips and
    nothing else changes). Pooling is integer math so the DuckDB twin
    hash-matches."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        k = THUMB_SRC // THUMB_OUT
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                grid = np.array(
                    decode_image(bytes(p) if p is not None else b"", strict=False),
                    dtype=np.int64,
                )
                pooled = (
                    grid.reshape(THUMB_OUT, k, THUMB_OUT, k).sum(axis=(1, 3))
                    // (k * k)
                )
                thumbs.append(",".join(str(int(v)) for v in pooled.ravel()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "thumb_str": thumbs})

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("thumb_str", T.StringType(), True),
        ]
    )
    return (
        media_table(spark, sf_dir).mapInPandas(op, schema=out_schema).orderBy("doc_id")
    )


def _resize_sql() -> str:
    # byte r*4+c of the ASCII payload, 0-padded past end-of-text
    def px(i: int) -> str:
        return (
            f"CASE WHEN length(text) > {i} "
            f"THEN ord(substr(text, {i + 1}, 1)) ELSE 0 END"
        )

    k = THUMB_SRC // THUMB_OUT
    cells = []
    for r in range(THUMB_OUT):
        for c in range(THUMB_OUT):
            terms = " + ".join(
                px((r * k + dr) * THUMB_SRC + (c * k + dc))
                for dr in range(k)
                for dc in range(k)
            )
            cells.append(f"CAST(({terms}) // {k * k} AS VARCHAR)")
    joined = " || ',' || ".join(cells)
    return f"""
SELECT doc_id, {joined} AS thumb_str
FROM documents
ORDER BY doc_id
"""


MEDIA_RESIZE_SQL = _resize_sql()


# ---------------------------------------------------------------------------
# frame-sample plumbing
# ---------------------------------------------------------------------------

FRAME_BYTES = 64
FRAME_STRIDE = 3  # keep every 3rd frame


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, frame_idx, frame_len, frame_digest): treat the payload
    as fixed-size {FRAME_BYTES}-byte frames, keep every
    {FRAME_STRIDE}rd frame, emit per-frame length + md5 — the video
    frame-sampling batch shape (a real build decodes container formats
    instead of slicing; partitioning, Arrow batching, explode-on-output
    schema are what this tests). Payload never survives the operator, so
    nothing heavy shuffles."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, lens, digs = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    fr = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(fr))
                    digs.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_len": lens,
                    "frame_digest": digs,
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.LongType(), False),
            T.StructField("frame_len", T.LongType(), False),
            T.StructField("frame_digest", T.StringType(), True),
        ]
    )
    return (
        media_table(spark, sf_dir)
        .mapInPandas(op, schema=out_schema)
        .orderBy("doc_id", "frame_idx")
    )


# ASCII fixture ⇒ byte slicing == char slicing; md5(substr) matches.
FRAME_SAMPLE_SQL = f"""
WITH frames AS (
  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         substr(text, CAST(i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES}) AS fr
  FROM documents,
       unnest(range(((length(text) + {FRAME_BYTES} - 1) // {FRAME_BYTES}))) AS t(i)
  WHERE i % {FRAME_STRIDE} = 0
)
SELECT doc_id, frame_idx,
       CAST(length(fr) AS BIGINT) AS frame_len,
       md5(fr) AS frame_digest
FROM frames
ORDER BY doc_id, frame_idx
"""
