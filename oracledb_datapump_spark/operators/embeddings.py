"""Embedding-column preprocessing: unit-normalization and int8
quantization — the standard stages before ANN indexing at scale (cosine
over unit vectors = dot product; int8 storage is 4× smaller than float32).

Pure array expressions (transform/aggregate); both have DuckDB oracle
twins. Determinism: norms use the sequential double fold (bit-identical
to DuckDB's list_sum, see dedup.py cosine); quantization uses floor()
(both engines floor identically — CAST rounding differs, see
operators/analytics.py delay_days note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _norm_col():
    return F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize_expr():
    """Unit-normalized array<double> expression over ``embedding`` (library
    form; zero-norm vectors pass through as zeros rather than NaN)."""
    norm = _norm_col()
    return F.when(
        norm > 0,
        F.transform("embedding", lambda x: x.cast("double") / norm),
    ).otherwise(F.transform("embedding", lambda x: x.cast("double")))


def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, norm, unit_q): L2 norm + unit vector serialized as
    comma-joined floor(x*1e7) integers. The driver's comparator can't hash
    raw array columns, and float→string formatting differs across engines,
    so the query surface emits integer-quantized components (the underlying
    doubles are bit-identical — sequential fold, see module docstring —
    hence the floors are too). Library callers use :func:`normalize_expr`
    for the real array."""
    e = _emb(spark, sf_dir)
    norm = _norm_col()
    unit_q = F.array_join(
        F.transform(
            normalize_expr(),
            lambda x: F.floor(x * F.lit(10000000.0)).cast("long").cast("string"),
        ),
        ",",
    )
    return e.select(
        "vec_id", norm.alias("norm"), unit_q.alias("unit_q")
    ).orderBy("vec_id")


EMBEDDING_NORMALIZE_SQL = """
SELECT vec_id,
       sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS norm,
       array_to_string(list_transform(
           CASE WHEN sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) > 0
                THEN list_transform(embedding, x -> x::DOUBLE / sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE))))
                ELSE list_transform(embedding, x -> x::DOUBLE) END,
           x -> CAST(CAST(floor(x * 10000000.0) AS BIGINT) AS VARCHAR)), ',') AS unit_q
FROM embeddings
ORDER BY vec_id
"""


QUANT_SCALE = 127.0


def quantize_expr():
    """Symmetric int8-quantized array<int> expression over ``embedding``
    (library form) — scale = max|x|, q_i = floor(x_i / scale * 127). floor
    (not round) keeps both engines bit-identical."""
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return F.when(
        max_abs > 0,
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / max_abs * QUANT_SCALE).cast("int"),
        ),
    ).otherwise(F.transform("embedding", lambda x: F.lit(0)))


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, scale, q_str): int8 quantization with the codes serialized
    comma-joined (integer→string formatting is engine-identical; raw array
    columns break the driver's comparator). Library callers use
    :func:`quantize_expr` for the real array; reconstruction error ≤
    scale/127."""
    e = _emb(spark, sf_dir)
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    q_str = F.array_join(
        F.transform(quantize_expr(), lambda v: v.cast("string")), ","
    )
    return e.select(
        "vec_id", max_abs.alias("scale"), q_str.alias("q_str")
    ).orderBy("vec_id")


EMBEDDING_QUANTIZE_SQL = f"""
SELECT vec_id,
       list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale,
       array_to_string(list_transform(
           CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) > 0
                THEN list_transform(embedding,
                     x -> CAST(floor(x::DOUBLE / list_max(list_transform(embedding, y -> abs(y::DOUBLE))) * {QUANT_SCALE}) AS INT))
                ELSE list_transform(embedding, x -> 0) END,
           v -> CAST(v AS VARCHAR)), ',') AS q_str
FROM embeddings
ORDER BY vec_id
"""
