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


def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, norm, unit): L2 norm + unit-normalized vector (zero-norm
    vectors pass through as zeros rather than NaN)."""
    e = _emb(spark, sf_dir)
    norm = _norm_col()
    unit = F.when(
        norm > 0,
        F.transform("embedding", lambda x: x.cast("double") / norm),
    ).otherwise(F.transform("embedding", lambda x: x.cast("double")))
    return e.select(
        "vec_id", norm.alias("norm"), unit.alias("unit")
    ).orderBy("vec_id")


EMBEDDING_NORMALIZE_SQL = """
SELECT vec_id,
       sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS norm,
       CASE WHEN sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) > 0
            THEN list_transform(embedding, x -> x::DOUBLE / sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE))))
            ELSE list_transform(embedding, x -> x::DOUBLE) END AS unit
FROM embeddings
ORDER BY vec_id
"""


QUANT_SCALE = 127.0


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, scale, q): symmetric int8 quantization — scale = max|x|,
    q_i = floor(x_i / scale * 127). floor (not round) keeps both engines
    bit-identical; reconstruction error ≤ scale/127."""
    e = _emb(spark, sf_dir)
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    q = F.when(
        max_abs > 0,
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / max_abs * QUANT_SCALE).cast("int"),
        ),
    ).otherwise(F.transform("embedding", lambda x: F.lit(0)))
    return e.select(
        "vec_id", max_abs.alias("scale"), q.alias("q")
    ).orderBy("vec_id")


EMBEDDING_QUANTIZE_SQL = f"""
SELECT vec_id,
       list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale,
       CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) > 0
            THEN list_transform(embedding,
                 x -> CAST(floor(x::DOUBLE / list_max(list_transform(embedding, y -> abs(y::DOUBLE))) * {QUANT_SCALE}) AS INT))
            ELSE list_transform(embedding, x -> 0) END AS q
FROM embeddings
ORDER BY vec_id
"""
