"""Shared loader for the ``embeddings`` table — the fixture-drift
absorber for the vector fixture (same posture as docs_source for
documents and events_source for events.ts: one module owns the physical
schema; a regenerated fixture fails LOUDLY here, not silently across
the clustering/similarity/dedup/PCA stacks).

Normalizations that are value-preserving on both engines (the DuckDB
oracles read the same file, so value-level comparisons are unaffected):
- vec_id int32 → BIGINT;
- embedding element type float32 OR float64 both pass through — every
  consumer casts elements to double before arithmetic, and
  float32→float64 promotion is exact and identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REQUIRED_COLUMNS = ("vec_id", "embedding")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    missing = [c for c in REQUIRED_COLUMNS if c not in e.columns]
    if missing:
        raise ValueError(
            f"embeddings source {sf_dir}/embeddings.parquet lacks required "
            f"column(s) {missing}; found {e.columns}"
        )
    dtypes = dict(e.dtypes)
    if dtypes["vec_id"] not in ("bigint", "long"):
        if dtypes["vec_id"] not in ("int", "smallint", "tinyint"):
            raise ValueError(
                f"embeddings vec_id has non-integral dtype {dtypes['vec_id']}"
            )
        e = e.withColumn("vec_id", F.col("vec_id").cast("long"))
    if dtypes["embedding"] not in ("array<float>", "array<double>"):
        raise ValueError(
            f"embeddings embedding has dtype {dtypes['embedding']}; expected "
            "array<float> or array<double> — element-wise casts downstream "
            "assume a float vector"
        )
    # r16 (guide §2.2): a fixture-sized embeddings.parquet scans as one
    # partition, serializing every consumer's per-vector arithmetic
    # (dot folds, quantization, PQ coding) onto one core before its
    # first exchange; widen to session parallelism when narrower —
    # no-op at any scale where the scan is already wide
    from ..functions.partitioning import widen_small_scan

    return widen_small_scan(e)
