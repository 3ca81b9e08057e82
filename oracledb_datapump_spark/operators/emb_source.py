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


def load_embeddings(
    spark: SparkSession, sf_dir: str, widen: bool = False
) -> DataFrame:
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
    # r17 (guide §2.2, r16 verdict item 1): the widen is now OPT-IN per
    # consumer instead of unconditional in this absorber. r16 applied
    # widen_small_scan here for every consumer; the driver's bench showed
    # the exchange of the full embedding arrays regresses every consumer
    # whose first stage is NOT row-heavy (embedding_dim_profile 0.48×,
    # centroid_topk 0.69×, doc_embedding_coverage 0.82×,
    # embedding_pca_scores 0.89×) — the same payload-through-the-widen
    # failure r16 itself measured and reverted for media_features and
    # docs_source. Consumers with a genuinely row-heavy first stage
    # (ann_bruteforce's n·|Q| cosine fan-out, PQ coding) pass widen=True.
    if widen:
        from ..functions.partitioning import widen_small_scan

        return widen_small_scan(e)
    return e
