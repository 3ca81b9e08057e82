"""Shared loader for the ``documents`` table.

Every text operator takes an optional ``docs`` frame and falls back to
its own parquet read. Composite pipelines (curation.curated_corpus_v2)
pass ONE persisted base frame to every arm, so the corpus is scanned
once per pipeline run instead of once per arm — at 100 TB the repeated
full-corpus scan is the dominant cost of a multi-gate curation pass
(the r2/r3 plan audit counted 15 scans for 7 arms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_docs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    if docs is not None:
        return docs
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
