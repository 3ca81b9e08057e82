"""Shared loader for the ``documents`` table.

Every text operator takes an optional ``docs`` frame and falls back to
its own parquet read. Composite pipelines (curation.curated_corpus_v2)
pass ONE persisted base frame to every arm, so the corpus is scanned
once per pipeline run instead of once per arm — at 100 TB the repeated
full-corpus scan is the dominant cost of a multi-gate curation pass
(the r2/r3 plan audit counted 15 scans for 7 arms).

Fixture-drift absorber (the documents analog of events_source's ts
contract): the driver has regenerated fixtures with changed physical
types before (events ts, round 3) — this is the single place that
validates the documents schema, so a regenerated fixture fails LOUDLY
here instead of silently mis-hashing across the ~40 downstream text
operators. doc_id is normalized to BIGINT (an int32 fixture would
produce identical values, so the cast is behavior-preserving; DuckDB
oracles read the same file and compare by value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REQUIRED_COLUMNS = ("doc_id", "text")


def load_docs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    if docs is not None:
        return docs
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    missing = [c for c in REQUIRED_COLUMNS if c not in d.columns]
    if missing:
        raise ValueError(
            f"documents source {sf_dir}/documents.parquet lacks required "
            f"column(s) {missing}; found {d.columns} — a regenerated "
            "fixture changed shape, fix the absorber here, not the "
            "40 downstream operators"
        )
    dtypes = dict(d.dtypes)
    if dtypes["doc_id"] not in ("bigint", "long"):
        if dtypes["doc_id"] not in ("int", "smallint", "tinyint"):
            raise ValueError(
                f"documents doc_id has non-integral dtype {dtypes['doc_id']}"
                " — ordering/threshold semantics would silently change"
            )
        d = d.withColumn("doc_id", F.col("doc_id").cast("long"))
    if dtypes["text"] != "string":
        raise ValueError(
            f"documents text has dtype {dtypes['text']}; expected string"
        )
    return d
