"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB, repeated joins on the same key (fact-fact joins, incremental
merges into a dump set) should not re-shuffle both sides every run.
Bucketing fixes the partitioning at write time: two tables bucketed by
the same key into the same bucket count join with NO Exchange in the
physical plan — Spark's scan-level co-location replaces the shuffle.

These helpers wrap ``bucketBy`` + ``saveAsTable`` (bucketing metadata
lives in the session catalog / metastore) and provide a plan assertion
used by tests and by operators that want to verify co-location held.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) catalog
    table. Sorting within buckets additionally removes the sort step of a
    sort-merge join."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. When both
    sides are bucketed identically this produces a shuffle-free plan."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (0 for a fully
    co-located join)."""
    return physical_plan(df).count("Exchange")
