"""Batch 34: functional-dependency discovery and a per-source quality
percentile normalizer.

Intra-table profiling (the FD complement to fk_candidate_scan's
inter-table key discovery) and a feature-normalization builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# candidate LHS→RHS pairs: real dependencies AND planted near-misses so
# the discovery must separate them (a scan that flags everything fails)
FD_CANDIDATES = [
    ("nation", "n_nationkey", "n_name"),  # key → attr: holds
    ("nation", "n_regionkey", "n_name"),  # 5 regions, 25 names: violates
    ("orders", "o_orderkey", "o_orderstatus"),  # key → attr: holds
    ("orders", "o_custkey", "o_orderstatus"),  # repeat customers: violates
    ("lineitem", "l_orderkey", "l_suppkey"),  # multi-line orders: violates
    ("supplier", "s_suppkey", "s_nationkey"),  # key → attr: holds
]


def fd_discovery_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, lhs, rhs, n_lhs_values, n_violating_lhs, holds):
    functional-dependency check LHS→RHS for a fixed candidate list over
    the star schema — a dependency holds iff no LHS value maps to more
    than one RHS value. The candidate list plants true keys AND
    near-miss pairs, so the scan's discrimination is itself under the
    hash. The intra-table twin of fk_candidate_scan: together they
    recover the schema's key structure from data alone (what a catalog
    crawler runs before trusting undocumented tables).

    Plan: per candidate one distinct + one partial-aggregated groupBy
    on the LHS (count distinct RHS per LHS value) — each candidate is
    an independent 2-column scan with column pruning pushed down."""
    out = None
    for table, lhs, rhs in FD_CANDIDATES:
        t = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(lhs, rhs)
        per_lhs = t.distinct().groupBy(lhs).agg(
            F.count(F.lit(1)).alias("n_rhs")
        )
        r = per_lhs.agg(
            F.lit(table).alias("table_name"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
            F.sum((F.col("n_rhs") > 1).cast("long"))
            .cast("long")
            .alias("n_violating_lhs"),
        ).withColumn("holds", F.col("n_violating_lhs") == 0)
        out = r if out is None else out.unionByName(r)
    return out.orderBy("table_name", "lhs", "rhs")


def _fd_sql() -> str:
    selects = []
    for table, lhs, rhs in FD_CANDIDATES:
        selects.append(
            f"""SELECT '{table}' AS table_name, '{lhs}' AS lhs, '{rhs}' AS rhs,
       CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_lhs,
       SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
      FROM {table} GROUP BY {lhs})"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY table_name, lhs, rhs"


FD_DISCOVERY_SCAN_SQL = _fd_sql()


# ---------------------------------------------------------------------------
# Per-source length-percentile normalization bands
# ---------------------------------------------------------------------------

NORM_BANDS = 4


def source_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, band, n_docs, min_chars, max_chars): per-SOURCE quartile
    banding of document length — the feature-normalization step before
    mixing heterogeneous sources (a 500-char doc can be source A's
    median and source B's tail; per-source percentile rank is the
    standard fix). Bands are NTILE({NORM_BANDS}) over (n_chars, doc_id)
    — the doc_id tiebreak makes the band assignment (and the hash)
    deterministic under ties.

    Plan: one window per source partition (shuffle on source), one
    partial-aggregated groupBy — the normalize-then-summarize shape."""
    from pyspark.sql import Window

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        d.withColumn("band", F.ntile(NORM_BANDS).over(w).cast("long"))
        .groupBy("source", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("source", "band")
    )


SOURCE_PERCENTILE_BANDS_SQL = f"""
WITH banded AS (
  SELECT source, n_chars,
         NTILE({NORM_BANDS}) OVER (PARTITION BY source
                                   ORDER BY n_chars, doc_id) AS band
  FROM documents
)
SELECT source, CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM banded
GROUP BY source, band
ORDER BY source, band
"""
