"""Pipeline dashboards, batch 23: the bucketed-table lifecycle under
the cross-engine hash — co-located joins and bucket-pruned lookups.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

Bucketing is the co-location lever the 100 TB brief names explicitly:
fix the partitioning at WRITE time so every later join or lookup on the
bucket key skips its shuffle. ``functions/bucketing.py`` provides the
write/join/plan helpers and ``tests/test_bucketing.py`` +
``tests/test_pipeline22.py`` assert the PLAN side (no Exchange on the
join; SelectedBucketsCount on the lookup); these two queries put the
DATA side — that the bucketed path computes exactly what the plain path
computes — under the driver's value hash.

- ``bucketed_join_rollup``: write orders and lineitem bucketed by
  orderkey, run the co-located fact—fact join, roll revenue up by
  priority.
- ``bucket_pruned_lookup``: point-IN lookup on the bucket key of a
  bucketed table — Spark prunes to the buckets the literals hash to,
  reading 1/N of the files.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 8
LOOKUP_KEYS = (1, 7, 1000)


def _tbl(prefix: str, sf_dir: str) -> str:
    return f"{prefix}_{re.sub('[^a-z0-9]', '_', sf_dir.lower())}"


def bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, n_lines, revenue_cents): revenue per order priority
    computed through the BUCKETED path — both fact tables written
    bucketBy(orderkey) into the session catalog, joined co-located (no
    Exchange on the join; asserted mechanically in
    tests/test_pipeline22.py), aggregated. Hash equality against the
    plain-SQL oracle proves the bucketed layout moved/lost/duplicated
    nothing — the data-fidelity half of the co-location contract.

    At 100 TB this is THE repeated-join pattern: pay the bucketed write
    once, then every orderkey join (incremental merges, enrichments,
    reconciliations) skips both shuffle sides forever. Bucket tables
    are per-sf-dir named and dropped after the read (the result is
    pinned with localCheckpoint first)."""
    from ..functions.bucketing import co_located_join, write_bucketed

    ot, lt = _tbl("bkt_rj_o", sf_dir), _tbl("bkt_rj_l", sf_dir)
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("rc"),
        )
        write_bucketed(o, ot, ["o_orderkey"], N_BUCKETS,
                       sort_cols=["o_orderkey"])
        write_bucketed(l, lt, ["o_orderkey"], N_BUCKETS,
                       sort_cols=["o_orderkey"])
        out = (
            co_located_join(spark, ot, lt, on=["o_orderkey"])
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_lines"),
                F.sum(F.col("rc").cast("decimal(38,0)"))
                .cast("long")
                .alias("revenue_cents"),
            )
            .orderBy("priority")
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


BUCKETED_JOIN_ROLLUP_SQL = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY priority
"""


def bucket_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, o_orderstatus, price_cents): point-IN lookup of
    keys {LOOKUP_KEYS} on a bucketed orders table. Spark's bucket
    pruning hashes each literal and scans ONLY the buckets they land
    in (SelectedBucketsCount in the plan — asserted in
    tests/test_pipeline22.py), so the lookup reads ~|literals|/N of
    the files, no matter how big the table. The hash gate pins that
    pruning returns exactly the plain-filter rows — pruning bugs
    (wrong hash, wrong bucket math) are silent row loss, which is
    precisely what a value hash catches.

    ``autoBucketedScan`` is pinned off for the read: Spark's
    DisableUnnecessaryBucketedScan rule otherwise reverts a pure
    filter to a plain scan (it only keeps bucketed reads when a join/
    aggregate wants the partitioning), which silently forfeits the
    pruning this query demonstrates."""
    from ..functions.bucketing import write_bucketed

    ot = _tbl("bkt_pl_o", sf_dir)
    prev = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias(
                "price_cents"
            ),
        )
        write_bucketed(o, ot, ["o_orderkey"], N_BUCKETS)
        out = (
            spark.table(ot)
            .filter(F.col("o_orderkey").isin(*LOOKUP_KEYS))
            .orderBy("o_orderkey")
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
        spark.sql(f"DROP TABLE IF EXISTS {ot}")


BUCKET_PRUNED_LOOKUP_SQL = f"""
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
WHERE o_orderkey IN {LOOKUP_KEYS}
ORDER BY o_orderkey
"""
