"""Plan-side assertions for the bucketed lifecycle queries: the hash
gate proves the DATA; these prove the PLANS (no join Exchange;
SelectedBucketsCount pruning)."""

import pytest
from pyspark.sql import functions as F

from oracledb_datapump_spark.functions.bucketing import (
    co_located_join,
    physical_plan,
    shuffle_count,
    write_bucketed,
)
from oracledb_datapump_spark.operators import pipeline22 as PL22


def test_rollup_join_is_co_located(spark, sf_dir):
    """The exact frames bucketed_join_rollup writes must join with
    ZERO Exchange before the aggregate."""
    ot, lt = "t22_o", "t22_l"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("rc"),
        )
        write_bucketed(o, ot, ["o_orderkey"], PL22.N_BUCKETS,
                       sort_cols=["o_orderkey"])
        write_bucketed(l, lt, ["o_orderkey"], PL22.N_BUCKETS,
                       sort_cols=["o_orderkey"])
        joined = co_located_join(spark, ot, lt, on=["o_orderkey"])
        assert shuffle_count(joined) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_lookup_prunes_buckets(spark, sf_dir):
    """The IN-literal lookup must scan fewer buckets than the table
    has (SelectedBucketsCount in the scan node)."""
    import re

    ot = "t22_p"
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus"
        )
        write_bucketed(o, ot, ["o_orderkey"], PL22.N_BUCKETS)
        df = spark.table(ot).filter(
            F.col("o_orderkey").isin(*PL22.LOOKUP_KEYS)
        )
        plan = physical_plan(df)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, f"no bucket pruning in plan:\n{plan[:2000]}"
        selected, total = int(m.group(1)), int(m.group(2))
        assert total == PL22.N_BUCKETS
        assert selected <= len(PL22.LOOKUP_KEYS) < total
        # and the pruned read returns exactly the plain-filter rows
        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderkey").isin(*PL22.LOOKUP_KEYS))
            .count()
        )
        assert df.count() == plain
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
