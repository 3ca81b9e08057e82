"""Bucketed co-located join: identical bucketing on both sides must
remove the Exchange from the join plan (the co-location lever for
repeated fact-fact joins at scale)."""

import pytest
from pyspark.sql import functions as F

from oracledb_datapump_spark.functions.bucketing import (
    co_located_join,
    shuffle_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "bkt_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, lt, rt, on=["o_orderkey"])
        n_bucketed = shuffle_count(joined)

        # the same join on raw (non-bucketed) parquet shuffles both sides
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        n_raw = shuffle_count(o.join(l, "o_orderkey"))

        assert n_bucketed == 0, f"bucketed join still shuffles ({n_bucketed})"
        assert n_raw > 0
        # and it computes the right thing
        expected = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
