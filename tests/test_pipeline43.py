"""Batch-43 property tests."""

import pytest

from oracledb_datapump_spark.operators.pipeline43 import (
    dow_seasonality_chi2,
    gini_source_chars,
    spearman_rho_daily,
)


def test_spearman_bounds(spark, sf_dir):
    r = spearman_rho_daily(spark, sf_dir).collect()[0]
    assert -1_000_000 <= r["rho_ppm"] <= 1_000_000
    assert r["sum_d2"] >= 0 and r["n_days"] > 2
    # volume and revenue are strongly rank-correlated in TPC-H-ish data
    assert r["rho_ppm"] > 0


def test_spearman_perfect_on_identical_ranks(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    tmp = str(tmp_path / "o")
    # strictly increasing revenue with volume: rho == 1e6 exactly
    df = spark.range(1, 101).select(
        F.expr("date_add(DATE'2024-01-01', CAST(id AS INT))").alias(
            "o_orderdate"
        ),
        (F.col("id") * 1.0).alias("o_totalprice"),
    )
    df.write.parquet(os.path.join(tmp, "orders.parquet"))
    r = spearman_rho_daily(spark, tmp).collect()[0]
    assert r["sum_d2"] == 0 and r["rho_ppm"] == 1_000_000


def test_dow_peak_in_range(spark, sf_dir):
    rows = dow_seasonality_chi2(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["peak_dow"] <= 6
        assert r["n_events"] > 0


def test_gini_bounds_and_uniform_zero(spark, sf_dir, tmp_path):
    import os

    from pyspark.sql import functions as F

    r = gini_source_chars(spark, sf_dir).collect()[0]
    assert 0 <= r["gini_ppm"] < 1_000_000
    # perfectly uniform sources → gini 0
    tmp = str(tmp_path / "d")
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
        F.lit(100).alias("n_chars"),
    )
    df.write.parquet(os.path.join(tmp, "documents.parquet"))
    r = gini_source_chars(spark, tmp).collect()[0]
    assert r["gini_ppm"] == 0 and r["n_sources"] == 4


def test_cross_source_matrix_accounts_every_pair(spark, sf_dir):
    from oracledb_datapump_spark.operators.dedup import (
        verified_pairs_cached,
    )
    from oracledb_datapump_spark.operators.pipeline43 import (
        cross_source_dup_matrix,
    )

    rows = cross_source_dup_matrix(spark, sf_dir).collect()
    n_pairs = verified_pairs_cached(spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["source_a"] <= r["source_b"] and r["n_pairs"] >= 1


def test_entropy_bands_specialists_at_zero(spark, sf_dir, tmp_path):
    import os

    from pyspark.sql import functions as F

    from oracledb_datapump_spark.operators.pipeline43 import (
        user_type_entropy_bands,
    )

    rows = user_type_entropy_bands(spark, sf_dir).collect()
    assert rows and all(r["entropy_proxy"] >= 0 for r in rows)
    # synthetic: 5 pure specialists (one type each) + 1 even 2-type user
    tmp = str(tmp_path / "ev")
    data = [(u, "a", f"2024-01-0{u+1} 00:00:00") for u in range(5) for _ in range(4)]
    data += [(9, t, "2024-01-09 00:00:00") for t in ("a", "b") for _ in range(4)]
    spark.createDataFrame(
        data, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts")).write.parquet(
        os.path.join(tmp, "events.parquet")
    )
    rows = {r["entropy_proxy"]: r["n_users"] for r in
            user_type_entropy_bands(spark, tmp).collect()}
    # specialists: N=4,c=4 -> 4*3 - 4*3 = 0
    assert rows.get(0) == 5
    # even 2-type user: N=8,c=4,4 -> 8*4 - 2*(4*3) = 8
    assert rows.get(8) == 1
