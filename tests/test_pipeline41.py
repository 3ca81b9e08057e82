"""Batch-41 property tests: rank statistics + near-dup degree profile."""

import pytest

from oracledb_datapump_spark.operators.pipeline41 import (
    dedup_pair_degree_histogram,
    events_runs_test,
    kendall_tau_daily,
    mw_u_segments,
)


def test_mw_u_bounds_and_symmetry(spark, sf_dir):
    rows = mw_u_segments(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 choose 2 ordered pairs
    for r in rows:
        # 0 <= U <= n_a*n_b  (U2 is 2U)
        assert 0 <= r["u2"] <= 2 * r["n_a"] * r["n_b"], r
        assert r["tie_correction"] >= 0
        assert r["seg_a"] < r["seg_b"]


def test_mw_u_identical_segments_insignificant(spark):
    """Two segments drawn as the SAME value multiset: U2 == n_a*n_b
    exactly (all mass in ties) and the verdict must be insignificant."""
    from pyspark.sql import functions as F
    import os, tempfile, shutil

    tmp = tempfile.mkdtemp(prefix="mw_ident_")
    try:
        df = spark.range(400).select(
            F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias(
                "o_orderpriority"
            ),
            (((F.col("id") / 2).cast("long") % 50) * 1.0).alias(
                "o_totalprice"
            ),
        )
        df.write.parquet(os.path.join(tmp, "orders.parquet"))
        rows = mw_u_segments(spark, tmp).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["u2"] == 2 * (r["n_a"] * r["n_b"] // 2) == r["n_a"] * r["n_b"]
        assert not r["significant"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_runs_test_counts(spark, sf_dir):
    rows = events_runs_test(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # runs count is between 1 and n_days; above-count inside range
        assert 1 <= r["n_runs"] <= r["n_days"]
        assert 0 <= r["n_above"] <= r["n_days"]


def test_kendall_tau_pair_accounting(spark, sf_dir):
    r = kendall_tau_daily(spark, sf_dir).collect()[0]
    n = r["n_days"]
    # C + D + all tie classes == n_days choose 2
    total = r["concordant"] + r["discordant"] + r["ties_x"] + r["ties_y"]
    assert total <= n * (n - 1) // 2
    assert -1_000_000 <= r["tau_ppm"] <= 1_000_000


def test_degree_histogram_accounting(spark, sf_dir):
    rows = dedup_pair_degree_histogram(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # degree-0 included
    # sum(degree * n_docs) = 2 * |pairs| (handshake lemma)
    from oracledb_datapump_spark.operators.dedup import (
        verified_pairs_cached,
    )

    n_pairs = verified_pairs_cached(spark, sf_dir).count()
    assert sum(r["degree"] * r["n_docs"] for r in rows) == 2 * n_pairs
