"""Batch 76: Anderson–Darling drift + permutation test."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline76 import (
    AD_CRIT_MILLI,
    ANDERSON_DARLING_SQL,
    PERM_B,
    PERMUTATION_TEST_SQL,
    anderson_darling_drift,
    permutation_test_arm_diff,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (anderson_darling_drift, ANDERSON_DARLING_SQL),
        (permutation_test_arm_diff, PERMUTATION_TEST_SQL),
    ],
    ids=["anderson_darling", "permutation"],
)
def test_cross_engine_hash_sf0001(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, sql)
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)


def test_ad_matches_python_reference(spark, tmp_path):
    """Pettitt's A² recomputed in plain Python over the same daily
    series (built small enough to enumerate) must equal the engine's
    integer staging up to its documented per-term truncation (<1 milli
    per term here, so exact at this size)."""
    import datetime

    vals = [100, 220, 140, 380, 260, 500, 180, 440, 320, 560, 420, 600]
    rows = [
        (
            i,
            1,
            "O",
            float(v),
            datetime.datetime(1992, 1, 1) + datetime.timedelta(days=i),
            "1-URGENT",
        )
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = anderson_darling_drift(spark, str(tmp_path)).collect()[0]
    # python reference with the SAME integer staging
    n = len(vals)
    mid = (0 + n - 1 + 1) // 2
    cents = [round(v * 100) for v in vals]
    pooled = sorted((c, d) for d, c in enumerate(cents))
    n0 = sum(1 for _, d in pooled if d < mid)
    ts, m = 0, 0
    for i, (_, d) in enumerate(pooled, start=1):
        if d < mid:
            m += 1
        if i < n:
            dterm = m * n - n0 * i
            ts += dterm * dterm * 1000 // (i * (n - i))
    want = ts // (n0 * (n - n0))
    assert r["n_first"] == n0 and r["a2_milli"] == want


def test_permutation_p_bounds_and_determinism(spark, sf_dir):
    a = permutation_test_arm_diff(spark, sf_dir).collect()[0]
    b = permutation_test_arm_diff(spark, sf_dir).collect()[0]
    assert a == b  # hash draws → fully deterministic
    assert a["b_perms"] == PERM_B
    # add-one correction: p in [1/(B+1), 1]
    assert 1_000_000 // (PERM_B + 1) <= a["p_ppm"] <= 1_000_000
    assert 0 <= a["n_extreme"] <= PERM_B


def test_permutation_detects_planted_effect(spark, tmp_path):
    """Plant a huge arm effect keyed to the REAL 'qte:' hash arm: the
    re-randomization p must hit its floor 1/(B+1) and flag."""
    import datetime

    from oracledb_datapump_spark.functions.text import hash64
    from pyspark.sql import functions as F

    ids = list(range(1, 201))
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    arms = {
        r["user_id"]: r["arm"]
        for r in df.select(
            "user_id",
            F.pmod(
                hash64(
                    F.concat(F.lit("qte:"), F.col("user_id").cast("string"))
                ),
                F.lit(2),
            ).alias("arm"),
        ).collect()
    }
    rows = []
    for i in ids:
        value = 1000.0 if arms[i] == 1 else 1.0
        rows.append(
            (
                i,
                datetime.datetime(1992, 1, 1 + (i % 28)),
                i,
                "purchase",
                value,
                "{}",
            )
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = permutation_test_arm_diff(spark, str(tmp_path)).collect()[0]
    assert r["p_ppm"] == 1_000_000 // (PERM_B + 1)
    assert bool(r["signif_flag"]) is True
    assert abs(r["obs_diff_ppm"]) > 0


def test_ad_flag_threshold():
    assert AD_CRIT_MILLI == 2_492
