"""Batch 72: robust statistics & sequential testing."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline72 import (
    AB_SEQUENTIAL_SQL,
    MANN_KENDALL_SQL,
    MCNEMAR_DEDUP_SQL,
    OBF_BOUNDS_MILLI,
    PAGE_HINKLEY_SQL,
    THEIL_SEN_SQL,
    TRIM_ALPHAS_PPM,
    TRIMMED_MEAN_SQL,
    TUKEY_FENCE_SQL,
    ab_sequential_looks,
    mann_kendall_trend,
    mcnemar_dedup_agreement,
    page_hinkley_drift,
    theil_sen_slope,
    trimmed_mean_report,
    tukey_fence_outliers,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (trimmed_mean_report, TRIMMED_MEAN_SQL),
        (tukey_fence_outliers, TUKEY_FENCE_SQL),
        (mann_kendall_trend, MANN_KENDALL_SQL),
        (theil_sen_slope, THEIL_SEN_SQL),
        (mcnemar_dedup_agreement, MCNEMAR_DEDUP_SQL),
        (page_hinkley_drift, PAGE_HINKLEY_SQL),
        (ab_sequential_looks, AB_SEQUENTIAL_SQL),
    ],
    ids=[
        "trimmed",
        "tukey",
        "mann_kendall",
        "theil_sen",
        "mcnemar",
        "page_hinkley",
        "ab_seq",
    ],
)
def test_cross_engine_hash_sf0001(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, sql)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)


def test_trimmed_mean_monotone_and_bounded(spark, sf_dir):
    """More trimming narrows the kept range; every mean lies between
    lo and hi; winsorized uses the full n."""
    rows = {r["alpha_ppm"]: r for r in trimmed_mean_report(spark, sf_dir).collect()}
    assert set(rows) == set(TRIM_ALPHAS_PPM)
    prev_lo, prev_hi = None, None
    for a in sorted(rows):
        r = rows[a]
        assert r["lo_cents"] <= r["trimmed_mean_cents"] <= r["hi_cents"]
        assert r["lo_cents"] <= r["winsor_mean_cents"] <= r["hi_cents"]
        if prev_lo is not None:
            assert r["lo_cents"] >= prev_lo and r["hi_cents"] <= prev_hi
        prev_lo, prev_hi = r["lo_cents"], r["hi_cents"]


def test_tukey_quartiles_ordered(spark, sf_dir):
    r = tukey_fence_outliers(spark, sf_dir).collect()[0]
    assert r["q1_cents"] <= r["q3_cents"]
    assert r["iqr_cents"] == r["q3_cents"] - r["q1_cents"]
    assert r["n_low"] + r["n_high"] <= r["n"]
    assert 0 <= r["outlier_ppm"] <= 1_000_000


def test_mann_kendall_hand_computed(spark, tmp_path):
    """Strictly increasing 6-day series: S = 15 (all pairs concordant),
    no ties, var18 = 6·5·17 = 510, z = 14/sqrt(510/18) = 2.630."""
    import datetime

    spark.createDataFrame(
        [
            (i, 1, "O", float(i + 1), datetime.datetime(1992, 1, i + 1), "1-URGENT")
            for i in range(6)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = mann_kendall_trend(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 6
    assert r["s_stat"] == 15
    assert r["var18_q"] == 510
    # z² ppm = 14²·18e6 // 510 = 6917647 → isqrt = 2630
    assert r["z_milli"] == 2630
    assert bool(r["trend_flag"]) is True


def test_theil_sen_hand_computed(spark, tmp_path):
    """Days 0..3 with values 100,200,300,400 cents·100: every pairwise
    slope is 10000 ppm-cents/day·... — slope = value-step·1e6/day-step
    is constant, so the median equals it."""
    import datetime

    spark.createDataFrame(
        [
            (i, 1, "O", float(i + 1), datetime.datetime(1992, 1, i + 1), "1-URGENT")
            for i in range(4)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = theil_sen_slope(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 4 and r["n_pairs"] == 6
    assert r["slope_ppm"] == 100 * 1_000_000  # 100 cents/day in ppm


def test_mcnemar_partition_is_exhaustive(spark, sf_dir):
    r = mcnemar_dedup_agreement(spark, sf_dir).collect()[0]
    assert (
        r["in_both"] + r["exact_only"] + r["near_only"] + r["neither"]
        == r["n_docs"]
    )
    # exact dups share all shingles: the near detector must cover them
    assert r["exact_only"] == 0
    assert r["chi2_milli"] >= 0


def test_page_hinkley_nonnegative(spark, sf_dir):
    r = page_hinkley_drift(spark, sf_dir).collect()[0]
    assert r["ph_max_q"] >= 0
    assert r["sigma_n_q"] >= 0
    assert (r["alarm_day"] >= 0) == bool(r["alarm_flag"])


def test_ab_sequential_monotone_info(spark, sf_dir):
    rows = ab_sequential_looks(spark, sf_dir).collect()
    assert [r["look"] for r in rows] == [1, 2, 3, 4]
    ns = [r["n_a"] + r["n_b"] for r in rows]
    assert ns == sorted(ns)  # information accrues
    assert [r["bound_milli"] for r in rows] == list(OBF_BOUNDS_MILLI)
