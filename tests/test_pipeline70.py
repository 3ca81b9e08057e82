"""Batch 70: MASE seasonal backtest, rich-club curve, RBO overlap."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline70 import (
    MASE_SQL,
    RBO_DENOM,
    RBO_OVERLAP_SQL,
    RICH_CLUB_SQL,
    RICH_THRESHOLDS,
    mase_seasonal_backtest,
    rbo_ranker_overlap,
    rich_club_curve,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (mase_seasonal_backtest, MASE_SQL),
        (rich_club_curve, RICH_CLUB_SQL),
        (rbo_ranker_overlap, RBO_OVERLAP_SQL),
    ],
    ids=["mase", "richclub", "rbo"],
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


def test_mase_consistency(spark, sf_dir):
    row = mase_seasonal_backtest(spark, sf_dir).collect()[0]
    assert row["n_days"] > 0
    assert row["sae_naive"] >= 0 and row["sae_seasonal"] >= 0
    assert row["mase_ppm"] == row["sae_seasonal"] * 1_000_000 // max(
        row["sae_naive"], 1
    )
    assert bool(row["seasonal_wins"]) == (
        row["sae_seasonal"] < row["sae_naive"]
    )


def test_rich_club_structure(spark, sf_dir):
    rows = rich_club_curve(spark, sf_dir).collect()
    assert [r["deg_threshold"] for r in rows] == list(RICH_THRESHOLDS)
    for a, b in zip(rows, rows[1:]):
        # higher threshold => fewer rich nodes and fewer rich edges
        assert a["n_rich"] >= b["n_rich"]
        assert a["e_rich"] >= b["e_rich"]
    for r in rows:
        assert 0 <= r["phi_ppm"] <= 1_000_000
        if r["n_rich"] >= 2:
            assert (
                r["phi_ppm"]
                == 2 * r["e_rich"] * 1_000_000 // (r["n_rich"] * (r["n_rich"] - 1))
            )


def test_rbo_bounds_and_identity(spark, sf_dir):
    rows = rbo_ranker_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_common"] <= 5
        assert 0 <= r["rbo_ppm"] <= 1_000_000
        # n_common = 5 with perfect order means rbo close to 1; rbo of
        # disjoint lists is exactly 0
        if r["n_common"] == 0:
            assert r["rbo_ppm"] == 0
    # the two lexical rankers genuinely overlap on this corpus
    assert any(r["rbo_ppm"] > 0 for r in rows)
    assert RBO_DENOM == 2_457_060
