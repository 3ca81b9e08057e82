"""Batch 68: max drawdown, dedup medoid, JL distortion."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline68 import (
    DEDUP_MEDOID_SQL,
    JL_DISTORTION_SQL,
    MAX_DRAWDOWN_SQL,
    dedup_medoid_select,
    jl_distortion_report,
    max_drawdown_report,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (max_drawdown_report, MAX_DRAWDOWN_SQL),
        (dedup_medoid_select, DEDUP_MEDOID_SQL),
        (jl_distortion_report, JL_DISTORTION_SQL),
    ],
    ids=["drawdown", "medoid", "jl"],
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


def test_drawdown_ordering(spark, sf_dir):
    row = max_drawdown_report(spark, sf_dir).collect()[0]
    assert row["peak_day"] <= row["trough_day"]
    assert row["dd_days"] == row["trough_day"] - row["peak_day"]
    assert row["drawdown_q"] >= 0
    # recovery, if any, is after the trough
    assert row["recovered_day"] == -1 or row["recovered_day"] > row["trough_day"]


def test_medoid_is_group_member(spark, sf_dir):
    rows = dedup_medoid_select(spark, sf_dir).collect()
    assert rows  # the fixture plants near-dups
    for r in rows:
        assert r["group_size"] >= 2
        # group label is the minimum member id; the medoid is >= it
        assert r["medoid_doc"] >= r["group_id"]
        # medoid distance is bounded by (size-1) full distances
        assert 0 <= r["sum_dist_q"] <= (r["group_size"] - 1) * 1_000_000
    # group ids unique
    assert len({r["group_id"] for r in rows}) == len(rows)


def test_jl_quantiles_bracket_unity(spark, sf_dir):
    rows = {r["stat"]: r for r in jl_distortion_report(spark, sf_dir).collect()}
    assert set(rows) == {"p10", "p50", "p90"}
    assert rows["p10"]["ratio_ppm"] <= rows["p50"]["ratio_ppm"] <= rows["p90"]["ratio_ppm"]
    # JL: the median ratio sits near 1e6 (generous band — k=16 is noisy)
    assert 300_000 < rows["p50"]["ratio_ppm"] < 3_000_000
    assert rows["p10"]["n_pairs"] > 0
