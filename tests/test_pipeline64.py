"""Batch 64: ABC-XYZ, CMH pooled odds, capture-recapture, Hurst R/S."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline64 import (
    ABC_XYZ_SQL,
    CMH_POOLED_SQL,
    DEDUP_CRC_SQL,
    HURST_BLOCKS,
    HURST_RS_SQL,
    abc_xyz_matrix,
    cmh_pooled_odds,
    dedup_capture_recapture,
    hurst_rs_report,
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
        (abc_xyz_matrix, ABC_XYZ_SQL),
        (cmh_pooled_odds, CMH_POOLED_SQL),
        (dedup_capture_recapture, DEDUP_CRC_SQL),
        (hurst_rs_report, HURST_RS_SQL),
    ],
    ids=["abcxyz", "cmh", "crc", "hurst"],
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


def test_abc_xyz_partition_of_parts(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = abc_xyz_matrix(spark, sf_dir).collect()
    assert rows
    n_parts_direct = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts_direct
    for r in rows:
        assert r["abc"] in ("A", "B", "C") and r["xyz"] in ("X", "Y", "Z")
        assert r["n_parts"] > 0
    # the A band exists and holds the largest mean revenue per part
    by_abc = {}
    for r in rows:
        a = by_abc.setdefault(r["abc"], [0, 0])
        a[0] += r["n_parts"]
        a[1] += r["revenue_cents"]
    assert "A" in by_abc
    if "C" in by_abc:
        assert (
            by_abc["A"][1] // by_abc["A"][0]
            > by_abc["C"][1] // by_abc["C"][0]
        )


def test_cmh_within_per_stratum_range(spark, sf_dir):
    rows = cmh_pooled_odds(spark, sf_dir).collect()
    assert rows
    cmh = {r["cmh_or_ppm"] for r in rows}
    assert len(cmh) == 1  # pooled verdict shared
    cmh = cmh.pop()
    ors = [r["or_ppm"] for r in rows]
    # CMH is a weighted combination: it lies within the stratum range
    assert min(ors) <= cmh <= max(ors)
    for r in rows:
        assert r["a"] + r["b"] + r["c"] + r["d"] > 0


def test_capture_recapture_bounds(spark, sf_dir):
    row = dedup_capture_recapture(spark, sf_dir).collect()[0]
    assert row["overlap"] <= min(row["n_method1"], row["n_method2"])
    assert row["overlap"] > 0  # the two catches do overlap on planted dups
    # Chapman estimate is at least each single catch
    assert row["chapman_est"] >= max(row["n_method1"], row["n_method2"])
    assert 0 < row["cov1_ppm"] <= 1_000_000
    assert 0 < row["cov2_ppm"] <= 1_000_000


def test_hurst_rs_grows_with_block(spark, sf_dir):
    rows = hurst_rs_report(spark, sf_dir).collect()
    assert [r["block_days"] for r in rows] == list(HURST_BLOCKS)
    for r in rows:
        assert r["n_blocks"] >= 1
        assert r["rs_avg_q"] > 0
    # R/S grows with block size (H > 0 for any series)
    for a, b in zip(rows, rows[1:]):
        assert b["rs_avg_q"] >= a["rs_avg_q"]
        assert b["rs_ratio_ppm"] > 1_000_000
    assert rows[0]["rs_ratio_ppm"] == 0  # no predecessor
