"""Batch 63: Wilson CIs, FS EM step, Shapley attribution, Simpson scan."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline63 import (
    FS_EM_SQL,
    SHAPLEY_CHANNELS,
    SHAPLEY_SQL,
    SIMPSONS_SQL,
    WILSON_CI_SQL,
    fs_em_iteration,
    shapley_attribution,
    simpsons_reversal_scan,
    wilson_ci_by_arm,
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
        (wilson_ci_by_arm, WILSON_CI_SQL),
        (fs_em_iteration, FS_EM_SQL),
        (shapley_attribution, SHAPLEY_SQL),
        (simpsons_reversal_scan, SIMPSONS_SQL),
    ],
    ids=["wilson", "fs_em", "shapley", "simpsons"],
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


def test_wilson_interval_brackets_point(spark, sf_dir):
    rows = wilson_ci_by_arm(spark, sf_dir).collect()
    assert len(rows) == 2
    flags = {bool(r["sig_flag"]) for r in rows}
    assert len(flags) == 1  # same verdict on both rows
    for r in rows:
        assert 0 <= r["lo_ppm"] <= r["p_ppm"] <= r["hi_ppm"] <= 1_000_000
        # Wilson is strictly narrower than [0, 1] for 0 < x < n
        if 0 < r["conversions"] < r["n_users"]:
            assert r["lo_ppm"] > 0 or r["hi_ppm"] < 1_000_000


def test_fs_em_separates_m_from_u(spark, sf_dir):
    rows = {r["field"]: r for r in fs_em_iteration(spark, sf_dir).collect()}
    assert set(rows) == {"lang", "source", "len_band", "prefix8"}
    pis = {r["pi1_ppm"] for r in rows.values()}
    assert len(pis) == 1  # shared class prior
    assert 0 < pis.pop() < 1_000_000
    for r in rows.values():
        assert 0 <= r["u1_ppm"] <= 1_000_000
        assert 0 <= r["m1_ppm"] <= 1_000_000
        assert r["weight_q"] >= 1
    # prefix8 agreement is the sharpest match signal in the fixture:
    # its match-class agreement rate must exceed its nonmatch rate
    assert rows["prefix8"]["m1_ppm"] > rows["prefix8"]["u1_ppm"]


def test_shapley_efficiency_axiom(spark, sf_dir):
    rows = {r["channel"]: r for r in shapley_attribution(spark, sf_dir).collect()}
    assert set(rows) == set(SHAPLEY_CHANNELS) | {"direct"}
    # efficiency: channel phis sum to 6*(v(C) - v(empty)), so all four
    # rows together account for 6*v(C) exactly -> shares sum to ~1e6
    total_q6 = sum(r["phi_q6"] for r in rows.values())
    assert total_q6 % 6 == 0
    share_sum = sum(r["share_ppm"] for r in rows.values())
    assert 999_990 <= share_sum <= 1_000_000
    for ch in SHAPLEY_CHANNELS:
        assert rows[ch]["phi_q6"] >= 0  # monotone game => nonneg phi


def test_simpsons_scan_signs(spark, sf_dir):
    rows = simpsons_reversal_scan(spark, sf_dir).collect()
    assert rows
    pooled = {r["pooled_sign"] for r in rows}
    assert len(pooled) == 1
    for r in rows:
        assert r["cov_sign"] in (-1, 0, 1)
        assert bool(r["reversal_flag"]) == (
            r["cov_sign"] * r["pooled_sign"] < 0
        )
        assert r["n_rows"] > 0
