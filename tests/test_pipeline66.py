"""Batch 66: k-center selection, quantile normalization, modularity."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline66 import (
    KC_STEPS,
    KCENTER_SQL,
    NATION_MODULARITY_SQL,
    QUANTILE_NORMALIZE_SQL,
    kcenter_select,
    nation_modularity,
    quantile_normalize_report,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (kcenter_select, KCENTER_SQL),
        (quantile_normalize_report, QUANTILE_NORMALIZE_SQL),
        (nation_modularity, NATION_MODULARITY_SQL),
    ],
    ids=["kcenter", "qnorm", "modularity"],
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


def test_kcenter_radii_nonincreasing(spark, sf_dir):
    rows = kcenter_select(spark, sf_dir).collect()
    assert [r["step"] for r in rows] == list(range(1, KC_STEPS + 1))
    assert rows[0]["radius_q"] == 0  # seed
    assert rows[1]["radius_q"] > 0
    # Gonzalez invariant: selection radii never increase
    for a, b in zip(rows[1:], rows[2:]):
        assert a["radius_q"] >= b["radius_q"]
    # no center picked twice
    assert len({r["vec_id"] for r in rows}) == KC_STEPS


def test_quantile_normalize_invariant(spark, sf_dir):
    rows = quantile_normalize_report(spark, sf_dir).collect()
    assert rows
    # the normalized profile is IDENTICAL across sources per decile
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r["decile"], set()).add(r["after_mean_q"])
    for d, vals in by_decile.items():
        assert len(vals) == 1, d
    # within a source, both before and after profiles are monotone
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r["decile"])
        for a, b in zip(rs, rs[1:]):
            assert a["before_mean_q"] <= b["before_mean_q"]
            assert a["after_mean_q"] <= b["after_mean_q"]


def test_modularity_bounds_and_additivity(spark, sf_dir):
    rows = nation_modularity(spark, sf_dir).collect()
    assert rows
    totals = {r["q_total_ppm"] for r in rows}
    assert len(totals) == 1
    q = totals.pop()
    # modularity is in [-0.5, 1]
    assert -500_000 <= q <= 1_000_000
    for r in rows:
        assert r["internal_edges"] * 2 <= r["degree_sum"]
        assert r["n_nodes"] > 0
    # contributions sum to the total up to per-row truncation
    s = sum(r["q_contrib_ppm"] for r in rows)
    assert abs(s - q) <= len(rows)
