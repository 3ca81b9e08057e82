"""Batch 59: conformal calibration, EWMA control bands, clustering
coefficient."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline59 import (
    CC_TOPK,
    CLUSTERING_COEFF_SQL,
    CONF_ALPHAS_PPM,
    CONFORMAL_CALIBRATION_SQL,
    EWMA_CONTROL_SQL,
    EWMA_H,
    clustering_coefficient_topk,
    conformal_calibration_report,
    ewma_control_bands,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (conformal_calibration_report, CONFORMAL_CALIBRATION_SQL),
        (ewma_control_bands, EWMA_CONTROL_SQL),
        (clustering_coefficient_topk, CLUSTERING_COEFF_SQL),
    ],
    ids=["conformal", "ewma", "cc"],
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


def test_conformal_coverage_tracks_alpha(spark, sf_dir):
    rows = {
        r["alpha_ppm"]: r
        for r in conformal_calibration_report(spark, sf_dir).collect()
    }
    assert set(rows) == set(CONF_ALPHAS_PPM)
    covs = [rows[a]["coverage_ppm"] for a in sorted(CONF_ALPHAS_PPM)]
    # larger alpha -> smaller quantile -> coverage never increases
    assert covs == sorted(covs, reverse=True)
    qs = [rows[a]["q_hat"] for a in sorted(CONF_ALPHAS_PPM)]
    assert qs == sorted(qs, reverse=True)
    for a in CONF_ALPHAS_PPM:
        # distribution-free guarantee with finite-sample slack: coverage
        # lands near 1 - alpha (the exchangeable-split bound is marginal;
        # a fixed split gets within sampling noise of it)
        assert rows[a]["coverage_ppm"] >= 1_000_000 - a - 100_000


def test_ewma_band_flags_are_consistent(spark, sf_dir):
    rows = ewma_control_bands(spark, sf_dir).collect()
    assert len(rows) == 60
    for r in rows:
        assert 1 <= r["n_window"] <= EWMA_H
        assert r["mad_cents"] >= 0
        if r["n_window"] == 1:
            # a lone day IS its own EWMA
            assert r["ewma_cents"] == r["x_cents"]
        flag = r["n_window"] >= 4 and abs(
            r["x_cents"] - r["ewma_cents"]
        ) > 5 * r["mad_cents"]
        assert bool(r["outlier_flag"]) == flag


def test_clustering_coeff_bounded(spark, sf_dir):
    rows = clustering_coefficient_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= CC_TOPK
    for r in rows:
        assert r["degree"] >= 2
        # T <= C(deg, 2) so the ppm coefficient never exceeds 1
        assert 0 <= r["coeff_ppm"] <= 1_000_000
        assert (
            r["coeff_ppm"]
            == r["n_triangles"] * 2_000_000 // (r["degree"] * (r["degree"] - 1))
        )


def test_triangle_refactor_unchanged(spark, sf_dir):
    """The _tri_graph refactor must leave triangle_participation's
    result byte-identical to its oracle."""
    from oracledb_datapump_spark.operators.graph import (
        TRIANGLE_SQL,
        triangle_participation,
    )

    sdf = triangle_participation(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, TRIANGLE_SQL)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)
