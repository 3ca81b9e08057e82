"""Batch 69: Burrows' Delta, lead-lag cross-correlation, hubness."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline69 import (
    BD_TOPK_PAIRS,
    BURROWS_DELTA_SQL,
    CC_MAX_LAG,
    CROSSCORR_SQL,
    HUB_K,
    HUBNESS_SQL,
    burrows_delta_matrix,
    crosscorr_leadlag,
    hubness_report,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (burrows_delta_matrix, BURROWS_DELTA_SQL),
        (crosscorr_leadlag, CROSSCORR_SQL),
        (hubness_report, HUBNESS_SQL),
    ],
    ids=["burrows", "crosscorr", "hubness"],
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


def test_burrows_delta_ranked_and_positive(spark, sf_dir):
    rows = burrows_delta_matrix(spark, sf_dir).collect()
    assert 0 < len(rows) <= BD_TOPK_PAIRS
    for a, b in zip(rows, rows[1:]):
        assert a["delta_q"] <= b["delta_q"]
    for r in rows:
        assert r["delta_q"] >= 0
        assert r["src_a"] < r["src_b"]


def test_crosscorr_lags_and_best(spark, sf_dir):
    rows = crosscorr_leadlag(spark, sf_dir).collect()
    assert [r["lag_days"] for r in rows] == list(
        range(-CC_MAX_LAG, CC_MAX_LAG + 1)
    )
    bests = [r for r in rows if r["best_flag"]]
    assert len(bests) == 1
    mx = max(abs(r["r_ppm"]) for r in rows)
    assert abs(bests[0]["r_ppm"]) == mx
    for r in rows:
        assert -1_000_000 <= r["r_ppm"] <= 1_000_000
        # longer lags overlap fewer days
        assert r["n_pairs"] <= rows[CC_MAX_LAG]["n_pairs"]


def test_hubness_histogram_conserves_citations(spark, sf_dir):
    rows = hubness_report(spark, sf_dir).collect()
    assert rows
    n_vecs = sum(r["n_vecs"] for r in rows)
    citations = sum(r["k_occurrence"] * r["n_vecs"] for r in rows)
    # every vector hands out exactly HUB_K citations
    assert citations == n_vecs * HUB_K
    for r in rows:
        assert r["k_occurrence"] >= 0 and r["n_vecs"] > 0
