"""Batch 62: Gini feature ranking, QTE, sorted-neighborhood blocking,
deterministic bootstrap CI."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline62 import (
    BOOT_B,
    GINI_GAIN_SQL,
    HASH_BOOTSTRAP_SQL,
    QTE_SQL,
    SNM_CANDIDATE_SQL,
    SNM_MAX_W,
    gini_gain_feature_rank,
    hash_bootstrap_ci,
    quantile_treatment_effect,
    snm_candidate_pairs,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (gini_gain_feature_rank, GINI_GAIN_SQL),
        (quantile_treatment_effect, QTE_SQL),
        (snm_candidate_pairs, SNM_CANDIDATE_SQL),
        (hash_bootstrap_ci, HASH_BOOTSTRAP_SQL),
    ],
    ids=["gini", "qte", "snm", "bootstrap"],
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


def test_gini_gain_nonnegative_and_bounded(spark, sf_dir):
    rows = gini_gain_feature_rank(spark, sf_dir).collect()
    assert len(rows) == 3
    assert sorted(r["rnk"] for r in rows) == [1, 2, 3]
    for r in rows:
        # Gini of a binary label is at most 0.5
        assert 0 <= r["parent_gini_ppm"] <= 500_000
        assert 0 <= r["weighted_gini_ppm"] <= 500_000
        # splitting never increases impurity (±2 ppm truncation slack)
        assert r["gain_ppm"] >= -2
        assert r["n_values"] >= 2
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["gain_ppm"] >= b["gain_ppm"]


def test_qte_deciles_monotone_within_arm(spark, sf_dir):
    rows = quantile_treatment_effect(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 10))
    for a, b in zip(rows, rows[1:]):
        # quantiles are non-decreasing in the decile within each arm
        assert a["qa_cents"] <= b["qa_cents"]
        assert a["qb_cents"] <= b["qb_cents"]
    for r in rows:
        assert r["qte_cents"] == r["qb_cents"] - r["qa_cents"]
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_snm_recall_curve_monotone(spark, sf_dir):
    rows = snm_candidate_pairs(spark, sf_dir).collect()
    assert [r["w"] for r in rows] == list(range(1, SNM_MAX_W + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["cand_pairs_cum"] < b["cand_pairs_cum"]
        assert a["hits_cum"] <= b["hits_cum"]
        assert a["recall_ppm"] <= b["recall_ppm"]
    for r in rows:
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert r["hits_cum"] <= r["n_truth"]
    # the fixture plants near-identical docs: identical prefixes sort
    # adjacent, so the w=1 window already recalls over half the truth
    assert rows[0]["n_truth"] > 0
    assert rows[0]["recall_ppm"] > 500_000


def test_bootstrap_ci_brackets_median_and_point(spark, sf_dir):
    rows = {r["stat"]: r["value_cents"] for r in hash_bootstrap_ci(spark, sf_dir).collect()}
    assert set(rows) == {"point", "boot_median", "ci_lo", "ci_hi"}
    assert rows["ci_lo"] <= rows["boot_median"] <= rows["ci_hi"]
    # a day-level mean-1 resample stays near the point estimate
    assert rows["ci_lo"] <= rows["point"] <= rows["ci_hi"]
    assert BOOT_B == 32
