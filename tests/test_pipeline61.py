"""Batch 61: KS drift, embedding isotropy, UCB1 allocation, greedy
max-coverage selection."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline61 import (
    COVERAGE_STEPS,
    EMBEDDING_ISOTROPY_SQL,
    GREEDY_COVERAGE_SQL,
    KS_TWO_SAMPLE_SQL,
    UCB_ALLOCATION_SQL,
    embedding_isotropy_report,
    greedy_coverage_select,
    ks_two_sample_drift,
    ucb_allocation_plan,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (ks_two_sample_drift, KS_TWO_SAMPLE_SQL),
        (embedding_isotropy_report, EMBEDDING_ISOTROPY_SQL),
        (ucb_allocation_plan, UCB_ALLOCATION_SQL),
        (greedy_coverage_select, GREEDY_COVERAGE_SQL),
    ],
    ids=["ks", "isotropy", "ucb", "coverage"],
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


def test_ks_statistic_bounds_and_flag(spark, sf_dir):
    rows = ks_two_sample_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # D ∈ [0, 1] in the cross-multiplied form
        assert 0 <= r["d_cross"] <= r["n_ref"] * r["n_cur"]
        assert 0 <= r["ks_ppm"] <= 1_000_000
        assert r["crit_ppm"] > 0
        assert bool(r["drift_flag"]) == (r["ks_ppm"] > r["crit_ppm"])


def test_isotropy_dominant_axis_and_range(spark, sf_dir):
    rows = embedding_isotropy_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # cosine average is a cosine
        assert -1_000_000 <= r["mean_pair_cos_ppm"] <= 1_000_000
        assert 0 <= r["dominant_dim"] < 64
        # the argmax axis holds at least the uniform share of Σ|S_d|
        assert r["dominant_share_ppm"] >= 1_000_000 // 64
        assert r["n_vecs"] >= 2


def test_ucb_order_and_bonus_monotone(spark, sf_dir):
    rows = ucb_allocation_plan(spark, sf_dir).collect()
    assert rows
    assert sorted(r["alloc_rank"] for r in rows) == list(
        range(1, len(rows) + 1)
    )
    by_rank = sorted(rows, key=lambda r: r["alloc_rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["ucb_ppm"] >= b["ucb_ppm"]
    for r in rows:
        assert r["ucb_ppm"] == r["mean_ppm"] + r["bonus_ppm"]
    # the exploration bonus shrinks as an arm gets pulled more
    by_n = sorted(rows, key=lambda r: r["n_trials"])
    for a, b in zip(by_n, by_n[1:]):
        if a["n_trials"] < b["n_trials"]:
            assert a["bonus_ppm"] >= b["bonus_ppm"]


def test_greedy_coverage_submodular(spark, sf_dir):
    rows = greedy_coverage_select(spark, sf_dir).collect()
    assert len(rows) == COVERAGE_STEPS
    assert [r["step"] for r in rows] == list(range(1, COVERAGE_STEPS + 1))
    # greedy marginal gains are non-increasing (submodularity)
    for a, b in zip(rows, rows[1:]):
        assert a["gain"] >= b["gain"]
    # covered_cum is exactly the running sum of gains, strictly growing
    run = 0
    for r in rows:
        run += r["gain"]
        assert r["covered_cum"] == run
        assert r["gain"] > 0
    # no document picked twice
    assert len({r["doc_id"] for r in rows}) == COVERAGE_STEPS
