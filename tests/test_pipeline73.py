"""Batch 73: rank-based effect sizes, paired tests, RRF fusion,
embedding centroid drift (rrf_fusion_topk already ships in
pipeline28 — batch 73 deliberately does NOT duplicate it)."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline73 import (
    CLIFFS_DELTA_SQL,
    EMB_CENTROID_DRIFT_SQL,
    HODGES_LEHMANN_SQL,
    SIGN_TEST_SQL,
    WILCOXON_SQL,
    cliffs_delta_arms,
    embedding_centroid_drift,
    hodges_lehmann_shift,
    sign_test_paired,
    wilcoxon_signed_rank,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (cliffs_delta_arms, CLIFFS_DELTA_SQL),
        (wilcoxon_signed_rank, WILCOXON_SQL),
        (sign_test_paired, SIGN_TEST_SQL),
        (hodges_lehmann_shift, HODGES_LEHMANN_SQL),
        (embedding_centroid_drift, EMB_CENTROID_DRIFT_SQL),
    ],
    ids=["cliffs", "wilcoxon", "sign", "hodges_lehmann", "centroid"],
)
def test_cross_engine_hash_sf0001(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, sql)
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)


def test_cliffs_delta_pair_identity(spark, sf_dir):
    """gt + lt + ties = n_a·n_b, and delta matches the definition."""
    r = cliffs_delta_arms(spark, sf_dir).collect()[0]
    assert 0 <= r["gt_pairs"] and 0 <= r["lt_pairs"]
    assert r["gt_pairs"] + r["lt_pairs"] <= r["n_a"] * r["n_b"]
    want = (r["gt_pairs"] - r["lt_pairs"]) * 1_000_000
    # Spark div truncates toward zero, like the operator
    assert r["delta_ppm"] == int(want / (r["n_a"] * r["n_b"]))
    assert -1_000_000 <= r["delta_ppm"] <= 1_000_000


def test_wilcoxon_and_sign_agree_on_direction(spark, sf_dir):
    w = wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    s = sign_test_paired(spark, sf_dir).collect()[0]
    assert w["n_eff"] == s["m_nonzero"]
    # both z's signed the same way (or one of them is zero)
    assert (
        w["z_milli"] == 0
        or s["z_milli"] == 0
        or (w["z_milli"] > 0) == (s["z_milli"] > 0)
    )
    # W2+ bounded by twice the total rank sum
    assert 0 <= w["w2_plus"] <= 2 * w["e2"]


def test_hodges_lehmann_within_range(spark, sf_dir):
    r = hodges_lehmann_shift(spark, sf_dir).collect()[0]
    assert r["n_pairs"] == r["n_era1"] * r["n_era2"]


def test_centroid_drift_self_consistency(spark, sf_dir):
    rows = embedding_centroid_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cos_ppm"] <= 1_100_000  # isqrt floors can nudge >1e6
        assert (r["cos_ppm"] > 900_000) == bool(r["stable_flag"])
        assert r["n_even"] + r["n_odd"] > 0
