"""Batch 58: Kneser-Ney smoothing, Fellegi-Sunter weights, Adamic-Adar
link prediction, randomized-response debiasing."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline58 import (
    AA_DEG_CAP,
    AA_DEG_MIN,
    ADAMIC_ADAR_SQL,
    FELLEGI_SUNTER_SQL,
    KNESER_NEY_BIGRAM_SQL,
    RANDOMIZED_RESPONSE_SQL,
    adamic_adar_linkpred,
    fellegi_sunter_weights,
    kneser_ney_bigram_ppm,
    randomized_response_debias,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "lineitem", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (kneser_ney_bigram_ppm, KNESER_NEY_BIGRAM_SQL),
        (fellegi_sunter_weights, FELLEGI_SUNTER_SQL),
        (adamic_adar_linkpred, ADAMIC_ADAR_SQL),
        (randomized_response_debias, RANDOMIZED_RESPONSE_SQL),
    ],
    ids=["kn", "fs", "aa", "rr"],
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


def test_kn_probabilities_bounded_and_discounted(spark, sf_dir):
    rows = kneser_ney_bigram_ppm(spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        assert 0 < r["p_kn_ppm"] <= 1_000_000
        assert r["c_vw"] >= 1
    # counts are reported in rank order
    counts = [r["c_vw"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_fs_weights_reflect_field_selectivity(spark, sf_dir):
    rows = {r["field"]: r for r in fellegi_sunter_weights(spark, sf_dir).collect()}
    assert set(rows) == {"lang", "source", "len_band", "prefix8"}
    for r in rows.values():
        assert 0 <= r["m_ppm"] <= 1_000_000
        assert 0 < r["u_ppm"] <= 1_000_000
    # the high-cardinality prefix field separates matches from random
    # pairs far more strongly than any low-cardinality field
    assert rows["prefix8"]["weight_q"] > rows["lang"]["weight_q"]
    assert rows["prefix8"]["weight_q"] > rows["source"]["weight_q"]


def test_aa_scores_respect_degree_band(spark, sf_dir):
    rows = adamic_adar_linkpred(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    lo = 1_000_000 // AA_DEG_CAP.bit_length()
    hi = 1_000_000 // AA_DEG_MIN.bit_length()
    for r in rows:
        assert r["cust_a"] < r["cust_b"]
        assert r["n_common"] >= 1
        # each shared part contributes within the capped-degree band
        assert r["n_common"] * lo <= r["aa_q"] <= r["n_common"] * hi


def test_rr_estimator_is_unbiased_in_total_and_deterministic(spark, sf_dir):
    df1 = randomized_response_debias(spark, sf_dir).toPandas()
    df2 = randomized_response_debias(spark, sf_dir).toPandas()
    assert df1.equals(df2)  # hash-derived noise: a pure function
    k = len(df1)
    assert abs(df1.est_ppm.sum() - 1_000_000) <= k  # shares resum to 1
    assert df1.true_ppm.sum() <= 1_000_000
    # the mechanism really perturbed something (obs != true somewhere)
    assert (df1.obs_ppm != df1.true_ppm).any()
