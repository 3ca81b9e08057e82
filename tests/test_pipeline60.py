"""Batch 60: unigram encode fertility + PSI drift."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline60 import (
    PSI_DRIFT_SQL,
    UNIGRAM_ENCODE_FERTILITY_SQL,
    psi_drift_report,
    unigram_encode_fertility,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (unigram_encode_fertility, UNIGRAM_ENCODE_FERTILITY_SQL),
        (psi_drift_report, PSI_DRIFT_SQL),
    ],
    ids=["fertility", "psi"],
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


def test_prune_shrinks_vocab_without_fertility_collapse(spark, sf_dir):
    rows = {r["stage"]: r for r in unigram_encode_fertility(spark, sf_dir).collect()}
    a, b = rows["a_seed"], rows["b_pruned"]
    assert b["vocab_size"] < a["vocab_size"]  # the prune really pruned
    # every word still encodes: fertility stays bounded by the
    # character-baseline upper bound (< 12 pieces/word) and cannot be
    # better than 1 piece/word
    for r in (a, b):
        assert 1_000_000 <= r["fertility_ppm"] < 12_000_000
    # the SentencePiece claim, quantified: dropping the bottom quarter
    # of the vocabulary costs < 35% extra pieces
    assert b["total_pieces"] < a["total_pieces"] * 135 // 100


def test_psi_terms_sum_and_flag(spark, sf_dir):
    rows = psi_drift_report(spark, sf_dir).collect()
    assert rows
    total = rows[0]["psi_total_q"]
    assert all(r["psi_total_q"] == total for r in rows)
    assert sum(r["psi_term_q"] for r in rows) == total
    for r in rows:
        assert r["psi_term_q"] >= 0
        assert bool(r["drift_flag"]) == (total > 200_000)
        # a stable category (equal shares) contributes zero
        if r["ref_ppm"] == r["cur_ppm"]:
            assert r["psi_term_q"] == 0
