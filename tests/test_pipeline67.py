"""Batch 67: naive Bayes eval, Mahalanobis outliers, weighted Jaccard."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline67 import (
    MAHA_TOPK,
    MAHALANOBIS_SQL,
    NAIVE_BAYES_SQL,
    WEIGHTED_JACCARD_SQL,
    WJ_TOPK,
    mahalanobis_outliers,
    naive_bayes_source_eval,
    weighted_jaccard_pairs,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (naive_bayes_source_eval, NAIVE_BAYES_SQL),
        (mahalanobis_outliers, MAHALANOBIS_SQL),
        (weighted_jaccard_pairs, WEIGHTED_JACCARD_SQL),
    ],
    ids=["nb", "maha", "wjaccard"],
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


def test_nb_confusion_consistency(spark, sf_dir):
    rows = naive_bayes_source_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_test"]
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert r["accuracy_ppm"] == r["n_correct"] * 1_000_000 // r["n_test"]
        # a fully-correct class has no confusion to name
        if r["n_correct"] == r["n_test"]:
            assert r["top_confusion"] == "-"
        else:
            assert r["top_confusion"] != r["true_source"]


def test_mahalanobis_topk_shape(spark, sf_dir):
    rows = mahalanobis_outliers(spark, sf_dir).collect()
    assert rows
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
        assert r["score_q"] > 0
    for label, rs in by_label.items():
        assert [r["rnk"] for r in sorted(rs, key=lambda r: r["rnk"])] == list(
            range(1, len(rs) + 1)
        )
        assert len(rs) <= MAHA_TOPK
        rs.sort(key=lambda r: r["rnk"])
        for a, b in zip(rs, rs[1:]):
            assert a["score_q"] >= b["score_q"]


def test_weighted_jaccard_ranked(spark, sf_dir):
    rows = weighted_jaccard_pairs(spark, sf_dir).collect()
    assert 0 < len(rows) <= WJ_TOPK
    for a, b in zip(rows, rows[1:]):
        assert a["jw_ppm"] >= b["jw_ppm"]
    for r in rows:
        assert 0 < r["inter_w"] <= r["union_w"]
        assert r["jw_ppm"] == r["inter_w"] * 1_000_000 // r["union_w"]
        assert r["doc_a"] < r["doc_b"]
    # the fixture's planted near-identical pairs survive IDF weighting
    assert rows[0]["jw_ppm"] > 900_000
