"""Batch 57: MMR rerank, RAKE keywords, c-TF-IDF source terms."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline57 import (
    CTFIDF_SOURCE_TERMS_SQL,
    MMR_K,
    MMR_RERANK_SQL,
    RAKE_KEYWORDS_SQL,
    RAKE_MAX_PHRASE,
    RAKE_STOPWORDS,
    ctfidf_source_terms,
    mmr_rerank_topk,
    rake_keywords,
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
        (mmr_rerank_topk, MMR_RERANK_SQL),
        (rake_keywords, RAKE_KEYWORDS_SQL),
        (ctfidf_source_terms, CTFIDF_SOURCE_TERMS_SQL),
    ],
    ids=["mmr", "rake", "ctfidf"],
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


def test_mmr_greedy_invariants(spark, sf_dir):
    rows = mmr_rerank_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, picks in by_q.items():
        picks.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in picks] == list(range(1, MMR_K + 1))
        ids = [r["neighbor_id"] for r in picks]
        assert len(set(ids)) == MMR_K  # no repeats
        # step 1 is pure relevance; later mmr2 subtracts a max-sim >= 0
        # only when vectors correlate positively, so just pin the report
        # identity: rank-1 mmr2 == rel
        assert picks[0]["mmr2"] == picks[0]["rel"]


def test_mmr_diversifies_planted_duplicates(spark, tmp_path):
    """A query with two IDENTICAL top candidates and one diverse one:
    relevance-only top-2 picks the twins; MMR's second pick must be the
    diverse vector (the twin's max-sim to the selected twin is its own
    self-dot, crushing its marginal score)."""
    q = [1.0] * 4
    twin = [2.0] * 4  # huge mutual dot: picking both twins is penalized
    diverse = [1.0, 1.0, 1.0, -1.0]
    rows = [(0, q, 0), (1, list(twin), 0), (2, list(twin), 0), (3, diverse, 0)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = mmr_rerank_topk(spark, str(tmp_path)).collect()
    mine = sorted(
        (r for r in out if r["query_id"] == 0), key=lambda r: r["rank"]
    )
    assert mine[0]["neighbor_id"] in (1, 2)  # a twin wins on relevance
    assert mine[1]["neighbor_id"] == 3  # MMR swaps in the diverse vector


def test_rake_phrases_exclude_stopwords(spark, sf_dir):
    rows = rake_keywords(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        toks = r["phrase"].split(" ")
        assert 1 <= len(toks) <= RAKE_MAX_PHRASE
        assert not set(toks) & set(RAKE_STOPWORDS)
        assert r["score_ppm"] >= 1_000_000  # a word's degree >= its freq


def test_ctfidf_idf_monotone(spark, sf_dir):
    rows = ctfidf_source_terms(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["score"] == r["tf"] * r["idf_q"]
        assert r["idf_q"] >= 1
    # rarer corpus terms never get a smaller idf than common ones:
    # idf_q is a function of ft alone, so equal terms agree across rows
    seen = {}
    for r in rows:
        assert seen.setdefault(r["term"], r["idf_q"]) == r["idf_q"]
