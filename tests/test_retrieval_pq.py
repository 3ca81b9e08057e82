"""Semantic properties of the round-5 retrieval/PQ/curation operators —
the hash-parity harness (test_queries_oracle) proves cross-engine
equality; these prove the numbers MEAN what the docstrings claim."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bm25_prefers_self_similar_docs(spark):
    """Every query's top-1 BM25 match must score >= its rank-5 match,
    ranks are dense 1..k, and scores are non-negative."""
    from oracledb_datapump_spark.operators.sparse_text import bm25_search_topk

    rows = bm25_search_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_doc, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_q for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0 for s in scores)


def test_dsir_importance_separates_target_language(spark):
    """Mean importance of target-language (en) docs must exceed the
    non-target mean — the whole point of importance resampling."""
    from oracledb_datapump_spark.operators.textprep import dsir_importance
    from oracledb_datapump_spark.operators.docs_source import load_docs

    w = dsir_importance(spark, SF)
    langs = load_docs(spark, SF).select("doc_id", "lang")
    j = w.join(langs, "doc_id").select(
        (F.col("lang") == "en").alias("is_en"),
        (F.col("logratio_q").cast("double") / F.col("n_feats")).alias("per_feat"),
    )
    means = {
        r.is_en: r.m
        for r in j.groupBy("is_en").agg(F.avg("per_feat").alias("m")).collect()
    }
    assert means[True] > means[False]


def test_pq_codes_within_range_and_recon_err_nonneg(spark):
    from oracledb_datapump_spark.operators import pq as PQ

    rows = PQ.embedding_pq_codes(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        for m in range(PQ.PQ_M):
            assert 0 <= r[f"code_{m}"] < PQ.PQ_K
        assert r.recon_err >= 0


def test_pq_adist_equals_lut_reconstruction(spark):
    """ann_pq_topk's adist for a (query, match) pair must equal the
    direct sum of subspace distances from query to the match's assigned
    codewords — i.e. the LUT join computes what PQ defines."""
    from oracledb_datapump_spark.operators import pq as PQ

    books = PQ._fit_codebooks(spark, SF)
    q = {r.vec_id: list(r.qv) for r in PQ._quantized(spark, SF).collect()}
    codes = {
        r.vec_id: [r[f"code_{m}"] for m in range(PQ.PQ_M)]
        for r in PQ.embedding_pq_codes(spark, SF).collect()
    }
    top = PQ.ann_pq_topk(spark, SF).collect()
    for r in top[:20]:
        expect = 0
        for m in range(PQ.PQ_M):
            cv = books[(m, codes[r.match_id][m])]
            sub = q[r.query_id][m * PQ.PQ_SUB : (m + 1) * PQ.PQ_SUB]
            expect += sum((a - b) * (a - b) for a, b in zip(sub, cv))
        assert r.adist == expect


def test_ivfpq_results_subset_of_probed_clusters(spark):
    """Every IVF-PQ match must belong to a cluster its query probed."""
    from oracledb_datapump_spark.operators import pq as PQ
    from oracledb_datapump_spark.operators.clustering import kmeans_assign

    assign = {
        r.vec_id: r.cluster for r in kmeans_assign(spark, SF).collect()
    }
    top = PQ.ann_ivfpq_topk(spark, SF).collect()
    assert len(top) > 0
    # reconstruct probes: nprobe nearest coarse centroids per query
    from oracledb_datapump_spark.operators.clustering import _fit_centroids

    cents = _fit_centroids(spark, SF)
    qv = {r.vec_id: list(r.qv) for r in PQ._quantized(spark, SF).collect()}
    for r in top:
        dists = sorted(
            (
                sum((a - b) * (a - b) for a, b in zip(qv[r.query_id], cv)),
                cid,
            )
            for cid, cv in cents
        )
        probed = {cid for _, cid in dists[: PQ.IVFPQ_NPROBE]}
        assert assign[r.match_id] in probed


def test_pq_recall_bounds_and_ivfpq_no_better_than_pq(spark):
    """recall_ppm in [0, 1e6]; IVF-PQ returns a subset of clusters so a
    query's IVF-PQ hit set cannot exceed its full-PQ-scan top-k pool in
    size."""
    from oracledb_datapump_spark.operators import pq as PQ

    rec = PQ.ann_pq_recall(spark, SF).collect()
    assert all(0 <= r.recall_ppm <= 1_000_000 for r in rec)
    full = PQ.ann_pq_topk(spark, SF).groupBy("query_id").count().collect()
    ivf = PQ.ann_ivfpq_topk(spark, SF).groupBy("query_id").count().collect()
    fmap = {r.query_id: r["count"] for r in full}
    for r in ivf:
        assert r["count"] <= fmap[r.query_id]


def test_retrieval_mrr_consistency(spark):
    """rr_ppm must be exactly 1e6 // first_rel_rank when a hit exists
    and 0 otherwise; n_rel bounded by top-k."""
    from oracledb_datapump_spark.operators.evaluation import retrieval_eval_mrr
    from oracledb_datapump_spark.operators.sparse_text import BM25_TOP_K

    for r in retrieval_eval_mrr(spark, SF).collect():
        assert 0 <= r.n_rel_topk <= BM25_TOP_K
        if r.first_rel_rank > 0:
            assert r.rr_ppm == 1_000_000 // r.first_rel_rank
        else:
            assert r.rr_ppm == 0 and r.n_rel_topk == 0


def test_bigram_surprise_flags_rare_sequences(spark):
    """A doc of one repeated bigram must score lower per-token surprise
    than the corpus mean (its continuation is maximally predictable)."""
    from oracledb_datapump_spark.operators.textstats import bigram_surprise
    from oracledb_datapump_spark.operators.docs_source import load_docs

    docs = load_docs(spark, SF).select("doc_id", "text").limit(50)
    rep = spark.createDataFrame(
        [(100000, "alpha beta " * 40, "en", "srcX", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).select("doc_id", "text")
    out = bigram_surprise(
        spark, SF, docs=docs.unionByName(rep).withColumn("lang", F.lit("en"))
    ).collect()
    per = {r.doc_id: r.surprise2_per_tok_q for r in out}
    others = [v for k, v in per.items() if k != 100000]
    assert per[100000] < sum(others) / len(others)


def test_source_quality_report_totals(spark):
    """Per-source doc counts must sum to the corpus size and pass_ppm
    stays within [0, 1e6]."""
    from oracledb_datapump_spark.operators.evaluation import (
        source_quality_report,
    )
    from oracledb_datapump_spark.operators.docs_source import load_docs

    rows = source_quality_report(spark, SF).collect()
    n = load_docs(spark, SF).count()
    assert sum(r.n_docs for r in rows) == n
    assert all(0 <= r.pass_ppm <= 1_000_000 for r in rows)


def test_pq_fit_drops_emptied_codes_like_sql_twin(spark, tmp_path):
    """If an init code wins zero vectors (vec 1 duplicates vec 0, so the
    lowest-cid tie-break starves code 1 in iteration 1), the Spark fit
    must DROP it — exactly as the SQL twin's update CTE has no row for
    it — and the cross-engine hash must still match. Regression: the fit
    once updated the book in place, retaining stale init centroids for
    emptied codes that DuckDB had dropped."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    from oracledb_datapump_spark.operators import pq as PQ

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 64)).astype(np.float32)
    vecs[1] = vecs[0]  # code 1's init == code 0's init → code 1 empties
    tbl = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 40, pa.int32()),
        }
    )
    papq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    sf_dir = str(tmp_path)
    PQ._CODEBOOK_CACHE.pop((spark.sparkContext.applicationId, sf_dir), None)

    books = PQ._fit_codebooks(spark, sf_dir)
    # the starved code must be gone from at least one subspace book
    assert any((m, 1) not in books for m in range(PQ.PQ_M)), sorted(books)

    sdf = PQ.embedding_pq_codes(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    odf = con.sql(PQ.EMBEDDING_PQ_CODES_SQL).df()
    cols = list(sdf.columns)
    s2 = sdf.sort_values(cols).reset_index(drop=True)
    o2 = odf[cols].astype(sdf.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    assert s2.equals(o2)


def test_pq_index_export_import_identical(spark, tmp_path):
    """An exported PQ index must answer asymmetric top-k identically to
    the direct path (zero corpus re-encode), and parameter-drifted /
    foreign-corpus indexes must be rejected loudly (same contracts as
    the LSH index lifecycle)."""
    import json
    import os

    import pytest

    from oracledb_datapump_spark.exceptions import UsageError
    from oracledb_datapump_spark.operators import pq as PQ

    sf_dir = "/root/testdata/sf0.001"
    idx = str(tmp_path / "pq_idx")
    meta = PQ.export_pq_index(spark, sf_dir, idx)
    assert meta["m"] == PQ.PQ_M and meta["k"] == PQ.PQ_K
    assert len(meta["codebooks"]) <= PQ.PQ_M * PQ.PQ_K

    direct = [tuple(r) for r in PQ.ann_pq_topk(spark, sf_dir).collect()]
    via = [
        tuple(r)
        for r in PQ.ann_pq_topk_from_index(spark, sf_dir, idx).collect()
    ]
    assert direct == via and len(direct) > 0

    # foreign corpus → loud rejection
    with pytest.raises(UsageError, match="rebuild the index for this corpus"):
        PQ.ann_pq_topk_from_index(spark, "/root/testdata/sf0.01", idx)

    # drifted parameters → loud rejection
    mpath = os.path.join(idx, PQ.PQ_INDEX_MANIFEST)
    m = json.load(open(mpath))
    m["k"] = 99
    json.dump(m, open(mpath, "w"))
    with pytest.raises(UsageError, match="codebook geometry"):
        PQ.load_pq_index(spark, idx)


def test_pq_index_roundtrip_survives_artifact_removal(spark):
    """pq_index_roundtrip materializes before deleting its temp dir —
    the returned frame must stay collectable afterwards and equal the
    direct search."""
    from oracledb_datapump_spark.operators import pq as PQ

    sf_dir = "/root/testdata/sf0.001"
    rt = PQ.pq_index_roundtrip(spark, sf_dir)
    got = [tuple(r) for r in rt.collect()]
    want = [tuple(r) for r in PQ.ann_pq_topk(spark, sf_dir).collect()]
    assert got == want and len(got) > 0
