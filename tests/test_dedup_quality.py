"""Semantic quality checks for the dedup/similarity operators (beyond
oracle equality): MinHash-LSH recall vs exact Jaccard ground truth,
SimHash collision behavior, LSH-ANN recall vs brute force."""

from pyspark.sql import functions as F

from oracledb_datapump_spark.operators import dedup as D
from oracledb_datapump_spark.operators import similarity as S


def test_minhash_finds_true_near_dups(spark, sf_dir):
    """Every pair with exact 3-gram Jaccard ≥ 0.9 must be recalled by the
    banded MinHash (16 hashes, 4×4 bands ⇒ P(recall) ≈ 1 at J≥0.9)."""
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_ngram_jaccard(spark, sf_dir).filter(
            F.col("jaccard") >= 0.9
        ).collect()
    }
    found = {
        (r.doc_a, r.doc_b) for r in D.dedup_minhash_pairs(spark, sf_dir).collect()
    }
    assert truth, "fixture should contain planted near-duplicates"
    missed = truth - found
    assert not missed, f"MinHash missed true near-dups: {missed}"


def test_simhash_near_dups_collide(spark, sf_dir):
    """Docs with identical token sets (the planted dups) get identical
    simhash fingerprints."""
    jac = D.dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") == 1.0)
    sh = D.simhash_fingerprints(spark, sf_dir)
    pairs = (
        jac.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "sh_b"), "doc_b")
    )
    bad = pairs.filter(F.col("sh_a") != F.col("sh_b")).count()
    assert bad == 0


def test_lsh_ann_recall(spark, sf_dir):
    """Multi-probe LSH top-k must recall most of brute-force top-k
    (4 tables × 4 bits with Hamming-1 query probes → ~0.9 measured)."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id) for r in S.ann_lsh_topk(spark, sf_dir).collect()
    }
    assert brute
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.7, f"LSH recall collapsed: {recall:.2f}"


def test_exact_dedup_keeps_min_doc_id(spark, sf_dir):
    rows = D.dedup_exact(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.dup_count for r in rows) == n_docs
    assert all(r.dup_count >= 1 for r in rows)


def test_dedup_groups_transitive_chain(spark, tmp_path):
    """a~b and b~c (but a,c share fewer shingles) must still land in one
    group: connected components close the chain pairwise dedup misses."""
    core = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    extras = "uniform victor whiskey xray yankee zulu maple cedar".split()
    # doc_k = core + first k extra words: adjacent J = (10+k)/(11+k) >= 0.91
    # (always LSH-recalled), ends J = 10/18 = 0.56 < 0.6 (transitive only)
    chain = [(k, " ".join([core] + extras[:k])) for k in range(9)]
    rows = chain + [
        (i, f"totally unrelated document number {i} with its own words "
            f"about topic {i * 7} and nothing shared") for i in range(9, 30)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    verified = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_minhash_verified(spark, str(tmp_path)).collect()
    }
    # precondition: the fixture's adjacent edges are all LSH-recalled and
    # its ends are not directly paired (fails loudly if dedup constants move)
    assert all((k, k + 1) in verified for k in range(8)), verified
    assert (0, 8) not in verified, "chain ends must only connect transitively"
    out = {r.doc_id: (r.group_id, r.group_size)
           for r in D.dedup_groups(spark, str(tmp_path)).collect()}
    assert all(out[k] == (0, 9) for k in range(9)), out
    assert out[15] == (15, 1)


def test_quadratic_guard_blocks_large_inputs(spark, sf_dir, monkeypatch):
    """The O(n²) verification baselines must refuse oversized inputs
    unless verification=True — nothing else stops a 100 TB invocation
    from launching a quadratic job (VERDICT r4 #4)."""
    import pytest

    from oracledb_datapump_spark.exceptions import UsageError

    monkeypatch.setattr(D, "QUADRATIC_GUARD_MAX_ROWS", 10)
    with pytest.raises(UsageError, match="O\\(n\\^2\\)"):
        D.dedup_embedding_cosine(spark, sf_dir)
    with pytest.raises(UsageError, match="dedup_minhash_verified"):
        D.dedup_ngram_jaccard(spark, sf_dir)
    # verification=True forces the quadratic plan through unchanged
    assert D.dedup_embedding_cosine(spark, sf_dir, verification=True).count() > 0


def test_minhash_hot_bucket_cap(spark, tmp_path):
    """max_bucket_size drops boilerplate mega-buckets: 20 identical
    documents form one bucket per band; with the cap their 190 pairs
    disappear while a genuinely-similar distinct pair survives."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(20)]
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows += [(100, dup), (101, dup)]  # size-2 bucket: must survive the cap
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_minhash_pairs(spark, str(tmp_path)).collect()
    }
    assert (0, 1) in uncapped  # boilerplate pairs present without a cap
    capped = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_minhash_pairs(
            spark, str(tmp_path), max_bucket_size=10
        ).collect()
    }
    assert all(a >= 100 for a, _ in capped), capped  # boilerplate dropped
    assert (100, 101) in capped  # real near-dup pair survives the cap


def test_tfidf_max_df_prunes_stopword_postings(spark, tmp_path):
    """max_df drops stopword-frequency postings from the inverted index:
    a token in every document stops contributing matches, while rare
    tokens still rank. Corpus: 25 docs sharing 'common'; two of the
    query docs additionally share 'rare'."""
    from oracledb_datapump_spark.operators import sparse_text as SX

    rows = [(i, f"common filler{i} noise{i}") for i in range(2, 25)]
    rows += [(0, "common rare alpha"), (1, "common rare beta")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    capped = SX.tfidf_search_topk(spark, str(tmp_path), max_df=5).collect()
    pairs = {(r.query_doc, r.match_doc) for r in capped}
    # with 'common' pruned (df=25 > 5), docs 0 and 1 still match via 'rare'
    assert (0, 1) in pairs and (1, 0) in pairs, pairs
    # docs with ONLY stopword overlap produce no matches at all
    assert all(q in (0, 1) and m in (0, 1) for q, m in pairs), pairs


def test_ann_index_export_import_identical(spark, sf_dir, tmp_path):
    """An exported LSH index must answer queries identically to the
    direct path (zero signature recompute), and a parameter-mismatched
    index must be rejected loudly rather than probed."""
    import json
    import os

    import pytest

    from oracledb_datapump_spark.exceptions import UsageError

    idx = str(tmp_path / "ann_idx")
    meta = S.export_ann_index(spark, sf_dir, idx)
    assert meta["tables"] == S.LSH_TABLES and meta["bits"] == S.LSH_BITS

    direct = [tuple(r) for r in S.ann_lsh_topk(spark, sf_dir).collect()]
    via_index = [
        tuple(r) for r in S.ann_lsh_topk_from_index(spark, sf_dir, idx).collect()
    ]
    assert direct == via_index and len(direct) > 0

    # drifted parameters → loud rejection
    mpath = os.path.join(idx, S.INDEX_MANIFEST)
    m = json.load(open(mpath))
    m["bits"] = 99
    json.dump(m, open(mpath, "w"))
    with pytest.raises(UsageError, match="wrong bucket space"):
        S.load_ann_index(spark, idx)


def test_ann_index_rejects_foreign_corpus(spark, sf_dir, tmp_path):
    """An index built from corpus A must refuse to serve queries against
    corpus B: the vec_id join against a different embeddings table would
    probe stale buckets and return plausible-but-wrong neighbors with no
    error (the manifest records `source` exactly for this drift)."""
    import pytest

    from oracledb_datapump_spark.exceptions import UsageError

    idx = str(tmp_path / "ann_idx_src")
    S.export_ann_index(spark, sf_dir, idx)
    with pytest.raises(UsageError, match="rebuild the index for this corpus"):
        S.ann_lsh_topk_from_index(spark, "/root/testdata/sf0.01", idx)
    # the matching corpus still loads fine
    assert S.ann_lsh_topk_from_index(spark, sf_dir, idx).count() > 0


def test_quadratic_guard_covers_mcnemar(spark, sf_dir, monkeypatch):
    """mcnemar_dedup_agreement's near side is the same shared-shingle
    all-pairs join the baselines guard — it must carry the identical
    pre-flight (VERDICT r15: docstring claimed the guard without
    calling it)."""
    import pytest

    from oracledb_datapump_spark.exceptions import UsageError
    from oracledb_datapump_spark.operators import pipeline72 as PL72

    monkeypatch.setattr(D, "QUADRATIC_GUARD_MAX_ROWS", 10)
    with pytest.raises(UsageError, match="mcnemar_dedup_agreement"):
        PL72.mcnemar_dedup_agreement(spark, sf_dir)
    assert (
        PL72.mcnemar_dedup_agreement(spark, sf_dir, verification=True).count()
        == 1
    )
