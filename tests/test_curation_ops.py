"""Semantic properties of the round-5 curation/budget/streaming-vector
operators (hash parity is covered by test_queries_oracle)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_budget_mix_plan_respects_budget_and_caps(spark):
    """No source is allocated more than it has; the total allocation
    never exceeds the global budget; small sources are fully taken."""
    from oracledb_datapump_spark.operators.evaluation import (
        BUDGET_DEN,
        BUDGET_NUM,
        budget_mix_plan,
    )

    rows = budget_mix_plan(spark, SF).collect()
    total_tokens = sum(r.n_tokens for r in rows)
    budget = (total_tokens * BUDGET_NUM) // BUDGET_DEN
    assert all(r.alloc_tokens <= r.n_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) <= budget
    # water-filling property: any source allocated below its size must
    # be at the (single) waterline — all capped sources get equal alloc
    capped = {r.alloc_tokens for r in rows if r.alloc_tokens < r.n_tokens}
    assert len(capped) <= 1


def test_contrastive_negatives_are_not_duplicates(spark):
    from oracledb_datapump_spark.operators.dedup import (
        contrastive_pairs,
        dedup_minhash_verified,
    )

    dups = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_verified(spark, SF).collect()
    }
    trips = contrastive_pairs(spark, SF).collect()
    assert len(trips) > 0
    for t in trips:
        assert (t.anchor, t.positive) in dups
        key = (min(t.anchor, t.negative), max(t.anchor, t.negative))
        assert key not in dups
        assert t.negative not in (t.anchor, t.positive)


def test_tokenizer_fertility_at_least_one(spark):
    """Every word yields at least one BPE-ish subtoken, so fertility_q
    >= 1000 for every language."""
    from oracledb_datapump_spark.operators.textstats import tokenizer_fertility

    rows = tokenizer_fertility(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.fertility_q >= 1000 for r in rows)


def test_source_overlap_matrix_totals(spark):
    """Matrix cells sum to the total number of verified pairs and are
    upper-triangular by source name."""
    from oracledb_datapump_spark.operators.dedup import (
        dedup_minhash_verified,
        source_overlap_matrix,
    )

    n_pairs = dedup_minhash_verified(spark, SF).count()
    rows = source_overlap_matrix(spark, SF).collect()
    assert sum(r.n_pairs for r in rows) == n_pairs
    assert all(r.source_a <= r.source_b for r in rows)


def test_streaming_pq_codes_matches_batch(spark):
    """The two-cycle streaming sink equals batch embedding_pq_codes
    row-for-row (the incremental-encode correctness claim)."""
    from oracledb_datapump_spark.operators.pq import embedding_pq_codes
    from oracledb_datapump_spark.streaming.vectors import streaming_pq_codes

    batch = {r.vec_id: tuple(r) for r in embedding_pq_codes(spark, SF).collect()}
    stream = {r.vec_id: tuple(r) for r in streaming_pq_codes(spark, SF).collect()}
    assert batch == stream


def test_bigram_surprise_counts(spark):
    """n_bigrams equals n_tokens - 1 for every doc with >= 2 tokens."""
    from oracledb_datapump_spark.operators.textstats import (
        bigram_surprise,
        token_count,
    )
    from oracledb_datapump_spark.functions.text import tokens
    from oracledb_datapump_spark.operators.docs_source import load_docs

    d = load_docs(spark, SF).select(
        "doc_id", F.size(tokens("text")).alias("n_toks")
    )
    bs = bigram_surprise(spark, SF).select("doc_id", "n_bigrams")
    j = {r.doc_id: (r.n_toks, r.n_bigrams)
         for r in d.join(bs, "doc_id").selectExpr(
             "doc_id", "n_toks", "n_bigrams").collect()}
    for doc_id, (n_toks, n_bigrams) in j.items():
        assert n_bigrams == n_toks - 1, doc_id


def test_minhash_estimate_accuracy_bounds(spark):
    """Estimates and exact Jaccard both in [0, 1e6]; est quantized to
    sixteenths; err = est - exact identically."""
    from oracledb_datapump_spark.operators.dedup import (
        NUM_HASHES,
        minhash_estimate_accuracy,
    )

    rows = minhash_estimate_accuracy(spark, SF).collect()
    assert len(rows) > 0
    sixteenths = {(k * 1_000_000) // NUM_HASHES for k in range(NUM_HASHES + 1)}
    for r in rows:
        assert 0 <= r.est_ppm <= 1_000_000 and r.est_ppm in sixteenths
        assert 0 <= r.exact_ppm <= 1_000_000
        assert r.err_ppm == r.est_ppm - r.exact_ppm


def test_quality_calibration_partitions_corpus(spark):
    """Deciles 1..10 cover every doc once; score ranges are ordered and
    non-overlapping across deciles."""
    from oracledb_datapump_spark.operators.evaluation import (
        CALIB_TILES,
        quality_calibration,
    )
    from oracledb_datapump_spark.operators.docs_source import load_docs

    rows = sorted(quality_calibration(spark, SF).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, CALIB_TILES + 1))
    assert sum(r.n_docs for r in rows) == load_docs(spark, SF).count()
    for a, b in zip(rows, rows[1:]):
        assert a.min_score_q <= a.max_score_q <= b.min_score_q
