"""Corpus curation: the end-to-end training-data pipeline stage, composed
from the text/dedup operators — the flagship "what this engine is for at
100 TB" query.

    documents
      → quality gate   (length/diversity heuristics, textstats)
      → language gate  (stopword-argmax lang-id)
      → near-dup drop  (MinHash-LSH candidates → exact Jaccard ≥ τ;
                        greedy survivor = lowest doc_id in each pair)
      → curated corpus

Everything stays declarative; the dedup arm reuses the LSH-bounded exact
verification (dedup.dedup_minhash_verified), so the expensive check never
runs on more than the candidate pairs. Oracle twin composes the same CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DEDUP_MINHASH_VERIFIED_SQL, verified_pairs_cached
from .textstats import LANG_ID_SQL, QUALITY_SQL, lang_id, quality_score

MIN_QUALITY = 0.5
KEEP_LANG = "en"


def _shared_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE persisted documents frame fed to every pipeline arm, so the
    corpus is scanned once per curation run instead of once per arm
    (the r2/r3 plan audit counted 15 scans for v2's 7 arms). persist()
    is lazy — the first arm's execution populates the cache and the
    rest read InMemoryRelation; MEMORY_AND_DISK spills rather than
    recomputes at 100 TB, and eviction degrades to a re-scan, never a
    wrong answer.

    The persist is SESSION-LIVED by design (there is no safe point to
    unpersist inside a lazily-evaluated query); later documents queries
    in the same session read the cache, which is a perf win in a shared
    session. Measurement harnesses that need parquet-true timings/plans
    per query (bench.py, tools/plan_audit.py) call
    ``spark.catalog.clearCache()`` between queries."""
    from pyspark import StorageLevel

    from .docs_source import load_docs

    return load_docs(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)


def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, quality_score, lang_pred): documents that pass
    the quality gate, are predicted {KEEP_LANG}, and are not the dropped
    side of a verified near-duplicate pair."""
    base = _shared_docs(spark, sf_dir)
    q = quality_score(spark, sf_dir, docs=base).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lng = lang_id(spark, sf_dir, docs=base).select("doc_id", "lang_pred")
    dup_losers = (
        # base is the FULL corpus (persisted, not filtered), so the
        # driver-memoized default-docs pair list is semantically
        # identical — riding it removes the whole LSH+verify arm from
        # this plan (r6: ~1-2s/query at sf0.1, one fewer corpus pass)
        verified_pairs_cached(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        q.join(lng, "doc_id")
        .filter(
            (F.col("quality_score") >= MIN_QUALITY)
            & (F.col("lang_pred") == KEEP_LANG)
        )
        .join(dup_losers, "doc_id", "left_anti")
        .orderBy("doc_id")
    )


# Compose the oracle from the building-block oracles (DuckDB accepts a
# full WITH-query nested inside a CTE body).
CURATED_SQL = f"""
WITH q AS ({QUALITY_SQL}),
lng AS ({LANG_ID_SQL}),
dup AS ({DEDUP_MINHASH_VERIFIED_SQL})
SELECT q.doc_id, q.n_tokens, q.quality_score, lng.lang_pred
FROM q
JOIN lng ON q.doc_id = lng.doc_id
WHERE q.quality_score >= {MIN_QUALITY}
  AND lng.lang_pred = '{KEEP_LANG}'
  AND q.doc_id NOT IN (SELECT DISTINCT doc_b FROM dup)
ORDER BY q.doc_id
"""


# ---------------------------------------------------------------------------
# curated_corpus_v2: the full modern pipeline
# ---------------------------------------------------------------------------

MAX_SPAN_DUP_Q = 200_000  # ≤20% of 5-token spans duplicated elsewhere
SURPRISE_LO = 4_500_000  # unigram-surprise band (ppm per token):
SURPRISE_HI = 5_060_000  # drop boilerplate-low and garbage-high tails


def curated_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, quality_score, lang_pred, dup_frac_q,
    surprise_per_tok_q): every gate a current training-data pipeline
    runs, composed declaratively —

        quality heuristics  ∧  Gopher repetition rules
      ∧ language == {KEEP_LANG}
      ∧ exact-substring duplication ≤ {MAX_SPAN_DUP_Q} ppm
      ∧ unigram surprise in [{SURPRISE_LO}, {SURPRISE_HI}] ppm/token
        (perplexity-band filtering, LM proxy)
      ∧ not benchmark-contaminated (n-gram overlap)
      ∧ not the dropped side of an LSH-verified near-dup pair

    Each arm is its own audited operator; Catalyst fuses the shared
    token/scan work where it can. The expensive arms (LSH verify, span
    index) stay candidate-bounded exactly as standalone. This query is
    the engine's thesis statement: the whole pipeline is one
    declarative plan, no orchestration glue."""
    from .sparse_text import span_dup_score
    from .textprep import contamination_ngram, quality_gopher
    from .textstats import unigram_surprise

    base = _shared_docs(spark, sf_dir)
    q = quality_score(spark, sf_dir, docs=base).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lng = lang_id(spark, sf_dir, docs=base).select("doc_id", "lang_pred")
    gop = (
        quality_gopher(spark, sf_dir, docs=base)
        .filter(F.col("passes"))
        .select("doc_id")
    )
    span = span_dup_score(spark, sf_dir, docs=base).select("doc_id", "dup_frac_q")
    sur = unigram_surprise(spark, sf_dir, docs=base).select(
        "doc_id", "surprise_per_tok_q"
    )
    contam = contamination_ngram(spark, sf_dir, docs=base).select(
        F.col("train_doc_id").alias("doc_id")
    )
    dup_losers = (
        # base is the FULL corpus (persisted, not filtered), so the
        # driver-memoized default-docs pair list is semantically
        # identical — riding it removes the whole LSH+verify arm from
        # this plan (r6: ~1-2s/query at sf0.1, one fewer corpus pass)
        verified_pairs_cached(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        q.join(lng, "doc_id")
        .join(gop, "doc_id")
        .join(span, "doc_id")
        .join(sur, "doc_id")
        .filter(
            (F.col("quality_score") >= MIN_QUALITY)
            & (F.col("lang_pred") == KEEP_LANG)
            & (F.col("dup_frac_q") <= MAX_SPAN_DUP_Q)
            & (F.col("surprise_per_tok_q") >= SURPRISE_LO)
            & (F.col("surprise_per_tok_q") <= SURPRISE_HI)
        )
        .join(contam, "doc_id", "left_anti")
        .join(dup_losers, "doc_id", "left_anti")
        .orderBy("doc_id")
    )


def _curated_v2_sql() -> str:
    from .sparse_text import SPAN_DUP_SQL
    from .textprep import CONTAMINATION_SQL, QUALITY_GOPHER_SQL
    from .textstats import UNIGRAM_SURPRISE_SQL

    return f"""
WITH q AS ({QUALITY_SQL}),
lng AS ({LANG_ID_SQL}),
gop AS ({QUALITY_GOPHER_SQL}),
span AS ({SPAN_DUP_SQL}),
sur AS ({UNIGRAM_SURPRISE_SQL}),
contam AS ({CONTAMINATION_SQL}),
dup AS ({DEDUP_MINHASH_VERIFIED_SQL})
SELECT q.doc_id, q.n_tokens, q.quality_score, lng.lang_pred,
       span.dup_frac_q, sur.surprise_per_tok_q
FROM q
JOIN lng ON q.doc_id = lng.doc_id
JOIN gop ON q.doc_id = gop.doc_id AND gop.passes
JOIN span ON q.doc_id = span.doc_id
JOIN sur ON q.doc_id = sur.doc_id
WHERE q.quality_score >= {MIN_QUALITY}
  AND lng.lang_pred = '{KEEP_LANG}'
  AND span.dup_frac_q <= {MAX_SPAN_DUP_Q}
  AND sur.surprise_per_tok_q BETWEEN {SURPRISE_LO} AND {SURPRISE_HI}
  AND q.doc_id NOT IN (SELECT train_doc_id FROM contam)
  AND q.doc_id NOT IN (SELECT DISTINCT doc_b FROM dup)
ORDER BY q.doc_id
"""


CURATED_V2_SQL = _curated_v2_sql()


# ---------------------------------------------------------------------------
# v3: v2's gates + importance-resampling and sequence-plausibility arms
# ---------------------------------------------------------------------------

DSIR_MIN_PER_FEAT_Q = -50  # milli-bits/feature: keep target-like or neutral
BIGRAM_LO = 5_000_000  # milli-bits/bigram sequence-plausibility band
BIGRAM_HI = 5_600_000


def curated_corpus_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, quality_score, dsir_per_feat_q,
    surprise2_per_tok_q): curated_corpus_v2's seven gates plus the two
    round-5 model-based arms —

      ∧ DSIR importance ≥ {DSIR_MIN_PER_FEAT_Q} milli-bits/feature
        (hashed-bigram target-likeness: drop strongly off-target docs)
      ∧ bigram surprise in [{BIGRAM_LO}, {BIGRAM_HI}] milli-bits/bigram
        (sequence plausibility: drop degenerate repetition AND gibberish)

    — i.e. the full heuristic + LM-proxy + importance-weighting stack a
    current pipeline runs before tokenization. Each arm remains its own
    gated operator; this composition is one declarative plan."""
    from .textprep import dsir_importance
    from .textstats import bigram_surprise

    base = _shared_docs(spark, sf_dir)
    v2 = curated_corpus_v2(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    dsir = dsir_importance(spark, sf_dir, docs=base).select(
        "doc_id",
        F.expr("(logratio_q * 1000) div n_feats").alias("dsir_per_feat_q"),
    )
    big = bigram_surprise(spark, sf_dir, docs=base).select(
        "doc_id", "surprise2_per_tok_q"
    )
    return (
        v2.join(dsir, "doc_id")
        .join(big, "doc_id")
        .filter(
            (F.col("dsir_per_feat_q") >= DSIR_MIN_PER_FEAT_Q)
            & (F.col("surprise2_per_tok_q") >= BIGRAM_LO)
            & (F.col("surprise2_per_tok_q") <= BIGRAM_HI)
        )
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            "dsir_per_feat_q",
            "surprise2_per_tok_q",
        )
        .orderBy("doc_id")
    )


def _curated_v3_sql() -> str:
    from .textprep import DSIR_IMPORTANCE_SQL
    from .textstats import BIGRAM_SURPRISE_SQL

    v2 = CURATED_V2_SQL.replace("ORDER BY q.doc_id", "")
    dsir = DSIR_IMPORTANCE_SQL.replace("ORDER BY f.doc_id", "")
    big = BIGRAM_SURPRISE_SQL.replace("ORDER BY g.doc_id", "")
    return f"""
WITH v2 AS ({v2}),
dsir_raw AS ({dsir}),
dsir AS (
  SELECT doc_id,
         CAST((logratio_q * 1000) // n_feats AS BIGINT) AS dsir_per_feat_q
  FROM dsir_raw
),
big AS ({big})
SELECT v2.doc_id, v2.n_tokens, v2.quality_score,
       dsir.dsir_per_feat_q, big.surprise2_per_tok_q
FROM v2
JOIN dsir USING (doc_id)
JOIN big USING (doc_id)
WHERE dsir.dsir_per_feat_q >= {DSIR_MIN_PER_FEAT_Q}
  AND big.surprise2_per_tok_q BETWEEN {BIGRAM_LO} AND {BIGRAM_HI}
ORDER BY v2.doc_id
"""


CURATED_V3_SQL = _curated_v3_sql()
