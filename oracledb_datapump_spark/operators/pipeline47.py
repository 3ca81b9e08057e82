"""Batch 47: corpus-linguistics operators — keyword extraction,
readability, burstiness.

Three more named public methods over ``documents``:

- ``textrank_keywords`` — TextRank (Mihalcea & Tarau 2004): weighted
  PageRank over the token co-occurrence graph (adjacent-token edges,
  window 2), two damped iterations in pure int64 (damping 0.85 as the
  85/100 integer split, per-neighbor contributions floor-divided by
  the neighbor's total edge weight), top-20 tokens. The unsupervised
  keyword list a corpus card leads with.
- ``readability_report`` — Flesch–Kincaid grade level per source
  (Kincaid et al. 1975): 0.39·(words/sentence) + 11.8·(syllables/word)
  − 15.59, emitted in milligrades with every division an integer div.
  Syllables are the standard vowel-group proxy ([aeiou]+ runs, ≥1 per
  word); sentences are [.!?]+ runs clamped to ≥1 per doc — both
  regex-class-only, so Java regex and RE2 agree.
- ``burstiness_report`` — Church & Gale (1995) burstiness: the
  variance-to-mean ratio of a term's per-document count across the
  WHOLE corpus (zeros included) for the top-30 terms by volume.
  VMR ≈ 1 is Poisson background (function-word-like); VMR ≫ 1 is a
  bursty content term that concentrates in few docs — the
  corpus-linguistics split between topical and boilerplate vocabulary.
  Exact: vmr_ppm = (N·Σc² − S²)·10⁶ div (N·S) in DECIMAL(38,0).

Scale posture: the TextRank edge list is one row-local adjacent-pair
explode + a gram-keyed groupBy, and each iteration is one join + one
partial-aggregated groupBy over the Zipf-bounded edge list; the other
two are scan-bound aggregates. Top-K everywhere is
TakeOrderedAndProject — no global row sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import TOKEN_SPLIT_RE, tokens

# ---------------------------------------------------------------------------
# textrank_keywords
# ---------------------------------------------------------------------------

TR_TOP_K = 20
TR_SCALE = 1_000_000
TR_MIN_LEN = 3  # tokens shorter than this are skipped (stopword-ish)


def _tr_iterate(edges: DataFrame, pr: DataFrame) -> DataFrame:
    """One damped weighted-PageRank step in int64:
    pr'(v) = 0.15·SCALE + 0.85·Σ_u w(u,v)·pr(u) div W(u), with the
    0.85 applied as ·85 div 100 after the sum."""
    contrib = (
        edges.join(pr, edges.src == pr.tok)
        .select(
            "dst",
            F.expr("w * pr div wtot").alias("c"),
        )
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    return contrib.select(
        F.col("dst").alias("tok"),
        (F.lit(150_000) + F.expr("s * 85 div 100")).alias("pr"),
    )


def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, pr_score, rank): TextRank keywords — two damped weighted
    PageRank iterations over the adjacent-token co-occurrence graph
    (tokens of length ≥ {TR_MIN_LEN}; each undirected co-occurrence
    contributes a directed edge both ways, weight = co-occurrence
    count). Integer-exact: scores start at {TR_SCALE}, every
    per-neighbor contribution is w·pr div W(u), damping is the 85/100
    split. Top-{TR_TOP_K} by (score desc, token asc).

    Plan: adjacent pairs are a row-local transform+explode (no window);
    the edge aggregate is one gram-keyed groupBy; each iteration is one
    broadcast-size join on the Zipf-bounded edge list + one
    partial-aggregated groupBy; final top-K is TakeOrderedAndProject."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        F.filter(
            tokens("text"), lambda t: F.length(t) >= TR_MIN_LEN
        ).alias("t")
    ).filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t)-2),"
                " i -> struct(t[i] AS a, t[i+1] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b").filter(F.col("a") != F.col("b"))
    und = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # localCheckpoint: every downstream consumer (wtot, pr0, both
    # PageRank iterations) replays from here — without it each replay
    # re-tokenizes the whole corpus (the graph.py power-iteration
    # device); the edge aggregate is Zipf-bounded
    edges0 = (
        und.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)
    )
    wtot = edges0.groupBy("src").agg(F.sum("w").alias("wtot"))
    edges = edges0.join(wtot, "src").localCheckpoint(eager=True).localCheckpoint(eager=True)

    pr0 = wtot.select(
        F.col("src").alias("tok"), F.lit(TR_SCALE).cast("long").alias("pr")
    )
    pr1 = _tr_iterate(edges, pr0)
    pr2 = _tr_iterate(edges, pr1)
    ranked = pr2.orderBy(F.desc("pr"), "tok").limit(TR_TOP_K)
    return ranked.select(
        "tok",
        F.col("pr").cast("long").alias("pr_score"),
        F.row_number()
        .over(W.orderBy(F.desc("pr"), "tok"))
        .cast("long")
        .alias("rank"),
    )


TEXTRANK_KEYWORDS_SQL = f"""
WITH toklists AS (
  SELECT list_filter(
           list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                       t -> t != ''),
           t -> len(t) >= {TR_MIN_LEN}) AS t
  FROM documents
),
pairs AS (
  SELECT t[i+1] AS a, t[i+2] AS b
  FROM toklists, UNNEST(generate_series(0, len(t) - 2)) AS u(i)
  WHERE len(t) >= 2 AND t[i+1] <> t[i+2]
),
und AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM und GROUP BY src, dst
),
wtot AS (SELECT src, SUM(w) AS wtot FROM edges GROUP BY src),
e AS (SELECT edges.*, wtot.wtot FROM edges JOIN wtot USING (src)),
pr0 AS (SELECT src AS tok, CAST({TR_SCALE} AS BIGINT) AS pr FROM wtot),
pr1 AS (
  SELECT dst AS tok, 150000 + (SUM(w * pr // wtot) * 85 // 100) AS pr
  FROM e JOIN pr0 ON e.src = pr0.tok GROUP BY dst
),
pr2 AS (
  SELECT dst AS tok, 150000 + (SUM(w * pr // wtot) * 85 // 100) AS pr
  FROM e JOIN pr1 ON e.src = pr1.tok GROUP BY dst
)
SELECT tok, CAST(pr AS BIGINT) AS pr_score,
       CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, tok) AS BIGINT) AS rank
FROM pr2
ORDER BY pr DESC, tok
LIMIT {TR_TOP_K}
"""


# ---------------------------------------------------------------------------
# readability_report
# ---------------------------------------------------------------------------

_SYL_RE = "[aeiou]+"
_SENT_RE = "[.!?]+"


def readability_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_words, n_sentences, n_syllables, fkgl_milli):
    Flesch–Kincaid grade level per source in milligrades, all divisions
    integer: fkgl_milli = max(390000·words div sentences
    + 11800000·syllables div words − 15590000, 0) div 1000 —
    i.e. 0.39·W/S + 11.8·Y/W − 15.59 scaled by 1000, floored at grade 0
    (the conventional clamp, which also keeps every division on the
    non-negative side where both engines' integer division agrees). Words are
    the engine's standard tokens; syllables the [aeiou]+ vowel-group
    proxy (≥1 per word); sentences [.!?]+ runs clamped to ≥1 per doc.

    Plan: three regexp counts row-local on the scan, one
    partial-aggregated groupBy(source) — strictly scan-bound."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = d.select(
        "source",
        F.size(tokens("text")).cast("long").alias("w"),
        F.greatest(
            F.expr(f"regexp_count(text, '{_SENT_RE}')"), F.lit(1)
        )
        .cast("long")
        .alias("s"),
        F.greatest(
            F.expr(f"regexp_count(lower(text), '{_SYL_RE}')"),
            F.size(tokens("text")).cast("int"),
        )
        .cast("long")
        .alias("y"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("nw"),
        F.sum("s").alias("ns"),
        F.sum("y").alias("ny"),
    )
    return (
        agg.filter(F.col("nw") > 0)
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("nw").cast("long").alias("n_words"),
            F.col("ns").cast("long").alias("n_sentences"),
            F.col("ny").cast("long").alias("n_syllables"),
            # clamped at 0 (the conventional FKGL floor) — also keeps
            # the final division non-negative, where Spark's truncating
            # div and DuckDB's flooring // agree
            F.expr(
                "greatest(390000 * nw div ns + 11800000 * ny div nw"
                " - 15590000, 0) div 1000"
            )
            .cast("long")
            .alias("fkgl_milli"),
        )
        .orderBy("source")
    )


READABILITY_REPORT_SQL = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(list_filter(
           string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
           t -> t != '')) AS BIGINT) AS w,
         CAST(GREATEST(len(regexp_extract_all(text, '{_SENT_RE}')), 1)
              AS BIGINT) AS s,
         CAST(GREATEST(len(regexp_extract_all(lower(text), '{_SYL_RE}')),
                       len(list_filter(
                         string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                         t -> t != ''))) AS BIGINT) AS y
  FROM documents
),
agg AS (
  SELECT source, COUNT(*) AS n_docs, SUM(w) AS nw, SUM(s) AS ns,
         SUM(y) AS ny
  FROM per_doc GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(nw AS BIGINT) AS n_words,
       CAST(ns AS BIGINT) AS n_sentences,
       CAST(ny AS BIGINT) AS n_syllables,
       CAST(GREATEST(390000 * nw // ns + 11800000 * ny // nw - 15590000, 0)
            // 1000 AS BIGINT) AS fkgl_milli
FROM agg
WHERE nw > 0
ORDER BY source
"""


# ---------------------------------------------------------------------------
# burstiness_report
# ---------------------------------------------------------------------------

BURST_TOP_K = 30


def burstiness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, total, n_docs_with, vmr_ppm): Church–Gale burstiness of
    the top-{BURST_TOP_K} terms by corpus volume — the
    variance-to-mean ratio of the term's per-document count over ALL
    N documents (absent docs count zero, via the moment identity
    Var·N² = N·Σc² − S²): vmr_ppm = (N·Σc² − S²)·10⁶ div (N·S),
    DECIMAL(38,0) so no corpus size overflows. VMR ≈ 10⁶ is Poisson
    background; far above marks bursty topical terms.

    Plan: one tokenize+explode, a (tok, doc) count, a tok-level moment
    aggregate, a 1-row N broadcast and a TakeOrderedAndProject top-K —
    shuffle shape identical to the unigram-aggregate family."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_total = d.select(F.count(F.lit(1)).cast("long").alias("n"))
    per = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mom = per.groupBy("tok").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.count(F.lit(1)).alias("n_docs_with"),
    )
    out = mom.crossJoin(F.broadcast(n_total)).select(
        "tok",
        F.col("s").cast("long").alias("total"),
        F.col("n_docs_with").cast("long").alias("n_docs_with"),
        F.expr(
            "CAST(((CAST(n AS DECIMAL(38,0)) * s2 - CAST(s AS DECIMAL(38,0)) * s)"
            " * 1000000) div (CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("vmr_ppm"),
    )
    ranked = out.orderBy(F.desc("total"), "tok").limit(BURST_TOP_K)
    return ranked.select(
        "tok",
        "total",
        "n_docs_with",
        "vmr_ppm",
    ).orderBy(F.desc("total"), "tok")


BURSTINESS_REPORT_SQL = f"""
WITH per AS (
  SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
             t -> t != '')) AS tok
    FROM documents
  ) GROUP BY tok, doc_id
),
mom AS (
  SELECT tok, SUM(c) AS s, SUM(c * c) AS s2,
         CAST(COUNT(*) AS BIGINT) AS n_docs_with
  FROM per GROUP BY tok
),
n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
SELECT tok, CAST(s AS BIGINT) AS total, n_docs_with,
       CAST((CAST(n AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s) * 1000000
            // (CAST(n AS HUGEINT) * s) AS BIGINT) AS vmr_ppm
FROM mom, n_total
ORDER BY total DESC, tok
LIMIT {BURST_TOP_K}
"""
