"""Pipeline dashboards, batch 24: quantization planning, context-window
truncation accounting, and near-dup transitivity auditing.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``quantization_error_curve``: symmetric integer quantization error of
  the embedding corpus at 2/4/8 bits — the bits-vs-quality planning
  table for vector-index compression (PQ's scalar-quantization
  sibling), in EXACT integer arithmetic: values pre-scaled to
  micro-units, floor quantization, so the error is literally
  ``|x| mod step`` and no float rounding crosses the engines.
- ``truncation_loss_curve``: what a hard context-window limit costs —
  docs over the limit and tokens lost at 32/64/128-token cutoffs, from
  ONE row-local ``size(tokens)`` pass (no explode).
- ``dedup_transitivity_audit``: near-duplicate similarity is NOT
  transitive — a~b and b~c at Jaccard ≥ t does not imply a~c — and
  connected-component grouping silently merges across those open
  wedges. This audit counts them: the fraction of verified-pair wedges
  whose closing edge is absent is exactly the over-merge exposure of
  ``dedup_groups``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# -- scalar quantization error curve -----------------------------------------

QUANT_BITS = (2, 4, 8)
QUANT_SCALE = 1_000_000


def quantization_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bits, n_values, step, mean_abs_err_micro, max_abs_err_micro):
    per bit width, the error of symmetric floor quantization of every
    embedding coordinate against the corpus max-|value|. Coordinates
    quantize to micro-units first (floor(x·1e6) — the repo's float
    determinism recipe), then ``step = A div levels + 1`` with
    ``levels = 2^(bits−1) − 1``; floor quantization's error is exactly
    ``|x| mod step``, so the whole curve is integer arithmetic —
    sign-split so truncating and flooring division agree on negative
    coordinates.

    Plan: the explode (|vectors|×dim rows) runs exactly TWICE — once
    for the max-|value| (a one-row broadcast), once for an aggregate
    computing EVERY bit width's error sums as conditional columns —
    then stack() unpivots the one-row result. Never a re-scan per bit
    width (the first formulation paid 3; the plan audit caught it)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.explode("embedding").alias("x")
    ).select(
        F.expr(f"abs(CAST(floor(x * {QUANT_SCALE}) AS BIGINT))").alias("ax")
    )
    a = e.agg(F.max("ax").alias("A"))
    ex = e.crossJoin(F.broadcast(a))
    aggs = [F.count(F.lit(1)).alias("n")]
    for b in QUANT_BITS:
        levels = (1 << (b - 1)) - 1
        step = f"(A div {levels} + 1)"
        aggs.append(F.expr(f"max({step})").alias(f"step_{b}"))
        aggs.append(F.expr(f"sum(ax % {step})").alias(f"sum_{b}"))
        aggs.append(F.expr(f"max(ax % {step})").alias(f"max_{b}"))
    one = ex.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({b} AS BIGINT), step_{b}, sum_{b}, max_{b}"
        for b in QUANT_BITS
    )
    return (
        one.selectExpr(
            "n",
            f"stack({len(QUANT_BITS)}, {stack_args})"
            " AS (bits, step, err_sum, max_abs_err_micro)",
        )
        .select(
            "bits",
            F.col("n").cast("long").alias("n_values"),
            F.col("step").cast("long"),
            F.expr("CAST(err_sum div n AS BIGINT)").alias(
                "mean_abs_err_micro"
            ),
            F.col("max_abs_err_micro").cast("long"),
        )
        .orderBy("bits")
    )


def _quant_sql() -> str:
    arms = []
    for b in QUANT_BITS:
        levels = (1 << (b - 1)) - 1
        arms.append(f"""
  SELECT {b} AS bits, COUNT(*) AS n_values,
         MAX(A // {levels} + 1) AS step,
         SUM(ax % (A // {levels} + 1)) // COUNT(*) AS mean_abs_err_micro,
         MAX(ax % (A // {levels} + 1)) AS max_abs_err_micro
  FROM ex""")
    union = "\n  UNION ALL\n".join(arms)
    return f"""
WITH xs AS (
  SELECT CAST(floor(u.x * {QUANT_SCALE}) AS BIGINT) AS xi
  FROM (SELECT unnest(embedding) AS x FROM embeddings) u
),
a AS (SELECT MAX(ABS(xi)) AS A FROM xs),
ex AS (SELECT ABS(xi) AS ax, A FROM xs CROSS JOIN a),
arms AS (
{union}
)
SELECT CAST(bits AS BIGINT) AS bits, CAST(n_values AS BIGINT) AS n_values,
       CAST(step AS BIGINT) AS step,
       CAST(mean_abs_err_micro AS BIGINT) AS mean_abs_err_micro,
       CAST(max_abs_err_micro AS BIGINT) AS max_abs_err_micro
FROM arms
ORDER BY bits
"""


QUANTIZATION_ERROR_CURVE_SQL = _quant_sql()


# -- context-window truncation loss ------------------------------------------

TRUNC_LIMITS = (32, 64, 128)


def truncation_loss_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(limit_tokens, n_docs_over, tokens_lost, lost_ppm): per hard
    context-window limit, how many documents exceed it and what share
    of the corpus' tokens a hard truncation throws away — the number
    that decides between truncating, chunking (``doc_chunks``), or
    dropping. ``lost_ppm`` is exact ppm of total corpus tokens.

    Plan: token COUNTS are row-local (size(tokens(text)) — no
    explode); one scan computes every limit's arms as conditional
    sums; the report is |limits| rows from a stack-unpivoted one-row
    aggregate."""
    from ..functions.text import tokens as _tokens
    from .docs_source import load_docs

    d = load_docs(spark, sf_dir).select(
        F.size(_tokens("text")).cast("long").alias("nt")
    )
    aggs = [F.sum("nt").alias("tot")]
    for L in TRUNC_LIMITS:
        aggs.append(
            F.sum(F.when(F.col("nt") > L, 1).otherwise(0)).alias(f"over_{L}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("nt") > L, F.col("nt") - L).otherwise(0)
            ).alias(f"lost_{L}")
        )
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({L} AS BIGINT), over_{L}, lost_{L}" for L in TRUNC_LIMITS
    )
    return (
        one.selectExpr(
            "tot",
            f"stack({len(TRUNC_LIMITS)}, {stack_args})"
            " AS (limit_tokens, n_docs_over, tokens_lost)",
        )
        .select(
            "limit_tokens",
            F.col("n_docs_over").cast("long"),
            F.col("tokens_lost").cast("long"),
            F.expr(
                "CAST(tokens_lost * 1000000 div greatest(tot, 1) AS BIGINT)"
            ).alias("lost_ppm"),
        )
        .orderBy("limit_tokens")
    )


def _trunc_sql() -> str:
    from ..functions.text import TOKEN_SPLIT_RE

    return f"""
WITH nt AS (
  SELECT len(list_filter(
    string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != ''))
    AS nt
  FROM documents
),
tot AS (SELECT SUM(nt) AS tot FROM nt),
arms AS (
  SELECT l.limit_tokens,
         SUM(CASE WHEN nt > l.limit_tokens THEN 1 ELSE 0 END)
           AS n_docs_over,
         SUM(CASE WHEN nt > l.limit_tokens THEN nt - l.limit_tokens
                  ELSE 0 END) AS tokens_lost
  FROM nt CROSS JOIN (VALUES {", ".join(f"({L})" for L in TRUNC_LIMITS)})
    AS l(limit_tokens)
  GROUP BY l.limit_tokens
)
SELECT CAST(a.limit_tokens AS BIGINT) AS limit_tokens,
       CAST(a.n_docs_over AS BIGINT) AS n_docs_over,
       CAST(a.tokens_lost AS BIGINT) AS tokens_lost,
       CAST(a.tokens_lost * 1000000 // GREATEST(t.tot, 1) AS BIGINT)
         AS lost_ppm
FROM arms a CROSS JOIN tot t
ORDER BY limit_tokens
"""


TRUNCATION_LOSS_CURVE_SQL = _trunc_sql()


# -- near-dup transitivity audit ---------------------------------------------


def dedup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_edges, n_wedges, n_closed, open_ppm): over the VERIFIED
    near-dup pair graph (LSH candidates → exact Jaccard ≥ t), count the
    wedges a—b—c (two edges sharing b, a < c) and how many close into
    a triangle (a—c also verified). ``open_ppm`` is the share that do
    NOT close — exactly the over-merge exposure of transitive
    (connected-component) grouping: every open wedge is a pair of
    documents ``dedup_groups`` places in one cluster despite being
    below the similarity threshold.

    Plan: rides the verified-pair memo (the expensive LSH+verify
    pipeline runs once per session); wedge enumeration is one
    self-join of the symmetrized edge list on the shared endpoint and
    closure is a broadcast-or-hash join back against the edges —
    near-dup graphs are sparse (bounded candidate fan-out), so wedges
    stay edge-scale, not corpus-scale."""
    from .dedup import verified_pairs_cached

    p = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    sym = p.unionByName(
        p.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    e1 = sym.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = sym.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    wedges = e1.join(e2, "b").filter(F.col("a") < F.col("c"))
    closed = wedges.join(
        p.select(
            F.col("doc_a").alias("a"),
            F.col("doc_b").alias("c"),
            F.lit(1).alias("hit"),
        ),
        ["a", "c"],
        "left",
    )
    n_edges = p.count()
    return closed.agg(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.count(F.lit(1)).cast("long").alias("n_wedges"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_closed"),
        F.expr(
            "CAST((count(1) - sum(coalesce(hit, 0))) * 1000000"
            " div greatest(count(1), 1) AS BIGINT)"
        ).alias("open_ppm"),
    )


def _transitivity_sql() -> str:
    from .dedup import DEDUP_MINHASH_VERIFIED_SQL

    base = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return (
        "WITH pairs AS ("
        + base
        + """),
p AS (SELECT doc_a, doc_b FROM pairs),
sym AS (
  SELECT doc_a, doc_b FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
),
wedges AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM sym e1 JOIN sym e2 ON e2.doc_a = e1.doc_b
  WHERE e1.doc_a < e2.doc_b
),
closed AS (
  SELECT w.*, CASE WHEN pp.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM wedges w
  LEFT JOIN p pp ON pp.doc_a = w.a AND pp.doc_b = w.c
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_wedges,
       CAST(SUM(hit) AS BIGINT) AS n_closed,
       CAST((COUNT(*) - SUM(hit)) * 1000000
            // GREATEST(COUNT(*), 1) AS BIGINT) AS open_ppm
FROM closed
"""
    )


DEDUP_TRANSITIVITY_SQL = _transitivity_sql()
