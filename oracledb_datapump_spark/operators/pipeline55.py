"""Batch 55: duplicated-span masking plan — the ACTION after
duplicated_spans_report's detection.

Lee et al. 2022's result is that training on exact duplicated
substrings hurts; the report (pipeline44) finds them, and this plan
prices the fix: for every document, the exact number of tokens covered
by at least one corpus-duplicated K-gram (the tokens an ExactSubstr
masking pass would drop), rolled up per source. Coverage is computed
EXACTLY despite overlapping spans — each duplicated gram position
explodes into its K token indices and the per-doc distinct count is
the union length, the set form of interval merging (no
gaps-and-islands edge cases, bit-identical across engines).

Scale posture: same bounded machinery as the report — linear gram
explode, one gram-keyed doc-frequency shuffle, then a K-fold explode
of DUPLICATED positions only (a small fraction of the corpus by
construction) and two partial-aggregated groupBys. No pair join at
all: masking needs coverage, not pair attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline44 import K, _grams


def duplicated_span_mask_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_docs_affected, tokens_total, tokens_maskable,
    maskable_ppm): the per-source cost sheet of masking every token
    covered by a corpus-duplicated {K}-gram (doc frequency ≥ 2).
    tokens_total counts ALL whitespace tokens (including docs shorter
    than one gram — they can never be covered but still count in the
    denominator); maskable_ppm = tokens_maskable·10⁶ div tokens_total.

    Plan: the report's gram + doc-frequency machinery, then a K-way
    row-local explode of duplicated positions, a per-doc distinct
    (set-union interval merge), and two small rollups."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).cast("long").alias("n_toks"),
    )
    g = _grams(spark, sf_dir)
    dfreq = g.groupBy("gram").agg(F.count_distinct("doc_id").alias("df"))
    dup = g.join(dfreq.filter(F.col("df") >= 2), "gram").select(
        "doc_id", "pos"
    )
    covered = (
        dup.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(K - 1))
            ).alias("tok_idx"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("maskable"))
    )
    per_doc = totals.join(covered, "doc_id", "left").select(
        "source",
        "n_toks",
        F.coalesce(F.col("maskable"), F.lit(0)).alias("maskable"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("maskable") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_affected"),
            F.sum("n_toks").cast("long").alias("tokens_total"),
            F.sum("maskable").cast("long").alias("tokens_maskable"),
        )
        .select(
            "source",
            "n_docs",
            "n_docs_affected",
            "tokens_total",
            "tokens_maskable",
            F.expr(
                "CASE WHEN tokens_total = 0 THEN 0"
                " ELSE tokens_maskable * 1000000 div tokens_total END"
            )
            .cast("long")
            .alias("maskable_ppm"),
        )
        .orderBy("source")
    )


DUPLICATED_SPAN_MASK_PLAN_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
totals AS (
  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_toks FROM d
),
d2 AS (SELECT * FROM d WHERE len(t) >= {K}),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[i+1:i+{K}], ' ') AS gram
  FROM d2, UNNEST(generate_series(0, len(t)-{K})) AS u(i)
),
dfreq AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram),
dup AS (SELECT g.doc_id, g.pos FROM g JOIN dfreq USING (gram)
        WHERE dfreq.df >= 2),
covered AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS maskable
  FROM (
    SELECT DISTINCT doc_id, pos + j AS tok_idx
    FROM dup, UNNEST(generate_series(0, {K - 1})) AS s(j)
  ) GROUP BY doc_id
),
per_doc AS (
  SELECT t.source, t.n_toks, COALESCE(c.maskable, 0) AS maskable
  FROM totals t LEFT JOIN covered c USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN maskable > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_affected,
       CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
       CAST(SUM(maskable) AS BIGINT) AS tokens_maskable,
       CAST(CASE WHEN SUM(n_toks) = 0 THEN 0
            ELSE SUM(maskable) * 1000000 // SUM(n_toks) END AS BIGINT)
         AS maskable_ppm
FROM per_doc
GROUP BY source
ORDER BY source
"""
