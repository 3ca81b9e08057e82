"""Batch 52: sampling-design and vocabulary-richness estimators.

- ``vocab_richness_report`` — two named estimators per source over the
  unigram distribution: Chao1 species richness (Chao 1984 —
  V + f₁²/(2f₂), the lower-bound estimate of TOTAL vocabulary
  including never-seen types; the classic "how much vocabulary is this
  source still hiding" number next to Good–Turing's unseen MASS) and
  Simpson's concentration index (Simpson 1949 — Σc(c−1)/(N(N−1)), the
  probability two random tokens are the same type). Both exact
  integers: Chao1 with the standard f₂ = 0 bias-corrected form
  f₁(f₁−1)/2, Simpson in ppm via DECIMAL(38,0).
- ``kish_design_effect`` — Kish's design effect (Kish 1965) for the
  chars-weighted sample weighted_sample_report draws:
  DEFF = n·Σw²/(Σw)², effective sample size n_eff = n/DEFF. The one
  number that says how much statistical power the weighting costs —
  DEFF 2.0 means the weighted sample is worth half its row count.

Scale posture: both are scan-bound — one tokenize+explode + two
partial-aggregated groupBys for richness (the unigram shuffle the
entropy family already pays), one row-local weight projection + one
groupBy for DEFF. No joins beyond the rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE, tokens

# ---------------------------------------------------------------------------
# vocab_richness_report
# ---------------------------------------------------------------------------


def vocab_richness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, n_types, chao1_types, simpson_ppm): Chao1
    total-vocabulary lower bound and Simpson concentration per source.
    chao1 = V + f₁²/(2f₂) when f₂ > 0, else the bias-corrected
    V + f₁(f₁−1)/2 — integer division throughout; simpson_ppm =
    Σc(c−1)·10⁶ div (N(N−1)) in DECIMAL(38,0) (0 for N < 2). A source
    whose chao1 far exceeds its observed types is still minting
    vocabulary; a high simpson is template-dominated.

    Plan: the same (source, tok) → source two-stage aggregate as
    source_token_entropy — Zipf-bounded second stage, no joins."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_tok = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_src = per_tok.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).alias("cc"),
    )
    return per_src.select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("n_types"),
        F.expr(
            "CASE WHEN f2 > 0 THEN v + (f1 * f1) div (2 * f2)"
            " ELSE v + (f1 * (f1 - 1)) div 2 END"
        )
        .cast("long")
        .alias("chao1_types"),
        F.expr(
            "CASE WHEN n < 2 THEN 0"
            " ELSE CAST((cc * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT) END"
        )
        .cast("long")
        .alias("simpson_ppm"),
    ).orderBy("source")


VOCAB_RICHNESS_REPORT_SQL = f"""
WITH toks AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
           t -> t != '')) AS tok
  FROM documents
),
per_tok AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
),
per_src AS (
  SELECT source, SUM(c) AS n, COUNT(*) AS v,
         SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
         SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2,
         SUM(CAST(c AS HUGEINT) * (c - 1)) AS cc
  FROM per_tok GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(v AS BIGINT) AS n_types,
       CAST(CASE WHEN f2 > 0 THEN v + (f1 * f1) // (2 * f2)
            ELSE v + (f1 * (f1 - 1)) // 2 END AS BIGINT) AS chao1_types,
       CAST(CASE WHEN n < 2 THEN 0
            ELSE (cc * 1000000) // (CAST(n AS HUGEINT) * (n - 1)) END
            AS BIGINT) AS simpson_ppm
FROM per_src
ORDER BY source
"""


# ---------------------------------------------------------------------------
# kish_design_effect
# ---------------------------------------------------------------------------


def kish_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, sum_w, deff_ppm, n_eff): Kish's design effect of
    the chars-proportional weighting per source — DEFF = n·Σw²/(Σw)²
    in ppm (10⁶ = self-weighting/equal weights; 2·10⁶ = half the
    effective sample), n_eff = (Σw)²/Σw² docs (integer floor). Weights
    are the same GREATEST(n_chars, 1) weighted_sample_report samples
    by, so the two queries read as a pair: what the sample contains,
    and what it is statistically worth.

    Plan: row-local weights, one partial-aggregated groupBy(source) —
    strictly scan-bound; the moments are DECIMAL(38,0)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.greatest(F.col("n_chars"), F.lit(1)).alias("w")
    )
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * w")).alias("sw2"),
    )
    return agg.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("sw").cast("long").alias("sum_w"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sw2 * 1000000)"
            " div (CAST(sw AS DECIMAL(38,0)) * sw) AS BIGINT)"
        ).alias("deff_ppm"),
        F.expr(
            "CAST((CAST(sw AS DECIMAL(38,0)) * sw) div sw2 AS BIGINT)"
        ).alias("n_eff"),
    ).orderBy("source")


KISH_DESIGN_EFFECT_SQL = """
WITH d AS (
  SELECT source, GREATEST(n_chars, 1) AS w FROM documents
),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n, SUM(w) AS sw,
         SUM(CAST(w AS HUGEINT) * w) AS sw2
  FROM d GROUP BY source
)
SELECT source, n AS n_docs, CAST(sw AS BIGINT) AS sum_w,
       CAST((CAST(n AS HUGEINT) * sw2 * 1000000)
            // (CAST(sw AS HUGEINT) * sw) AS BIGINT) AS deff_ppm,
       CAST((CAST(sw AS HUGEINT) * sw) // sw2 AS BIGINT) AS n_eff
FROM agg
ORDER BY source
"""
