"""Corpus sampling / mixing operators for training-data assembly.

- stratified_sample: exact per-stratum quotas (strata = predicted
  language) in a deterministic pseudo-random order. Selection order is
  hash64(doc_id || salt) — reproducible across engines and runs, unlike
  rand()-based sampling.
- mix_weights: per-document resampling weights that rebalance the corpus
  toward a uniform language mix (the static analogue of data-mixture
  reweighting). All arithmetic is exact-integer so the oracle hashes.

Scale notes: a naive row_number() OVER (PARTITION BY lang) sends every
row of a language to ONE reducer — at 100 TB a single stratum can be
most of the corpus. stratified_sample therefore ranks in two phases:
per (lang, salt-bucket) first (32-way parallel per language, each bucket
keeps at most CAP candidates), then a global rank over the <= 32*CAP
survivors per language. Any global top-CAP row is in its bucket's
top-CAP, so the two-phase result is exactly the one-phase result — the
DuckDB oracle uses the plain one-phase window and the hashes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64
from .textstats import LANG_ID_SQL, lang_id

STRATUM_CAP = 40
SAMPLE_SALT = "strat-v1:"
N_BUCKETS = 32
WEIGHT_SCALE = 1_000_000  # weights in parts-per-million


def _ordered_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, h): stratum label + deterministic sort key."""
    strata = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    h = hash64(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
    return strata.select("doc_id", "lang_pred", h.alias("h"))


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, sample_rank): at most STRATUM_CAP docs per
    language stratum, chosen by deterministic hash order.

    Phase 1 ranks inside (lang, h % N_BUCKETS) and keeps bucket-local
    top-CAP; phase 2 ranks the survivors globally per language. The
    phase-1 window's partition count is strata x N_BUCKETS, so no single
    reducer sees a whole stratum."""
    s = _ordered_strata(spark, sf_dir)
    w1 = Window.partitionBy(
        "lang_pred", F.pmod(F.col("h"), F.lit(N_BUCKETS))
    ).orderBy("h", "doc_id")
    survivors = (
        s.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= STRATUM_CAP)
        .drop("rn1")
    )
    w2 = Window.partitionBy("lang_pred").orderBy("h", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("sample_rank") <= STRATUM_CAP)
        .select("doc_id", "lang_pred", "sample_rank")
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_SQL = (
    "WITH lang AS ("
    + LANG_ID_SQL.replace("ORDER BY doc_id", "")
    + f"""),
ordered AS (
  SELECT doc_id, lang_pred,
         ROW_NUMBER() OVER (
           PARTITION BY lang_pred
           ORDER BY {sql_hash64(f"'{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS sample_rank
  FROM lang
)
SELECT doc_id, lang_pred, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ordered
WHERE sample_rank <= {STRATUM_CAP}
ORDER BY doc_id
"""
)


def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, n_stratum, weight_ppm): per-doc resampling
    weight rebalancing toward a uniform language mix.

    weight = (n_total / n_strata) / n_stratum, emitted as
    (1e6 * n_total) DIV (n_strata * n_stratum) — exact integer
    arithmetic on both engines (Spark DIV, DuckDB //), so cross-engine
    hash-stable regardless of magnitude; a float-divide-then-floor
    would drift once 1e6*n_total exceeds double's 53-bit mantissa.

    Plan: the stratum histogram is a tiny aggregate joined back by
    broadcast; the corpus is touched once, shuffle-free."""
    strata = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    hist = strata.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_stratum"))
    totals = hist.agg(
        F.sum("n_stratum").alias("n_total"),
        F.count(F.lit(1)).alias("n_strata"),
    )
    dims = F.broadcast(hist.crossJoin(F.broadcast(totals)))
    weight = F.expr(
        f"({WEIGHT_SCALE} * n_total) DIV (n_strata * n_stratum)"
    ).cast("long")
    return (
        strata.join(dims, "lang_pred")
        .select("doc_id", "lang_pred", "n_stratum", weight.alias("weight_ppm"))
        .orderBy("doc_id")
    )


MIX_WEIGHTS_SQL = (
    "WITH lang AS ("
    + LANG_ID_SQL.replace("ORDER BY doc_id", "")
    + f"""),
hist AS (SELECT lang_pred, COUNT(*) AS n_stratum FROM lang GROUP BY lang_pred),
tot AS (SELECT SUM(n_stratum) AS n_total, COUNT(*) AS n_strata FROM hist)
SELECT l.doc_id, l.lang_pred, h.n_stratum,
       CAST(({WEIGHT_SCALE} * t.n_total) // (t.n_strata * h.n_stratum) AS BIGINT)
         AS weight_ppm
FROM lang l JOIN hist h USING (lang_pred) CROSS JOIN tot t
ORDER BY l.doc_id
"""
)


def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, n_copies): MATERIALIZE the mixture that
    mix_weights only scores — each document is kept with
    n_copies = weight//1e6 guaranteed copies plus one more with
    probability (weight mod 1e6)/1e6, decided by a deterministic hash
    of the doc id (so expected copies == weight exactly, and the
    realized sample is reproducible run-to-run and engine-to-engine —
    no RNG). Docs drawing zero copies are dropped.

    Plan: mix_weights' broadcast-histogram pass plus one row-local
    hash-compare — the materialization adds no shuffle. This is how a
    100 TB pipeline applies source-mixing rates: a hash threshold per
    row, never a global sort or sample() (whose seeds are
    partitioning-dependent)."""
    w = mix_weights(spark, sf_dir)
    draw = hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % F.lit(
        WEIGHT_SCALE
    )
    n_copies = (
        F.expr(f"weight_ppm div {WEIGHT_SCALE}")
        + F.when(draw < F.col("weight_ppm") % WEIGHT_SCALE, F.lit(1)).otherwise(
            F.lit(0)
        )
    ).cast("long")
    return (
        w.select("doc_id", "lang_pred", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .orderBy("doc_id")
    )


CORPUS_MIX_SQL = (
    "WITH mixw AS ("
    + MIX_WEIGHTS_SQL.replace("ORDER BY l.doc_id", "")
    + f""")
SELECT doc_id, lang_pred,
       CAST(weight_ppm // {WEIGHT_SCALE}
            + CASE WHEN {sql_hash64("'mix:' || CAST(doc_id AS VARCHAR)")}
                       % {WEIGHT_SCALE} < weight_ppm % {WEIGHT_SCALE}
                   THEN 1 ELSE 0 END AS BIGINT) AS n_copies
FROM mixw
WHERE weight_ppm // {WEIGHT_SCALE}
      + CASE WHEN {sql_hash64("'mix:' || CAST(doc_id AS VARCHAR)")}
                 % {WEIGHT_SCALE} < weight_ppm % {WEIGHT_SCALE}
             THEN 1 ELSE 0 END > 0
ORDER BY doc_id
"""
)
