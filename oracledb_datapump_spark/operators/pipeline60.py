"""Batch 60: unigram-LM encode fertility + PSI drift.

- ``unigram_encode_fertility`` — the second half of the SentencePiece
  story batch 56 opens: encode the corpus under the SEED vocabulary and
  again under the EM-PRUNED, re-estimated vocabulary, and report the
  vocab-size/fertility trade — the quantified justification for the
  prune (vocabulary shrinks ~25%, tokens-per-word barely moves). Both
  passes ride pipeline56's exact integer Viterbi.
- ``psi_drift_report`` — Population Stability Index, the scorecard
  industry's standard drift metric (Σ (p−q)·ln(p/q)), over the event
  mix of the timeline's first vs second half. The log ratio uses the
  repo's bitlen surrogate so every term is integer; PSI complements
  ``category_drift_report``'s plain L1 with the log-weighted form that
  amplifies tail-category swings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline56 import (
    SEED_SQL_CTES,
    UNI_PRUNE,
    _seed_vcost,
    _viterbi_final,
    _word_counts,
    viterbi_sql_chain,
)
from ..functions.local_table import values_df

PSI_DAY_US = 86_400_000_000
PSI_THRESHOLD_Q = 200_000  # classic "significant shift" PSI ≈ 0.2 analog


def unigram_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, vocab_size, total_pieces, fertility_ppm): corpus encode
    statistics under (a) the seed substring vocabulary and (b) the
    EM-pruned vocabulary with re-estimated costs. Stage b's costs are
    bitlen(T₁² div c₁²) over add-one-smoothed Viterbi counts (the +1
    keeps never-used alphabet characters encodable — SentencePiece's
    floor score); the prune is batch 56's exact bottom-{UNI_PRUNE}
    rule. fertility_ppm = total pieces · 1e6 div total words — the
    tokenizer-quality number bpe_encode_curve reports for the merge
    family, now for the unigram family, before and after pruning.

    Scale shape: two Viterbi passes over the Zipf-bounded word table
    (pipeline56's loop — broadcast piece joins + min-struct groupBys),
    plus one aggregate per pass. Nothing touches raw text twice."""
    from pyspark.sql import Window

    wc = _word_counts(spark, sf_dir)
    total_words = int(wc.agg(F.sum("cnt")).collect()[0][0])

    def _stats(stage: str, vocab_size: int, final: DataFrame):
        pieces = int(
            final.agg(
                F.sum(F.col("cnt") * F.size(F.split("seg", " "))).alias("p")
            ).collect()[0]["p"]
        )
        return (
            stage,
            vocab_size,
            pieces,
            pieces * 1_000_000 // total_words,
        )

    vcost0 = _seed_vcost(wc)
    final0 = _viterbi_final(wc, vcost0)
    row_a = _stats("a_seed", vcost0.count(), final0)

    em = (
        final0.select("cnt", F.explode(F.split("seg", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("em_count"))
    )
    scored = vcost0.join(em, "piece", "left").select(
        "piece",
        F.length("piece").alias("plen"),
        F.coalesce("em_count", F.lit(0)).cast("long").alias("em_count"),
    )
    prune_rnk = Window.orderBy(F.asc("em_count"), F.asc("piece"))
    kept = scored.filter(F.col("plen") == 1).unionByName(
        scored.filter(F.col("plen") > 1)
        .withColumn("prn", F.row_number().over(prune_rnk))
        .filter(F.col("prn") > UNI_PRUNE)
        .drop("prn")
    )
    t1 = kept.agg(F.sum(F.col("em_count") + 1)).collect()[0][0]
    vcost1 = kept.select(
        "piece",
        (F.col("em_count") + 1).alias("f"),
        F.expr(
            f"CAST(length(bin(({t1} * {t1}) div "
            f"((em_count + 1) * (em_count + 1)))) AS BIGINT)"
        ).alias("cost"),
    ).localCheckpoint(eager=True)
    final1 = _viterbi_final(wc, vcost1)
    row_b = _stats("b_pruned", vcost1.count(), final1)

    return values_df(spark,
        [row_a, row_b],
        "stage string, vocab_size long, total_pieces long, fertility_ppm long",
    ).orderBy("stage")


def _encode_fertility_sql() -> str:
    chain_a = viterbi_sql_chain("")
    chain_b = viterbi_sql_chain("b")
    return f"""
{SEED_SQL_CTES}
{chain_a},
twords AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tw FROM words),
em AS (
  SELECT piece, SUM(cnt) AS em_count FROM (
    SELECT cnt, unnest(string_split(seg, ' ')) AS piece FROM final
  ) GROUP BY piece
),
scored AS (
  SELECT v.piece, len(v.piece) AS plen,
         CAST(COALESCE(em.em_count, 0) AS BIGINT) AS em_count
  FROM vcost v LEFT JOIN em ON em.piece = v.piece
),
kept AS MATERIALIZED (
  SELECT piece, em_count FROM scored WHERE plen = 1
  UNION ALL
  SELECT piece, em_count FROM (
    SELECT piece, em_count,
           ROW_NUMBER() OVER (ORDER BY em_count, piece) AS prn
    FROM scored WHERE plen > 1
  ) WHERE prn > {UNI_PRUNE}
),
t1 AS (SELECT CAST(SUM(em_count + 1) AS BIGINT) AS t FROM kept),
vcostb AS MATERIALIZED (
  SELECT piece, CAST(em_count + 1 AS BIGINT) AS f,
         CAST(length(bin((t1.t * t1.t)
              // ((em_count + 1) * (em_count + 1)))) AS BIGINT) AS cost
  FROM kept CROSS JOIN t1
),
{chain_b},
stat_a AS (
  SELECT 'a_seed' AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM vcost) AS vocab_size,
         CAST(SUM(cnt * len(string_split(seg, ' '))) AS BIGINT)
           AS total_pieces
  FROM final
),
stat_b AS (
  SELECT 'b_pruned' AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM vcostb) AS vocab_size,
         CAST(SUM(cnt * len(string_split(seg, ' '))) AS BIGINT)
           AS total_pieces
  FROM finalb
)
SELECT stage, vocab_size, total_pieces,
       CAST(total_pieces * 1000000 // (SELECT tw FROM twords) AS BIGINT)
         AS fertility_ppm
FROM (SELECT * FROM stat_a UNION ALL SELECT * FROM stat_b)
ORDER BY stage
"""


UNIGRAM_ENCODE_FERTILITY_SQL = _encode_fertility_sql()


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, ref_ppm, cur_ppm, psi_term_q, psi_total_q,
    drift_flag): Population Stability Index of the event-type mix,
    reference era = first half of the observed day range, current era =
    second half (category_drift_report's self-calibrating split; +1
    count smoothing keeps vanished/new categories finite). Each term is
    the integer surrogate of (p−q)·ln(p/q):

        term_q = (|p_ppm − q_ppm| · (bitlen((max²·1024) div min²) − 10))
                 div 2

    — |Δshare| in ppm times the half-log₂-resolution ratio surrogate
    (squaring the ratio doubles bitlen's resolution, the
    unigram-cost trick; the two factors of a PSI term always share
    sign, so the absolute form IS the term). psi_total_q = Σ terms in
    the same micro-units as a 1e6-scaled PSI, flagged against
    {PSI_THRESHOLD_Q} (the classic 0.2 'significant shift' rule of
    thumb; log₂ vs ln makes the surrogate ~1.44× the textbook value —
    a documented constant, not noise).

    Scale shape: identical to category_drift_report — one scan, one
    ≤|types| groupBy, broadcast totals."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        "event_type", F.expr(f"ts_us div {PSI_DAY_US}").alias("day_idx")
    )
    bounds = e.agg(
        F.expr("(min(day_idx) + max(day_idx) + 1) div 2").alias("mid")
    )
    counts = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            (F.sum((F.col("day_idx") < F.col("mid")).cast("long")) + 1).alias(
                "ref_n"
            ),
            (F.sum((F.col("day_idx") >= F.col("mid")).cast("long")) + 1).alias(
                "cur_n"
            ),
        )
    )
    tot = counts.agg(
        F.sum("ref_n").alias("rt"), F.sum("cur_n").alias("ct")
    )
    ppm = counts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.expr("ref_n * 1000000 div rt").alias("ref_ppm"),
        F.expr("cur_n * 1000000 div ct").alias("cur_ppm"),
    )
    term = ppm.select(
        "event_type",
        "ref_ppm",
        "cur_ppm",
        F.expr(
            "(abs(ref_ppm - cur_ppm) * "
            "(CAST(length(bin((greatest(ref_ppm, cur_ppm) "
            " * greatest(ref_ppm, cur_ppm) * 1024) div "
            "(greatest(least(ref_ppm, cur_ppm), 1) * "
            " greatest(least(ref_ppm, cur_ppm), 1)))) AS BIGINT) - 10)) div 2"
        )
        .cast("long")
        .alias("psi_term_q"),
    )
    total = term.agg(F.sum("psi_term_q").alias("tq"))
    return (
        term.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            F.col("ref_ppm").cast("long"),
            F.col("cur_ppm").cast("long"),
            "psi_term_q",
            F.col("tq").cast("long").alias("psi_total_q"),
            (F.col("tq") > PSI_THRESHOLD_Q).alias("drift_flag"),
        )
        .orderBy("event_type")
    )


PSI_DRIFT_SQL = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {PSI_DAY_US} AS day_idx FROM events
),
bounds AS (
  SELECT (MIN(day_idx) + MAX(day_idx) + 1) // 2 AS mid FROM e
),
counts AS (
  SELECT event_type,
         SUM(CASE WHEN day_idx < mid THEN 1 ELSE 0 END) + 1 AS ref_n,
         SUM(CASE WHEN day_idx >= mid THEN 1 ELSE 0 END) + 1 AS cur_n
  FROM e CROSS JOIN bounds GROUP BY event_type
),
tot AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM counts),
ppm AS (
  SELECT event_type,
         ref_n * 1000000 // rt AS ref_ppm,
         cur_n * 1000000 // ct AS cur_ppm
  FROM counts CROSS JOIN tot
),
term AS (
  SELECT event_type, ref_ppm, cur_ppm,
         (ABS(ref_ppm - cur_ppm)
          * (CAST(length(bin((greatest(ref_ppm, cur_ppm)
                              * greatest(ref_ppm, cur_ppm) * 1024)
                  // (greatest(least(ref_ppm, cur_ppm), 1)
                      * greatest(least(ref_ppm, cur_ppm), 1))))
             AS BIGINT) - 10)) // 2 AS psi_term_q
  FROM ppm
),
total AS (SELECT CAST(SUM(psi_term_q) AS BIGINT) AS tq FROM term)
SELECT event_type, CAST(ref_ppm AS BIGINT) AS ref_ppm,
       CAST(cur_ppm AS BIGINT) AS cur_ppm,
       CAST(psi_term_q AS BIGINT) AS psi_term_q,
       tq AS psi_total_q,
       tq > {PSI_THRESHOLD_Q} AS drift_flag
FROM term CROSS JOIN total
ORDER BY event_type
"""
