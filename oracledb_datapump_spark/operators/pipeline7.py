"""Pipeline QA dashboards, batch 8 (round 6; queued for the round-7
gated prefix — hash-verified locally at both fixture scales by
tests/test_queries_oracle.py until then).

- ``pii_hit_rates``         per-source PII incidence (rides pii_redact)
- ``session_funnel_rates``  within-session view→click→purchase funnel
- ``dau_wau_stickiness``    DAU/WAU engagement ratio per week
- ``simhash_pair_hamming``  hamming profile of verified near-dup pairs

Same contracts as operators/pipeline.py: integer-exact statistics,
oracles composed from the primitives' own SQL. No reference analog
(SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..events_source import load_events
from .docs_source import load_docs
from . import dedup as D


# ---------------------------------------------------------------------------
# per-source PII incidence
# ---------------------------------------------------------------------------


def pii_hit_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_docs_with_pii, n_email, n_ip, n_phone,
    hit_ppm): the per-source PII exposure dashboard — which ingestion
    sources leak contact data and at what rate (the go/no-go input for
    a per-source scrub-or-drop policy; rates matter because scrubbing
    mutates text and breaks exact-hash dedup downstream).

    Plan: rides pii_redact's row-local regex pass (same planted-PII
    fixture contract), one broadcast-free doc_id join back to the
    source column, a |sources|-row reduce."""
    from .privacy import pii_redact

    p = pii_redact(spark, sf_dir).select("doc_id", "n_email", "n_ip", "n_phone")
    src = load_docs(spark, sf_dir).select("doc_id", "source")
    j = p.join(src, "doc_id")
    any_pii = (
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone")) > 0
    ).cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(any_pii).cast("long").alias("n_docs_with_pii"),
            F.sum("n_email").cast("long").alias("n_email"),
            F.sum("n_ip").cast("long").alias("n_ip"),
            F.sum("n_phone").cast("long").alias("n_phone"),
        )
        .select(
            "source",
            "n_docs",
            "n_docs_with_pii",
            "n_email",
            "n_ip",
            "n_phone",
            F.expr(
                "(n_docs_with_pii * 1000000) div n_docs"
            ).alias("hit_ppm"),
        )
        .orderBy("source")
    )


def _pii_hit_rates_sql() -> str:
    from .privacy import PII_REDACT_SQL

    base = PII_REDACT_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH p AS ({base}),
j AS (
  SELECT d.source, p.n_email, p.n_ip, p.n_phone,
         CASE WHEN p.n_email + p.n_ip + p.n_phone > 0 THEN 1 ELSE 0 END
           AS has_pii
  FROM p JOIN documents d USING (doc_id)
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(has_pii) AS BIGINT) AS n_docs_with_pii,
       CAST(SUM(n_email) AS BIGINT) AS n_email,
       CAST(SUM(n_ip) AS BIGINT) AS n_ip,
       CAST(SUM(n_phone) AS BIGINT) AS n_phone,
       CAST((SUM(has_pii) * 1000000) // COUNT(*) AS BIGINT) AS hit_ppm
FROM j GROUP BY source ORDER BY source
"""


PII_HIT_RATES_SQL = _pii_hit_rates_sql()


# ---------------------------------------------------------------------------
# within-session funnel
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1_800_000_000  # the sessionizer's 30-minute gap


def session_funnel_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_sessions, n_view, n_view_click, n_full_funnel): of all
    sessions, how many contained a view, a view followed (>= same
    instant) by a click, and the full view→click→purchase chain — the
    WITHIN-SESSION funnel (funnel_conversion's cross-session twin:
    that one allows conversion across visits, this one demands it in a
    single sitting).

    Plan: the sessionizer's user-keyed shuffle (gap flag + running
    sum), per-session min timestamps per step in one groupBy, a 1-row
    reduce."""
    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    mins = sess.groupBy("user_id", "session_seq").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias("v"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts_us"))).alias("c"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("p"),
    )
    vc = F.col("v").isNotNull() & F.col("c").isNotNull() & (F.col("c") >= F.col("v"))
    full = vc & F.col("p").isNotNull() & (F.col("p") >= F.col("c"))
    return mins.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("v").isNotNull().cast("long")).cast("long").alias("n_view"),
        F.sum(vc.cast("long")).cast("long").alias("n_view_click"),
        F.sum(full.cast("long")).cast("long").alias("n_full_funnel"),
    )


SESSION_FUNNEL_RATES_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
mins AS (
  SELECT user_id, session_seq,
         MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS v,
         MIN(CASE WHEN event_type = 'click' THEN ts_us END) AS c,
         MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) AS p
  FROM sess GROUP BY 1, 2
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(SUM(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND c >= v
                THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND c >= v
                 AND p IS NOT NULL AND p >= c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_funnel
FROM mins
"""


# ---------------------------------------------------------------------------
# DAU/WAU stickiness
# ---------------------------------------------------------------------------


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week_idx, n_days, wau, sum_dau, stickiness_ppm): weekly active
    users, the sum of daily actives, and the DAU/WAU engagement ratio
    (Σdau·1e6 div (n_days·wau)) — the canonical product-health metric,
    with weeks as epoch-day div 7 (pure arithmetic, no calendar/locale
    function on either engine; partial edge weeks keep their true
    n_days instead of skewing the ratio).

    Plan: one (week, day, user) distinct-collapse groupBy (map-side
    combinable), a per-week distinct-user count, a |weeks|-row join."""
    e = load_events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000")
    base = e.select(
        (day.cast("long")).alias("day_idx"),
        F.expr("(ts_us div 86400000000) div 7").cast("long").alias("week_idx"),
        "user_id",
    ).distinct()
    dau = base.groupBy("week_idx", "day_idx").agg(
        F.count(F.lit(1)).alias("dau")
    )
    weekly = dau.groupBy("week_idx").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
    )
    wau = base.groupBy("week_idx").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        weekly.join(wau, "week_idx")
        .select(
            "week_idx",
            "n_days",
            "wau",
            "sum_dau",
            F.expr(
                "CAST((CAST(sum_dau AS DECIMAL(38,0)) * 1000000)"
                " div (CAST(n_days AS DECIMAL(38,0)) * wau) AS LONG)"
            ).alias("stickiness_ppm"),
        )
        .orderBy("week_idx")
    )


DAU_WAU_STICKINESS_SQL = """
WITH base AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_idx,
         (epoch_us(ts) // 86400000000) // 7 AS week_idx,
         user_id
  FROM events
),
dau AS (
  SELECT week_idx, day_idx, COUNT(*) AS dau FROM base GROUP BY 1, 2
),
weekly AS (
  SELECT week_idx, COUNT(*) AS n_days, CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM dau GROUP BY week_idx
),
wau AS (
  SELECT week_idx, COUNT(DISTINCT user_id) AS wau FROM base GROUP BY week_idx
)
SELECT CAST(w.week_idx AS BIGINT) AS week_idx, w.n_days, u.wau, w.sum_dau,
       CAST((CAST(w.sum_dau AS HUGEINT) * 1000000)
            // (CAST(w.n_days AS HUGEINT) * u.wau) AS BIGINT)
         AS stickiness_ppm
FROM weekly w JOIN wau u USING (week_idx)
ORDER BY week_idx
"""


# ---------------------------------------------------------------------------
# simhash hamming profile of verified pairs
# ---------------------------------------------------------------------------


def simhash_pair_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hamming, n_pairs): for every VERIFIED near-dup pair, the
    hamming distance between the two documents' simhash fingerprints —
    the empirical validation of the simhash shortcut (verified
    Jaccard-near-dups should concentrate at low hamming; a flat
    profile would mean simhash bucketing is useless on this corpus).

    Plan: the memoized pair list is broadcast against the simhash
    frame twice (corpus side streams, broadcast side is pair-sized —
    the dup_cross_lang_pairs join shape), then a ≤bits-row
    histogram."""
    p = D.verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    # r16: pinned — both pair-side joins below consume the fingerprint
    # frame, and each used to re-run the tokenize→60-vote simhash agg
    s = D.simhash_fingerprints(spark, sf_dir).localCheckpoint(eager=True)
    half = s.join(F.broadcast(p), s.doc_id == p.doc_a).select(
        F.col("simhash").alias("sig_a"), "doc_b"
    )
    j = s.join(F.broadcast(half), s.doc_id == half.doc_b).select(
        F.expr("CAST(bit_count(sig_a ^ simhash) AS BIGINT)").alias("hamming")
    )
    return (
        j.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


def _simhash_pair_hamming_sql() -> str:
    verified = D.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    simhash = D.SIMHASH_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH v AS ({verified}),
s AS ({simhash})
SELECT CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming,
       COUNT(*) AS n_pairs
FROM v
JOIN s sa ON v.doc_a = sa.doc_id
JOIN s sb ON v.doc_b = sb.doc_id
GROUP BY 1 ORDER BY 1
"""


SIMHASH_PAIR_HAMMING_SQL = _simhash_pair_hamming_sql()
