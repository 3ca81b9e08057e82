"""Pipeline QA dashboards, batch 10 (round 6; queued for the round-7
gated prefix — hash-verified locally at both fixture scales by
tests/test_queries_oracle.py until then).

- ``weekly_new_vs_returning``   growth accounting per week
- ``events_interarrival_moments`` per-type traffic burstiness moments
- ``cold_start_users``          first-event-is-purchase integrity stat
- ``revenue_pareto_bands``      revenue concentration by customer band

Same contracts as operators/pipeline.py: integer-exact statistics,
oracles composed from the primitives' own SQL. No reference analog
(SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..events_source import load_events


# ---------------------------------------------------------------------------
# weekly new-vs-returning growth accounting
# ---------------------------------------------------------------------------


def weekly_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week_idx, n_new, n_returning): of each week's active users, how
    many are seen for the FIRST time ever vs returning — the growth-
    accounting split every weekly dashboard leads with (weeks are
    epoch-day div 7, the same locale-free arithmetic as
    dau_wau_stickiness).

    Plan: per-user first week via one min() groupBy, broadcast-free
    join back on user_id (both sides |users|-scale after the distinct
    collapse), a |weeks|-row reduce."""
    e = load_events(spark, sf_dir)
    week = F.expr("(ts_us div 86400000000) div 7").cast("long")
    active = e.select(week.alias("week_idx"), "user_id").distinct()
    first = active.groupBy("user_id").agg(F.min("week_idx").alias("first_week"))
    j = active.join(first, "user_id")
    is_new = (F.col("week_idx") == F.col("first_week")).cast("long")
    return (
        j.groupBy("week_idx")
        .agg(
            F.sum(is_new).cast("long").alias("n_new"),
            F.sum(1 - is_new).cast("long").alias("n_returning"),
        )
        .orderBy("week_idx")
    )


WEEKLY_NEW_VS_RETURNING_SQL = """
WITH active AS (
  SELECT DISTINCT (epoch_us(ts) // 86400000000) // 7 AS week_idx, user_id
  FROM events
),
first AS (
  SELECT user_id, MIN(week_idx) AS first_week FROM active GROUP BY user_id
)
SELECT CAST(a.week_idx AS BIGINT) AS week_idx,
       CAST(SUM(CASE WHEN a.week_idx = f.first_week THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN a.week_idx = f.first_week THEN 0 ELSE 1 END)
            AS BIGINT) AS n_returning
FROM active a JOIN first f USING (user_id)
GROUP BY a.week_idx ORDER BY a.week_idx
"""


# ---------------------------------------------------------------------------
# per-type inter-arrival moments
# ---------------------------------------------------------------------------


def events_interarrival_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_gaps, sum_gap_ms, sum_gap2s, max_gap_ms): exact
    integer moments of the GLOBAL inter-arrival gaps per event type
    (consecutive events of the type across all users, ordered by
    (ts, event_id)) — the burstiness profile: CV² reconstructed offline
    from n·Σg² / (Σg)² tells Poisson-like traffic (≈1) from bursty
    (≫1). Gaps in ms; the square term is per-row divided to seconds²
    (term-wise, non-negative — the embedding_dim_profile overflow
    recipe) before the DECIMAL sum.

    Plan: one type-keyed sort window (lag), a |types|-row moment
    reduce."""
    e = load_events(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("ts_us", "event_id")
    g = e.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    gap_ms = F.expr("gap_us div 1000")
    return (
        g.select("event_type", gap_ms.alias("gap_ms"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_ms").cast("long").alias("sum_gap_ms"),
            F.sum(F.expr("(gap_ms * gap_ms) div 1000000").cast("decimal(38,0)"))
            .cast("long")
            .alias("sum_gap2s"),
            F.max("gap_ms").cast("long").alias("max_gap_ms"),
        )
        .orderBy("event_type")
    )


EVENTS_INTERARRIVAL_MOMENTS_SQL = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER
            (PARTITION BY event_type ORDER BY ts, event_id)) // 1000 AS gap_ms
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       CAST(SUM(gap_ms) AS BIGINT) AS sum_gap_ms,
       CAST(SUM((gap_ms * gap_ms) // 1000000) AS BIGINT) AS sum_gap2s,
       CAST(MAX(gap_ms) AS BIGINT) AS max_gap_ms
FROM g WHERE gap_ms IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cold-start purchase integrity
# ---------------------------------------------------------------------------


def cold_start_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_users, n_cold_start, cold_ppm): users whose very FIRST event
    is already a purchase — attribution can never credit them, so a
    high rate means the click/view instrumentation misses a channel
    (or bots buy straight away). One-row integrity stat for the
    attribution family.

    Plan: first event per user via one row_number window, a 1-row
    reduce."""
    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    firsts = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select((F.col("event_type") == "purchase").cast("long").alias("cold"))
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cold").cast("long").alias("n_cold_start"),
    ).select(
        "n_users",
        "n_cold_start",
        F.expr("(n_cold_start * 1000000) div n_users").alias("cold_ppm"),
    )


COLD_START_USERS_SQL = """
WITH firsts AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cold
  FROM (SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)
  WHERE rn = 1
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(cold) AS BIGINT) AS n_cold_start,
       CAST((SUM(cold) * 1000000) // COUNT(*) AS BIGINT) AS cold_ppm
FROM firsts
"""


# ---------------------------------------------------------------------------
# revenue concentration by customer band
# ---------------------------------------------------------------------------


def revenue_pareto_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rev_band, n_customers, band_cents, share_ppm): customers
    bucketed by the bitlen of their lifetime revenue in whole dollars,
    with each band's share of total revenue — the sort-free Pareto
    view (is 80% of revenue in the top bands?). A true top-k% cut
    needs a global rank; bitlen bands answer the concentration
    question with one groupBy.

    Plan: one custkey-keyed partial-agg groupBy over orders, a
    ≤64-row band reduce, a 1-row total broadcast."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(25,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    band = F.expr("CAST(length(bin(cents div 100)) AS BIGINT)")
    bands = per.select(band.alias("rev_band"), "cents").groupBy("rev_band").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("band_cents"),
    )
    tot = bands.agg(F.sum("band_cents").alias("grand"))
    return (
        bands.crossJoin(F.broadcast(tot))
        .select(
            "rev_band",
            "n_customers",
            "band_cents",
            F.expr(
                "CAST((CAST(band_cents AS DECIMAL(38,0)) * 1000000)"
                " div grand AS LONG)"
            ).alias("share_ppm"),
        )
        .orderBy("rev_band")
    )


REVENUE_PARETO_BANDS_SQL = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
bands AS (
  SELECT CAST(length(bin(cents // 100)) AS BIGINT) AS rev_band,
         COUNT(*) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS band_cents
  FROM per GROUP BY 1
),
tot AS (SELECT SUM(band_cents) AS grand FROM bands)
SELECT rev_band, n_customers, band_cents,
       CAST((CAST(band_cents AS HUGEINT) * 1000000) // grand AS BIGINT)
         AS share_ppm
FROM bands, tot
ORDER BY rev_band
"""
