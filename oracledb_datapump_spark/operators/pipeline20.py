"""Pipeline dashboards, batch 21: robust (median/MAD) anomaly
detection, exact weighted order statistics, and cohort lifetime value.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``daily_volume_mad_outliers``: the robust twin of the
  moment-inequality sigma tests (``events_anomaly_hours``) — median +
  MAD flag anomalous days exactly, in integers, immune to the very
  outliers a mean/σ detector lets poison its own threshold.
- ``weighted_lag_median_by_priority``: exact REVENUE-weighted median
  ship lag — "half the money ships within N days", which is the SLA
  number that matters when line values differ by 100×. Weighted order
  statistics via cumulative-weight windows over aggregated (lag,
  weight) rows.
- ``cohort_ltv_curve``: cumulative purchase value per signup-week
  cohort by week age — the LTV payback curve behind every
  marketing-spend decision, as one window cumsum over
  ≤|cohorts×ages| aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

DAY_US = 86_400_000_000
WEEK_US = 7 * DAY_US

# -- median/MAD robust outliers ----------------------------------------------

MAD_K = 5  # flag |x - median| > MAD_K * MAD


def daily_volume_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, median_cnt, mad, n_outlier_days): per event
    type, the LOWER median of daily event counts, the lower-median
    absolute deviation, and how many days sit more than {MAD_K}×MAD
    from the median. Robust by construction: a bot-storm day shifts a
    mean/σ threshold toward itself (the classic masking failure); the
    median/MAD pair does not move, in exact integer arithmetic
    (lower median = the rank-⌈n/2⌉ element — no halving of even-count
    middles, so no fractions cross the engines).

    Plan: one scan → (type, day) groupBy (≤|types×days| rows); both
    medians come from rank windows over those aggregated rows
    partitioned by type — the fact table never enters a window."""
    from ..events_source import load_events

    daily = (
        load_events(spark, sf_dir)
        .groupBy(
            "event_type", F.expr(f"ts_us div {DAY_US}").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wt = W.partitionBy("event_type").orderBy("cnt", "day")
    med = (
        daily.withColumn("rk", F.row_number().over(wt))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("event_type")))
        .filter(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("cnt").alias("median_cnt"), "n")
    )
    dev = daily.join(med, "event_type").withColumn(
        "ad", F.abs(F.col("cnt") - F.col("median_cnt"))
    )
    wd = W.partitionBy("event_type").orderBy("ad", "day")
    mad = (
        dev.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("ad").alias("mad"))
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("median_cnt").cast("long").alias("median_cnt"),
            F.max("mad").cast("long").alias("mad"),
            F.sum(
                (F.col("ad") > MAD_K * F.col("mad")).cast("long")
            )
            .cast("long")
            .alias("n_outlier_days"),
        )
        .orderBy("event_type")
    )


DAILY_MAD_OUTLIERS_SQL = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY cnt, day) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
med AS (
  SELECT event_type, cnt AS median_cnt, n FROM ranked
  WHERE rk = (n + 1) // 2
),
dev AS (
  SELECT d.event_type, d.day, d.cnt, m.median_cnt, m.n,
         ABS(d.cnt - m.median_cnt) AS ad
  FROM daily d JOIN med m ON m.event_type = d.event_type
),
devranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ad, day) AS rk
  FROM dev
),
mad AS (
  SELECT event_type, ad AS mad FROM devranked WHERE rk = (n + 1) // 2
)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(d.median_cnt) AS BIGINT) AS median_cnt,
       CAST(MAX(m.mad) AS BIGINT) AS mad,
       CAST(SUM(CASE WHEN d.ad > {MAD_K} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outlier_days
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


# -- revenue-weighted median lag ---------------------------------------------


def weighted_lag_median_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, total_cents, plain_median_lag, weighted_median_lag):
    per order priority, the ship lag (days) below which half the
    REVENUE ships (lower weighted median: the smallest lag whose
    cumulative revenue reaches half the total) next to the plain
    row-weighted median — the gap between the two is the "big orders
    ship late" indicator no unweighted quantile shows.

    Exact weighted order statistic: groupBy (priority, lag) sums
    revenue cents, a cumulative-weight window runs over those
    ≤|priorities×lags| aggregated rows, and the median is the first
    lag with 2·cumw ≥ total. All integers; DECIMAL(38,0) cumulative
    revenue."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}")
        .alias("od"),
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {DAY_US}")
        .alias("sd"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    )
    lag = (
        o.join(l, "o_orderkey")
        .select(
            F.col("o_orderpriority").alias("priority"),
            (F.col("sd") - F.col("od")).alias("lag"),
            "w",
        )
        .groupBy("priority", "lag")
        .agg(
            F.sum(F.col("w").cast("decimal(38,0)")).alias("wsum"),
            F.count(F.lit(1)).alias("nrows"),
        )
    )
    wp = W.partitionBy("priority").orderBy("lag").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy("priority")
    cum = (
        lag.withColumn("cumw", F.sum("wsum").over(wp))
        .withColumn("cumn", F.sum("nrows").over(wp))
        .withColumn("totw", F.sum("wsum").over(wall))
        .withColumn("totn", F.sum("nrows").over(wall))
    )
    wmed = (
        cum.filter(F.expr("2 * cumw >= totw"))
        .groupBy("priority")
        .agg(F.min("lag").alias("weighted_median_lag"))
    )
    pmed = (
        cum.filter(F.expr("2 * cumn >= totn"))
        .groupBy("priority")
        .agg(F.min("lag").alias("plain_median_lag"))
    )
    tot = lag.groupBy("priority").agg(
        F.sum("wsum").cast("long").alias("total_cents")
    )
    return (
        tot.join(pmed, "priority")
        .join(wmed, "priority")
        .select(
            "priority",
            "total_cents",
            F.col("plain_median_lag").cast("long"),
            F.col("weighted_median_lag").cast("long"),
        )
        .orderBy("priority")
    )


WEIGHTED_LAG_MEDIAN_SQL = f"""
WITH lag_ AS (
  SELECT o.o_orderpriority AS priority,
         epoch_us(l.l_shipdate) // {DAY_US}
           - epoch_us(o.o_orderdate) // {DAY_US} AS lag,
         SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS wsum,
         COUNT(*) AS nrows
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
cum AS (
  SELECT *,
         SUM(wsum) OVER (PARTITION BY priority ORDER BY lag
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw,
         SUM(nrows) OVER (PARTITION BY priority ORDER BY lag
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumn,
         SUM(wsum) OVER (PARTITION BY priority) AS totw,
         SUM(nrows) OVER (PARTITION BY priority) AS totn
  FROM lag_
)
SELECT priority,
       CAST(MAX(totw) AS BIGINT) AS total_cents,
       CAST(MIN(CASE WHEN 2 * cumn >= totn THEN lag END) AS BIGINT)
         AS plain_median_lag,
       CAST(MIN(CASE WHEN 2 * cumw >= totw THEN lag END) AS BIGINT)
         AS weighted_median_lag
FROM cum
GROUP BY priority
ORDER BY priority
"""


# -- cohort lifetime value ---------------------------------------------------

LTV_VALUE_SCALE = 1_000_000  # event.value carried in exact micro-units


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, age_weeks, n_users, period_value_micro,
    cum_value_micro): cumulative purchase value per signup-week cohort
    by week age — the LTV payback curve. ``value`` doubles quantize to
    exact micro-units (floor(value·1e6)) before any aggregation, the
    established float-determinism recipe, so the curve hashes
    identically cross-engine.

    Plan: first-activity week per user (one groupBy), a user-keyed
    join stamping each purchase with its cohort + age, a
    (cohort, age) groupBy, and the cumulative column is a window over
    those ≤|cohorts×ages| rows. n_users counts the cohort once (from
    the cohort frame, not re-counted per row)."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        "user_id",
        F.expr(f"ts_us div {WEEK_US}").alias("week"),
        "event_type",
        F.expr(f"CAST(floor(value * {LTV_VALUE_SCALE}) AS BIGINT)").alias(
            "v_micro"
        ),
    )
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("age_weeks"),
        )
        .agg(
            F.sum(F.col("v_micro").cast("decimal(38,0)")).alias(
                "period_value"
            )
        )
    )
    wc = W.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        purchases.withColumn("cum_value", F.sum("period_value").over(wc))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("long"),
            F.col("age_weeks").cast("long"),
            F.col("n_users").cast("long"),
            F.col("period_value").cast("long").alias("period_value_micro"),
            F.col("cum_value").cast("long").alias("cum_value_micro"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


COHORT_LTV_CURVE_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {WEEK_US} AS week, event_type,
         CAST(floor(value * {LTV_VALUE_SCALE}) AS BIGINT) AS v_micro
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id),
sizes AS (SELECT cohort_week, COUNT(*) AS n_users FROM cohort GROUP BY 1),
purchases AS (
  SELECT c.cohort_week, e.week - c.cohort_week AS age_weeks,
         SUM(CAST(e.v_micro AS HUGEINT)) AS period_value
  FROM e JOIN cohort c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT CAST(p.cohort_week AS BIGINT) AS cohort_week,
       CAST(p.age_weeks AS BIGINT) AS age_weeks,
       CAST(s.n_users AS BIGINT) AS n_users,
       CAST(p.period_value AS BIGINT) AS period_value_micro,
       CAST(SUM(p.period_value) OVER (PARTITION BY p.cohort_week
                                      ORDER BY p.age_weeks
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
         AS cum_value_micro
FROM purchases p JOIN sizes s ON s.cohort_week = p.cohort_week
ORDER BY cohort_week, age_weeks
"""
