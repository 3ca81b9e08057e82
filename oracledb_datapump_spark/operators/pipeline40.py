"""Batch 40: change detection — the CUSUM scan as exact integers.

``events_changepoint_scan`` locates the most likely level shift in each
event type's daily volume with the classic cumulative-sum statistic,
division-free: with daily counts x₁..x_d (sum S), the scaled CUSUM at
day k is

    C_k = d·Σ_{i≤k} x_i − k·S        (= d²·(prefix mean − global mean)·k/d)

which is zero-mean under no change and peaks in magnitude at the shift
point. Everything is int64-exact (counts × counts), so the argmax day
and its statistic sit under the cross-engine hash with no float
tolerance — the same deferred-arithmetic discipline as the σ-anomaly
and chi² gates. Ties on |C_k| break to the earliest day,
deterministically.

Shape: one events scan → per-(type, day) counts (partial-aggregated),
then windows over the ≤|types|×|days| aggregate — model-scale at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..events_source import load_events

DAY_US = 86_400_000_000


def events_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, change_day_epoch, cusum_peak, mean_before_q,
    mean_after_q): per type, the |CUSUM|-maximizing split day (ties →
    earliest), the signed peak statistic, and the ppm-scaled daily means
    on each side of the split — the report a volume-shift alert reads."""
    e = load_events(spark, sf_dir)
    daily = (
        e.groupBy(
            "event_type",
            (F.expr(f"ts_us div {DAY_US}") * 86_400).alias("day_epoch"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wt = Window.partitionBy("event_type")
    worder = wt.orderBy("day_epoch")
    cum = (
        daily.withColumn("k", F.row_number().over(worder))
        .withColumn("pref", F.sum("x").over(
            worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .withColumn("d", F.count(F.lit(1)).over(wt))
        .withColumn("s", F.sum("x").over(wt))
        .withColumn(
            "cusum", F.col("d") * F.col("pref") - F.col("k") * F.col("s")
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.asc("day_epoch")
    )
    best = (
        cum.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").cast("long").alias("n_days"),
            F.col("day_epoch").cast("long").alias("change_day_epoch"),
            F.col("cusum").cast("long").alias("cusum_peak"),
            F.expr("pref * 1000000 div k").cast("long").alias(
                "mean_before_q"
            ),
            F.expr(
                "CASE WHEN d > k THEN (s - pref) * 1000000 div (d - k) "
                "ELSE 0 END"
            )
            .cast("long")
            .alias("mean_after_q"),
        )
    )
    return best.orderBy("event_type")


EVENTS_CHANGEPOINT_SCAN_SQL = f"""
WITH daily AS (
  SELECT event_type,
         (epoch_us(ts) // {DAY_US}) * 86400 AS day_epoch,
         COUNT(*) AS x
  FROM events
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, day_epoch,
         ROW_NUMBER() OVER w AS k,
         SUM(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pref,
         COUNT(*) OVER (PARTITION BY event_type) AS d,
         SUM(x) OVER (PARTITION BY event_type) AS s
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_epoch)
),
scored AS (
  SELECT *, d * pref - k * s AS cusum,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY ABS(d * pref - k * s) DESC, day_epoch) AS rk
  FROM cum
)
SELECT event_type,
       CAST(d AS BIGINT) AS n_days,
       CAST(day_epoch AS BIGINT) AS change_day_epoch,
       CAST(cusum AS BIGINT) AS cusum_peak,
       CAST(pref * 1000000 // k AS BIGINT) AS mean_before_q,
       CAST(CASE WHEN d > k THEN (s - pref) * 1000000 // (d - k)
                 ELSE 0 END AS BIGINT) AS mean_after_q
FROM scored
WHERE rk = 1
ORDER BY event_type
"""


def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, trend_num_q, direction, first_day_epoch):
    direction of each type's daily mean ``value`` over time, exact —
    the OLS slope numerator over (day index t, day mean m) rewritten to
    avoid every division: with per-day sums s_t over counts c_t, daily
    means are s_t/c_t, so

        slope sign = sign( n·Σ t·(s_t/c_t) − Σt · Σ(s_t/c_t) )
                   = sign( n·Σ t·s_t·P_t − Σt · Σ s_t·P_t ),
        P_t = Π c_u (u ≠ t)  — cleared denominators

    which explodes; instead values are quantized to the 1e-7 grid and
    day means taken as exact sign-abs integer divisions (the repo's
    signed-DIV recipe: Spark truncates, DuckDB floors), making the
    statistic reproducible cross-engine: trend_num = n·Σ(t·m_t) − Σt·Σm_t
    with m_t = s_t div c_t on quantized sums. The floor loses < 1 grid
    unit per day — documented, deterministic, and identical in both
    engines, which is what the gate requires. One events scan → a
    ≤|types×days| aggregate → one |types|-row reduction."""
    e = load_events(spark, sf_dir)
    daily = (
        e.groupBy(
            "event_type",
            F.expr(f"ts_us div {DAY_US}").alias("day"),
        )
        .agg(
            F.sum(
                F.floor(F.col("value").cast("double") * 10_000_000).cast(
                    "long"
                )
            ).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .withColumn(
            "m",
            F.expr("CASE WHEN s >= 0 THEN s div c ELSE -((-s) div c) END"),
        )  # sign-abs DIV: Spark truncates, DuckDB floors on negatives
    )
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("t", F.row_number().over(w))
    out = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (
            F.count(F.lit(1)) * F.sum(F.col("t") * F.col("m"))
            - F.sum("t") * F.sum("m")
        )
        .cast("long")
        .alias("trend_num_q"),
        (F.min("day") * 86_400).cast("long").alias("first_day_epoch"),
    )
    return out.select(
        "event_type",
        "n_days",
        "trend_num_q",
        F.expr(
            "CASE WHEN trend_num_q > 0 THEN 'up' "
            "WHEN trend_num_q < 0 THEN 'down' ELSE 'flat' END"
        ).alias("direction"),
        "first_day_epoch",
    ).orderBy("event_type")


EVENTS_VALUE_TREND_SQL = f"""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // {DAY_US} AS day,
         SUM(CAST(floor(CAST(value AS DOUBLE) * 10000000) AS BIGINT)) AS s,
         COUNT(*) AS c
  FROM events
  GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day,
         CASE WHEN s >= 0 THEN s // c ELSE -((-s) // c) END AS m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
),
agg AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         COUNT(*) * SUM(t * m) - SUM(t) * SUM(m) AS trend_num_q,
         MIN(day) * 86400 AS first_day_epoch
  FROM idx GROUP BY event_type
)
SELECT event_type,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(trend_num_q AS BIGINT) AS trend_num_q,
       CASE WHEN trend_num_q > 0 THEN 'up'
            WHEN trend_num_q < 0 THEN 'down' ELSE 'flat' END AS direction,
       CAST(first_day_epoch AS BIGINT) AS first_day_epoch
FROM agg
ORDER BY event_type
"""
