"""Batch 75: fully-sequential testing & survival analysis.

Completes the sequential-decision family (O'Brien–Fleming looks in
batch 72, BH-FDR in batch 74) and closes the survival-curve hook
repurchase_hazard_table left open ("the float cumulative product left
to the notebook" — pipeline37.py:231).

- ``sprt_conversion_monitor`` — Wald's Sequential Probability Ratio
  Test (Wald 1945) on the user-conversion stream: H₀ p = {SPRT_P0_PPM}
  ppm vs H₁ p = {SPRT_P1_PPM} ppm at α = β = 5%. Users accrue on
  their FIRST event day; each day contributes
  n_conv·L1 + (n − n_conv)·L0 to the log-likelihood ratio, with the
  per-observation increments L1 = ln(p1/p0), L0 = ln(q1/q0) and the
  Wald boundaries ±ln((1−β)/α) baked as milli LITERALS at import (the
  BH_CRIT_MILLI posture — no runtime float crosses the cross-engine
  hash). The monitor reports the first boundary-crossing day and the
  decision — the always-on alternative to fixed-horizon A/B reads.
- ``kaplan_meier_survival`` — the product-limit estimator over the
  customer reorder interval, with REAL right-censoring: each
  consecutive-order gap is an event at its week bucket
  (repurchase_hazard_table's definition), and each customer's open
  tail (last order → dataset end) enters as censored. n_at_risk is
  the reverse cumulative of events+censored; the survival curve is
  the exact truncating integer fold S_ppm ← S_ppm·(n−d) div n applied
  bucket-by-bucket IDENTICALLY by both engines (Spark folds the
  ≤|weeks| aggregate on the driver — the iterative-op posture of
  dedup_medoid_select; DuckDB folds it with a recursive CTE). The
  retention curve every replenishment model actually plots.

Reference scope note: extends the reference's analytics surface per
SURVEY §2.9-2.10; the reference engine ships data movement only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_table import values_df

#: SPRT design: H0/H1 conversion probabilities (ppm) and error rates.
SPRT_P0_PPM = 500_000
SPRT_P1_PPM = 550_000
#: per-observation LLR increments, milli-nats (import-time literals).
SPRT_L1_MILLI = round(math.log(SPRT_P1_PPM / SPRT_P0_PPM) * 1000)
SPRT_L0_MILLI = round(
    math.log((1_000_000 - SPRT_P1_PPM) / (1_000_000 - SPRT_P0_PPM)) * 1000
)
#: Wald boundaries ±ln((1−β)/α) at α = β = 0.05, milli-nats.
SPRT_BOUND_MILLI = round(math.log(0.95 / 0.05) * 1000)

#: week bucket width for the survival curve (pipeline37's constant).
KM_BUCKET_DAYS = 7

_DAY_US = 86_400_000_000


def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_days, n_users, llr_final_milli, first_upper_day,
    first_lower_day, decision): Wald's SPRT folded over accrual days.
    Outcome per user: purchases outnumber errors
    (ab_sequential_looks' non-saturated binary); accrual day = the
    user's first event day, so both engines see the identical
    sequence. Cumulative LLR_d = Σ (n_conv·{SPRT_L1_MILLI} +
    (n − n_conv)·{SPRT_L0_MILLI}); first day the cumulative crosses
    ±{SPRT_BOUND_MILLI} decides ('h1' upper first, 'h0' lower first,
    'continue' if never) — day-resolution looks, which is how a real
    monitor polls. −1 marks a boundary never crossed.

    Scale shape: events scan → per-user aggregate → per-day accrual
    aggregate (≤|days| rows); the cumulative ride is one
    SinglePartition window over that calendar-bounded frame
    (exemption table) and three 1-row reduces."""
    from ..events_source import load_events

    users = (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr(f"ts_us div {_DAY_US}").alias("day_idx"),
            F.expr(
                "CAST(event_type = 'purchase' AS LONG)"
            ).alias("p"),
            F.expr("CAST(event_type = 'error' AS LONG)").alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.min("day_idx").alias("day"),
            F.sum("p").alias("np"),
            F.sum("e").alias("ne"),
        )
        .select(
            "day", F.expr("CAST(np > ne AS LONG)").alias("conv")
        )
    )
    accrual = users.groupBy("day").agg(
        F.count(F.lit(1)).alias("nu"), F.sum("conv").alias("nc")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    path = accrual.select(
        "day",
        F.sum("nu").over(w).alias("cum_u"),
        F.sum(
            F.expr(
                f"nc * {SPRT_L1_MILLI} + (nu - nc) * {SPRT_L0_MILLI}"
            )
        ).over(w).alias("llr"),
    )
    return path.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("cum_u").cast("long").alias("n_users"),
        F.max_by("llr", "day").cast("long").alias("llr_final_milli"),
        F.coalesce(
            F.min(F.when(F.col("llr") >= SPRT_BOUND_MILLI, F.col("day"))),
            F.lit(-1),
        ).cast("long").alias("first_upper_day"),
        F.coalesce(
            F.min(F.when(F.col("llr") <= -SPRT_BOUND_MILLI, F.col("day"))),
            F.lit(-1),
        ).cast("long").alias("first_lower_day"),
    ).withColumn(
        "decision",
        F.expr(
            "CASE WHEN first_upper_day >= 0 AND (first_lower_day < 0"
            " OR first_upper_day <= first_lower_day) THEN 'h1'"
            " WHEN first_lower_day >= 0 THEN 'h0'"
            " ELSE 'continue' END"
        ),
    )


SPRT_MONITOR_SQL = f"""
WITH users AS (
  SELECT MIN(epoch_us(ts) // 86400000000) AS day,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END)
                 > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
accrual AS (
  SELECT day, COUNT(*) AS nu, SUM(conv) AS nc FROM users GROUP BY day
),
path AS (
  SELECT day,
         SUM(nu) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_u,
         SUM(nc * {SPRT_L1_MILLI} + (nu - nc) * {SPRT_L0_MILLI})
           OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS llr
  FROM accrual
),
agg AS (
  SELECT COUNT(*) AS n_days, MAX(cum_u) AS n_users,
         MAX_BY(llr, day) AS llr_final,
         COALESCE(MIN(CASE WHEN llr >= {SPRT_BOUND_MILLI} THEN day END),
                  -1) AS up_day,
         COALESCE(MIN(CASE WHEN llr <= -{SPRT_BOUND_MILLI} THEN day END),
                  -1) AS lo_day
  FROM path
)
SELECT CAST(n_days AS BIGINT) AS n_days, CAST(n_users AS BIGINT) AS n_users,
       CAST(llr_final AS BIGINT) AS llr_final_milli,
       CAST(up_day AS BIGINT) AS first_upper_day,
       CAST(lo_day AS BIGINT) AS first_lower_day,
       CASE WHEN up_day >= 0 AND (lo_day < 0 OR up_day <= lo_day)
            THEN 'h1'
            WHEN lo_day >= 0 THEN 'h0'
            ELSE 'continue' END AS decision
FROM agg
"""


# ---------------------------------------------------------------------------
# Kaplan–Meier product-limit survival
# ---------------------------------------------------------------------------


def _km_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week_bucket, d, c): reorder-gap events and right-censored open
    tails per {KM_BUCKET_DAYS}-day bucket. Distributed: one lag window
    per customer (entity-partitioned), one per-customer aggregate for
    the tail, two bucket groupBys."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderdate").over(w).alias("prev_date"),
        )
        .filter(F.col("prev_date").isNotNull())
        .select(
            (
                F.datediff(F.col("o_orderdate"), F.col("prev_date"))
                / KM_BUCKET_DAYS
            )
            .cast("long")
            .alias("week_bucket")
        )
    )
    events = gaps.groupBy("week_bucket").agg(
        F.count(F.lit(1)).alias("d")
    )
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    tails = (
        o.groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("last_date"))
        .crossJoin(F.broadcast(maxd))
        .select(
            (
                F.datediff(F.col("maxd"), F.col("last_date"))
                / KM_BUCKET_DAYS
            )
            .cast("long")
            .alias("week_bucket")
        )
        .groupBy("week_bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        events.join(tails, "week_bucket", "full")
        .select(
            "week_bucket",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )


def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week_bucket, n_events, n_censored, n_at_risk, s_ppm): the
    product-limit survival curve of the customer reorder interval
    with administrative right-censoring (each customer's open tail
    from their last order to the dataset's max order date). n_at_risk
    = reverse cumulative (events + censored); the curve is the exact
    truncating fold S_ppm ← S_ppm·(n_at_risk − d) div n_at_risk from
    S = 1e6, bucket-ascending — each step truncates identically in
    both engines, so the whole curve is bit-stable (the "float
    cumulative product" repurchase_hazard_table deferred, made
    integer).

    Scale shape: the fact table feeds one entity-partitioned lag
    window and two groupBys; everything after is the ≤|weeks|
    aggregate. The fold itself runs on the driver over that
    calendar-bounded frame (the iterative-op posture — the collected
    frame can never be fact-sized) and re-enters Spark as a literal
    DataFrame."""
    buckets = _km_buckets(spark, sf_dir)
    cum = Window.orderBy(F.desc("week_bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        buckets.withColumn(
            "n_at_risk", F.sum(F.col("d") + F.col("c")).over(cum)
        )
        .orderBy("week_bucket")
        .collect()  # ≤ |weeks| rows — calendar-bounded
    )
    s = 1_000_000
    rows = []
    for r in risk:
        n = int(r["n_at_risk"])
        d = int(r["d"])
        s = s * (n - d) // n
        rows.append((int(r["week_bucket"]), d, int(r["c"]), n, s))
    return values_df(spark,
        rows,
        "week_bucket long, n_events long, n_censored long,"
        " n_at_risk long, s_ppm long",
    ).orderBy("week_bucket")


KAPLAN_MEIER_SQL = f"""
WITH RECURSIVE gaps AS (
  SELECT CAST(datediff('day', prev_date, o_orderdate)
              // {KM_BUCKET_DAYS} AS BIGINT) AS week_bucket
  FROM (
    SELECT o_orderdate,
           LAG(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_date
    FROM orders
  )
  WHERE prev_date IS NOT NULL
),
events AS (
  SELECT week_bucket, COUNT(*) AS d FROM gaps GROUP BY week_bucket
),
maxd AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
tails AS (
  SELECT CAST(datediff('day', last_date, maxd)
              // {KM_BUCKET_DAYS} AS BIGINT) AS week_bucket,
         COUNT(*) AS c
  FROM (
    SELECT o_custkey, MAX(o_orderdate) AS last_date
    FROM orders GROUP BY o_custkey
  ) CROSS JOIN maxd
  GROUP BY 1
),
buckets AS (
  SELECT COALESCE(e.week_bucket, t.week_bucket) AS week_bucket,
         COALESCE(e.d, 0) AS d, COALESCE(t.c, 0) AS c
  FROM events e FULL JOIN tails t ON t.week_bucket = e.week_bucket
),
risk AS (
  SELECT week_bucket, d, c,
         SUM(d + c) OVER (ORDER BY week_bucket DESC
                          ROWS UNBOUNDED PRECEDING) AS n_at_risk,
         ROW_NUMBER() OVER (ORDER BY week_bucket) AS i
  FROM buckets
),
km AS (
  SELECT i, week_bucket, d, c, n_at_risk,
         1000000 * (n_at_risk - d) // n_at_risk AS s
  FROM risk WHERE i = 1
  UNION ALL
  SELECT r.i, r.week_bucket, r.d, r.c, r.n_at_risk,
         km.s * (r.n_at_risk - r.d) // r.n_at_risk AS s
  FROM risk r JOIN km ON r.i = km.i + 1
)
SELECT CAST(week_bucket AS BIGINT) AS week_bucket,
       CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(s AS BIGINT) AS s_ppm
FROM km ORDER BY week_bucket
"""
