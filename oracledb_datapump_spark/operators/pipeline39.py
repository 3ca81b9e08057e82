"""Batch 39: experiment analysis — the A/B readout as exact integers.

``ab_test_report`` assigns every user to an arm by the cross-engine
md5-hash64 (the repo's deterministic-sampling primitive — the same
assignment a production experiment system derives from a user id, and
reproducible across engines/runs, unlike an RNG), measures conversion
(≥1 purchase event), and flags two-proportion significance with the
pooled z-test rewritten as a cross-multiplied integer inequality so no
float variance ever computes:

    z² = (c₁n₂ − c₂n₁)²·n / (n₁n₂·c·(n−c))     (pooled, n = n₁+n₂, c = c₁+c₂)
    significant  ⇔  (c₁n₂ − c₂n₁)²·n·10⁴ > 38416·n₁n₂·c·(n−c)

(38416/10⁴ = 1.96², the 95% two-sided critical value.) Products ride
DECIMAL(38,0)/HUGEINT — the same recipe as the σ-anomaly and chi²
gates. One events scan → per-user flag → 2-row arm table; everything
after the first groupBy is constant-size at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64

Z2_NUM = 38_416  # 1.96² · 10⁴
Z2_DEN = 10_000


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, n_users, n_converted, cvr_ppm, significant): per-arm
    conversion and the pooled z-test verdict (module docstring). The
    verdict is a property of the experiment, so both rows carry it."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir)
    users = (
        e.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "conv"
            )
        )
        .withColumn(
            "arm",
            (hash64(F.col("user_id").cast("string")) % 2).cast("long"),
        )
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_converted"),
    )
    wide = (
        arms.agg(
            F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n1"),
            F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias(
                "c1"
            ),
            F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n2"),
            F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias(
                "c2"
            ),
        )
    )
    sig = F.expr(
        f"""
        (CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)
        * (CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)
        * (n1 + n2) * {Z2_DEN}
        > {Z2_NUM} * CAST(n1 AS DECIMAL(38,0)) * n2
          * (c1 + c2) * (n1 + n2 - c1 - c2)
        """
    )
    return (
        arms.crossJoin(F.broadcast(wide.select(sig.alias("significant"))))
        .select(
            F.col("arm").cast("long").alias("arm"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_converted").cast("long").alias("n_converted"),
            F.expr("n_converted * 1000000 div n_users")
            .cast("long")
            .alias("cvr_ppm"),
            "significant",
        )
        .orderBy("arm")
    )


AB_TEST_REPORT_SQL = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         {sql_hash64("CAST(user_id AS VARCHAR)")} % 2 AS arm
  FROM events
  GROUP BY user_id
),
arms AS (
  SELECT arm, COUNT(*) AS n_users, SUM(conv) AS n_converted
  FROM users GROUP BY arm
),
wide AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n_users END) AS n1,
         MAX(CASE WHEN arm = 0 THEN n_converted END) AS c1,
         MAX(CASE WHEN arm = 1 THEN n_users END) AS n2,
         MAX(CASE WHEN arm = 1 THEN n_converted END) AS c2
  FROM arms
),
verdict AS (
  SELECT (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
         * (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
         * (n1 + n2) * {Z2_DEN}
         > {Z2_NUM} * CAST(n1 AS HUGEINT) * n2
           * (c1 + c2) * (n1 + n2 - c1 - c2) AS significant
  FROM wide
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_converted AS BIGINT) AS n_converted,
       CAST(n_converted * 1000000 // n_users AS BIGINT) AS cvr_ppm,
       significant
FROM arms, verdict
ORDER BY arm
"""
