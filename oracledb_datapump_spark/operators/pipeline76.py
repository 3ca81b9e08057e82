"""Batch 76: EDF drift testing & randomization inference.

Completes the two-sample EDF family (KS sup-norm in pipeline61, CvM L²
in batch 74) with the variance-weighted Anderson–Darling criterion,
and adds the assumption-free randomization test that validates every
parametric arm comparison in the suite.

- ``anderson_darling_drift`` — the two-sample Anderson–Darling A²
  (Pettitt 1976 rank form) between the calendar halves of the daily
  revenue series: A² = (1/(nm))·Σᵢ (Mᵢ·N − n·i)² / (i·(N−i)) over the
  pooled order, which up-weights the DISTRIBUTION TAILS the CvM
  criterion treats evenly — the standard pick when tail drift is what
  matters. Exact integer via per-term staged division; ties broken by
  the (value, day) unique key identically in both engines (the
  large-sample statistic under a deterministic tie order — documented
  approximation, same posture as Page's L under ties).
- ``permutation_test_arm_diff`` — a {PERM_B}-draw re-randomization
  test of the per-user value difference between the two hash arms:
  the original assignment IS Bernoulli(1/2) by md5 hash
  (srm_bucket_audit's scheme), so re-drawing labels with fresh
  hash streams samples the true randomization distribution.
  Statistic: per-arm mean in ppm-cents (integer div, comparable
  across draws); p = (1 + #extreme)/(B + 1) with the add-one
  guarantee p > 0. The deterministic-hash analog of
  hash_bootstrap_ci — no distributional assumptions at all.

Reference scope note: extends the reference's analytics surface per
SURVEY §2.9-2.10; the reference engine ships data movement only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64

#: two-sample Anderson–Darling A² upper 5% point (large-sample,
#: Pettitt 1976 / Scholz–Stephens table), milli.
AD_CRIT_MILLI = 2_492
#: permutation draws (hash_bootstrap_ci's BOOT_B posture, doubled).
PERM_B = 64
#: two-sided significance level for the permutation p, ppm.
PERM_ALPHA_PPM = 50_000


def anderson_darling_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_first, n_second, a2_milli, drift_flag): the two-sample
    Anderson–Darling criterion between first- and second-half daily
    revenues (calendar-midpoint split — the ks/cvm convention).
    Pettitt's rank form over the pooled unique order (value, day):
    with Mᵢ = first-half count among the first i pooled values,
    termᵢ = (Mᵢ·N − n·i)²·1000 div (i·(N−i)) and
    a2_milli = Σ termᵢ div (n·m). The per-term early division keeps
    every intermediate in int64 to |days| ≈ 7e4 — d²·1000 with
    d ≤ nn²/2 (calendar-bounded forever); both engines truncate
    identically. Drift at A² >
    {AD_CRIT_MILLI} milli (upper 5% of the limiting distribution).

    Scale shape: everything runs on the ≤|days| daily aggregate after
    one orders scan; two rank windows over it (exemption table) and a
    1-row reduce."""
    from .pipeline72 import _daily

    d = _daily(spark, sf_dir)
    bounds = d.agg(
        F.expr("(min(day) + max(day) + 1) div 2").alias("mid")
    )
    s = d.crossJoin(F.broadcast(bounds)).select(
        "day", "x", F.expr("CAST(day < mid AS LONG)").alias("s0")
    )
    w = Window.orderBy("x", "day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    path = s.select(
        F.row_number().over(Window.orderBy("x", "day")).alias("i"),
        F.sum("s0").over(w).alias("m_i"),
    )
    tot = s.agg(
        F.sum("s0").alias("n0"),
        F.sum(F.expr("1 - s0")).alias("n1"),
        F.count(F.lit(1)).alias("nn"),
    )
    return (
        path.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("nn"))
        .select(
            "n0",
            "n1",
            F.expr(
                "(m_i * nn - n0 * i) * (m_i * nn - n0 * i) * 1000"
                " div (i * (nn - i))"
            ).alias("term"),
        )
        .groupBy("n0", "n1")
        .agg(F.sum("term").alias("ts"))
        .select(
            F.col("n0").cast("long").alias("n_first"),
            F.col("n1").cast("long").alias("n_second"),
            F.expr("ts div (n0 * n1)").cast("long").alias("a2_milli"),
        )
        .withColumn("drift_flag", F.col("a2_milli") > AD_CRIT_MILLI)
    )


def _ad_sql() -> str:
    from .pipeline72 import _DAILY_CTE

    return f"""
WITH {_DAILY_CTE.strip()},
bounds AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM daily),
s AS (
  SELECT day, x, CASE WHEN day < mid THEN 1 ELSE 0 END AS s0
  FROM daily CROSS JOIN bounds
),
path AS (
  SELECT ROW_NUMBER() OVER (ORDER BY x, day) AS i,
         SUM(s0) OVER (ORDER BY x, day ROWS UNBOUNDED PRECEDING) AS m_i
  FROM s
),
tot AS (
  SELECT SUM(s0) AS n0, SUM(1 - s0) AS n1, COUNT(*) AS nn FROM s
),
terms AS (
  SELECT n0, n1,
         (m_i * nn - n0 * i) * (m_i * nn - n0 * i) * 1000
           // (i * (nn - i)) AS term
  FROM path CROSS JOIN tot
  WHERE i < nn
),
agg AS (SELECT n0, n1, SUM(term) AS ts FROM terms GROUP BY n0, n1)
SELECT CAST(n0 AS BIGINT) AS n_first, CAST(n1 AS BIGINT) AS n_second,
       CAST(ts // (n0 * n1) AS BIGINT) AS a2_milli,
       ts // (n0 * n1) > {AD_CRIT_MILLI} AS drift_flag
FROM agg
"""


ANDERSON_DARLING_SQL = _ad_sql()


# ---------------------------------------------------------------------------
# Re-randomization (permutation) test over the hash arms
# ---------------------------------------------------------------------------


def permutation_test_arm_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_users, b_perms, obs_diff_ppm, n_extreme, p_ppm, signif_flag):
    a {PERM_B}-draw re-randomization test of the between-arm per-user
    value difference. The observed assignment is Bernoulli(1/2) by
    md5 hash (pipeline73's 'qte:' arms), so fresh hash streams
    'perm:b:' sample the SAME randomization distribution — the test
    is exact up to Monte-Carlo error with NO distributional
    assumptions. Statistic per draw: arm-mean difference in ppm-cents
    (integer div, scale-free across draws); p = (1 + #{|diff_b| ≥
    |diff_obs|}) / (B+1) ppm with the add-one correction (p can never
    be 0 — the observed draw counts itself).

    Scale shape: one events scan → per-user aggregate; the draw
    explode is a broadcast of {PERM_B} literals (B·|users| rows, one
    shuffle to the ≤B-row per-draw aggregate); everything after is a
    B-row frame."""
    from .pipeline73 import _user_arm_values

    users = _user_arm_values(spark, sf_dir)
    obs = users.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "sum(CASE WHEN arm = 1 THEN m END) * 1000000"
            " div sum(CAST(arm = 1 AS LONG))"
            " - sum(CASE WHEN arm = 0 THEN m END) * 1000000"
            " div sum(CAST(arm = 0 AS LONG))"
        ).alias("d_obs"),
    )
    draws = spark.range(1, PERM_B + 1).select(F.col("id").alias("b"))
    perm = (
        users.crossJoin(F.broadcast(draws))
        .select(
            "b",
            "m",
            F.pmod(
                hash64(
                    F.concat(
                        F.lit("perm:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                F.lit(2),
            ).alias("parm"),
        )
        .groupBy("b")
        .agg(
            F.expr(
                "sum(CASE WHEN parm = 1 THEN m END) * 1000000"
                " div sum(CAST(parm = 1 AS LONG))"
                " - sum(CASE WHEN parm = 0 THEN m END) * 1000000"
                " div sum(CAST(parm = 0 AS LONG))"
            ).alias("d_b")
        )
    )
    return (
        perm.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).alias("bb"),
            F.max("d_obs").alias("d_obs"),
            F.sum(
                F.expr("CAST(abs(d_b) >= abs(d_obs) AS LONG)")
            ).alias("ne"),
        )
        .select(
            F.col("n").cast("long").alias("n_users"),
            F.col("bb").cast("long").alias("b_perms"),
            F.col("d_obs").cast("long").alias("obs_diff_ppm"),
            F.col("ne").cast("long").alias("n_extreme"),
            F.expr("(1 + ne) * 1000000 div (bb + 1)")
            .cast("long")
            .alias("p_ppm"),
        )
        .withColumn("signif_flag", F.col("p_ppm") < PERM_ALPHA_PPM)
    )


def _perm_sql() -> str:
    from .pipeline73 import _ARM_USERS_CTE

    h = sql_hash64(
        "'perm:' || CAST(b AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)"
    )
    return f"""
WITH {_ARM_USERS_CTE.strip()},
obs AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN arm = 1 THEN m END) * 1000000
           // SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
         - SUM(CASE WHEN arm = 0 THEN m END) * 1000000
           // SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS d_obs
  FROM users
),
draws AS (SELECT unnest(range(1, {PERM_B + 1})) AS b),
perm AS (
  SELECT b,
         SUM(CASE WHEN parm = 1 THEN m END) * 1000000
           // SUM(CASE WHEN parm = 1 THEN 1 ELSE 0 END)
         - SUM(CASE WHEN parm = 0 THEN m END) * 1000000
           // SUM(CASE WHEN parm = 0 THEN 1 ELSE 0 END) AS d_b
  FROM (
    SELECT b, m, {h} % 2 AS parm
    FROM users CROSS JOIN draws
  ) GROUP BY b
),
agg AS (
  SELECT MAX(n) AS n, COUNT(*) AS bb, MAX(d_obs) AS d_obs,
         SUM(CASE WHEN abs(d_b) >= abs(d_obs) THEN 1 ELSE 0 END) AS ne
  FROM perm CROSS JOIN obs
)
SELECT CAST(n AS BIGINT) AS n_users, CAST(bb AS BIGINT) AS b_perms,
       CAST(d_obs AS BIGINT) AS obs_diff_ppm,
       CAST(ne AS BIGINT) AS n_extreme,
       CAST((1 + ne) * 1000000 // (bb + 1) AS BIGINT) AS p_ppm,
       (1 + ne) * 1000000 // (bb + 1) < {PERM_ALPHA_PPM} AS signif_flag
FROM agg
"""


PERMUTATION_TEST_SQL = _perm_sql()
