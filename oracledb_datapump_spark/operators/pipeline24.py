"""Pipeline dashboards, batch 25: SLO error-budget burn-down, top-k
turnover between eras, grouped integer correlation, and the OTIF
supply-chain KPI.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``slo_burn_report``: the SRE error-budget view of shipping — monthly
  SLA violations against a 5% allowance, with the cumulative budget
  balance that tells you WHEN the quarter's budget died, not just that
  it did.
- ``heavyhitter_turnover``: how stable is the revenue top-{TURNOVER_K}?
  Entered/exited/stayed between the timeline's two halves plus total
  rank displacement among stayers — the churn-of-the-leaderboard
  number behind "is our catalog concentrating".
- ``qty_price_correlation_by_brand``: Pearson corr(quantity, unit
  price) per brand in exact integer moments — the crude elasticity
  screen (negative = discounting moves volume).
- ``otif_by_month``: On-Time-In-Full — the share of orders whose EVERY
  line shipped within the SLA window, by order month; the KPI where
  order-level ALL-quantification (anti-join/min semantics) matters,
  not line-level averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

DAY_US = 86_400_000_000
SLA_DAYS = 30
SLO_ALLOW_PPM = 50_000  # 5% of lines may breach per month


def _order_lines(spark: SparkSession, sf_dir: str):
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}")
        .alias("od"),
        F.expr(
            "year(o_orderdate) * 100 + month(o_orderdate)"
        ).alias("ym"),
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {DAY_US}")
        .alias("sd"),
    )
    return o.join(l, "o_orderkey").withColumn(
        "late", (F.col("sd") - F.col("od") > SLA_DAYS).cast("long")
    )


def slo_burn_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, n_lines, n_late, burn_ppm, budget_balance): per order
    month, lines breaching the {SLA_DAYS}-day ship SLA, the month's
    burn in ppm of its lines, and the CUMULATIVE error-budget balance
    (Σ allowed − Σ late, where allowed = {SLO_ALLOW_PPM} ppm of each
    month's lines) — positive means budget in hand, the first negative
    month is when the SLO died. The windowed-burn-down formulation
    SREs use, in exact integers.

    Plan: one orderkey join, a ≤|months| groupBy, two cumulative
    windows over those month rows."""
    monthly = (
        _order_lines(spark, sf_dir)
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("late").alias("n_late"),
        )
    )
    wc = W.orderBy("ym").rowsBetween(W.unboundedPreceding, 0)
    return (
        monthly.withColumn(
            "budget_balance",
            F.sum(
                F.expr(f"n_lines * {SLO_ALLOW_PPM} div 1000000 - n_late")
            ).over(wc),
        )
        .select(
            F.col("ym").cast("long"),
            F.col("n_lines").cast("long"),
            F.col("n_late").cast("long"),
            F.expr("CAST(n_late * 1000000 div n_lines AS BIGINT)").alias(
                "burn_ppm"
            ),
            F.col("budget_balance").cast("long"),
        )
        .orderBy("ym")
    )


SLO_BURN_REPORT_SQL = f"""
WITH j AS (
  SELECT year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
         CASE WHEN epoch_us(l.l_shipdate) // {DAY_US}
                   - epoch_us(o.o_orderdate) // {DAY_US} > {SLA_DAYS}
              THEN 1 ELSE 0 END AS late
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
monthly AS (
  SELECT ym, COUNT(*) AS n_lines, SUM(late) AS n_late
  FROM j GROUP BY ym
)
SELECT CAST(ym AS BIGINT) AS ym, CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_late AS BIGINT) AS n_late,
       CAST(n_late * 1000000 // n_lines AS BIGINT) AS burn_ppm,
       CAST(SUM(n_lines * {SLO_ALLOW_PPM} // 1000000 - n_late)
              OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS budget_balance
FROM monthly
ORDER BY ym
"""


# -- top-k turnover between eras ---------------------------------------------

TURNOVER_K = 50


def heavyhitter_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_stayed, n_entered, n_exited, rank_displacement,
    stay_ppm): the revenue top-{TURNOVER_K} parts of the timeline's
    first half vs its second half (self-calibrating mid-ship-date
    split): how many stayed on the leaderboard, how many churned, and
    the total |rank shift| among stayers. Rank ties break by partkey,
    so both engines pick identical leaderboards.

    Plan: one scan → (part, era) groupBy; each era's top-k is a
    distributed sort+LIMIT (TakeOrderedAndProject) over the
    |parts×2| aggregated rows; the comparison joins two
    {TURNOVER_K}-row frames."""
    from ..events_source import pin_utc

    pin_utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {DAY_US}")
        .alias("sd"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("rc"),
    )
    mid = l.agg(F.expr("(min(sd) + max(sd) + 1) div 2").alias("mid"))
    era = l.crossJoin(F.broadcast(mid)).select(
        "l_partkey",
        "rc",
        F.when(F.col("sd") < F.col("mid"), "a").otherwise("b").alias("era"),
    )
    rev = era.groupBy("era", "l_partkey").agg(F.sum("rc").alias("rev"))

    def topk(tag):
        w = W.orderBy(F.desc("rev"), F.asc("l_partkey"))
        return (
            rev.filter(F.col("era") == tag)
            .orderBy(F.desc("rev"), F.asc("l_partkey"))
            .limit(TURNOVER_K)
            .withColumn("rk", F.row_number().over(w))
            .select("l_partkey", F.col("rk").alias(f"rk_{tag}"))
        )

    j = topk("a").join(topk("b"), "l_partkey", "full_outer")
    return j.agg(
        F.sum(
            (F.col("rk_a").isNotNull() & F.col("rk_b").isNotNull()).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_stayed"),
        F.sum(
            (F.col("rk_a").isNull() & F.col("rk_b").isNotNull()).cast("long")
        )
        .cast("long")
        .alias("n_entered"),
        F.sum(
            (F.col("rk_a").isNotNull() & F.col("rk_b").isNull()).cast("long")
        )
        .cast("long")
        .alias("n_exited"),
        F.sum(
            F.when(
                F.col("rk_a").isNotNull() & F.col("rk_b").isNotNull(),
                F.abs(F.col("rk_a") - F.col("rk_b")),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("rank_displacement"),
        F.expr(
            "CAST(sum(CASE WHEN rk_a IS NOT NULL AND rk_b IS NOT NULL"
            f" THEN 1 ELSE 0 END) * 1000000 div {TURNOVER_K} AS BIGINT)"
        ).alias("stay_ppm"),
    )


HEAVYHITTER_TURNOVER_SQL = f"""
WITH l AS (
  SELECT l_partkey, epoch_us(l_shipdate) // {DAY_US} AS sd,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS rc
  FROM lineitem
),
mid AS (SELECT (MIN(sd) + MAX(sd) + 1) // 2 AS mid FROM l),
rev AS (
  SELECT CASE WHEN sd < mid THEN 'a' ELSE 'b' END AS era, l_partkey,
         SUM(rc) AS rev
  FROM l CROSS JOIN mid GROUP BY 1, 2
),
ta AS (
  SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey)
           AS rk_a
  FROM rev WHERE era = 'a' ORDER BY rev DESC, l_partkey LIMIT {TURNOVER_K}
),
tb AS (
  SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey)
           AS rk_b
  FROM rev WHERE era = 'b' ORDER BY rev DESC, l_partkey LIMIT {TURNOVER_K}
),
j AS (
  SELECT COALESCE(ta.l_partkey, tb.l_partkey) AS k, ta.rk_a, tb.rk_b
  FROM ta FULL OUTER JOIN tb ON tb.l_partkey = ta.l_partkey
)
SELECT CAST(SUM(CASE WHEN rk_a IS NOT NULL AND rk_b IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_stayed,
       CAST(SUM(CASE WHEN rk_a IS NULL AND rk_b IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_entered,
       CAST(SUM(CASE WHEN rk_a IS NOT NULL AND rk_b IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exited,
       CAST(SUM(CASE WHEN rk_a IS NOT NULL AND rk_b IS NOT NULL
                     THEN ABS(rk_a - rk_b) ELSE 0 END) AS BIGINT)
         AS rank_displacement,
       CAST(SUM(CASE WHEN rk_a IS NOT NULL AND rk_b IS NOT NULL
                     THEN 1 ELSE 0 END) * 1000000 // {TURNOVER_K}
            AS BIGINT) AS stay_ppm
FROM j
"""


# -- grouped integer Pearson -------------------------------------------------


def qty_price_correlation_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, n_lines, r_ppm): Pearson correlation between quantity
    and UNIT price (extendedprice/quantity, in cents) per brand — the
    crude elasticity screen: strongly negative means volume follows
    discounting; near zero means quantities are set by need, not
    price. Exact integer moments per GROUP (the grouped form of the
    floor-sqrt/sign-split recipe used by ``degree_assortativity``).

    Plan: one partkey join (broadcast part dim), one groupBy(brand)
    computing all five moments as DECIMAL(38,0) conditional sums —
    |brands| rows out, everything else row-local."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("q"),
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("up"),
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    m = (
        l.join(F.broadcast(p), "l_partkey")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("q").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("up").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("q") * F.col("up")).cast("decimal(38,0)")).alias(
                "sxy"
            ),
            F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias(
                "sxx"
            ),
            F.sum((F.col("up") * F.col("up")).cast("decimal(38,0)")).alias(
                "syy"
            ),
        )
    )
    return m.select(
        "brand",
        F.col("n").cast("long").alias("n_lines"),
        F.expr(
            "CAST(sign(n * sxy - sx * sy) *"
            " (abs(n * sxy - sx * sy) * 1000000 div"
            "  greatest(CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)))"
            "           AS DECIMAL(38,0)) *"
            "           CAST(floor(sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
            "           AS DECIMAL(38,0)), 1)) AS BIGINT)"
        ).alias("r_ppm"),
    ).orderBy("brand")


QTY_PRICE_CORRELATION_SQL = """
WITH l AS (
  SELECT p.p_brand AS brand, CAST(l.l_quantity AS BIGINT) AS q,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           // CAST(l.l_quantity AS BIGINT) AS up
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
m AS (
  SELECT brand, COUNT(*) AS n,
         SUM(CAST(q AS HUGEINT)) AS sx, SUM(CAST(up AS HUGEINT)) AS sy,
         SUM(CAST(q AS HUGEINT) * up) AS sxy,
         SUM(CAST(q AS HUGEINT) * q) AS sxx,
         SUM(CAST(up AS HUGEINT) * up) AS syy
  FROM l GROUP BY brand
)
SELECT brand, CAST(n AS BIGINT) AS n_lines,
       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END *
            (ABS(n * sxy - sx * sy) * 1000000 //
             GREATEST(CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)))
                      AS HUGEINT) *
                      CAST(FLOOR(SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
                      AS HUGEINT), 1)) AS BIGINT) AS r_ppm
FROM m
ORDER BY brand
"""


# -- OTIF ---------------------------------------------------------------------


def otif_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, n_orders, n_otif, otif_ppm): On-Time-In-Full by order
    month — an order counts only if EVERY line shipped within the
    {SLA_DAYS}-day window (universal quantification via max(late)=0,
    never an average of line-level rates: one late line fails the
    order, which is why OTIF is always lower than line-level on-time
    share).

    Plan: the per-order ALL reduces in the same orderkey-partitioned
    groupBy that the join produces; the month rollup is ≤|months|
    rows."""
    per_order = (
        _order_lines(spark, sf_dir)
        .groupBy("o_orderkey", "ym")
        .agg(F.max("late").alias("any_late"))
    )
    return (
        per_order.groupBy("ym")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum((F.col("any_late") == 0).cast("long"))
            .cast("long")
            .alias("n_otif"),
        )
        .select(
            F.col("ym").cast("long"),
            "n_orders",
            "n_otif",
            F.expr("CAST(n_otif * 1000000 div n_orders AS BIGINT)").alias(
                "otif_ppm"
            ),
        )
        .orderBy("ym")
    )


OTIF_BY_MONTH_SQL = f"""
WITH j AS (
  SELECT o.o_orderkey,
         year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
         CASE WHEN epoch_us(l.l_shipdate) // {DAY_US}
                   - epoch_us(o.o_orderdate) // {DAY_US} > {SLA_DAYS}
              THEN 1 ELSE 0 END AS late
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
per_order AS (
  SELECT o_orderkey, ym, MAX(late) AS any_late FROM j GROUP BY 1, 2
)
SELECT CAST(ym AS BIGINT) AS ym,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN any_late = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_otif,
       CAST(SUM(CASE WHEN any_late = 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS otif_ppm
FROM per_order
GROUP BY ym
ORDER BY ym
"""
