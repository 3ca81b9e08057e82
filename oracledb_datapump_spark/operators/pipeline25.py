"""Pipeline dashboards, batch 26: hierarchical share-of-parent,
dormancy aging bands, and return-rate accounting.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``nation_share_of_region``: the percent-of-parent report — every
  nation's revenue as ppm of its REGION, with in-region rank; the
  hierarchy rollup every BI tool renders as a drill-down.
- ``customer_dormancy_bands``: recency aging — customers banded by
  days since their last order (including never-ordered, via the LEFT
  join that an inner join would silently drop) with the lifetime
  revenue at stake per band.
- ``returns_rate_by_brand``: returned-line and returned-revenue share
  per brand — the quality signal that catches a bad batch or a
  misleading listing long before margins show it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

DAY_US = 86_400_000_000


def nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region, nation, revenue_cents, share_of_region_ppm,
    rank_in_region): nation order revenue as exact ppm of its region's
    total, ranked within the region (revenue desc, nation asc ties).

    Plan: broadcast dims onto one orders scan, a |nations| groupBy;
    the share and rank windows partition by region over 25 aggregated
    rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("rc"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("rc").cast("decimal(38,0)")).alias("rev"))
    )
    wr = W.partitionBy("region")
    wk = W.partitionBy("region").orderBy(F.desc("rev"), F.asc("nation"))
    return (
        rev.withColumn("rtot", F.sum("rev").over(wr))
        .withColumn("rank_in_region", F.row_number().over(wk))
        .select(
            "region",
            "nation",
            F.col("rev").cast("long").alias("revenue_cents"),
            F.expr("CAST(rev * 1000000 div rtot AS BIGINT)").alias(
                "share_of_region_ppm"
            ),
            F.col("rank_in_region").cast("long"),
        )
        .orderBy("region", "rank_in_region")
    )


NATION_SHARE_OF_REGION_SQL = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, CAST(rev AS BIGINT) AS revenue_cents,
       CAST(rev * 1000000 // SUM(rev) OVER (PARTITION BY region)
            AS BIGINT) AS share_of_region_ppm,
       CAST(ROW_NUMBER() OVER (PARTITION BY region
                               ORDER BY rev DESC, nation) AS BIGINT)
         AS rank_in_region
FROM rev
ORDER BY region, rank_in_region
"""


# -- customer dormancy bands --------------------------------------------------

DORMANCY_BANDS = ((30, "active_30d"), (90, "cooling_90d"), (365, "dormant_1y"))


def customer_dormancy_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, n_customers, lifetime_revenue_cents): customers banded by
    days since their LAST order relative to the timeline's end
    (self-calibrating max order day): ≤30 active, ≤90 cooling, ≤365
    dormant, older = lost, plus 'never_ordered' — the LEFT join keeps
    customers with zero orders, which an inner join (the classic CRM
    report bug) silently drops. Lifetime revenue says what each band
    is worth.

    Plan: one |customers| groupBy of orders (max day + revenue sum),
    a broadcast one-row max, a LEFT join from the customer dim, a
    ≤5-row band groupBy."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}")
        .alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("rc"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.max("od").alias("last_od"),
        F.sum(F.col("rc").cast("decimal(38,0)")).alias("ltv"),
    )
    end = o.agg(F.max("od").alias("end_od"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey")
    )
    j = (
        c.join(per_cust, "o_custkey", "left")
        .crossJoin(F.broadcast(end))
        .withColumn("age", F.col("end_od") - F.col("last_od"))
    )
    band = (
        F.when(F.col("last_od").isNull(), "never_ordered")
        .when(F.col("age") <= DORMANCY_BANDS[0][0], DORMANCY_BANDS[0][1])
        .when(F.col("age") <= DORMANCY_BANDS[1][0], DORMANCY_BANDS[1][1])
        .when(F.col("age") <= DORMANCY_BANDS[2][0], DORMANCY_BANDS[2][1])
        .otherwise("lost")
    )
    return (
        j.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.coalesce(F.sum("ltv"), F.lit(0))
            .cast("long")
            .alias("lifetime_revenue_cents"),
        )
        .orderBy("band")
    )


CUSTOMER_DORMANCY_SQL = f"""
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) // {DAY_US} AS od,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rc
  FROM orders
),
per_cust AS (
  SELECT o_custkey, MAX(od) AS last_od, SUM(rc) AS ltv
  FROM o GROUP BY o_custkey
),
e AS (SELECT MAX(od) AS end_od FROM o),
j AS (
  SELECT p.last_od, p.ltv, e.end_od - p.last_od AS age
  FROM customer c
  LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey
  CROSS JOIN e
)
SELECT CASE WHEN last_od IS NULL THEN 'never_ordered'
            WHEN age <= {DORMANCY_BANDS[0][0]} THEN '{DORMANCY_BANDS[0][1]}'
            WHEN age <= {DORMANCY_BANDS[1][0]} THEN '{DORMANCY_BANDS[1][1]}'
            WHEN age <= {DORMANCY_BANDS[2][0]} THEN '{DORMANCY_BANDS[2][1]}'
            ELSE 'lost' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COALESCE(SUM(ltv), 0) AS BIGINT) AS lifetime_revenue_cents
FROM j
GROUP BY 1
ORDER BY band
"""


# -- returns by brand ----------------------------------------------------------


def returns_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, n_lines, n_returned, returned_rev_ppm): per brand, the
    returned-line count and the ppm of the brand's revenue that came
    back (l_returnflag = 'R') — the product-quality alarm. Revenue
    shares use exact cents.

    Plan: one broadcast part join, one |brands| groupBy with
    conditional sums."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("rc"),
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    return (
        l.join(F.broadcast(p), "l_partkey")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum((F.col("l_returnflag") == "R").cast("long"))
            .cast("long")
            .alias("n_returned"),
            F.expr(
                "CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN rc ELSE 0 END"
                " AS DECIMAL(38,0))) * 1000000"
                " div greatest(sum(CAST(rc AS DECIMAL(38,0))), 1) AS BIGINT)"
            ).alias("returned_rev_ppm"),
        )
        .orderBy("brand")
    )


RETURNS_RATE_BY_BRAND_SQL = """
WITH l AS (
  SELECT p.p_brand AS brand, l.l_returnflag,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS rc
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN rc ELSE 0 END) * 1000000
            // GREATEST(SUM(rc), 1) AS BIGINT) AS returned_rev_ppm
FROM l
GROUP BY brand
ORDER BY brand
"""
