"""Pipeline QA dashboards, batch 7 (round 6; queued for the round-7
gated prefix — hash-verified locally at both fixture scales by
tests/test_queries_oracle.py until then).

- ``nation_revenue_hhi``        revenue-concentration Herfindahl index
- ``user_activity_hhi``         per-type user-concentration index
- ``value_quartiles_by_type``   exact DISCRETE quartiles of event value
- ``order_width_histogram``     lineitems-per-order distribution

Same contracts as operators/pipeline.py: integer-exact statistics
(HHI as Σshare_ppm² div 1e6 with DECIMAL/HUGEINT accumulation,
discrete quartiles via rank selection — never an interpolating
percentile, whose midpoint arithmetic is engine-specific), oracles
composed from the primitives' own SQL. No reference analog
(SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..events_source import load_events


# ---------------------------------------------------------------------------
# revenue-concentration HHI per nation
# ---------------------------------------------------------------------------


def nation_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_suppliers, rev_cents, hhi_ppm): within each supplier
    nation, the Herfindahl-Hirschman concentration of lineitem revenue
    across its suppliers — HHI = Σ share² stated integer-exact as
    Σ(rev_s·1e6 div rev_nation)² div 1e6 (1e6 = single-supplier
    monopoly; 1e6/n = perfectly even). The supply-chain risk screen:
    a high-HHI nation fails over badly when its dominant supplier does.

    Plan: one suppkey-keyed partial-agg groupBy over lineitem (the only
    big shuffle), broadcast supplier→nation, a |nations|-row reduce.
    Per-supplier shares divide by the nation total BEFORE squaring, so
    every operand is non-negative and ≤1e6 (trunc/floor agree; no
    overflow past DECIMAL)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(25,2)")) * 100)
            .cast("decimal(38,0)")
            .alias("rev")
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "rev")
    )
    tot = per_supp.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev").alias("rev_tot"),
    )
    shares = per_supp.join(F.broadcast(tot), "nation").select(
        "nation",
        F.expr("(rev * 1000000) div rev_tot").alias("share_ppm"),
    )
    return (
        shares.groupBy("nation")
        .agg(
            F.expr(
                "CAST(SUM(CAST(share_ppm AS DECIMAL(38,0)) * share_ppm)"
                " div 1000000 AS LONG)"
            ).alias("hhi_ppm")
        )
        .join(F.broadcast(tot), "nation")
        .select(
            "nation",
            "n_suppliers",
            F.col("rev_tot").cast("long").alias("rev_cents"),
            "hhi_ppm",
        )
        .orderBy("nation")
    )


NATION_REVENUE_HHI_SQL = """
WITH per_supp AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) * 100 AS HUGEINT)
           AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, l.l_suppkey
),
tot AS (
  SELECT nation, COUNT(*) AS n_suppliers, SUM(rev) AS rev_tot
  FROM per_supp GROUP BY nation
),
shares AS (
  SELECT p.nation, (p.rev * 1000000) // t.rev_tot AS share_ppm
  FROM per_supp p JOIN tot t USING (nation)
)
SELECT s.nation, t.n_suppliers, CAST(t.rev_tot AS BIGINT) AS rev_cents,
       CAST(SUM(CAST(s.share_ppm AS HUGEINT) * s.share_ppm) // 1000000
            AS BIGINT) AS hhi_ppm
FROM shares s JOIN tot t USING (nation)
GROUP BY s.nation, t.n_suppliers, t.rev_tot
ORDER BY s.nation
"""


# ---------------------------------------------------------------------------
# user-concentration HHI per event type
# ---------------------------------------------------------------------------


def user_activity_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_users, n_events, hhi_ppm): how concentrated each
    event type's volume is across users — the bot/power-user screen
    (an 'error' type dominated by one user is one broken client, not a
    platform incident). Same integer HHI statement as
    nation_revenue_hhi, over event counts.

    Plan: one (type, user) partial-agg groupBy, a |types|-row total
    broadcast, a |types|-row reduce."""
    e = load_events(spark, sf_dir)
    per_user = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c").alias("n_tot"),
    )
    shares = per_user.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.expr("(CAST(c AS DECIMAL(38,0)) * 1000000) div n_tot").alias(
            "share_ppm"
        ),
    )
    return (
        shares.groupBy("event_type")
        .agg(
            F.expr(
                "CAST(SUM(CAST(share_ppm AS DECIMAL(38,0)) * share_ppm)"
                " div 1000000 AS LONG)"
            ).alias("hhi_ppm")
        )
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "n_users",
            F.col("n_tot").cast("long").alias("n_events"),
            "hhi_ppm",
        )
        .orderBy("event_type")
    )


USER_ACTIVITY_HHI_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, COUNT(*) AS c FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, COUNT(*) AS n_users, SUM(c) AS n_tot
  FROM per_user GROUP BY event_type
),
shares AS (
  SELECT p.event_type, (CAST(p.c AS HUGEINT) * 1000000) // t.n_tot AS share_ppm
  FROM per_user p JOIN tot t USING (event_type)
)
SELECT s.event_type, t.n_users, CAST(t.n_tot AS BIGINT) AS n_events,
       CAST(SUM(CAST(s.share_ppm AS HUGEINT) * s.share_ppm) // 1000000
            AS BIGINT) AS hhi_ppm
FROM shares s JOIN tot t USING (event_type)
GROUP BY s.event_type, t.n_users, t.n_tot
ORDER BY s.event_type
"""


# ---------------------------------------------------------------------------
# exact discrete quartiles of event value per type
# ---------------------------------------------------------------------------


def value_quartiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, p25_cents, p50_cents, p75_cents): exact
    DISCRETE quartiles of the cent-quantized event value — the k-th
    order statistic at rank ceil(n·k/4), never an interpolating
    percentile (whose midpoint arithmetic differs between engines; a
    discrete rank selection is bit-stable anywhere). Ties resolve by
    value order alone: equal values are interchangeable at a rank
    boundary, so the selected VALUE is deterministic even though row
    identity is not.

    Plan: one type-keyed sort window (rank), then a |types|-row
    conditional aggregation — the same single-shuffle shape as any
    per-group order statistic; at 100 TB a type-keyed range partition
    with AQE skew split carries it."""
    e = load_events(spark, sf_dir)
    vals = e.select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS LONG)").alias("cents"),
    )
    w = W.partitionBy("event_type").orderBy("cents")
    ranked = vals.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("event_type"))
    )
    pick = lambda k: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(f"CAST(ceil(n * {k} / 4.0) AS BIGINT)"), F.col("cents"))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            pick(1).alias("p25_cents"),
            pick(2).alias("p50_cents"),
            pick(3).alias("p75_cents"),
        )
        .orderBy("event_type")
    )


VALUE_QUARTILES_BY_TYPE_SQL = """
WITH vals AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM vals
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       MAX(CASE WHEN rn = CAST(ceil(n * 1 / 4.0) AS BIGINT) THEN cents END)
         AS p25_cents,
       MAX(CASE WHEN rn = CAST(ceil(n * 2 / 4.0) AS BIGINT) THEN cents END)
         AS p50_cents,
       MAX(CASE WHEN rn = CAST(ceil(n * 3 / 4.0) AS BIGINT) THEN cents END)
         AS p75_cents
FROM ranked GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# lineitems-per-order distribution
# ---------------------------------------------------------------------------


def order_width_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_items, n_orders): the order-width distribution — how many
    orders carry exactly k lineitems (TPC-H caps k at 7; real feeds
    don't, and a fat tail here is the skew that breaks naive per-order
    windows). The fact-table twin of dedup_group_size_histogram.

    Plan: one orderkey-keyed partial-agg groupBy, then a ≤|max-width|-
    row histogram reduce."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return (
        per.groupBy("n_items")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("n_items")
    )


ORDER_WIDTH_HISTOGRAM_SQL = """
WITH per AS (
  SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1
)
SELECT n_items, COUNT(*) AS n_orders FROM per GROUP BY 1 ORDER BY 1
"""
