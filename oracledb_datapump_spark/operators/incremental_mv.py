"""Incremental materialized-view maintenance (delta-merge aggregation).

``mv_delta_maintain`` maintains a monthly revenue MV per
(ym, priority) the way a production refresh job does at 100 TB: the
*base* partial states were aggregated once from the history before a
cutover date, the *delta* partial states aggregate only the new
partition, and the refresh MERGES the two partial-state tables — a
|MV|-sized re-aggregation that never rescans the fact history. The
output carries ``n_parts`` (how many partial states fed each cell), so
the incremental structure itself sits under the cross-engine hash: a
plain full re-aggregation could not produce that column.

No reference counterpart (the reference delegates materialized views to
Oracle's own refresh machinery); this is the Spark-side analog of
FAST REFRESH, built from the partial-aggregation algebra (SUM/COUNT are
self-mergeable states) that also powers Spark's own partial aggs.

Scale note: at 100 TB the base frame is a stored MV table (|months| ×
|priorities| rows) and the delta scan prunes to the new date partition
via the pushed-down ``o_orderdate`` filter visible in the plan; the
merge shuffles only MV-sized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# delta = orders on/after this date; deliberately mid-month so exactly
# one MV cell provably merges two partial states (n_parts = 2)
MV_CUTOVER = "1996-06-15"


def _partial(o: DataFrame) -> DataFrame:
    """Self-mergeable partial state per (ym, priority): n + cents sum."""
    return o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(25,2)")) * 100)
        .cast("long")
        .alias("rev_cents"),
    )


def mv_delta_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, priority, n_orders, rev_cents, n_parts): the refreshed MV
    after merging the pre-{MV_CUTOVER} base states with the delta
    partition's states. n_parts = how many partial states contributed
    (2 in the mid-month cutover cells, 1 elsewhere).

    Plan shape: two pruned scans (the date predicate is pushed to the
    parquet reader on both arms), partial aggregation on each arm, then
    a union + re-agg over ~|MV| rows — the canonical FAST-REFRESH plan.
    """
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    base = _partial(o.filter(F.col("o_orderdate") < F.lit(MV_CUTOVER)))
    delta = _partial(o.filter(F.col("o_orderdate") >= F.lit(MV_CUTOVER)))
    merged = (
        base.unionByName(delta)
        .groupBy("ym", "priority")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("rev_cents").cast("long").alias("rev_cents"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
        )
    )
    return merged.orderBy("ym", "priority")


MV_DELTA_MAINTAIN_SQL = f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{MV_CUTOVER}'
  GROUP BY 1, 2
),
delta AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM orders WHERE o_orderdate >= TIMESTAMP '{MV_CUTOVER}'
  GROUP BY 1, 2
),
unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta
)
SELECT ym, priority,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM unioned
GROUP BY ym, priority
ORDER BY ym, priority
"""


# every RETRACT_MOD-th order is withdrawn (the simulated late
# correction/erasure feed applied to an already-materialized view)
RETRACT_MOD = 7


def mv_delta_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, priority, n_orders, rev_cents, n_parts): the MV after a
    RETRACTION delta — every {RETRACT_MOD}th order is withdrawn (a late
    correction / GDPR erasure feed), and the refresh merges the stored
    base states with NEGATIVE-multiplicity partial states (−count,
    −sum) instead of rescanning history: the classic incremental
    view-maintenance algebra, the retract half that mv_delta_maintain's
    insert half leaves out. Groups whose count reaches zero drop out of
    the view (standard IVM zero-multiplicity elimination).

    The ORACLE is a from-scratch recompute over the surviving orders
    (with n_parts derived declaratively as 1 + has-retractions), so the
    hash proves the retraction algebra equals ground truth — not merely
    that both engines ran the same merge.

    Scale: identical profile to the insert path — the retract feed
    aggregates to |MV|-sized negative states and the merge shuffles
    only MV rows; the fact history is never rescanned."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    base = _partial(o).withColumn("part", F.lit(1))
    retracted = o.filter(F.col("o_orderkey") % RETRACT_MOD == 0)
    retr = _partial(retracted).select(
        "ym",
        "priority",
        (-F.col("n_orders")).alias("n_orders"),
        (-F.col("rev_cents")).alias("rev_cents"),
        F.lit(1).alias("part"),
    )
    merged = (
        base.unionByName(retr)
        .groupBy("ym", "priority")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("rev_cents").cast("long").alias("rev_cents"),
            F.sum("part").cast("long").alias("n_parts"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return merged.orderBy("ym", "priority")


MV_DELTA_RETRACT_SQL = f"""
WITH survivors AS (
  SELECT * FROM orders WHERE o_orderkey % {RETRACT_MOD} <> 0
),
recomputed AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM survivors GROUP BY 1, 2
),
retr_cells AS (
  SELECT DISTINCT
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         o_orderpriority AS priority
  FROM orders WHERE o_orderkey % {RETRACT_MOD} = 0
)
SELECT r.ym, r.priority, r.n_orders, r.rev_cents,
       CAST(1 + CASE WHEN rc.ym IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS n_parts
FROM recomputed r
LEFT JOIN retr_cells rc ON rc.ym = r.ym AND rc.priority = r.priority
ORDER BY r.ym, r.priority
"""


# join-MV cutovers: orders are "new" past JMV_CUT_O, lineitems past
# JMV_CUT_L; staggered so all four quadrants (old x old ... new x new)
# are populated at every fixture scale
JMV_CUT_O = "1996-06-01"
JMV_CUT_L = "1996-08-01"


def mv_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, n_lines, rev_e4, n_arms): incremental maintenance of a JOIN
    materialized view — monthly revenue over orders ⋈ lineitem — by the
    classic join-delta algebra: with ΔA = new orders and ΔB = newly
    shipped lineitems,

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    so the refresh merges the STORED base states (A_old ⋈ B_old,
    aggregated once) with three delta arms, none of which rejoins the
    old-x-old bulk — the piece mv_delta_maintain's single-table algebra
    cannot express. ``n_arms`` counts how many of the four arms fed each
    month's cell, so the three-arm structure itself sits under the
    cross-engine hash: a from-scratch rejoin could not produce it.

    The ORACLE recomputes from scratch — one join with each row
    classified into its (order-new? x line-new?) quadrant — proving the
    delta algebra equals ground truth, not merely that both engines ran
    the same merge.

    Determinism: revenue is quantized at the ROW to int64 ten-thousandths
    (extendedprice·(1−discount) is exact at scale 4 in DECIMAL), so every
    aggregate is integer arithmetic in both engines.

    Scale: the base arm is a stored |MV|-sized table in production (here
    recomputed once to stay self-contained); each delta arm joins a
    date-pruned delta scan against one pruned side — at 100 TB the delta
    sides are small enough to broadcast or runtime-filter the big scan
    (bloom_join_prune is that machinery), and no arm ever touches
    old ⋈ old. The merge shuffles only |MV| x 4 partial-state rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    a_old = o.filter(F.col("o_orderdate") < F.lit(JMV_CUT_O))
    a_new = o.filter(F.col("o_orderdate") >= F.lit(JMV_CUT_O))
    b_old = l.filter(F.col("l_shipdate") < F.lit(JMV_CUT_L))
    b_new = l.filter(F.col("l_shipdate") >= F.lit(JMV_CUT_L))

    def _dec(c: str):
        return F.col(c).cast("decimal(25,2)")

    rev_e4 = (
        (_dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount")))
        * 10000
    ).cast("long")

    def _arm(orders: DataFrame, lines: DataFrame) -> DataFrame:
        """Partial state per month for one quadrant's join."""
        return (
            orders.join(lines, orders.o_orderkey == lines.l_orderkey)
            .groupBy(
                (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                .cast("long")
                .alias("ym")
            )
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(rev_e4).alias("rev_e4"),
            )
        )

    arms = [
        _arm(a_old, b_old),  # stored base MV states
        _arm(a_new, b_old),  # ΔA ⋈ B_old
        _arm(a_old, b_new),  # A_old ⋈ ΔB
        _arm(a_new, b_new),  # ΔA ⋈ ΔB
    ]
    unioned = arms[0]
    for arm in arms[1:]:
        unioned = unioned.unionByName(arm)
    return (
        unioned.groupBy("ym")
        .agg(
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("rev_e4").cast("long").alias("rev_e4"),
            F.count(F.lit(1)).cast("long").alias("n_arms"),
        )
        .orderBy("ym")
    )


MV_JOIN_DELTA_SQL = f"""
WITH j AS (
  SELECT CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT) AS ym,
         (CASE WHEN o.o_orderdate >= TIMESTAMP '{JMV_CUT_O} 00:00:00' THEN 2 ELSE 0 END
          + CASE WHEN l.l_shipdate >= TIMESTAMP '{JMV_CUT_L} 00:00:00' THEN 1 ELSE 0 END)
           AS arm,
         CAST(CAST(l.l_extendedprice AS DECIMAL(25,2))
              * (CAST(1 AS DECIMAL(25,2)) - CAST(l.l_discount AS DECIMAL(25,2)))
              * 10000 AS BIGINT) AS rev_e4
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
states AS (
  SELECT ym, arm, COUNT(*) AS n_lines, SUM(rev_e4) AS rev_e4
  FROM j GROUP BY ym, arm
)
SELECT ym, CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(rev_e4) AS BIGINT) AS rev_e4,
       CAST(COUNT(*) AS BIGINT) AS n_arms
FROM states GROUP BY ym
ORDER BY ym
"""
