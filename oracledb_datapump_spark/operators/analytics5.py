"""Analytics batch 5: the four remaining TPC-H query shapes.

The fixture schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so (following the q4
precedent) each query keeps the reference query's *shape* — correlated
min subquery, market-share ratio, nested semi-join chain,
exists/not-exists self-join — re-expressed over the columns that exist:

- q2_min_cost_supplier: supply cost is derived from lineitem as the
  minimum observed unit price per (part, supplier) instead of
  ps_supplycost.
- q8_market_share: national revenue share within a region market.
- q20_part_promotion: "excess availability" becomes shipped-volume
  threshold per (supplier, part).
- q21_suppliers_kept_waiting: "late" is shipped >90 days after the
  order date (the q4 convention), since receipt/commit dates are absent.

Determinism contract: money aggregates in DECIMAL, unit-price division
in IEEE double (bit-identical across engines for identical operands),
casts to the same output type on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(25,{scale})")


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each PROMO part sized 10-20, the EUROPE
    supplier(s) offering it at the minimum unit price.

    Scale plan: the only big input is lineitem; one partial-aggregated
    groupBy (partkey, suppkey) reduces it to the supplier-part cost
    matrix. nation⋈region and the filtered part slice are broadcast;
    supplier joins on suppkey (shuffle, co-partitioned with the cost
    matrix at scale). The correlated MIN is a window over p_partkey —
    one more shuffle of the already-reduced matrix, not of lineitem.
    Unit price = MIN(l_extendedprice/l_quantity): IEEE double division,
    order-independent MIN → portable exact equality against the oracle.
    """
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & F.col("p_size").between(10, 20)
    )
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    s_eu = s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                  s.s_nationkey == F.col("n_nationkey"))
    joined = (
        cost.join(s_eu, cost.l_suppkey == s_eu.s_suppkey)
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
    )
    w = W.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       l_min.supply_cost AS supply_cost
FROM part,
     (SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey) l_min,
     supplier, nation, region
WHERE p_partkey = l_min.l_partkey
  AND s_suppkey = l_min.l_suppkey
  AND p_type = 'PROMO' AND p_size BETWEEN 10 AND 20
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND l_min.supply_cost = (
      SELECT MIN(i.supply_cost)
      FROM (SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey) i,
           supplier s2, nation n2, region r2
      WHERE i.l_partkey = p_partkey AND i.l_suppkey = s2.s_suppkey
        AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's share of STANDARD-part revenue sold
    into the AMERICA market, per order year.

    Scale plan: lineitem ⋈ broadcast(filtered part) prunes first (the
    most selective cut), then shuffles once on orderkey against the
    date-filtered orders, once on custkey against customers semi-joined
    to AMERICA nations (nation⋈region broadcast), and once on suppkey
    against supplier. Numerator/denominator are DECIMAL sums; the final
    share is one double division — portable.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = _t(spark, sf_dir, "nation")
    n_mkt = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n_mkt), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    n_s = n.select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    l = _t(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount"))
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(25,2)")
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE CAST(0 AS DECIMAL(25,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2))) AS volume,
           n2.n_name AS supp_nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
      AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers that shipped a significant
    volume (>40 units of any single red part) during 1997.

    Scale plan: nested semi-join chain, innermost first — lineitem is
    pruned by shipdate at the scan, joined to the broadcast red-part
    slice, partial-aggregated per (suppkey, partkey); the HAVING
    threshold reduces it to a small distinct-supplier set which
    left-semi-joins supplier (no row duplication at any step).
    DECIMAL quantity sum → exact threshold compare on both engines.
    """
    p_red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    big_shippers = (
        l.join(F.broadcast(p_red), l.l_partkey == p_red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(40).cast("decimal(25,2)"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(big_shippers, s.s_suppkey == big_shippers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(25,2))) > CAST(40 AS DECIMAL(25,2))
)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
ORDER BY s_name
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* late shipper on a
    finished multi-supplier order ("late" = shipped >90 days after the
    order date, the q4 convention), restricted to ASIA-region suppliers.
    Counts qualifying lineitems per supplier.

    Scale plan: the exists/not-exists pair over lineitem self-joins is
    re-expressed as per-order distinct-supplier counts computed in one
    window pass over (orderkey) — the stream is already shuffled on
    orderkey for the orders join, so the window adds no extra exchange;
    the classic formulation would self-join lineitem twice. Supplier
    join shuffles the small filtered remainder; nation broadcasts.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    j = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
    )
    w = W.partitionBy("l_orderkey")
    flagged = (
        j.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
            ),
        )
        .filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        flagged.join(s, flagged.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_asia), s.s_nationkey == n_asia.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation, region
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# funnel conversion: sequential view -> click -> purchase per user
# ---------------------------------------------------------------------------


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(users_viewed, users_clicked_after, users_purchased_after): how
    many users progressed through view -> click (strictly after the
    first view) -> purchase (strictly after that click) — the classic
    ordered-funnel shape sessionization cannot express.

    Plan: three groupBy(user_id) aggregations chained by joins on
    user_id. After the first shuffle the stream is hash-partitioned on
    user_id, so EnsureRequirements reuses the partitioning for the
    subsequent joins/aggs — effectively one shuffle of the events table
    at 100 TB. Strict > comparisons on epoch-µs keep step boundaries
    deterministic."""
    from .analytics import _events

    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    # explicit broadcast: each side is a single global-agg row, and the
    # final assembly must never become a shuffled join of one-row frames
    return (
        v.agg(F.count(F.lit(1)).alias("users_viewed"))
        .crossJoin(
            F.broadcast(c.agg(F.count(F.lit(1)).alias("users_clicked_after")))
        )
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("users_purchased_after")))
        )
    )


FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
v AS (SELECT user_id, MIN(ts_us) AS t1 FROM e WHERE event_type = 'view'
      GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts_us) AS t2
      FROM e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts_us > v.t1
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts_us) AS t3
      FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts_us > c.t2
      GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS users_viewed,
       (SELECT COUNT(*) FROM c) AS users_clicked_after,
       (SELECT COUNT(*) FROM p) AS users_purchased_after
"""


# ---------------------------------------------------------------------------
# CUBE: all grouping sets over (returnflag, shipmode-ish priority)
# ---------------------------------------------------------------------------


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE coverage (rollup's sibling): line counts and quantity by
    every grouping set of (l_returnflag, l_linestatus) — 2^2 sets in
    one pass (Spark expands grouping sets inside a single aggregate;
    shuffle volume is sum over sets of |groups|, still tiny)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(25,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n_lines",
            "sum_qty",
        )
        .orderBy("g_flag", "g_status", "returnflag", "linestatus")
    )


SALES_CUBE_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, returnflag, linestatus
"""


# ---------------------------------------------------------------------------
# skew-salted aggregation, inside the hard gate
# ---------------------------------------------------------------------------


def skew_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_suppkey, n_lines, revenue): per-supplier revenue via the
    two-phase salted aggregation (functions.skew.salted_agg) — the lever
    for hot keys AQE can't split (skewed *aggregations*). Phase 1
    spreads each key over 16 salt reducers; phase 2 combines
    |keys| x 16 rows. The oracle is the plain GROUP BY: salting must be
    invisible in the result, and the hash gate proves it. Decimal sums
    keep the two-phase reassociation exact (decimal addition is
    associative; a double SUM here would NOT be salt-order-stable)."""
    from ..functions.skew import salted_agg

    l = _t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(25,2)")
        * (F.lit(1).cast("decimal(25,2)") - F.col("l_discount").cast("decimal(25,2)"))
    )
    out = salted_agg(
        l.select("l_suppkey", "l_orderkey", rev.alias("rev")),
        ["l_suppkey"],
        [F.count(F.lit(1)).alias("c"), F.sum("rev").alias("s")],
        lambda pre: [
            F.sum("c").alias("n_lines"),
            F.sum("s").cast("double").alias("revenue"),
        ],
        salt_from=["l_orderkey"],
    )
    return out.select(
        F.col("l_suppkey").cast("long").alias("l_suppkey"), "n_lines", "revenue"
    ).orderBy("l_suppkey")


SKEW_SALTED_REVENUE_SQL = """
SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))
                * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2))))
            AS DOUBLE) AS revenue
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""
