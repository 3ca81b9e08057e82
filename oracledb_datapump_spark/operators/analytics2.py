"""Analytics batch 2: correlated/scalar subqueries, anti-joins,
disjunctive predicates, rollup, pivot, exact quantiles.

Same determinism contract as analytics.py (decimal-exact money math,
explicit aliases, engine-neutral tie-breaks). Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(25,{scale})")


_REV = None  # revenue expression builder


def _rev():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(25,2)") - _dec("l_discount")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20. lineitem⋈orders shuffles on orderkey; customer/nation are
    broadcast dims."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: supplier-part value concentration — groups whose
    value exceeds a scalar-subquery threshold (0.01% of total). The
    threshold is a broadcast scalar (crossJoin of a 1-row aggregate) —
    no driver round-trip, works at any scale."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    val = _dec("l_extendedprice") * _dec("l_quantity", 2)
    joined = l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    per_part = joined.groupBy("n_name", "l_partkey").agg(
        F.sum(val).cast("double").alias("part_value")
    )
    total = joined.agg(
        (F.sum(val).cast("double") * F.lit(0.0001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("n_name", "l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH joined AS (
  SELECT n_name, l_partkey,
         CAST(l_extendedprice AS DECIMAL(25,2)) * CAST(l_quantity AS DECIMAL(25,2)) AS val
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
)
SELECT n_name, l_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
FROM joined
GROUP BY n_name, l_partkey
HAVING CAST(SUM(val) AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) * 0.0001 FROM joined)
ORDER BY part_value DESC, l_partkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    excluding one brand — countDistinct after an anti-filter."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE l_partkey = p_partkey AND p_brand != 'Brand#1'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20% of
    that part's average — correlated aggregate re-expressed as a
    broadcast self-aggregation join (the Spark-native decorrelation)."""
    l = _t(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double")
            / F.count(F.lit(1))
            * F.lit(0.2)
        ).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(per_part), l.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l1
WHERE l_quantity < (
  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*) * 0.2
  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
)
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 250 —
    aggregate-then-semi-join (the IN-subquery decorrelation)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) > 250
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across the join — Catalyst
    pushes the common conjuncts and keeps the disjunction post-join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return j.filter(cond).agg(F.sum(_rev()).cast("double").alias("revenue"))


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE l_partkey = p_partkey AND (
      (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 40))
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above-average balance with no URGENT
    orders — scalar subquery + anti-join (the fixture gives every customer
    at least one order, so the anti-join target is the urgent subset)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("ab"))
    )
    no_orders = rich.join(
        o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_anti",
    )
    return (
        no_orders.groupBy(
            F.substring(F.col("c_name"), -1, 1).alias("name_tail")
        )
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("name_tail")
    )


Q22_SQL = """
WITH rich AS (
  SELECT * FROM customer
  WHERE CAST(c_acctbal AS DOUBLE) > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0)
)
SELECT substr(c_name, -1, 1) AS name_tail,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS totacctbal
FROM rich
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = rich.c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY 1
ORDER BY 1
"""


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP coverage: revenue by (returnflag, linestatus) with
    subtotals and a grand total. GROUPING() keys disambiguate NULLs."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "g_flag",
            "g_status",
            "revenue",
            "n_lines",
        )
        .orderBy("g_flag", "g_status", "returnflag", "linestatus")
    )


SALES_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, returnflag, linestatus
"""


def shipmode_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT coverage: per-returnflag line counts pivoted by linestatus."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
        )
        .orderBy("l_returnflag")
    )


SHIPMODE_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS status_f,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS status_o
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles of extended price per return flag —
    linear-interpolated, verified bit-identical across engines. (The
    approximate path at 100 TB is percentile_approx/t-digest; this exact
    form is the verification baseline.)"""
    l = _t(spark, sf_dir, "lineitem")
    q = l.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D, 0.99D))"
        ).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    return q.select(
        "l_returnflag",
        F.col("qs")[0].alias("p25"),
        F.col("qs")[1].alias("p50"),
        F.col("qs")[2].alias("p90"),
        F.col("qs")[3].alias("p99"),
        "n",
    ).orderBy("l_returnflag")


PRICE_QUANTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
