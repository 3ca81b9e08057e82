"""Warehouse data-quality and change-management operators.

- ``data_quality_audit``: the dbt-tests-style expectation suite over the
  star schema — primary-key uniqueness, referential integrity
  (anti-joins), not-null and domain-range checks — one (check, checked,
  violations) row per expectation. The daily trust report every
  warehouse runs before publishing.
- ``snapshot_diff``: table diff between two snapshots (a cutover-dated
  snapshot with a deterministic simulated mutation vs the current
  table) via a full-outer join on the key and column-wise comparison —
  added / removed / changed / unchanged counts, the Datafold-style
  regression gate for a pipeline change.
- ``join_order_estimate``: the System-R cardinality model
  |A ⋈ B| ≈ |A|·|B| / max(ndv(A.k), ndv(B.k)) evaluated against the
  exact join count for three star-schema joins — the statistic a
  cost-based optimizer's join reordering stands on, with its error
  made measurable.

No reference counterpart (the reference delegates constraint metadata
to Oracle and never diffs data); these extend the analytics surface
with the data-management operators a 100 TB lakehouse actually runs.

Scale: every check/diff arm is one scan + one aggregation or one
key-shuffled join; violations and diff classes are count rows, never
row dumps (at 100 TB you re-query for offending rows AFTER the counts
say where to look).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# expectation suite
# ---------------------------------------------------------------------------


def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check_name, n_checked, n_violations): the expectation suite.
    PK-uniqueness arms are count−countDistinct; FK arms are left-anti
    joins (dims broadcast where small); range/null arms are row-local
    predicates. All arms union into one report frame.

    A violation count of zero is evidence, not absence of a check —
    the fixture schema is referentially clean, so the suite's value
    under the hash is proving every arm runs and counts correctly."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")

    def pk(df: DataFrame, key: str, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(key) - F.countDistinct(key)).alias("n_violations"),
        )

    def fk(child: DataFrame, ck: str, parent: DataFrame, pk_: str, name: str) -> DataFrame:
        viol = child.join(
            parent.select(F.col(pk_).alias(ck)), ck, "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_violations"))
        tot = child.agg(F.count(F.lit(1)).alias("n_checked"))
        return tot.crossJoin(F.broadcast(viol)).select(
            F.lit(name).alias("check_name"), "n_checked", "n_violations"
        )

    def pred(df: DataFrame, cond, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(
                "n_violations"
            ),
        )

    arms = [
        pk(o, "o_orderkey", "pk_unique_orders"),
        pk(c, "c_custkey", "pk_unique_customer"),
        pk(p, "p_partkey", "pk_unique_part"),
        pk(s, "s_suppkey", "pk_unique_supplier"),
        fk(o, "o_custkey", c, "c_custkey", "fk_orders_customer"),
        fk(l, "l_orderkey", o, "o_orderkey", "fk_lineitem_orders"),
        fk(l, "l_partkey", p, "p_partkey", "fk_lineitem_part"),
        fk(l, "l_suppkey", s, "s_suppkey", "fk_lineitem_supplier"),
        pred(o, F.col("o_orderdate").isNull(), "notnull_orders_date"),
        pred(
            l,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "range_lineitem_quantity",
        ),
        pred(
            l,
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
            "range_lineitem_discount",
        ),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("check_name")


DATA_QUALITY_AUDIT_SQL = """
SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations
FROM (
  SELECT 'pk_unique_orders' AS check_name, COUNT(*) AS n_checked,
         COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'pk_unique_customer', COUNT(*),
         COUNT(c_custkey) - COUNT(DISTINCT c_custkey) FROM customer
  UNION ALL
  SELECT 'pk_unique_part', COUNT(*),
         COUNT(p_partkey) - COUNT(DISTINCT p_partkey) FROM part
  UNION ALL
  SELECT 'pk_unique_supplier', COUNT(*),
         COUNT(s_suppkey) - COUNT(DISTINCT s_suppkey) FROM supplier
  UNION ALL
  -- NOT EXISTS (not NOT IN): a NULL child key must COUNT as a violation,
  -- matching Spark's left-anti join; NOT IN would yield NULL and silently
  -- skip it — the engines would disagree exactly when the data is dirty
  SELECT 'fk_orders_customer', (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'fk_lineitem_orders', (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'fk_lineitem_part', (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'fk_lineitem_supplier', (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'notnull_orders_date', COUNT(*),
         SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) FROM orders
  UNION ALL
  SELECT 'range_lineitem_quantity', COUNT(*),
         SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
  FROM lineitem
  UNION ALL
  SELECT 'range_lineitem_discount', COUNT(*),
         SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
  FROM lineitem
)
ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------

DIFF_LO = "1996-01-01"  # snapshot A holds orders dated before DIFF_HI;
DIFF_HI = "1999-01-01"  # snapshot B holds orders dated from DIFF_LO on
DIFF_MUT_MOD = 97  # A's simulated stale mutation: every 97th key


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(change_type, n_rows): the table diff between snapshot A (orders
    before {DIFF_HI}, with every {DIFF_MUT_MOD}th order carrying a
    stale priority — the simulated pre-backfill state) and snapshot B
    (orders from {DIFF_LO} on, current values). Full-outer join on the
    key; rows classify as removed (A-only), added (B-only), changed
    (both, differing columns), unchanged.

    Plan: ONE key-shuffled full-outer join over the compared column
    hash — the canonical data-regression gate. At 100 TB both sides
    prune to the compared partition range at the scan, and the compare
    is a row-local struct equality; only four count rows leave."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(25,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    a = o.filter(F.col("o_orderdate") < F.lit(DIFF_HI)).select(
        F.col("o_orderkey").alias("key"),
        F.when(
            F.col("o_orderkey") % DIFF_MUT_MOD == 0, F.lit("9-SNAPSHOT")
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("a_priority"),
        F.col("cents").alias("a_cents"),
    )
    b = o.filter(F.col("o_orderdate") >= F.lit(DIFF_LO)).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("b_priority"),
        F.col("cents").alias("b_cents"),
    )
    j = a.join(b, "key", "full_outer")
    change = (
        F.when(F.col("a_priority").isNull(), "added")
        .when(F.col("b_priority").isNull(), "removed")
        .when(
            (F.col("a_priority") != F.col("b_priority"))
            | (F.col("a_cents") != F.col("b_cents")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("change_type")
    )


SNAPSHOT_DIFF_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
a AS (
  SELECT o_orderkey AS key,
         CASE WHEN o_orderkey % {DIFF_MUT_MOD} = 0 THEN '9-SNAPSHOT'
              ELSE o_orderpriority END AS a_priority,
         cents AS a_cents
  FROM o WHERE o_orderdate < TIMESTAMP '{DIFF_HI}'
),
b AS (
  SELECT o_orderkey AS key, o_orderpriority AS b_priority,
         cents AS b_cents
  FROM o WHERE o_orderdate >= TIMESTAMP '{DIFF_LO}'
),
j AS (SELECT * FROM a FULL OUTER JOIN b USING (key))
SELECT CASE WHEN a_priority IS NULL THEN 'added'
            WHEN b_priority IS NULL THEN 'removed'
            WHEN a_priority != b_priority OR a_cents != b_cents
              THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM j
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# System-R join-cardinality model vs exact
# ---------------------------------------------------------------------------

_JOINS = (
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
)


def join_order_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(join_name, est_rows, exact_rows, abs_err_ppm): the System-R
    equi-join cardinality estimate |A|·|B| div max(ndv(A.k), ndv(B.k))
    against the exact join count, for the three star joins a reorderer
    must rank. The estimate needs only per-table stats (count + NDV —
    at 100 TB these come from the catalog/HLL, no data motion); the
    exact count is the verification scan."""
    out = None
    for name, ta, ka, tb, kb in _JOINS:
        a = spark.read.parquet(f"{sf_dir}/{ta}.parquet").select(
            F.col(ka).alias("k")
        )
        b = spark.read.parquet(f"{sf_dir}/{tb}.parquet").select(
            F.col(kb).alias("k")
        )
        stats_a = a.agg(
            F.count(F.lit(1)).alias("na"), F.countDistinct("k").alias("da")
        )
        stats_b = b.agg(
            F.count(F.lit(1)).alias("nb"), F.countDistinct("k").alias("db")
        )
        exact = a.join(b, "k").agg(F.count(F.lit(1)).alias("exact_rows"))
        row = (
            stats_a.crossJoin(F.broadcast(stats_b))
            .crossJoin(F.broadcast(exact))
            .select(
                F.lit(name).alias("join_name"),
                F.expr(
                    "CAST(CAST(na AS DECIMAL(38,0)) * nb"
                    " div greatest(da, db) AS LONG)"
                ).alias("est_rows"),
                "exact_rows",
                F.expr(
                    "CAST(abs(CAST(CAST(na AS DECIMAL(38,0)) * nb"
                    " div greatest(da, db) AS LONG) - exact_rows)"
                    " * 1000000 DIV exact_rows AS BIGINT)"
                ).alias("abs_err_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")


def _join_order_sql() -> str:
    arms = []
    for name, ta, ka, tb, kb in _JOINS:
        arms.append(
            f"""
  SELECT '{name}' AS join_name, est_rows, exact_rows,
         abs(est_rows - exact_rows) * 1000000 // exact_rows AS abs_err_ppm
  FROM (
    SELECT (SELECT COUNT(*) FROM {ta}) * (SELECT COUNT(*) FROM {tb})
           // GREATEST((SELECT COUNT(DISTINCT {ka}) FROM {ta}),
                       (SELECT COUNT(DISTINCT {kb}) FROM {tb}))
             AS est_rows,
         (SELECT COUNT(*) FROM {ta} a JOIN {tb} b ON a.{ka} = b.{kb})
             AS exact_rows
  )"""
        )
    body = " UNION ALL ".join(arms)
    return (
        "SELECT join_name, CAST(est_rows AS BIGINT) AS est_rows, "
        "CAST(exact_rows AS BIGINT) AS exact_rows, "
        "CAST(abs_err_ppm AS BIGINT) AS abs_err_ppm "
        f"FROM ({body}) ORDER BY join_name"
    )


JOIN_ORDER_ESTIMATE_SQL = _join_order_sql()
