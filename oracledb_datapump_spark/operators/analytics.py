"""Relational analytics over the star schema.

The reference performs zero client-side relational computation (SURVEY.md
§2.3) — these operators are (a) the round-trip verification workload the
reference's tests imply, and (b) the extension analytics surface a Spark
engine gets for free. Every query here is declarative DataFrame API so
Catalyst owns the physical plan; each has an equivalent DuckDB oracle in
``__spark_entry__.oracle_sql``.

Determinism contract with the oracle: monetary aggregates are computed in
DECIMAL (exact, order-independent) and cast to DOUBLE at the end, so Spark
and DuckDB produce bit-identical values regardless of partitioning or
aggregation order. Plain SUM(double) would differ in the last ulp between
engines.

Scale notes per query are in docstrings: what shuffles, what broadcasts,
what prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col: str, scale: int = 2):
    """Exact decimal view of a parquet DOUBLE money column."""
    return F.col(col).cast(f"decimal(25,{scale})")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adaptation. One scan of lineitem, partial aggregation
    map-side then a tiny 4-group shuffle — optimal at any scale; the
    filter prunes on l_shipdate at the parquet scan."""
    l = _t(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(disc * (F.lit(1).cast("decimal(25,2)") + _dec("l_tax")))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2))) * (CAST(1 AS DECIMAL(25,2)) + CAST(l_tax AS DECIMAL(25,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adaptation (actual fixture schema: o_orderpriority stands
    in for o_shippriority). customer is small → broadcast; orders⋈lineitem
    shuffles on orderkey, the natural co-partition key at 100 TB."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15"))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adaptation: EXISTS → left-semi join (no row duplication,
    smaller shuffle than inner+distinct). The fixture lacks
    l_commitdate/l_receiptdate, so 'late' = shipped >90 days after the
    order date — same shape (correlated EXISTS with inequality)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > F.date_add(o.o_orderdate, 90)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join. region/nation/supplier/customer are dims →
    broadcast; the fact-fact join (orders⋈lineitem) shuffles on orderkey."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; all three predicates push to
    the parquet scan (verify via PushedFilters in explain)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount").cast("decimal(25,2)") >= F.lit("0.05").cast("decimal(25,2)"))
            & (F.col("l_discount").cast("decimal(25,2)") <= F.lit("0.07").cast("decimal(25,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(25,2)) BETWEEN CAST('0.05' AS DECIMAL(25,2)) AND CAST('0.07' AS DECIMAL(25,2))
  AND l_quantity < 24
"""


def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (join + conditional aggregation; CASE inside SUM
    stays in whole-stage codegen), adapted to the fixture: bucket lines by
    ship delay (days from order to ship date), count urgent-vs-rest."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    # calendar-day difference (both engines count date boundaries; all
    # fixture timestamps are midnight so semantics coincide exactly)
    delay_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay_days <= 30, "0-30")
        .when(delay_days <= 60, "31-60")
        .when(delay_days <= 90, "61-90")
        .otherwise("90+")
    )
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        j.groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


Q12_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 60 THEN '31-60'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN '61-90'
            ELSE '90+' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: lineitem ⋈ part with a conditional numerator; part is a
    dim → broadcast."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(25,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        THEN CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))
        ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1995-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXTURES.md's canonical cross-check: lineitem⋈orders⋈customer⋈nation."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("n_name")
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def top_suppliers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: top-3 suppliers by revenue per nation
    (rank over partitioned window; single shuffle on the partition key)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    l = _t(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(25,2)") - _dec("l_discount"))
    per_supp = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "s_suppkey", "s_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    w = W.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("s_suppkey"))
    return (
        per_supp.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("n_name", "s_suppkey", "s_name", "revenue", "rank")
        .orderBy("n_name", "rank")
    )


TOP_SUPPLIERS_SQL = """
WITH per_supp AS (
  SELECT n_name, s_suppkey, s_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2)) * (CAST(1 AS DECIMAL(25,2)) - CAST(l_discount AS DECIMAL(25,2)))) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey, s_name
)
SELECT n_name, s_suppkey, s_name, revenue, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey ASC) AS rank
  FROM per_supp
) WHERE rank <= 3
ORDER BY n_name, rank
"""


def customer_order_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op coverage: customers with BUILDING segment EXCEPT customers
    who placed an urgent order, UNION ALL customers in AUTOMOBILE with
    acctbal > 9000 — exercises except/union/distinct."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    auto_rich = c.filter(
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey")
    return (
        building.exceptAll(building.join(urgent, "c_custkey", "left_semi"))
        .union(auto_rich)
        .distinct()
        .orderBy("c_custkey")
    )


SET_OPS_SQL = """
SELECT DISTINCT c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
  UNION
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9000
) ORDER BY c_custkey
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet with the engine's ``ts_us`` (epoch-µs BIGINT)
    contract; the physical type of ``ts`` (NANOS-as-long vs
    timestamp[us]) is sniffed by events_source.load_events — the one
    place that knows the fixture's on-disk type."""
    from ..events_source import load_events

    return load_events(spark, sf_dir)


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series rollup over the events table: tumbling 1-hour windows
    per event_type (batch form; the streaming form is
    streaming.incremental). Double sums avoided: count + exact min/max.
    Hour emitted as epoch seconds (bigint) for engine-neutral comparison."""
    e = _events(spark, sf_dir)
    hour = (F.floor(F.col("ts_us") / 3_600_000_000) * 3600).cast("long")
    return (
        e.groupBy(hour.alias("hour_epoch"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("hour_epoch", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS hour_epoch, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gap detection: a new session starts when the gap
    to the previous event of the same user exceeds 30 minutes. Pure window
    functions — one shuffle on user_id; at 100 TB this is the standard
    lag/cumsum pattern (no Python in the loop)."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag(F.col("ts_us")).over(w)
    with_flag = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    )
    sess = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
        .orderBy("user_id", "session_seq")
    )


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, ts_us,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""
