"""Pipeline dashboards, batch 20: order-independent table checksums,
calendar-aware lag arithmetic, graph degree assortativity, and hash
partitioner QA.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``table_checksum_report``: the cross-system reconciliation
  primitive — an ORDER-INDEPENDENT aggregate fingerprint (row-hash sum
  mod 2⁶¹ AND xor) per table, the check a datapump user runs after any
  export→import to prove the copy is bit-faithful without comparing
  rows. Mergeable (sum/xor are commutative monoids), so partial
  checksums of shards combine for free.
- ``business_days_lag_by_priority``: ship lag measured in BUSINESS
  days via pure modular arithmetic on epoch-day indexes (closed-form
  weekday count, no calendar table, no UDF).
- ``degree_assortativity``: do high-degree customers buy high-degree
  (popular) parts? Pearson correlation of endpoint degrees over the
  co-purchase edge set, in exact-integer moments with the established
  floor-sqrt recipe for the final normalization.
- ``hash_partition_balance``: the partitioner QA twin of
  ``join_skew_report`` — that one measures KEY-frequency skew, this
  one measures whether the HASH ITSELF spreads distinct keys evenly
  (a pathological key pattern can alias buckets even with uniform
  frequencies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_US = 86_400_000_000

# -- order-independent table checksums ---------------------------------------

CHECKSUM_MOD = 1 << 61


def _canon_exprs() -> dict[str, str]:
    """Canonical row serialization per table: doubles → cents BIGINT,
    timestamps → epoch-µs, NULL → the sentinel '∅' — every value
    rendered from integer or string types only, so the string is
    byte-identical cross-engine (raw float formatting differs between
    engines; integer rendering does not)."""
    return {
        "nation": "concat_ws('|', CAST(n_nationkey AS STRING),"
        " coalesce(n_name, '∅'), CAST(n_regionkey AS STRING))",
        "customer": "concat_ws('|', CAST(c_custkey AS STRING),"
        " coalesce(c_name, '∅'), CAST(c_nationkey AS STRING),"
        " CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS STRING),"
        " coalesce(c_mktsegment, '∅'))",
        "orders": "concat_ws('|', CAST(o_orderkey AS STRING),"
        " CAST(o_custkey AS STRING), coalesce(o_orderstatus, '∅'),"
        " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING),"
        " CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS STRING),"
        " coalesce(o_orderpriority, '∅'))",
    }


def table_checksum_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, n_rows, checksum_sum, checksum_xor): per table, the
    row count plus TWO order-independent fingerprints of the md5-derived
    row hashes — their sum mod 2⁶¹ and their bitwise XOR. Any dropped,
    duplicated, or altered row moves at least one of them (sum catches
    what xor's self-cancelling pairs miss, and vice versa). This is the
    reconciliation handshake for the datapump lifecycle: run on source
    and on the imported copy, compare three numbers per table.

    Plan at 100 TB: embarrassingly parallel — hash and fold rows
    map-side, one partial (count, sum, xor) triple per partition
    crosses the wire. The hash is the repo's cross-engine md5 hash64;
    the canonical serialization renders every value through integer or
    string types (float formatting is engine-specific; integers are
    not)."""
    from ..events_source import pin_utc

    pin_utc(spark)
    out = None
    for table, canon in _canon_exprs().items():
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        # the md5 hash64 recipe inlined in SQL form (functions/text.py)
        # so the same expression feeds both the sum and xor aggregates
        out_arm = df.selectExpr(
            f"CAST(CONV(SUBSTRING(md5({canon}), 1, 15), 16, 10) AS BIGINT)"
            " AS h"
        ).agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(CHECKSUM_MOD))
            .cast("long")
            .alias("checksum_sum"),
            F.expr("bit_xor(h)").cast("long").alias("checksum_xor"),
        )
        out = out_arm if out is None else out.unionByName(out_arm)
    return out.orderBy("table_name")


def _checksum_sql() -> str:
    from ..functions.text import sql_hash64

    canon_duck = {
        "nation": "concat_ws('|', CAST(n_nationkey AS VARCHAR),"
        " coalesce(n_name, '∅'), CAST(n_regionkey AS VARCHAR))",
        "customer": "concat_ws('|', CAST(c_custkey AS VARCHAR),"
        " coalesce(c_name, '∅'), CAST(c_nationkey AS VARCHAR),"
        " CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR),"
        " coalesce(c_mktsegment, '∅'))",
        "orders": "concat_ws('|', CAST(o_orderkey AS VARCHAR),"
        " CAST(o_custkey AS VARCHAR), coalesce(o_orderstatus, '∅'),"
        " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),"
        " CAST(epoch_us(o_orderdate) AS VARCHAR),"
        " coalesce(o_orderpriority, '∅'))",
    }
    arms = "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows,"
        f" SUM(CAST({sql_hash64(c)} AS HUGEINT)) % {CHECKSUM_MOD}"
        " AS checksum_sum,"
        f" bit_xor({sql_hash64(c)}) AS checksum_xor FROM {t}"
        for t, c in canon_duck.items()
    )
    return f"""
WITH arms AS (
{arms}
)
SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(checksum_sum AS BIGINT) AS checksum_sum,
       CAST(checksum_xor AS BIGINT) AS checksum_xor
FROM arms
ORDER BY table_name
"""


TABLE_CHECKSUM_SQL = _checksum_sql()


# -- business-day lag --------------------------------------------------------


def _weekdays_before(day_expr: str) -> str:
    """Closed-form count of weekdays in [epoch, day): epoch day 0 =
    Thursday; offsets 0..6 are Thu,Fri,Sat,Sun,Mon,Tue,Wed, whose
    weekday-prefix counts are least(r,2) + greatest(r-4,0)."""
    return (
        f"(5 * (({day_expr}) div 7)"
        f" + least(({day_expr}) % 7, 2)"
        f" + greatest(({day_expr}) % 7 - 4, 0))"
    )


def business_days_lag_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, n_lines, mean_bd_milli, max_bd, neg_ppm): order→ship
    lag in BUSINESS days per order priority — the SLA view (a weekend
    order shipping Monday is 1 business day late, not 3). Weekday
    counting is closed-form modular arithmetic on epoch-day indexes
    (epoch day 0 is a Thursday): bd(a→b) = W(b) − W(a) with W(d) the
    weekdays before d — no calendar dimension table, no UDF, exact in
    both engines. ``neg_ppm`` reports the fixture's ship-before-order
    lines (negative lags are real here and signed arithmetic uses the
    sign-split ratio so truncating and flooring division agree).

    Plan: one orders⋈lineitem join (orderkey-partitioned), all lag
    arithmetic row-local, a ≤|priorities| groupBy."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}")
        .alias("od"),
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {DAY_US}")
        .alias("sd"),
    )
    bd = F.expr(f"{_weekdays_before('sd')} - {_weekdays_before('od')}")
    j = o.join(l, "o_orderkey").withColumn("bd", bd)
    return (
        j.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.expr(
                "CAST(sign(sum(bd)) * (abs(sum(bd)) * 1000 div count(1))"
                " AS BIGINT)"
            ).alias("mean_bd_milli"),
            F.max("bd").cast("long").alias("max_bd"),
            F.expr(
                "CAST(sum(CASE WHEN bd < 0 THEN 1 ELSE 0 END) * 1000000"
                " div count(1) AS BIGINT)"
            ).alias("neg_ppm"),
        )
        .orderBy("priority")
    )


def _bd_sql() -> str:
    def w(d):
        return (
            f"(5 * (({d}) // 7) + least(({d}) % 7, 2)"
            f" + greatest(({d}) % 7 - 4, 0))"
        )

    od = f"epoch_us(o.o_orderdate) // {DAY_US}"
    sd = f"epoch_us(l.l_shipdate) // {DAY_US}"
    return f"""
WITH j AS (
  SELECT o.o_orderpriority AS priority,
         {w(sd)} - {w(od)} AS bd
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(CASE WHEN SUM(bd) < 0 THEN -(ABS(SUM(bd)) * 1000 // COUNT(*))
                 ELSE SUM(bd) * 1000 // COUNT(*) END AS BIGINT)
         AS mean_bd_milli,
       CAST(MAX(bd) AS BIGINT) AS max_bd,
       CAST(SUM(CASE WHEN bd < 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS neg_ppm
FROM j
GROUP BY priority
ORDER BY priority
"""


BUSINESS_DAYS_LAG_SQL = _bd_sql()


# -- degree assortativity ----------------------------------------------------


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_edges, mean_cust_degree_milli, mean_part_degree_milli,
    r_ppm): do broad-basket customers buy popular parts? Pearson
    correlation of (customer degree, part degree) over the DISTINCT
    customer—part co-purchase edges, reported in ppm (r ∈
    [−1e6, 1e6]). Disassortative (< 0) is the normal retail shape —
    heavy buyers reach into the long tail.

    Exact-integer method: moments n, Σx, Σy, Σxy, Σx², Σy² accumulate
    as DECIMAL(38,0); r = (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²) / √(nΣy²−(Σy)²)
    with the established floor-sqrt recipe (IEEE sqrt of an int64-
    exact double is correctly rounded in both engines) and the
    sign-split division so negative correlations floor identically.

    Plan: one distinct-edge groupBy, two degree groupBys, two
    key-partitioned joins to attach degrees, a one-row moment
    reduce."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_partkey"
    )
    edges = (
        l.join(o, "o_orderkey")
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    degc = edges.groupBy("c").agg(F.count(F.lit(1)).alias("x"))
    degp = edges.groupBy("p").agg(F.count(F.lit(1)).alias("y"))
    xy = edges.join(degc, "c").join(degp, "p")
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_edges"),
        F.expr("CAST(sx * 1000 div n AS BIGINT)").alias(
            "mean_cust_degree_milli"
        ),
        F.expr("CAST(sy * 1000 div n AS BIGINT)").alias(
            "mean_part_degree_milli"
        ),
        F.expr(
            "CAST(sign(n * sxy - sx * sy) *"
            " (abs(n * sxy - sx * sy) * 1000000 div"
            "  greatest(CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)))"
            "           AS DECIMAL(38,0)) *"
            "           CAST(floor(sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
            "           AS DECIMAL(38,0)), 1)) AS BIGINT)"
        ).alias("r_ppm"),
    )


DEGREE_ASSORTATIVITY_SQL = """
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
degc AS (SELECT c, COUNT(*) AS x FROM edges GROUP BY c),
degp AS (SELECT p, COUNT(*) AS y FROM edges GROUP BY p),
m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM edges e JOIN degc USING (c) JOIN degp USING (p)
)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(sx * 1000 // n AS BIGINT) AS mean_cust_degree_milli,
       CAST(sy * 1000 // n AS BIGINT) AS mean_part_degree_milli,
       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END *
            (ABS(n * sxy - sx * sy) * 1000000 //
             GREATEST(CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)))
                      AS HUGEINT) *
                      CAST(FLOOR(SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
                      AS HUGEINT), 1)) AS BIGINT) AS r_ppm
FROM m
"""


# -- hash partitioner balance ------------------------------------------------

HPB_N_BUCKETS = 32


def hash_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key_col, n_buckets, min_bucket, max_bucket, imbalance_ppm):
    route each DISTINCT key through the cross-engine hash64 into
    {HPB_N_BUCKETS} buckets and report the spread — the partitioner QA
    check. ``join_skew_report`` asks "are some keys hot";
    this asks "does the hash itself spread DISTINCT keys evenly"
    (sequential or strided key patterns can alias low-order bits of a
    weak hash; a sound 64-bit hash should land within sampling noise
    of uniform). imbalance_ppm = (max − min)·1e6 div mean.

    Plan: distinct keys (partial-aggregated), a |keys|-row bucket
    groupBy, a {HPB_N_BUCKETS}-row reduce. The hash is md5-derived —
    identical in both engines, no engine-native partitioner
    functions."""
    from ..functions.text import hash64

    def arm(df, col, name):
        b = (
            df.select(F.col(col).cast("string").alias("k"))
            .distinct()
            .select((hash64(F.col("k")) % HPB_N_BUCKETS).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return b.agg(
            F.lit(name).alias("key_col"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.min("cnt").cast("long").alias("min_bucket"),
            F.max("cnt").cast("long").alias("max_bucket"),
            F.expr(
                "CAST((max(cnt) - min(cnt)) * 1000000 div"
                " greatest(sum(cnt) div count(1), 1) AS BIGINT)"
            ).alias("imbalance_ppm"),
        )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        arm(o, "o_orderkey", "orders.o_orderkey")
        .unionByName(arm(c, "c_custkey", "customer.c_custkey"))
        .orderBy("key_col")
    )


def _hpb_sql() -> str:
    from ..functions.text import sql_hash64

    def arm(table, col, name):
        h = sql_hash64(f"CAST({col} AS VARCHAR)")
        return f"""
  SELECT '{name}' AS key_col, COUNT(*) AS n_buckets,
         MIN(cnt) AS min_bucket, MAX(cnt) AS max_bucket,
         (MAX(cnt) - MIN(cnt)) * 1000000
           // GREATEST(SUM(cnt) // COUNT(*), 1) AS imbalance_ppm
  FROM (SELECT {h} % {HPB_N_BUCKETS} AS bucket, COUNT(*) AS cnt
        FROM (SELECT DISTINCT {col} FROM {table}) GROUP BY 1)"""

    return f"""
WITH arms AS (
{arm('orders', 'o_orderkey', 'orders.o_orderkey')}
  UNION ALL
{arm('customer', 'c_custkey', 'customer.c_custkey')}
)
SELECT key_col, CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(min_bucket AS BIGINT) AS min_bucket,
       CAST(max_bucket AS BIGINT) AS max_bucket,
       CAST(imbalance_ppm AS BIGINT) AS imbalance_ppm
FROM arms
ORDER BY key_col
"""


HASH_PARTITION_BALANCE_SQL = _hpb_sql()
