"""Analytics batch 4: multi-distinct aggregation and JSON extraction.

- distinct_counts: several COUNT(DISTINCT …) in one aggregation (Spark
  plans this with an Expand — worth covering explicitly).
- events_json_stats: JSON-function coverage over the events.props JSON
  string column (get_json_object ≡ DuckDB json_extract_string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-distinct: suppliers/parts/orders per return flag in a
    single groupBy (Expand-based plan; the approximate path at scale is
    approx_count_distinct, whose HLL sketches are not oracle-comparable
    across engines)."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_COUNTS_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the integer field ``k`` from the props JSON string and
    aggregate it per event_type (count/min/max/exact integer sum)."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""
