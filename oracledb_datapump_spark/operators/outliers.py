"""Robust outlier detection: per-group median/MAD price screening.

The data-quality filter a warehouse runs before trusting a feed:
flag rows whose value deviates from their group's median by more than
K times the median absolute deviation (MAD) — robust to the outliers
it is hunting, unlike mean/stddev.

Determinism: medians are PICKED (the value at rank (n+1)//2 under a
fully tie-broken ordering), never interpolated, and the deviation
arithmetic is IEEE double subtraction/comparison — bit-identical in
Spark and DuckDB, so the result sits in the hash gate.

Scale: three hash shuffles on the group key (rank, re-rank deviations,
final count), each carrying (group, value, rowid) — no global sort;
per-group state in the windows is rank bookkeeping only. Skewed groups
are ordinary window skew (salt or split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MAD_K = 3  # |x - median| > K * MAD flags an outlier


def price_outliers_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, n_items, median_price, mad, n_outliers): per-brand robust
    screening of lineitem extended prices."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    rows = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.col("l_extendedprice").alias("price"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("brand").orderBy("price", "l_orderkey", "l_linenumber")
    ranked = rows.select(
        "brand",
        "price",
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("brand")).alias("n"),
    )
    med = (
        ranked.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("brand", F.col("price").alias("median_price"), "n")
    )
    dev = rows.join(F.broadcast(med), "brand").select(
        "brand",
        "price",
        "l_orderkey",
        "l_linenumber",
        "median_price",
        "n",
        F.abs(F.col("price") - F.col("median_price")).alias("d"),
    )
    w2 = Window.partitionBy("brand").orderBy("d", "l_orderkey", "l_linenumber")
    mad = (
        dev.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") == F.expr("(n + 1) div 2"))
        .select("brand", F.col("d").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "brand")
        .groupBy("brand", "median_price", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.when(F.col("d") > MAD_K * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select("brand", "n_items", "median_price", "mad", "n_outliers")
        .orderBy("brand")
    )


PRICE_OUTLIERS_SQL = f"""
WITH rows_ AS (
  SELECT p.p_brand AS brand, l.l_extendedprice AS price,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), ranked AS (
  SELECT brand, price, l_orderkey, l_linenumber,
         ROW_NUMBER() OVER (PARTITION BY brand
                            ORDER BY price, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY brand) AS n
  FROM rows_
), med AS (
  SELECT brand, price AS median_price, n
  FROM ranked WHERE rn = (n + 1) // 2
), dev AS (
  SELECT r.brand, r.price, r.l_orderkey, r.l_linenumber,
         m.median_price, m.n, abs(r.price - m.median_price) AS d
  FROM rows_ r JOIN med m USING (brand)
), mad AS (
  SELECT brand, d AS mad
  FROM (SELECT brand, d, n,
               ROW_NUMBER() OVER (PARTITION BY brand
                                  ORDER BY d, l_orderkey, l_linenumber) AS rn2
        FROM dev)
  WHERE rn2 = (n + 1) // 2
)
SELECT dev.brand, CAST(COUNT(*) AS BIGINT) AS n_items,
       dev.median_price, mad.mad,
       CAST(SUM(CASE WHEN dev.d > {MAD_K} * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING (brand)
GROUP BY dev.brand, dev.median_price, mad.mad
ORDER BY dev.brand
"""
