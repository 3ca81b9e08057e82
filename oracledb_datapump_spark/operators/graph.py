"""Graph analytics: integer-quantized PageRank over the
customer-supplier transaction graph.

Nodes are customers and suppliers (supplier ids offset by SUPP_BASE to
disambiguate); an undirected edge connects each (customer, supplier)
pair that transacted (distinct over orders x lineitem). PageRank runs a
FIXED number of power iterations in exact integer arithmetic:

    pr_0(v)   = SCALE DIV N
    contrib   = pr(u) DIV deg(u)                 (per directed edge)
    pr_i+1(v) = (15*SCALE) DIV (100*N) + (85 * sum contribs) DIV 100

Every operation is int64 (sums < 2^53 by construction), so the result
is bit-identical in Spark and DuckDB — the same determinism recipe the
k-means operator uses to put an iterative algorithm inside the hard
hash gate. The DIV-based mass loss (< 1 unit per edge per round) is the
documented cost of exactness; rankings are unaffected.

Plan shape: degrees and edges are computed once and cached; each
iteration is one join (ranks onto the edge list, hash on src) + one
groupBy(dst) sum — O(|E|) shuffle per round, no driver data reads (the
iteration count is fixed, so the loop is pure lineage, and Spark
pipelines all rounds into one job). At 100 TB-scale graphs the same
plan holds; skewed hub nodes are the known risk (salt the dst key or
pre-combine map-side, which groupBy's partial aggregation already does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000
PR_ITERS = 3
SUPP_BASE = 10_000_000
PR_TOPK = 50


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("c"),
            (F.col("l_suppkey").cast("long") + SUPP_BASE).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node_id, pr): top-PR_TOPK nodes after PR_ITERS quantized power
    iterations; ties broken by node id."""
    edges = _edges(spark, sf_dir).cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").cache()
    nodes = edges.select(F.col("src").alias("node")).distinct().cache()
    n = nodes.count()
    base = (15 * PR_SCALE) // (100 * n)
    ranks = nodes.select("node", F.lit(PR_SCALE // n).cast("long").alias("pr"))
    for _ in range(PR_ITERS):
        msgs = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("pr DIV deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = nodes.join(
            msgs, nodes.node == msgs.dst, "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr("85 * coalesce(s, CAST(0 AS BIGINT)) DIV 100")
            ).cast("long").alias("pr"),
        )
    out = (
        ranks.orderBy(F.desc("pr"), "node")
        .limit(PR_TOPK)
        .select(F.col("node").alias("node_id"), "pr")
    )
    edges.unpersist()
    ed.unpersist()
    nodes.unpersist()
    return out


def _pagerank_sql() -> str:
    ctes = [
        f"""pairs AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
         CAST(l.l_suppkey AS BIGINT) + {SUPP_BASE} AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)""",
        """edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
)""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "n AS (SELECT COUNT(*) AS n FROM nodes)",
        f"""r0 AS (
  SELECT node, CAST({PR_SCALE} // n.n AS BIGINT) AS pr FROM nodes, n
)""",
    ]
    for it in range(PR_ITERS):
        ctes.append(
            f"""m{it} AS (
  SELECT e.dst, SUM(r.pr // d.deg) AS s
  FROM edges e JOIN r{it} r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{it + 1} AS (
  SELECT nd.node,
         CAST((15::BIGINT * {PR_SCALE}) // (100 * n.n)
              + (85::BIGINT * COALESCE(m.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes nd CROSS JOIN n LEFT JOIN m{it} m ON nd.node = m.dst
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node AS node_id, pr FROM r{PR_ITERS}
ORDER BY pr DESC, node ASC
LIMIT {PR_TOPK}
"""
    )


PAGERANK_SQL = _pagerank_sql()
