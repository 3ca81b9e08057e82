"""Batch 37: association mining, scalar-quantization audit, and
repurchase survival hazard.

- ``bigram_lift_topk`` — PMI-shaped collocation mining with the log
  removed so it sits under the integer hash: lift(a,b) =
  p(ab)/(p(a·)·p(·b)) in ppm over bigram-instance marginals, deferred
  HUGEINT/DECIMAL(38,0) products, min-support pruned, global top-k.
  The association table a phrase-aware tokenizer or stopword policy is
  tuned against.
- ``sq8_quant_error`` — the scalar-int8 counterpart of the PQ error
  audits (pq_subspace_error): per-dimension min/max affine
  quantization to 0..255 on the 1e-7-quantized integer grid, exact
  integer reconstruction error per dimension. Answers "is SQ8 enough
  or do we pay for PQ" from data.
- ``repurchase_hazard_table`` — discrete-time hazard table of customer
  reorder gaps (the Kaplan-Meier table with the cumulative product
  left out so every number stays an exact integer ratio): per week
  bucket, events / at-risk / hazard_ppm.

Shapes: token/bigram groupBys (Zipf-bounded), a 64-row per-dim frame,
and a |week-buckets| frame after one lag window — all model-scale
after one partial-aggregated pass; safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE, tokens
from .textstats import load_docs

LIFT_MIN_SUPPORT = 5
LIFT_TOP_K = 100
EMB_Q = 10_000_000  # the repo-wide float→int64 quantization grid
HAZARD_BUCKET_DAYS = 7


def bigram_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, t1, t2, n_ab, lift_ppm): top-{LIFT_TOP_K} bigrams by
    lift = n_ab·NB / (n_a·× n_·b) in ppm, bigram-instance marginals
    (head count × tail count), support ≥ {LIFT_MIN_SUPPORT}, ties
    broken lexicographically. One tokenize pass → one bigram groupBy
    (Zipf-bounded; cap with the support filter at 100 TB) → two
    marginal aggregates of THAT table (never a second corpus pass) →
    a |survivors|-row sort for the top-k."""
    d = load_docs(spark, sf_dir)
    wt = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    big = wt.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 2)),
            )
        ).alias("gram")
    ).select(
        F.split(F.col("gram"), " ", 2).getItem(0).alias("t1"),
        F.split(F.col("gram"), " ", 2).getItem(1).alias("t2"),
    )
    bcnt = big.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_ab"))
    heads = bcnt.groupBy("t1").agg(F.sum("n_ab").alias("n_head"))
    tails = bcnt.groupBy("t2").agg(F.sum("n_ab").alias("n_tail"))
    total = bcnt.agg(F.sum("n_ab").alias("nb"))
    lift = F.expr(
        """
        CAST(n_ab AS DECIMAL(38,0)) * nb * 1000000
        div (CAST(n_head AS DECIMAL(38,0)) * n_tail)
        """
    )
    ranked = (
        bcnt.filter(F.col("n_ab") >= LIFT_MIN_SUPPORT)
        .join(F.broadcast(heads), "t1")
        .join(F.broadcast(tails), "t2")
        .crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            F.col("n_ab").cast("long").alias("n_ab"),
            lift.cast("long").alias("lift_ppm"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.desc("lift_ppm"), F.asc("t1"), F.asc("t2")
                )
            ),
        )
        .filter(F.col("rank") <= LIFT_TOP_K)
    )
    # the single-partition rank window runs over the support-filtered
    # aggregate only (Zipf survivors), never corpus-scale rows
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        "t1",
        "t2",
        "n_ab",
        "lift_ppm",
    ).orderBy("rank")


BIGRAM_LIFT_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t != '') AS l
  FROM documents
), big AS (
  SELECT l[i+1] AS t1, l[i+2] AS t2
  FROM toks, unnest(range(len(l) - 1)) AS t(i)
  WHERE len(l) >= 2
), bcnt AS (
  SELECT t1, t2, COUNT(*) AS n_ab FROM big GROUP BY t1, t2
), heads AS (
  SELECT t1, SUM(n_ab) AS n_head FROM bcnt GROUP BY t1
), tails AS (
  SELECT t2, SUM(n_ab) AS n_tail FROM bcnt GROUP BY t2
), total AS (
  SELECT SUM(n_ab) AS nb FROM bcnt
), ranked AS (
  SELECT t1, t2, n_ab,
         CAST(CAST(n_ab AS HUGEINT) * nb * 1000000
              // (CAST(n_head AS HUGEINT) * n_tail) AS BIGINT) AS lift_ppm
  FROM bcnt JOIN heads USING (t1) JOIN tails USING (t2) CROSS JOIN total
  WHERE n_ab >= {LIFT_MIN_SUPPORT}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift_ppm DESC, t1, t2) AS BIGINT)
         AS rank,
       t1, t2, CAST(n_ab AS BIGINT) AS n_ab, lift_ppm
FROM ranked
ORDER BY lift_ppm DESC, t1, t2
LIMIT {LIFT_TOP_K}
"""


def sq8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim, n_vecs, range_q, max_err_q, mean_err_q7): per-dimension
    int8 (0..255) affine quantization error on the 1e-7-quantized
    integer grid — q = ((v−min)·255) div range, recon = min +
    (q·range) div 255, err = |v − recon|, all exact integers (the
    repo's quantize-then-integer recipe; floats never divide). A flat
    dimension (range 0) reconstructs exactly. Plan: one posexplode →
    a 64-row min/max broadcast → row-local arithmetic → a 64-row
    aggregate; the explode is the only corpus-scale stage."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("val").cast("double") * EMB_Q).cast("long").alias("vq"),
    )
    mm = v.groupBy("dim").agg(
        F.min("vq").alias("lo"), F.max("vq").alias("hi")
    )
    errs = v.join(F.broadcast(mm), "dim").select(
        "dim",
        F.expr(
            """
            CASE WHEN hi > lo THEN
              abs(vq - (lo + (((vq - lo) * 255 div (hi - lo))
                              * (hi - lo)) div 255))
            ELSE 0 END
            """
        ).alias("err"),
    )
    return (
        errs.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.max("err").cast("long").alias("max_err_q"),
            F.expr("sum(err) * 1000000 div count(1)")
            .cast("long")
            .alias("mean_err_q7"),
        )
        .join(
            F.broadcast(
                mm.select("dim", (F.col("hi") - F.col("lo")).alias("range_q"))
            ),
            "dim",
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n_vecs",
            F.col("range_q").cast("long").alias("range_q"),
            "max_err_q",
            "mean_err_q7",
        )
        .orderBy("dim")
    )


SQ8_QUANT_ERROR_SQL = f"""
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {EMB_Q}) AS BIGINT)
           AS vq
  FROM embeddings
), mm AS (
  SELECT dim, MIN(vq) AS lo, MAX(vq) AS hi FROM v GROUP BY dim
), errs AS (
  SELECT v.dim,
         CASE WHEN hi > lo THEN
           abs(vq - (lo + (((vq - lo) * 255 // (hi - lo))
                           * (hi - lo)) // 255))
         ELSE 0 END AS err
  FROM v JOIN mm USING (dim)
)
SELECT CAST(e.dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MAX(m.hi - m.lo) AS BIGINT) AS range_q,
       CAST(MAX(err) AS BIGINT) AS max_err_q,
       CAST(SUM(err) * 1000000 // COUNT(*) AS BIGINT) AS mean_err_q7
FROM errs e JOIN mm m ON e.dim = m.dim
GROUP BY e.dim
ORDER BY dim
"""


def repurchase_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week_bucket, n_events, n_at_risk, hazard_ppm): discrete-time
    hazard of the customer reorder interval — per consecutive-order gap
    (lag window per customer, ties broken by o_orderkey), bucketed into
    {HAZARD_BUCKET_DAYS}-day weeks: how many gaps END in this bucket
    (events) out of the gaps that REACHED it (at-risk = reverse
    cumulative count), hazard in exact ppm. The retention-curve input
    every replenishment model starts from, with the float cumulative
    product left to the notebook. One lag window + one groupBy; the
    cumulative at-risk window runs over the |buckets| aggregate."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderdate").over(w).alias("prev_date"),
        )
        .filter(F.col("prev_date").isNotNull())
        .select(
            (
                F.datediff(F.col("o_orderdate"), F.col("prev_date"))
                / HAZARD_BUCKET_DAYS
            )
            .cast("long")
            .alias("week_bucket")
        )
    )
    counts = gaps.groupBy("week_bucket").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    cum = Window.orderBy(F.desc("week_bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counts.withColumn(
            "n_at_risk", F.sum("n_events").over(cum).cast("long")
        )
        .select(
            "week_bucket",
            F.col("n_events").cast("long").alias("n_events"),
            "n_at_risk",
            F.expr("n_events * 1000000 div n_at_risk")
            .cast("long")
            .alias("hazard_ppm"),
        )
        .orderBy("week_bucket")
    )


REPURCHASE_HAZARD_TABLE_SQL = f"""
WITH gaps AS (
  SELECT CAST(datediff('day', prev_date, o_orderdate)
              // {HAZARD_BUCKET_DAYS} AS BIGINT) AS week_bucket
  FROM (
    SELECT o_orderdate,
           LAG(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_date
    FROM orders
  )
  WHERE prev_date IS NOT NULL
),
counts AS (
  SELECT week_bucket, COUNT(*) AS n_events FROM gaps GROUP BY week_bucket
)
SELECT week_bucket,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(SUM(n_events) OVER (
              ORDER BY week_bucket DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_at_risk,
       CAST(n_events * 1000000 // SUM(n_events) OVER (
              ORDER BY week_bucket DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS hazard_ppm
FROM counts
ORDER BY week_bucket
"""
