"""Batch 49: forecast backtesting + hash-family QA.

- ``naive_forecast_backtest`` — rolling-origin backtest (the standard
  out-of-sample evaluation protocol for time series; Tashman 2000) of
  the 3-month moving-average forecaster on per-nation monthly revenue:
  for every month with 3 predecessors, forecast = mean of the previous
  3, then per-nation MAE and mean bias in cents. The baseline every
  fancier forecaster must beat before it ships — and the integer form
  of the protocol (floor-mean forecast, signed-ratio bias) keeps both
  engines bit-identical.
- ``minhash_perm_quality`` — QA of the engine's universal-hash minhash
  family: per permutation seed, the min/mean/max of the per-doc
  minhash value. For a healthy family every seed's mean sits near
  P/(m+1) (m = typical shingle count) and NO seed is an outlier — a
  biased a_j/b_j pair (a classic implementation bug) shows up as one
  seed whose mean drifts from its 15 siblings. Runs on the same
  signature aggregate the production LSH pass builds.

Scale posture: the backtest runs lag windows on the ≤|nation×month|
rollup; the perm audit is the signature groupBy (the LSH pass's own
shuffle) plus a 16-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# ---------------------------------------------------------------------------
# naive_forecast_backtest
# ---------------------------------------------------------------------------

FC_WINDOW = 3  # months in the moving-average forecaster


def naive_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_eval, mae_cents, mean_bias_cents): rolling-origin
    backtest of the {FC_WINDOW}-month moving-average forecaster on
    monthly revenue. forecast(t) = (y(t−1)+y(t−2)+y(t−3)) div 3;
    evaluated at every month with a full history window;
    mae_cents = Σ|y−f| div n_eval, mean_bias_cents the signed-ratio
    mean of (y−f) (positive = the naive model under-forecasts, i.e.
    growth). Nations with fewer than {FC_WINDOW}+1 months drop out.

    Plan: the rollup is the broadcast-dim monthly aggregate the trend
    family shares; three lag windows + one groupBy on ≤|nation×month|
    rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
    )
    w = W.partitionBy("nation").orderBy("ym")
    lagged = monthly.select(
        "nation",
        "y",
        F.lag("y", 1).over(w).alias("l1"),
        F.lag("y", 2).over(w).alias("l2"),
        F.lag("y", 3).over(w).alias("l3"),
    ).filter(F.col("l3").isNotNull())
    scored = lagged.select(
        "nation",
        (F.col("y") - F.expr("(l1 + l2 + l3) div 3")).alias("bias"),
    )
    agg = scored.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(F.col("bias"))).alias("sae"),
        F.sum("bias").alias("sb"),
    )
    return (
        agg.select(
            "nation",
            F.col("n_eval").cast("long").alias("n_eval"),
            F.expr("sae div n_eval").cast("long").alias("mae_cents"),
            (
                F.when(F.col("sb") < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr("abs(sb) div n_eval")
            )
            .cast("long")
            .alias("mean_bias_cents"),
        )
        .orderBy("nation")
    )


NAIVE_FORECAST_BACKTEST_SQL = f"""
WITH monthly AS (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT nation, y,
         LAG(y, 1) OVER (PARTITION BY nation ORDER BY ym) AS l1,
         LAG(y, 2) OVER (PARTITION BY nation ORDER BY ym) AS l2,
         LAG(y, 3) OVER (PARTITION BY nation ORDER BY ym) AS l3
  FROM monthly
),
scored AS (
  SELECT nation, y - (l1 + l2 + l3) // 3 AS bias
  FROM lagged WHERE l3 IS NOT NULL
),
agg AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_eval,
         SUM(abs(bias)) AS sae, SUM(bias) AS sb
  FROM scored GROUP BY nation
)
SELECT nation, n_eval,
       CAST(sae // n_eval AS BIGINT) AS mae_cents,
       CAST((CASE WHEN sb < 0 THEN -1 ELSE 1 END) * (abs(sb) // n_eval)
            AS BIGINT) AS mean_bias_cents
FROM agg
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# minhash_perm_quality
# ---------------------------------------------------------------------------


def minhash_perm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seed, n_docs, mean_mh, min_mh, max_mh): per-permutation audit of
    the minhash family — each of the 16 universal-hash permutations'
    per-doc minimum, reduced to its corpus min/mean/max. A biased
    (a_j, b_j) pair makes one seed's mean drift from its siblings; a
    healthy family shows 16 near-identical rows. mean_mh is exact
    integer division.

    Plan: the signature aggregate is the SAME single partial-aggregated
    groupBy the production LSH pass pays; the audit adds a row-local
    16-way posexplode and a 16-row aggregate — free QA riding the
    existing shuffle."""
    from .dedup import NUM_HASHES, _minhash_cols, _shingles_multiset

    agg = (
        _shingles_multiset(spark, sf_dir)
        .groupBy("doc_id")
        .agg(*_minhash_cols())
    )
    long_form = agg.select(
        F.posexplode(
            F.array(*[F.col(f"mh{j}") for j in range(NUM_HASHES)])
        ).alias("seed", "v")
    )
    return (
        long_form.groupBy("seed")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("v").alias("s"),
            F.min("v").alias("min_mh"),
            F.max("v").alias("max_mh"),
        )
        .select(
            F.col("seed").cast("long").alias("seed"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr("s div n_docs").cast("long").alias("mean_mh"),
            F.col("min_mh").cast("long").alias("min_mh"),
            F.col("max_mh").cast("long").alias("max_mh"),
        )
        .orderBy("seed")
    )


def _perm_quality_sql() -> str:
    from .dedup import NUM_HASHES, SQL_MINHASH_CTE

    cols = ", ".join(f"mh{j}" for j in range(NUM_HASHES))
    return f"""
WITH {SQL_MINHASH_CTE},
long_form AS (
  SELECT generate_subscripts(l, 1) - 1 AS seed, unnest(l) AS v
  FROM (SELECT list_value({cols}) AS l FROM mh)
)
SELECT CAST(seed AS BIGINT) AS seed,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(v) // COUNT(*) AS BIGINT) AS mean_mh,
       CAST(MIN(v) AS BIGINT) AS min_mh,
       CAST(MAX(v) AS BIGINT) AS max_mh
FROM long_form
GROUP BY seed
ORDER BY seed
"""


MINHASH_PERM_QUALITY_SQL = _perm_quality_sql()
