"""Batch 59: conformal calibration, EWMA control charts, clustering
coefficient.

- ``conformal_calibration_report`` — split conformal prediction
  (Papadopoulos et al. 2002; Vovk): calibrate an absolute-residual
  nonconformity quantile on half the corpus, report empirical coverage
  on the other half for three α levels. Quantile selection is an exact
  integer RANK (⌈(1−α)(n+1)⌉-th smallest score), so the whole report is
  bit-stable — the distribution-free prediction-interval machinery an
  ML data pipeline uses to sanity-check any scorer.
- ``ewma_control_bands`` — EWMA control chart (Roberts 1959) over daily
  order revenue, α=1/4 truncated to an {EWMA_H}-day horizon so the
  weights 3^j·4^({EWMA_H}-1-j) stay exact integers; the robust band is
  ±{EWMA_K}·MAD over the same window (lower-median rank selection).
- ``clustering_coefficient_topk`` — local clustering coefficient
  (Watts & Strogatz 1998) over the co-supplier graph:
  2·T·1e6 div (deg·(deg−1)) per node, riding graph._tri_graph's
  oriented-wedge triangle counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat
from ..functions.local_table import values_df

CONF_ALPHAS_PPM = (50_000, 100_000, 200_000)

EWMA_H = 8  # horizon (days): weights 3^j * 4^(H-1-j), j = lag
EWMA_K = 5  # robust band width in MADs
EWMA_DAYS = 60  # reported tail of the timeline

CC_TOPK = 30


def conformal_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(alpha_ppm, n_cal, n_test, q_hat, coverage_ppm): split conformal
    calibration of a chars-from-tokens predictor on documents. The
    deterministic split is doc_id parity; the "model" is the
    calibration half's global chars-per-token ratio (ppm); the
    nonconformity score is the absolute residual |n_chars − pred|. For
    each α, q_hat is the ⌈(1−α)(n_cal+1)⌉-th smallest calibration score
    — the exact finite-sample conformal quantile — and coverage_ppm is
    the fraction of test documents whose score ≤ q_hat (the
    distribution-free guarantee puts it near 1−α).

    Scale shape: one row-local score projection, one RANGE-PARTITIONED
    global rank over the calibration half (functions/global_order —
    the conformal quantile IS an order statistic, and the sort
    distributes), three threshold probes over the test half. Nothing
    is quadratic; the distributed sort is the cost, exactly
    exact_percentile_two_pass's class."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "n_chars",
        F.size(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
        ).cast("long").alias("n_toks"),
    )
    cal = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    r = cal.agg(
        F.expr("sum(n_chars) * 1000000 div greatest(sum(n_toks), 1)").alias(
            "ratio_ppm"
        )
    ).collect()[0]
    ratio = int(r["ratio_ppm"])
    score = F.expr(f"abs(n_chars - (n_toks * {ratio}) div 1000000)")
    cal_s = cal.select(score.cast("long").alias("s"), "doc_id")
    test_s = test.select(score.cast("long").alias("s"))
    # range-partitioned global rank (functions/global_order) — the
    # conformal order statistic without a single-partition sort; the
    # helper's grand total IS n_cal, saving a count pass.
    ranked, n_cal = with_global_order_stat(
        cal_s, [F.asc("s"), F.asc("doc_id")], out="rn"
    )
    n_test = test_s.count()
    rows = []
    for alpha in CONF_ALPHAS_PPM:
        rank = ((1_000_000 - alpha) * (n_cal + 1) + 999_999) // 1_000_000
        if rank > n_cal:
            q_hat = None
            cov = 1_000_000
        else:
            q_hat = ranked.filter(F.col("rn") == rank).collect()[0]["s"]
            cov = (
                test_s.filter(F.col("s") <= q_hat).count()
                * 1_000_000
                // n_test
            )
        rows.append((alpha, n_cal, n_test, q_hat, cov))
    return values_df(spark,
        rows,
        "alpha_ppm long, n_cal long, n_test long, q_hat long, coverage_ppm long",
    ).orderBy("alpha_ppm")


def _conformal_sql() -> str:
    arms = " UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS alpha_ppm" for a in CONF_ALPHAS_PPM
    )
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, n_chars,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              t -> t != '')) AS BIGINT) AS n_toks
  FROM documents
),
ratio AS (
  SELECT CAST(SUM(n_chars) * 1000000 // greatest(SUM(n_toks), 1) AS BIGINT)
         AS ratio_ppm
  FROM d WHERE doc_id % 2 = 0
),
scores AS MATERIALIZED (
  SELECT doc_id, doc_id % 2 AS half,
         CAST(abs(n_chars - (n_toks * ratio.ratio_ppm) // 1000000)
              AS BIGINT) AS s
  FROM d CROSS JOIN ratio
),
ranked AS MATERIALIZED (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s, doc_id) AS rn
  FROM scores WHERE half = 0
),
counts AS (
  SELECT CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cal,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
  FROM scores
),
alphas AS ({arms}),
q AS (
  SELECT a.alpha_ppm, c.n_cal, c.n_test,
         ((1000000 - a.alpha_ppm) * (c.n_cal + 1) + 999999) // 1000000
           AS rank
  FROM alphas a CROSS JOIN counts c
)
SELECT q.alpha_ppm, q.n_cal, q.n_test,
       r.s AS q_hat,
       CASE WHEN q.rank > q.n_cal THEN 1000000
            ELSE CAST((SELECT COUNT(*) FROM scores t
                       WHERE t.half = 1 AND t.s <= r.s)
                      * 1000000 // q.n_test AS BIGINT)
       END AS coverage_ppm
FROM q LEFT JOIN ranked r ON r.rn = q.rank
ORDER BY alpha_ppm
"""


CONFORMAL_CALIBRATION_SQL = _conformal_sql()


# ---------------------------------------------------------------------------
# EWMA control chart over daily order revenue
# ---------------------------------------------------------------------------


def ewma_control_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, x_cents, ewma_cents, mad_cents, n_window, outlier_flag):
    the last {EWMA_DAYS} days of an EWMA control chart over daily order
    revenue. α=1/4 truncated to the last {EWMA_H} PRESENT calendar days
    — lag-j weight 3^j·4^({EWMA_H}-1-j), normalized by the sum of
    weights actually present, every step integer. The robust band is
    ±{EWMA_K}·MAD of the same window (lower-median rank selection on
    sorted arrays — exact), and outlier_flag marks
    |x − ewma| > {EWMA_K}·MAD once ≥4 days of history exist.

    Scale shape: one partial-aggregated daily rollup of orders, then an
    explode over {EWMA_H} fixed day-offsets re-aggregated by day — a
    bounded-fanout self-alignment that shuffles |days|·{EWMA_H} rows
    (never touching orders twice), no unbounded window state."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
            ).alias("x_cents")
        )
        .localCheckpoint(eager=True)
    )
    lag = daily.select(
        "day",
        F.col("x_cents").alias("lx"),
        F.explode(F.expr(f"sequence(0, {EWMA_H - 1})")).alias("j"),
    ).select(
        F.expr("date_add(day, CAST(j AS INT))").alias("day"),
        "lx",
        "j",
    )
    agg = (
        daily.join(lag, "day")
        .groupBy("day", "x_cents")
        .agg(
            F.sum(
                F.expr(f"power(3, j) * power(4, {EWMA_H - 1} - j)").cast(
                    "long"
                )
                * F.col("lx")
            ).alias("num"),
            F.sum(
                F.expr(
                    f"CAST(power(3, j) * power(4, {EWMA_H - 1} - j) AS BIGINT)"
                )
            ).alias("den"),
            F.count(F.lit(1)).alias("n_window"),
            F.sort_array(F.collect_list("lx")).alias("xs"),
        )
    )
    med = "element_at(xs, CAST((n_window + 1) div 2 AS INT))"
    out = agg.select(
        # ISO string day: Spark DateType and DuckDB DATE normalize
        # differently through pandas, so the report column is text
        F.col("day").cast("string").alias("day"),
        F.col("x_cents").cast("long").alias("x_cents"),
        F.expr("num div den").cast("long").alias("ewma_cents"),
        F.expr(
            f"element_at(array_sort(transform(xs, v -> abs(v - {med}))), "
            f"CAST((n_window + 1) div 2 AS INT))"
        )
        .cast("long")
        .alias("mad_cents"),
        F.col("n_window").cast("long").alias("n_window"),
    ).withColumn(
        "outlier_flag",
        (F.col("n_window") >= 4)
        & (
            F.expr(f"abs(x_cents - ewma_cents) > {EWMA_K} * mad_cents")
        ),
    )
    w = W.orderBy(F.desc("day"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EWMA_DAYS)
        .drop("rn")
        .orderBy("day")
    )


EWMA_CONTROL_SQL = f"""
WITH daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS x_cents
  FROM orders GROUP BY o_orderdate
),
lag AS (
  SELECT day + CAST(j AS INTEGER) AS day, x_cents AS lx, j
  FROM daily, UNNEST(range({EWMA_H})) AS u(j)
),
agg AS (
  SELECT d.day, d.x_cents,
         CAST(SUM(CAST(3 ** l.j * 4 ** ({EWMA_H - 1} - l.j) AS BIGINT)
                  * l.lx) AS BIGINT) AS num,
         CAST(SUM(CAST(3 ** l.j * 4 ** ({EWMA_H - 1} - l.j) AS BIGINT))
              AS BIGINT) AS den,
         CAST(COUNT(*) AS BIGINT) AS n_window,
         list_sort(list(l.lx)) AS xs
  FROM daily d JOIN lag l USING (day)
  GROUP BY d.day, d.x_cents
),
scored AS (
  SELECT day, x_cents,
         CAST(num // den AS BIGINT) AS ewma_cents,
         CAST(list_sort(list_transform(xs,
                v -> abs(v - xs[CAST((n_window + 1) // 2 AS INTEGER)])))
              [CAST((n_window + 1) // 2 AS INTEGER)] AS BIGINT) AS mad_cents,
         n_window
  FROM agg
)
SELECT CAST(day AS VARCHAR) AS day, x_cents, ewma_cents, mad_cents, n_window,
       n_window >= 4 AND abs(x_cents - ewma_cents) > {EWMA_K} * mad_cents
         AS outlier_flag
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY day DESC) AS rn FROM scored
) WHERE rn <= {EWMA_DAYS}
ORDER BY day
"""


# ---------------------------------------------------------------------------
# local clustering coefficient
# ---------------------------------------------------------------------------


def clustering_coefficient_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(suppkey, degree, n_triangles, coeff_ppm): top-{CC_TOPK} local
    clustering coefficients in the co-supplier graph —
    2·T·1e6 div (deg·(deg−1)) per node with deg ≥ 2, zero-triangle
    nodes included. Rides graph._tri_graph's oriented-wedge plan (each
    triangle counted once, wedge fan-out bounded by out-degree), so the
    coefficient costs one extra broadcast join over the triangle
    report."""
    from .graph import _tri_graph

    deg, counts = _tri_graph(spark, sf_dir)
    joined = (
        deg.filter(F.col("deg") >= 2)
        .join(
            counts.withColumnRenamed("suppkey", "n"), "n", "left"
        )
        .select(
            F.col("n").cast("long").alias("suppkey"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.expr(
                "coalesce(n_triangles, 0) * 2000000 div (deg * (deg - 1))"
            )
            .cast("long")
            .alias("coeff_ppm"),
        )
    )
    w = W.orderBy(F.desc("coeff_ppm"), F.asc("suppkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CC_TOPK)
        .drop("rn")
        .orderBy(F.desc("coeff_ppm"), "suppkey")
    )


def _cc_sql() -> str:
    from .graph import TRIANGLE_SQL

    prefix = TRIANGLE_SQL[: TRIANGLE_SQL.rindex("SELECT suppkey, COUNT(*)")]
    return f"""{prefix}, tcnt AS (
  SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM corners GROUP BY suppkey
)
SELECT suppkey, degree, n_triangles, coeff_ppm FROM (
  SELECT deg.n AS suppkey, CAST(deg.deg AS BIGINT) AS degree,
         CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
         CAST(COALESCE(t.n_triangles, 0) * 2000000
              // (deg.deg * (deg.deg - 1)) AS BIGINT) AS coeff_ppm,
         ROW_NUMBER() OVER (
           ORDER BY COALESCE(t.n_triangles, 0) * 2000000
                    // (deg.deg * (deg.deg - 1)) DESC, deg.n) AS rn
  FROM deg LEFT JOIN tcnt t ON t.suppkey = deg.n
  WHERE deg.deg >= 2
) WHERE rn <= {CC_TOPK}
ORDER BY coeff_ppm DESC, suppkey
"""


CLUSTERING_COEFF_SQL = _cc_sql()
