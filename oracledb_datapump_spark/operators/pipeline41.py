"""Batch 41: rank statistics and near-dup graph profiling.

Nonparametric tests the experimentation family lacked (Mann–Whitney U
with tie correction, Wald–Wolfowitz runs test, Kendall tau-b) plus the
verified near-dup adjacency profile. All integer-exact under the
cross-engine hash: prices quantize to cents, rank sums use the 2×-rank
trick (average ranks over ties become integers), and every significance
verdict is a cross-multiplied DECIMAL(38,0)/HUGEINT inequality — no
float ever crosses an engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.local_table import values_df

# z_{0.975}^2 = 1.959964^2 as an exact rational (same constant family as
# ab_test_report / chi2_independence_matrix)
Z2_NUM = 38416
Z2_DEN = 10000


# ---------------------------------------------------------------------------
# Mann–Whitney U between order-priority segments (tie-corrected)
# ---------------------------------------------------------------------------


def mw_u_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seg_a, seg_b, n_a, n_b, u2, tie_correction, significant): the
    Mann–Whitney U rank test on o_totalprice between every ordered pair
    of o_orderpriority segments — "does priority shift the price
    distribution?" without any normality assumption.

    Integer-exact construction: prices quantize to cents; ranks come
    from the per-pair VALUE HISTOGRAM (count per distinct cents value
    per segment), so the only ordered structure is a window over the
    pair's distinct values — never a global row sort. With cum = rows
    strictly below v and t = rows tied at v, the 2×average-rank is the
    integer 2·cum + t + 1; R2_a = Σ c_a·(2cum+t+1) and
    U2 = R2_a − n_a(n_a+1) is exactly 2U. The normal-approximation
    verdict uses the tie-corrected variance
    σ² = n_a n_b (N(N−1)(N+1) − ΣT) / (12 N(N−1)), T = t³−t, as the
    cross-multiplied inequality
    (U2 − n_a n_b)² · 30000 · N(N−1) > 38416 · n_a n_b · (N(N−1)(N+1) − ΣT)
    in DECIMAL(38,0) (≈1e33 worst case at sf0.1 — inside both engines'
    128-bit range).

    Scale: one groupBy to the (segment, value) histogram (partial-agg,
    Zipf-ish distinct-value count), a 10-partition window over pair
    histograms, and a 10-row reduce. No global sort at any size."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").alias("seg"),
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("v"),
    )
    # r16 note: pinning this frame (the segment-list collect and the
    # pair-histogram join both consume it) was A/B-measured same-JVM at
    # sf0.1 and REJECTED (2.44 s → 2.68 s): the second orders
    # scan+groupBy re-runs cheaper than the eager materialization.
    # Left as-is deliberately.
    hist = o.groupBy("seg", "v").agg(F.count(F.lit(1)).alias("c"))
    segs = sorted(
        r["seg"] for r in hist.select("seg").distinct().collect()
    )
    pair_rows = [
        (a, b) for i, a in enumerate(segs) for b in segs[i + 1 :]
    ]
    pairs = values_df(spark, pair_rows, "seg_a string, seg_b string")
    ph = (
        hist.join(
            F.broadcast(pairs),
            (F.col("seg") == F.col("seg_a"))
            | (F.col("seg") == F.col("seg_b")),
        )
        .groupBy("seg_a", "seg_b", "v")
        .agg(
            F.sum(F.when(F.col("seg") == F.col("seg_a"), F.col("c"))
                  .otherwise(F.lit(0))).alias("ca"),
            F.sum(F.when(F.col("seg") == F.col("seg_b"), F.col("c"))
                  .otherwise(F.lit(0))).alias("cb"),
        )
        .withColumn("t", F.col("ca") + F.col("cb"))
    )
    w = (
        Window.partitionBy("seg_a", "seg_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = ph.withColumn("cum", F.coalesce(F.sum("t").over(w), F.lit(0)))
    stats = ranked.groupBy("seg_a", "seg_b").agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("cum") + F.col("t") + 1)
        ).alias("r2a"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_correction"),
    )
    sig = F.expr(
        f"""
        CAST(u2 - n_a * n_b AS DECIMAL(38,0))
          * CAST(u2 - n_a * n_b AS DECIMAL(38,0))
          * 30000 * nn
        > {Z2_NUM} * CAST(n_a AS DECIMAL(38,0)) * n_b
          * (CAST(nn AS DECIMAL(38,0)) * (n_a + n_b + 1) - tie_correction)
        """
    )
    return (
        stats.withColumn(
            "u2", F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)
        )
        .withColumn(
            "nn",
            (F.col("n_a") + F.col("n_b"))
            * (F.col("n_a") + F.col("n_b") - 1),
        )
        .select(
            "seg_a",
            "seg_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("u2").cast("long").alias("u2"),
            F.col("tie_correction").cast("long").alias("tie_correction"),
            sig.alias("significant"),
        )
        .orderBy("seg_a", "seg_b")
    )


MW_U_SEGMENTS_SQL = f"""
WITH q AS (
  SELECT o_orderpriority AS seg,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), hist AS (
  SELECT seg, v, CAST(COUNT(*) AS BIGINT) AS c FROM q GROUP BY seg, v
), segs AS (SELECT DISTINCT seg FROM hist),
prs AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b
  FROM segs a JOIN segs b ON a.seg < b.seg
), ph AS (
  SELECT p.seg_a, p.seg_b, h.v,
         SUM(CASE WHEN h.seg = p.seg_a THEN h.c ELSE 0 END) AS ca,
         SUM(CASE WHEN h.seg = p.seg_b THEN h.c ELSE 0 END) AS cb
  FROM prs p JOIN hist h ON h.seg IN (p.seg_a, p.seg_b)
  GROUP BY p.seg_a, p.seg_b, h.v
), ranked AS (
  SELECT *, ca + cb AS t,
         COALESCE(SUM(ca + cb) OVER (
           PARTITION BY seg_a, seg_b ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM ph
), stats AS (
  SELECT seg_a, seg_b,
         SUM(ca) AS n_a, SUM(cb) AS n_b,
         SUM(ca * (2 * cum + t + 1)) AS r2a,
         SUM(t * t * t - t) AS tie_correction
  FROM ranked GROUP BY seg_a, seg_b
), u AS (
  SELECT *, r2a - n_a * (n_a + 1) AS u2,
         (n_a + n_b) * (n_a + n_b - 1) AS nn
  FROM stats
)
SELECT seg_a, seg_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(u2 AS BIGINT) AS u2,
       CAST(tie_correction AS BIGINT) AS tie_correction,
       (u2 - n_a * n_b) * (u2 - n_a * n_b) * 30000 * nn
         > {Z2_NUM} * n_a * n_b * (nn * (n_a + n_b + 1) - tie_correction)
         AS significant
FROM u
ORDER BY seg_a, seg_b
"""


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test on daily event counts per type
# ---------------------------------------------------------------------------


def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, n_above, n_runs, clustered): is a type's
    daily-count series RANDOMLY mixed around its own mean, or do
    high/low days cluster (regime behavior the changepoint scan would
    then localize)? Wald–Wolfowitz: binarize each day as above/below the
    type's mean daily count (ties-with-mean count as below), count runs
    R of consecutive equal signs, and flag types whose R is
    significantly LOW (one-sided clustering verdict) under
    μ = 2 n₁n₂/N + 1, σ² = 2n₁n₂(2n₁n₂−N) / (N²(N−1)) — as the
    cross-multiplied integer inequality
    (μ−R)>0 ∧ (2n₁n₂(N−1)−RN²+N²)² ·(N−1)·10000 > 38416·2n₁n₂(2n₁n₂−N)·N²
    (both sides ≤~1e30 at the fixture's day counts — DECIMAL(38,0)).

    The mean-vs-day comparison is integer-exact: day_count·n_days vs
    total (no division). Scale: one partial-agg rollup to ≤|types×days|
    rows, one lag window per type, a per-type reduce."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir)
    daily = (
        e.groupBy(
            "event_type", F.to_date("ts").alias("d")
        ).agg(F.count(F.lit(1)).alias("c"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    signed = daily.join(tot, "event_type").withColumn(
        "above", (F.col("c") * F.col("n_days") > F.col("total")).cast("int")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    runs = (
        signed.withColumn("prev", F.lag("above").over(w))
        .withColumn(
            "new_run",
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("above")),
                1,
            ).otherwise(0),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("above").alias("n_above"),
            F.sum("new_run").alias("n_runs"),
        )
    )
    clustered = F.expr(
        f"""
        n_above > 0 AND n_above < n_days
        AND 2 * n_above * (n_days - n_above) * (n_days - 1)
              - n_runs * n_days * n_days + n_days * n_days > 0
        AND CAST(2 * n_above * (n_days - n_above) * (n_days - 1)
              - n_runs * n_days * n_days
              + n_days * n_days AS DECIMAL(38,0))
            * CAST(2 * n_above * (n_days - n_above) * (n_days - 1)
              - n_runs * n_days * n_days
              + n_days * n_days AS DECIMAL(38,0))
            * (n_days - 1) * {Z2_DEN}
          > {Z2_NUM} * CAST(2 AS DECIMAL(38,0)) * n_above
            * (n_days - n_above)
            * (2 * n_above * (n_days - n_above) - n_days)
            * n_days * n_days
        """
    )
    return (
        runs.select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_above").cast("long").alias("n_above"),
            F.col("n_runs").cast("long").alias("n_runs"),
            clustered.alias("clustered"),
        )
        .orderBy("event_type")
    )


EVENTS_RUNS_TEST_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, d
), tot AS (
  SELECT event_type, SUM(c) AS total, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
), signed AS (
  SELECT daily.event_type, d, c,
         CASE WHEN c * n_days > total THEN 1 ELSE 0 END AS above
  FROM daily JOIN tot USING (event_type)
), runs AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(above) AS BIGINT) AS n_above,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM (
    SELECT event_type, above,
           CASE WHEN LAG(above) OVER (
                  PARTITION BY event_type ORDER BY d) IS DISTINCT FROM above
                THEN 1 ELSE 0 END AS new_run
    FROM signed
  ) GROUP BY event_type
)
SELECT event_type, n_days, n_above, n_runs,
       (n_above > 0 AND n_above < n_days
        AND 2 * n_above * (n_days - n_above) * (n_days - 1)
              - n_runs * n_days * n_days + n_days * n_days > 0
        AND (2 * n_above * (n_days - n_above) * (n_days - 1)
              - n_runs * n_days * n_days + n_days * n_days)
            * (2 * n_above * (n_days - n_above) * (n_days - 1)
              - n_runs * n_days * n_days + n_days * n_days)
            * (n_days - 1) * {Z2_DEN}
          > {Z2_NUM} * 2 * n_above * (n_days - n_above)
            * (2 * n_above * (n_days - n_above) - n_days)
            * n_days * n_days) AS clustered
FROM runs
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Kendall tau-b between daily order volume and daily revenue
# ---------------------------------------------------------------------------


def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Kendall tau-b report between daily order COUNT and daily
    revenue (cents): (n_days, concordant, discordant, ties_x, ties_y,
    tau_ppm) — the rank-correlation a revenue-forecasting pipeline
    checks before trusting volume as a feature. Exact pair counting
    over the DAY-LEVEL aggregate (d choose 2 with d = distinct days —
    the O(d²) join is over the tiny rollup, never over orders), ties
    split per Kendall's tau-b. tau_ppm = (C−D)·1e6 / isqrt((P−Tx)(P−Ty))
    with P = d(d−1)/2, via the integer floor-sqrt both engines compute
    identically (IEEE sqrt of int64 is correctly rounded — the
    epoch_mix_plan recipe); sign carried separately (sign-abs DIV)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = o.groupBy("d").agg(
        F.count(F.lit(1)).alias("x"), F.sum("cents").alias("y")
    )
    a, b = daily.alias("a"), daily.alias("b")
    prs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (F.col("a.x") - F.col("b.x")).alias("dx"),
        (F.col("a.y") - F.col("b.y")).alias("dy"),
    )
    agg = prs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            ((F.col("dx") > 0) & (F.col("dy") > 0)
             | (F.col("dx") < 0) & (F.col("dy") < 0)).cast("long")
        ).alias("concordant"),
        F.sum(
            ((F.col("dx") > 0) & (F.col("dy") < 0)
             | (F.col("dx") < 0) & (F.col("dy") > 0)).cast("long")
        ).alias("discordant"),
        F.sum(
            ((F.col("dx") == 0) & (F.col("dy") != 0)).cast("long")
        ).alias("ties_x"),
        F.sum(
            ((F.col("dy") == 0) & (F.col("dx") != 0)).cast("long")
        ).alias("ties_y"),
        F.sum(
            ((F.col("dx") == 0) & (F.col("dy") == 0)).cast("long")
        ).alias("ties_xy"),
    )
    n_days = daily.count()
    return (
        agg.withColumn("n_days", F.lit(int(n_days)).cast("long"))
        .withColumn(
            "denom",
            F.expr(
                "CAST(FLOOR(SQRT("
                "CAST((n_pairs - ties_x - ties_xy) AS DOUBLE)"
                " * CAST((n_pairs - ties_y - ties_xy) AS DOUBLE)"
                ")) AS BIGINT)"
            ),
        )
        .select(
            "n_days",
            F.col("concordant").cast("long").alias("concordant"),
            F.col("discordant").cast("long").alias("discordant"),
            F.col("ties_x").cast("long").alias("ties_x"),
            F.col("ties_y").cast("long").alias("ties_y"),
            F.expr(
                "CAST(SIGN(concordant - discordant) AS BIGINT)"
                " * (ABS(concordant - discordant) * 1000000 DIV denom)"
            )
            .cast("long")
            .alias("tau_ppm"),
        )
    )


KENDALL_TAU_DAILY_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY d
), prs AS (
  SELECT a.x - b.x AS dx, a.y - b.y AS dy
  FROM daily a JOIN daily b ON a.d < b.d
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(SUM(CASE WHEN dx = 0 AND dy != 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_x,
         CAST(SUM(CASE WHEN dy = 0 AND dx != 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_y,
         CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_xy
  FROM prs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
       concordant, discordant, ties_x, ties_y,
       CAST(CASE WHEN concordant >= discordant THEN 1 ELSE -1 END
            * (ABS(concordant - discordant) * 1000000
               // CAST(FLOOR(SQRT(
                    CAST(n_pairs - ties_x - ties_xy AS DOUBLE)
                    * CAST(n_pairs - ties_y - ties_xy AS DOUBLE)))
                  AS BIGINT)) AS BIGINT) AS tau_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# Verified near-dup adjacency profile
# ---------------------------------------------------------------------------


def dedup_pair_degree_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(degree, n_docs): how many verified near-dup partners each
    document has — the raw ADJACENCY profile of the dedup graph
    (dedup_group_size_histogram profiles connected COMPONENTS; a
    component of size 3 can be a path of degree ≤2 or a triangle of
    degree 2 everywhere, and blocking-quality work needs the
    distinction: heavy-degree docs are template/boilerplate suspects).
    Degree-0 docs are counted — the denominator a dedup-rate report
    divides by. Rides the memoized verified-pair table; one groupBy per
    direction union, one small histogram."""
    from .dedup import _docs, verified_pairs_cached

    pairs = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(deg, "doc_id", "left")
        .select(F.coalesce("degree", F.lit(0)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("degree").cast("long").alias("degree"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("degree")
    )


def _dedup_pair_degree_sql() -> str:
    from .dedup import DEDUP_MINHASH_VERIFIED_SQL

    base = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH pairs AS ({base}),
ends AS (
  SELECT doc_a AS doc_id FROM pairs
  UNION ALL
  SELECT doc_b AS doc_id FROM pairs
), deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM ends GROUP BY doc_id
)
SELECT CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id
GROUP BY 1
ORDER BY degree
"""


DEDUP_PAIR_DEGREE_SQL = _dedup_pair_degree_sql()
