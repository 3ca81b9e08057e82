"""Batch 74: blocked / ordered nonparametrics & multiple-testing
governance.

The round-72/73 robust-stats family tested one comparison at a time;
this batch adds the designs a metrics platform actually runs — ranked
complete blocks, ordered-alternative trend, serial-correlation audit,
and the FDR machinery that keeps a 25-way comparison honest.

- ``friedman_event_type_ranks`` — Friedman's rank test over complete
  day-blocks: does event-type volume keep the same within-day ordering
  across the calendar? Tie-corrected statistic (Friedman 1937; the
  A−C denominator form), doubled midranks keep it exact-integer.
- ``page_trend_hour_bins`` — Page's L (Page 1963) for an ORDERED
  alternative over the four six-hour bins of each day: activity is
  hypothesized to rise across the day, and L weights each bin's rank
  sum by its position. Normal approximation on exact-integer L.
- ``cochran_armitage_priority`` — the Cochran–Armitage trend test:
  does the fulfilled-order proportion trend monotonically across the
  five ordered priorities? Exact-integer z via staged division.
- ``mood_median_priority`` — Mood's median test: a 2×k χ² on
  above-grand-median counts per priority (the coarse, outlier-immune
  cousin of Kruskal–Wallis; the grand median is an exact rank
  selection through functions/global_order).
- ``durbin_watson_trend`` — the Durbin–Watson serial-correlation
  statistic on the residuals of the daily-revenue OLS line, with the
  slope quantized to milli-cents/day so residuals stay integer.
- ``cramer_von_mises_drift`` — the two-sample Cramér–von Mises T
  (Anderson 1962 rank form) between the two calendar halves of the
  daily revenue series: the L²-of-ECDF-gap drift test that sees
  middle-of-distribution shifts KS's sup-norm misses.
- ``bh_fdr_nation_trend`` — per-nation Mann–Kendall trend z over the
  FIXED 25-nation family, then Benjamini–Hochberg step-up at α=0.05:
  the multiple-testing governance layer for per-segment drift scans
  (critical z per BH rank precomputed as milli literals via Acklam's
  inverse-normal — Python-side literals, so both engines compare
  against identical constants).
- ``cochran_q_detectors`` — Cochran's Q (the k-detector extension of
  McNemar) over THREE dedup detectors per document: exact (md5),
  cheap prefix (first-{PREFIX_DUP_CHARS}-chars md5), and the
  verification-grade 3-shingle Jaccard near detector. One test for
  "do the detectors agree beyond chance?" before anyone ships an
  ensemble.

All exact-integer under the cross-engine hash (both engines truncate
integer division toward zero); headroom bounds documented per op.
Reference scope note: extends the reference's analytics surface per
SURVEY §2.9-2.10; the reference engine ships data movement only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat

#: χ²(df) upper 5% critical values, milli (standard table).
CHI2_CRIT_MILLI = {
    1: 3_841,
    2: 5_991,
    3: 7_815,
    4: 9_488,
    5: 11_070,
    6: 12_592,
    7: 14_067,
    8: 15_507,
    9: 16_919,
    10: 18_307,
    11: 19_675,
    12: 21_026,
}
#: |z| 5% two-sided boundary, milli.
Z_CRIT_MILLI = 1_960
#: two-sample Cramér–von Mises T upper 5% (Anderson–Darling 1952
#: limiting ω² table), ppm.
CVM_CRIT_PPM = 461_000
#: Durbin–Watson heuristic bands, milli (dw < low → positive serial
#: correlation suspected; > high → negative; n-dependent exact dL/dU
#: tables are out of scope for a single-series audit).
DW_LOW_MILLI, DW_HIGH_MILLI = 1_500, 2_500
#: residual quantum for the DW sums (page_hinkley_drift's
#: PH_SIGMA_QUANT posture): raw daily-cent residuals square to ~1e16
#: and Σe² overflows int64 by sf0.01 — residuals are floor-divided to
#: $100 units BEFORE squaring, identically in both engines (DW is a
#: ratio, so the quantum cancels up to the documented ≤1-milli
#: rounding).
DW_RESID_QUANT = 10_000
#: BH family: the fixed 25-nation panel at α = 0.05.
BH_ALPHA_PPM = 50_000
BH_FAMILY_M = 25
#: prefix-dup detector: first-N-chars fingerprint.
PREFIX_DUP_CHARS = 40
#: χ²(2) upper 5%, milli (Cochran's Q with k = 3 detectors).
COCHRAN_Q_CRIT_MILLI = 5_991

_DAY_US = 86_400_000_000


def _norm_ppf(p: float) -> float:
    """Acklam's rational approximation to the standard-normal inverse
    CDF (public domain; |rel err| < 1.15e-9). Used ONLY at import time
    to bake the BH critical-z milli literals — both engines then
    compare against the identical integer constants, so no runtime
    float crosses the cross-engine hash."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                * q + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3])
                               * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                 * q + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3])
                                * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
            * r + a[5]) * q / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3])
                                * r + b[4]) * r + 1)


#: BH step-up critical |z| per rank i (1-based, sorted by |z| DESC):
#: z_i = Φ⁻¹(1 − α·i/(2m)) for the fixed m = 25 family, milli.
BH_CRIT_MILLI = tuple(
    round(_norm_ppf(1 - 0.05 * i / (2 * BH_FAMILY_M)) * 1000)
    for i in range(1, BH_FAMILY_M + 1)
)


def _chi2_crit_case(df_expr: str) -> str:
    """SQL CASE mapping a runtime df to its χ² 5% milli literal."""
    arms = " ".join(
        f"WHEN {df} THEN {crit}" for df, crit in CHI2_CRIT_MILLI.items()
    )
    return f"CASE {df_expr} {arms} END"


def _bh_crit_case(rank_expr: str) -> str:
    arms = " ".join(
        f"WHEN {i + 1} THEN {crit}" for i, crit in enumerate(BH_CRIT_MILLI)
    )
    return f"CASE {rank_expr} {arms} END"


# ---------------------------------------------------------------------------
# day × event-type and day × hour-bin count frames (events)
# ---------------------------------------------------------------------------


def _day_cell_counts(
    spark: SparkSession, sf_dir: str, treat_expr: str
) -> DataFrame:
    """(day_idx, treat, c): per-day counts of a treatment expression
    over ts_us/event rows — the complete-block input both Friedman and
    Page consume. Distributed (day, treat) groupBy; nothing
    fact-sized survives it."""
    from ..events_source import load_events

    return (
        load_events(spark, sf_dir)
        .select(
            F.expr(f"ts_us div {_DAY_US}").alias("day_idx"),
            F.expr(treat_expr).alias("treat"),
        )
        .groupBy("day_idx", "treat")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _complete_block_ranks(cells: DataFrame) -> DataFrame:
    """Keep only COMPLETE blocks (days observing every treatment) and
    attach the doubled within-day midrank of c:
    r2 = 2·rank + ties − 1 (kruskal_wallis_price's exact-midrank
    identity, here per day-partitioned window — thousands of
    day partitions, never SinglePartition)."""
    k_frame = cells.agg(
        F.countDistinct("treat").alias("k")
    )
    per_day = cells.groupBy("day_idx").agg(
        F.countDistinct("treat").alias("kt")
    )
    complete = (
        cells.join(per_day, "day_idx")
        .crossJoin(F.broadcast(k_frame))
        .filter(F.col("kt") == F.col("k"))
        .select("day_idx", "treat", "c", "k")
    )
    w = Window.partitionBy("day_idx").orderBy("c")
    we = Window.partitionBy("day_idx", "c")
    return complete.select(
        "day_idx",
        "treat",
        "c",
        "k",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(we) - 1).alias("r2"),
    )


_CELLS_SQL = """
cells AS (
  SELECT epoch_us(ts) // 86400000000 AS day_idx, {treat} AS treat,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
kk AS (SELECT COUNT(DISTINCT treat) AS k FROM cells),
per_day AS (
  SELECT day_idx, COUNT(DISTINCT treat) AS kt FROM cells GROUP BY 1
),
complete AS (
  SELECT c.day_idx, c.treat, c.c, kk.k
  FROM cells c JOIN per_day p ON p.day_idx = c.day_idx
  CROSS JOIN kk
  WHERE p.kt = kk.k
),
ranked AS (
  SELECT day_idx, treat, c, k,
         2 * RANK() OVER (PARTITION BY day_idx ORDER BY c)
           + COUNT(*) OVER (PARTITION BY day_idx, c) - 1 AS r2
  FROM complete
)
"""


def friedman_event_type_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_blocks, k_treatments, chi2f_milli, signif_flag): Friedman's
    rank test across complete day-blocks with event types as the k
    correlated treatments. Doubled midranks q = 2·midrank keep every
    term integer; the tie-corrected statistic is
    χ²_F = (k−1)·Σⱼ(R2ⱼ − n(k+1))² / (A4 − nk(k+1)²) with
    R2ⱼ = Σ q over blocks, A4 = Σ q² — exactly 4×num / 4×denom of
    Friedman's A−C form, so the ratio is the classic statistic.
    χ² milli vs the df = k−1 literal {CHI2_CRIT_MILLI}. Int64
    headroom: A4 ≤ n·k·(2k)², fine to ~1e13 blocks.

    Scale shape: events scan → (day, type) groupBy; ranks ride
    day-partitioned windows (≤k rows per partition); two tiny
    aggregates end it."""
    ranked = _complete_block_ranks(
        _day_cell_counts(spark, sf_dir, "event_type")
    )
    col = ranked.groupBy("treat").agg(
        F.sum("r2").alias("rr"),
        F.max("k").alias("k"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("r2 * r2")).alias("a4p"),
    )
    return (
        col.agg(
            F.max("n").alias("n"),
            F.max("k").alias("k"),
            F.sum(F.expr("(rr - n * (k + 1)) * (rr - n * (k + 1))")).alias(
                "num"
            ),
            F.sum("a4p").alias("a4"),
        )
        .select(
            F.col("n").cast("long").alias("n_blocks"),
            F.col("k").cast("long").alias("k_treatments"),
            F.expr(
                "CASE WHEN a4 - n * k * (k + 1) * (k + 1) = 0"
                " THEN CAST(0 AS BIGINT)"
                " ELSE CAST((k - 1) * num * 1000"
                " div (a4 - n * k * (k + 1) * (k + 1)) AS BIGINT) END"
            ).alias("chi2f_milli"),
        )
        .withColumn(
            "signif_flag",
            F.col("chi2f_milli")
            > F.expr(
                "CASE k_treatments - 1 "
                + " ".join(
                    f"WHEN {df} THEN {crit}"
                    for df, crit in CHI2_CRIT_MILLI.items()
                )
                + " END"
            ),
        )
    )


FRIEDMAN_SQL = f"""
WITH {_CELLS_SQL.format(treat="event_type").strip()},
col AS (
  SELECT treat, SUM(r2) AS rr, MAX(k) AS k, COUNT(*) AS n,
         SUM(r2 * r2) AS a4p
  FROM ranked GROUP BY treat
),
agg AS (
  SELECT MAX(n) AS n, MAX(k) AS k,
         SUM((rr - n * (k + 1)) * (rr - n * (k + 1))) AS num,
         SUM(a4p) AS a4
  FROM col
)
SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k_treatments,
       CAST(CASE WHEN a4 - n * k * (k + 1) * (k + 1) = 0 THEN 0
            ELSE (k - 1) * num * 1000 // (a4 - n * k * (k + 1) * (k + 1))
            END AS BIGINT) AS chi2f_milli,
       CASE WHEN a4 - n * k * (k + 1) * (k + 1) = 0 THEN FALSE
            ELSE (k - 1) * num * 1000 // (a4 - n * k * (k + 1) * (k + 1))
                 > {_chi2_crit_case("k - 1")} END AS signif_flag
FROM agg
"""


def page_trend_hour_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_blocks, k_bins, l2_stat, z_milli, trend_flag): Page's L test
    for the ORDERED alternative "event volume rises across the day" —
    treatments are the four six-hour bins in time order, blocks are
    complete days, and L = Σⱼ j·Rⱼ. Doubled midranks: L2 = Σ j·R2ⱼ,
    E[L2] = n·k(k+1)²/2 (always integer — k(k+1)² is even), and with
    D = L2 − E[L2] = 2(L−E), z²·1e6 = 36e6·D² div (nk²(k+1)(k²−1))
    exactly (Var[L] = nk²(k+1)(k²−1)/144; ties use average ranks
    under the normal approximation, Page 1963). |z| vs
    {Z_CRIT_MILLI} milli.

    Scale shape: identical to friedman_event_type_ranks — the bin
    index replaces the event type."""
    ranked = _complete_block_ranks(
        _day_cell_counts(
            spark,
            sf_dir,
            f"(ts_us % {_DAY_US}) div 21600000000",
        )
    )
    col = ranked.groupBy("treat").agg(
        F.sum("r2").alias("rr"),
        F.max("k").alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        col.agg(
            F.max("n").alias("n"),
            F.max("k").alias("k"),
            F.sum(F.expr("(treat + 1) * rr")).alias("l2"),
        )
        .select(
            F.col("n").cast("long").alias("n_blocks"),
            F.col("k").cast("long").alias("k_bins"),
            F.col("l2").cast("long").alias("l2_stat"),
            F.expr(
                "CASE WHEN n * k * k * (k + 1) * (k * k - 1) = 0"
                " THEN CAST(0 AS BIGINT) ELSE"
                " CAST(sign(l2 - n * k * (k + 1) * (k + 1) div 2) AS BIGINT)"
                " * CAST(FLOOR(SQRT(CAST("
                "(l2 - n * k * (k + 1) * (k + 1) div 2)"
                " * (l2 - n * k * (k + 1) * (k + 1) div 2)"
                " * 36000000 div (n * k * k * (k + 1) * (k * k - 1))"
                " AS DOUBLE))) AS BIGINT) END"
            ).alias("z_milli"),
        )
        .withColumn("trend_flag", F.abs(F.col("z_milli")) > Z_CRIT_MILLI)
    )


PAGE_TREND_SQL = f"""
WITH {_CELLS_SQL.format(treat="(epoch_us(ts) % 86400000000) // 21600000000").strip()},
col AS (
  SELECT treat, SUM(r2) AS rr, MAX(k) AS k, COUNT(*) AS n
  FROM ranked GROUP BY treat
),
agg AS (
  SELECT MAX(n) AS n, MAX(k) AS k, SUM((treat + 1) * rr) AS l2
  FROM col
)
SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k_bins,
       CAST(l2 AS BIGINT) AS l2_stat,
       CAST(CASE WHEN n * k * k * (k + 1) * (k * k - 1) = 0 THEN 0 ELSE
         CAST(sign(l2 - n * k * (k + 1) * (k + 1) // 2) AS BIGINT)
         * CAST(FLOOR(SQRT(CAST(
             (l2 - n * k * (k + 1) * (k + 1) // 2)
             * (l2 - n * k * (k + 1) * (k + 1) // 2)
             * 36000000 // (n * k * k * (k + 1) * (k * k - 1))
             AS DOUBLE))) AS BIGINT) END AS BIGINT) AS z_milli,
       CASE WHEN n * k * k * (k + 1) * (k * k - 1) = 0 THEN FALSE ELSE
         abs(CAST(sign(l2 - n * k * (k + 1) * (k + 1) // 2) AS BIGINT)
         * CAST(FLOOR(SQRT(CAST(
             (l2 - n * k * (k + 1) * (k + 1) // 2)
             * (l2 - n * k * (k + 1) * (k + 1) // 2)
             * 36000000 // (n * k * k * (k + 1) * (k * k - 1))
             AS DOUBLE))) AS BIGINT)) > {Z_CRIT_MILLI} END AS trend_flag
FROM agg
"""


# ---------------------------------------------------------------------------
# Cochran–Armitage trend (orders: fulfillment by ordered priority)
# ---------------------------------------------------------------------------


def cochran_armitage_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, n_fulfilled, a_stat, z_milli, trend_flag): the
    Cochran–Armitage test for a monotone trend in the fulfilled
    proportion (o_orderstatus = 'F') across the five ORDERED
    priorities, scores l = 1..5 from the priority prefix digit.
    a = N·Σl·r − R·Σl·n (the trend covariance ×N²); z = a/√V with
    V = (R(N−R) div N)·(N·Σn·l² − (Σn·l)²) — the single early
    truncation (div N, relative error ≤ 1/N) applied IDENTICALLY by
    both engines; z_milli = sign(a)·(|a|·1000 div ⌊√V⌋). Int64
    headroom: |a| ≤ 5N² needs N ≲ 1e9 rows (documented; past that,
    the χ² family needs 128-bit promotion, not a stride — trend χ²
    is count-scaled, so pre-dividing counts would change the answer).

    Scale shape: one orders scan → 5-row (l) aggregate → 1-row
    reduce. Nothing else."""
    per = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.expr(
                "CAST(substring(o_orderpriority, 1, 1) AS LONG)"
            ).alias("l"),
            F.expr("CAST(o_orderstatus = 'F' AS LONG)").alias("y"),
        )
        .groupBy("l")
        .agg(F.count(F.lit(1)).alias("nl"), F.sum("y").alias("rl"))
    )
    return (
        per.agg(
            F.sum("nl").alias("n"),
            F.sum("rl").alias("r"),
            F.sum(F.expr("l * rl")).alias("slr"),
            F.sum(F.expr("l * nl")).alias("sln"),
            F.sum(F.expr("l * l * nl")).alias("sl2n"),
        )
        .select(
            F.col("n").cast("long"),
            F.col("r").cast("long").alias("n_fulfilled"),
            F.expr("n * slr - r * sln").cast("long").alias("a_stat"),
            F.expr(
                "CASE WHEN r = 0 OR r = n OR n * sl2n - sln * sln = 0"
                " THEN CAST(0 AS BIGINT) ELSE"
                " CAST(sign(n * slr - r * sln) AS BIGINT)"
                " * (abs(n * slr - r * sln) * 1000"
                " div CAST(FLOOR(SQRT(CAST("
                "(r * (n - r) div n) * (n * sl2n - sln * sln)"
                " AS DOUBLE))) AS BIGINT)) END"
            ).alias("z_milli"),
        )
        .withColumn("trend_flag", F.abs(F.col("z_milli")) > Z_CRIT_MILLI)
    )


COCHRAN_ARMITAGE_SQL = f"""
WITH per AS (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS l,
         COUNT(*) AS nl,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS rl
  FROM orders GROUP BY 1
),
agg AS (
  SELECT SUM(nl) AS n, SUM(rl) AS r, SUM(l * rl) AS slr,
         SUM(l * nl) AS sln, SUM(l * l * nl) AS sl2n
  FROM per
)
SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_fulfilled,
       CAST(n * slr - r * sln AS BIGINT) AS a_stat,
       CAST(CASE WHEN r = 0 OR r = n OR n * sl2n - sln * sln = 0 THEN 0
         ELSE CAST(sign(n * slr - r * sln) AS BIGINT)
           * (abs(n * slr - r * sln) * 1000
              // CAST(FLOOR(SQRT(CAST(
                   (r * (n - r) // n) * (n * sl2n - sln * sln)
                   AS DOUBLE))) AS BIGINT)) END AS BIGINT) AS z_milli,
       CASE WHEN r = 0 OR r = n OR n * sl2n - sln * sln = 0 THEN FALSE
         ELSE abs(CAST(sign(n * slr - r * sln) AS BIGINT)
           * (abs(n * slr - r * sln) * 1000
              // CAST(FLOOR(SQRT(CAST(
                   (r * (n - r) // n) * (n * sl2n - sln * sln)
                   AS DOUBLE))) AS BIGINT))) > {Z_CRIT_MILLI} END
         AS trend_flag
FROM agg
"""


# ---------------------------------------------------------------------------
# Mood's median test (orders by priority)
# ---------------------------------------------------------------------------


def mood_median_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority_l, n_g, above_g, median_cents, chi2_milli,
    signif_flag): Mood's median test — the grand median of
    o_totalprice cents (exact lower-median rank selection via the
    range-partitioned distinct-value cumsum), then a 2×5 χ² on
    strictly-above counts per ordered priority. Per-cell milli term
    ((d div 4)² div (n_g·C))·16000 div N with d = O·N − n_g·C — the
    d div 4 pre-shrink keeps d² in int64 to N ≈ 6e9 (identical
    truncation both engines; error < 0.2 milli at fixture scale). df
    = k−1 = 4, crit {CHI2_CRIT_MILLI}.

    Scale shape: orders scan → distinct-value count frame → ONE
    range-partitioned cumsum (functions/global_order) for the median
    → a 5-row group frame and a broadcast of two scalars."""
    xs = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("CAST(substring(o_orderpriority, 1, 1) AS LONG)").alias("l"),
        F.expr("CAST(round(o_totalprice * 100) AS LONG)").alias("x"),
    )
    vx = xs.groupBy("x").agg(F.count(F.lit(1)).alias("cx"))
    vxr, total = with_global_order_stat(
        vx, [F.col("x")], cumsum_col="cx", out="cum"
    )
    med = (
        vxr.filter(F.col("cum") >= (total + 1) // 2)
        .agg(F.min("x").alias("m"))
    )
    per = (
        xs.crossJoin(F.broadcast(med))
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum(F.expr("CAST(x > m AS LONG)")).alias("ag"),
            F.max("m").alias("m"),
        )
    )
    tot = per.agg(
        F.sum("ng").alias("n"), F.sum("ag").alias("a")
    )
    cell = (
        "CASE WHEN {c} = 0 THEN CAST(0 AS BIGINT) ELSE"
        " ((({o} * n - ng * {c}) div 4) * (({o} * n - ng * {c}) div 4)"
        " div (ng * {c})) * 16000 div n END"
    )
    chi2 = (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                cell.format(o="ag", c="a")
                + " + "
                + cell.format(o="(ng - ag)", c="(n - a)")
            ).alias("cm")
        )
        .agg(F.sum("cm").alias("chi2"))
    )
    return (
        per.crossJoin(F.broadcast(chi2))
        .select(
            F.col("l").cast("long").alias("priority_l"),
            F.col("ng").cast("long").alias("n_g"),
            F.col("ag").cast("long").alias("above_g"),
            F.col("m").cast("long").alias("median_cents"),
            F.col("chi2").cast("long").alias("chi2_milli"),
            (F.col("chi2") > CHI2_CRIT_MILLI[4]).alias("signif_flag"),
        )
        .orderBy("priority_l")
    )


def _mood_sql() -> str:
    cell = (
        "CASE WHEN {c} = 0 THEN 0 ELSE"
        " ((({o} * n - ng * {c}) // 4) * (({o} * n - ng * {c}) // 4)"
        " // (ng * {c})) * 16000 // n END"
    )
    return f"""
WITH xs AS (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS l,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders
),
tot0 AS (SELECT COUNT(*) AS total FROM xs),
vx AS (
  SELECT x, COUNT(*) AS cx,
         SUM(COUNT(*)) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum
  FROM xs GROUP BY x
),
med AS (
  SELECT MIN(x) AS m FROM vx CROSS JOIN tot0
  WHERE cum >= (total + 1) // 2
),
per AS (
  SELECT l, COUNT(*) AS ng,
         SUM(CASE WHEN x > m THEN 1 ELSE 0 END) AS ag, MAX(m) AS m
  FROM xs CROSS JOIN med GROUP BY l
),
tot AS (SELECT SUM(ng) AS n, SUM(ag) AS a FROM per),
chi2 AS (
  SELECT SUM({cell.format(o="ag", c="a")}
             + {cell.format(o="(ng - ag)", c="(n - a)")}) AS chi2
  FROM per CROSS JOIN tot
)
SELECT CAST(l AS BIGINT) AS priority_l, CAST(ng AS BIGINT) AS n_g,
       CAST(ag AS BIGINT) AS above_g, CAST(m AS BIGINT) AS median_cents,
       CAST(chi2 AS BIGINT) AS chi2_milli,
       chi2 > {CHI2_CRIT_MILLI[4]} AS signif_flag
FROM per CROSS JOIN chi2
ORDER BY priority_l
"""


MOOD_MEDIAN_SQL = _mood_sql()


# ---------------------------------------------------------------------------
# Durbin–Watson over daily-revenue OLS residuals
# ---------------------------------------------------------------------------


def durbin_watson_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_days, slope_mcpd, dw_milli, pos_autocorr_flag,
    neg_autocorr_flag): the Durbin–Watson ratio Σ(eₜ−eₜ₋₁)²/Σeₜ² on
    the residuals of the daily-revenue OLS line over observed days
    (successive OBSERVED days are adjacent — gap days carry no
    residual). Exact-integer residuals via a quantized slope:
    slope_mcpd = (nΣtx − ΣtΣx) div ((nΣt² − (Σt)²) div 1000)
    milli-cents/day (the div-1000 pre-shrink keeps the numerator in
    int64 — identical truncation both engines), then
    eₜ = xₜ − Σx div n − slope_mcpd·(n·t − Σt) div (1000n), then
    floor-divided to $100 units ({DW_RESID_QUANT} cents) so Σe² stays
    in int64 (the PH_SIGMA_QUANT posture — the quantum cancels in the
    ratio). dw_milli = Σd² div (Σe² div 1000). Heuristic bands
    {DW_LOW_MILLI}/{DW_HIGH_MILLI} (exact dL/dU tables are
    n-dependent and out of scope).

    Scale shape: the day frame is calendar-bounded; the lag ride is
    two SinglePartition windows over ≤|days| rows (exemption table),
    after five scalar aggregates."""
    from .pipeline72 import _daily

    d = _daily(spark, sf_dir)
    mom = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").alias("st"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("day * x")).alias("stx"),
        F.sum(F.expr("day * day")).alias("st2"),
    )
    resid = (
        d.crossJoin(F.broadcast(mom))
        .select(
            "day",
            F.expr(
                "x - sx div n"
                " - (CASE WHEN (n * st2 - st * st) div 1000 = 0 THEN 0"
                " ELSE (n * stx - st * sx)"
                " div ((n * st2 - st * st) div 1000) END)"
                " * (n * day - st) div (1000 * n)"
            ).alias("e"),
            F.expr(
                "CASE WHEN (n * st2 - st * st) div 1000 = 0 THEN"
                " CAST(0 AS BIGINT) ELSE (n * stx - st * sx)"
                " div ((n * st2 - st * st) div 1000) END"
            ).alias("slope"),
            "n",
        )
    )
    resid = resid.select(
        "n", "slope", F.expr(f"e div {DW_RESID_QUANT}").alias("e"), "day"
    )
    w = Window.orderBy("day")
    lagd = resid.select(
        "n",
        "slope",
        "e",
        (F.col("e") - F.lag("e").over(w)).alias("de"),
    )
    return lagd.agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("slope").cast("long").alias("slope_mcpd"),
        F.expr(
            "CASE WHEN sum(e * e) div 1000 = 0 THEN CAST(0 AS BIGINT)"
            " ELSE sum(de * de) div (sum(e * e) div 1000) END"
        ).alias("dw_milli"),
    ).select(
        "n_days",
        "slope_mcpd",
        "dw_milli",
        (F.col("dw_milli") < DW_LOW_MILLI).alias("pos_autocorr_flag"),
        (F.col("dw_milli") > DW_HIGH_MILLI).alias("neg_autocorr_flag"),
    )


def _dw_sql() -> str:
    from .pipeline72 import _DAILY_CTE

    return f"""
WITH {_DAILY_CTE.strip()},
mom AS (
  SELECT COUNT(*) AS n, SUM(day) AS st, SUM(x) AS sx,
         SUM(day * x) AS stx, SUM(day * day) AS st2
  FROM daily
),
resid AS (
  SELECT day,
         x - sx // n
           - (CASE WHEN (n * st2 - st * st) // 1000 = 0 THEN 0
              ELSE (n * stx - st * sx) // ((n * st2 - st * st) // 1000)
              END) * (n * day - st) // (1000 * n) AS e_raw,
         CASE WHEN (n * st2 - st * st) // 1000 = 0 THEN 0
              ELSE (n * stx - st * sx) // ((n * st2 - st * st) // 1000)
              END AS slope,
         n
  FROM daily CROSS JOIN mom
),
quant AS (
  SELECT n, slope, day, e_raw // 10000 AS e FROM resid
),
lagd AS (
  SELECT n, slope, e,
         e - LAG(e) OVER (ORDER BY day) AS de
  FROM quant
),
agg AS (
  SELECT MAX(n) AS n, MAX(slope) AS slope,
         SUM(de * de) AS sd2, SUM(e * e) AS se2
  FROM lagd
)
SELECT CAST(n AS BIGINT) AS n_days, CAST(slope AS BIGINT) AS slope_mcpd,
       CAST(CASE WHEN se2 // 1000 = 0 THEN 0
            ELSE sd2 // (se2 // 1000) END AS BIGINT) AS dw_milli,
       CASE WHEN se2 // 1000 = 0 THEN FALSE
            ELSE sd2 // (se2 // 1000) < {DW_LOW_MILLI} END
         AS pos_autocorr_flag,
       CASE WHEN se2 // 1000 = 0 THEN FALSE
            ELSE sd2 // (se2 // 1000) > {DW_HIGH_MILLI} END
         AS neg_autocorr_flag
FROM agg
"""


DURBIN_WATSON_SQL = _dw_sql()


# ---------------------------------------------------------------------------
# Two-sample Cramér–von Mises drift (daily revenue, calendar halves)
# ---------------------------------------------------------------------------


def cramer_von_mises_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_first, n_second, u4_stat, t_ppm, drift_flag): the two-sample
    Cramér–von Mises criterion between the first- and second-half
    daily revenue distributions (calendar-midpoint split, the
    ks_two_sample_drift convention) in Anderson's rank form:
    U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)², T = U/(nm(n+m)) − (4nm−1)/(6(n+m)).
    Doubled pooled midranks r2 and doubled within-sample positions i2
    make U4 = 4U exact-integer (a pooled tie group's Σ(r2−i2)² is
    invariant to within-group position order, so ties stay
    deterministic); T_ppm = U4·1e6 div (4nm(n+m)) − (4nm−1)·1e6 div
    (6(n+m)). Drift at T > {CVM_CRIT_PPM} ppm (limiting ω² 5%
    point). Int64: U4·1e6 needs |days| ≲ 1e4 — calendar-bounded
    forever.

    Scale shape: the whole computation runs on the ≤|days| daily
    frame: three rank windows over it (exemption table) and a 1-row
    reduce."""
    from .pipeline72 import _daily

    d = _daily(spark, sf_dir)
    bounds = d.agg(
        F.expr("(min(day) + max(day) + 1) div 2").alias("mid")
    )
    s = d.crossJoin(F.broadcast(bounds)).select(
        "day", "x", F.expr("CAST(day >= mid AS LONG)").alias("s")
    )
    wp = Window.orderBy("x")
    we = Window.partitionBy("x")
    ws = Window.partitionBy("s").orderBy("x", "day")
    ranked = s.select(
        "s",
        (2 * F.rank().over(wp) + F.count(F.lit(1)).over(we) - 1).alias("r2"),
        (2 * F.row_number().over(ws)).alias("i2"),
    )
    per = ranked.groupBy("s").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum(F.expr("(r2 - i2) * (r2 - i2)")).alias("q"),
    )
    return (
        per.agg(
            F.sum(F.when(F.col("s") == 0, F.col("ns"))).alias("n0"),
            F.sum(F.when(F.col("s") == 1, F.col("ns"))).alias("n1"),
            F.sum(F.when(F.col("s") == 0, F.col("q"))).alias("q0"),
            F.sum(F.when(F.col("s") == 1, F.col("q"))).alias("q1"),
        )
        .select(
            F.col("n0").cast("long").alias("n_first"),
            F.col("n1").cast("long").alias("n_second"),
            F.expr("n0 * q0 + n1 * q1").cast("long").alias("u4_stat"),
            F.expr(
                "(n0 * q0 + n1 * q1) * 1000000"
                " div (4 * n0 * n1 * (n0 + n1))"
                " - (4 * n0 * n1 - 1) * 1000000 div (6 * (n0 + n1))"
            ).cast("long").alias("t_ppm"),
        )
        .withColumn("drift_flag", F.col("t_ppm") > CVM_CRIT_PPM)
    )


def _cvm_sql() -> str:
    from .pipeline72 import _DAILY_CTE

    return f"""
WITH {_DAILY_CTE.strip()},
bounds AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM daily),
s AS (
  SELECT day, x, CASE WHEN day >= mid THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN bounds
),
ranked AS (
  SELECT s,
         2 * RANK() OVER (ORDER BY x)
           + COUNT(*) OVER (PARTITION BY x) - 1 AS r2,
         2 * ROW_NUMBER() OVER (PARTITION BY s ORDER BY x, day) AS i2
  FROM s
),
per AS (
  SELECT s, COUNT(*) AS ns, SUM((r2 - i2) * (r2 - i2)) AS q
  FROM ranked GROUP BY s
),
agg AS (
  SELECT SUM(CASE WHEN s = 0 THEN ns END) AS n0,
         SUM(CASE WHEN s = 1 THEN ns END) AS n1,
         SUM(CASE WHEN s = 0 THEN q END) AS q0,
         SUM(CASE WHEN s = 1 THEN q END) AS q1
  FROM per
)
SELECT CAST(n0 AS BIGINT) AS n_first, CAST(n1 AS BIGINT) AS n_second,
       CAST(n0 * q0 + n1 * q1 AS BIGINT) AS u4_stat,
       CAST((n0 * q0 + n1 * q1) * 1000000 // (4 * n0 * n1 * (n0 + n1))
            - (4 * n0 * n1 - 1) * 1000000 // (6 * (n0 + n1))
            AS BIGINT) AS t_ppm,
       (n0 * q0 + n1 * q1) * 1000000 // (4 * n0 * n1 * (n0 + n1))
         - (4 * n0 * n1 - 1) * 1000000 // (6 * (n0 + n1))
         > {CVM_CRIT_PPM} AS drift_flag
FROM agg
"""


CRAMER_VON_MISES_SQL = _cvm_sql()


# ---------------------------------------------------------------------------
# Benjamini–Hochberg over the 25-nation Mann–Kendall family
# ---------------------------------------------------------------------------


def bh_fdr_nation_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nationkey, n_name, n_days, s_stat, z_milli, bh_rank,
    crit_milli, reject_flag): per-nation Mann–Kendall trend z over
    each nation's daily revenue, then Benjamini–Hochberg step-up
    across the FIXED m = {BH_FAMILY_M} nation family at α = 0.05.
    The family is fixed a priori (every TPC-H nation is a hypothesis;
    a nation with < 3 observed days contributes z = 0 and is never
    rejected but still counts in m) — the statistically honest
    framing, and it makes the per-rank critical z a LITERAL:
    critᵢ = Φ⁻¹(1 − α·i/(2m)) milli via Acklam's approximation at
    import. Step-up: reject ranks 1..k, k = max{{i: |z|ᵢ ≥ critᵢ}}
    (|z| sorted DESC ↔ p sorted ASC).

    Scale shape: orders⋈customer shuffle join → (nation, day)
    aggregate (≤ 25·|days| rows); the MK pair stage is per-nation
    calendar-bounded (|days|²·25 sign evaluations); the BH ordering
    runs on the 25-row frame (exempt window)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr(
            "CAST(datediff(o_orderdate, to_date('1992-01-01')) AS LONG)"
        ).alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS LONG)").alias("rc"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nk"),
    )
    # r16: pinned — the MK pair join (both sides), the tie table and the
    # per-nation count are four subtrees that each re-ran the
    # orders⋈customer shuffle join + groupBy; the pinned frame is
    # ≤ 25·|days| rows, model-sized at any corpus scale (guide §1.2)
    nd = (
        o.join(c, "o_custkey")
        .groupBy("nk", "day")
        .agg(F.sum("rc").alias("x"))
        .localCheckpoint(eager=True)
    )
    a, b = nd.alias("a"), nd.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.nk") == F.col("b.nk"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.nk").alias("nk"))
        .agg(
            F.sum(
                F.signum(F.col("b.x") - F.col("a.x")).cast("long")
            ).alias("s")
        )
    )
    ties = (
        nd.groupBy("nk", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("nk")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).alias("tsum")
        )
    )
    nn = nd.groupBy("nk").agg(F.count(F.lit(1)).alias("n"))
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    z = (
        nat.join(s, "nk", "left")
        .join(ties, "nk", "left")
        .join(nn, "nk", "left")
        .select(
            "nk",
            "n_name",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("s", F.lit(0)).alias("s"),
            F.coalesce("tsum", F.lit(0)).alias("tsum"),
        )
        .select(
            "nk",
            "n_name",
            "n",
            "s",
            F.expr(
                "CASE WHEN n < 3 OR s = 0"
                " OR n * (n - 1) * (2 * n + 5) - tsum = 0"
                " THEN CAST(0 AS BIGINT) ELSE"
                " CAST(sign(s) AS BIGINT) * CAST(FLOOR(SQRT(CAST("
                "(abs(s) - 1) * (abs(s) - 1) * 18000000 div"
                " (n * (n - 1) * (2 * n + 5) - tsum) AS DOUBLE)))"
                " AS BIGINT) END"
            ).alias("z_milli"),
        )
    )
    w = Window.orderBy(F.abs(F.col("z_milli")).desc(), F.col("nk"))
    crit_case = (
        "CASE bh_rank "
        + " ".join(
            f"WHEN {i + 1} THEN {cr}" for i, cr in enumerate(BH_CRIT_MILLI)
        )
        + " END"
    )
    ranked = z.select(
        "*", F.row_number().over(w).alias("bh_rank")
    ).withColumn("crit_milli", F.expr(crit_case).cast("long"))
    kmax = ranked.agg(
        F.max(
            F.when(
                F.abs(F.col("z_milli")) >= F.col("crit_milli"),
                F.col("bh_rank"),
            )
        ).alias("kmax")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            F.col("nk").cast("long").alias("n_nationkey"),
            "n_name",
            F.col("n").cast("long").alias("n_days"),
            F.col("s").cast("long").alias("s_stat"),
            F.col("z_milli").cast("long"),
            F.col("bh_rank").cast("long"),
            "crit_milli",
            F.expr(
                "CASE WHEN kmax IS NULL THEN FALSE"
                " ELSE bh_rank <= kmax END"
            ).alias("reject_flag"),
        )
        .orderBy("bh_rank")
    )


BH_FDR_NATION_SQL = f"""
WITH o AS (
  SELECT o_custkey,
         CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rc
  FROM orders
),
nd AS (
  SELECT c.c_nationkey AS nk, o.day, SUM(o.rc) AS x
  FROM o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT a.nk,
         SUM(CAST(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END AS BIGINT)) AS s
  FROM nd a JOIN nd b ON b.nk = a.nk AND b.day > a.day
  GROUP BY 1
),
ties AS (
  SELECT nk, SUM(t * (t - 1) * (2 * t + 5)) AS tsum
  FROM (SELECT nk, x, COUNT(*) AS t FROM nd GROUP BY 1, 2) GROUP BY 1
),
nn AS (SELECT nk, COUNT(*) AS n FROM nd GROUP BY 1),
z AS (
  SELECT nat.n_nationkey AS nk, nat.n_name,
         COALESCE(nn.n, 0) AS n, COALESCE(s.s, 0) AS s,
         CASE WHEN COALESCE(nn.n, 0) < 3 OR COALESCE(s.s, 0) = 0
              OR COALESCE(nn.n, 0) * (COALESCE(nn.n, 0) - 1)
                 * (2 * COALESCE(nn.n, 0) + 5) - COALESCE(ties.tsum, 0) = 0
           THEN 0 ELSE
           CAST(sign(s.s) AS BIGINT) * CAST(FLOOR(SQRT(CAST(
             (abs(s.s) - 1) * (abs(s.s) - 1) * 18000000 //
             (nn.n * (nn.n - 1) * (2 * nn.n + 5) - COALESCE(ties.tsum, 0))
             AS DOUBLE))) AS BIGINT) END AS z_milli
  FROM nation nat
  LEFT JOIN s ON s.nk = nat.n_nationkey
  LEFT JOIN ties ON ties.nk = nat.n_nationkey
  LEFT JOIN nn ON nn.nk = nat.n_nationkey
),
ranked AS (
  SELECT z.*,
         ROW_NUMBER() OVER (ORDER BY abs(z_milli) DESC, nk) AS bh_rank
  FROM z
),
ranked2 AS (
  SELECT ranked.*, {_bh_crit_case("bh_rank")} AS crit_milli FROM ranked
),
kmax AS (
  SELECT MAX(CASE WHEN abs(z_milli) >= crit_milli THEN bh_rank END) AS kmax
  FROM ranked2
)
SELECT CAST(nk AS BIGINT) AS n_nationkey, n_name,
       CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s_stat,
       CAST(z_milli AS BIGINT) AS z_milli,
       CAST(bh_rank AS BIGINT) AS bh_rank,
       CAST(crit_milli AS BIGINT) AS crit_milli,
       CASE WHEN kmax IS NULL THEN FALSE
            ELSE bh_rank <= kmax END AS reject_flag
FROM ranked2 CROSS JOIN kmax
ORDER BY bh_rank
"""


# ---------------------------------------------------------------------------
# Cochran's Q over three dedup detectors
# ---------------------------------------------------------------------------


def cochran_q_detectors(
    spark: SparkSession, sf_dir: str, verification: bool = False
) -> DataFrame:
    """(n_docs, c_exact, c_prefix, c_near, q_milli, signif_flag):
    Cochran's Q — the k-treatment generalization of McNemar — on
    THREE correlated binary dedup detectors per document: exact (md5
    text group > 1), prefix (first-{PREFIX_DUP_CHARS}-chars md5 group
    > 1, the cheap screen), and near (exact 3-shingle Jaccard pair
    membership, mcnemar_dedup_agreement's detector — guarded-
    quadratic with the same _guard_quadratic pre-flight).
    Q = (k−1)·(k·ΣCⱼ² − (ΣCⱼ)²) div (k·ΣRᵢ − ΣRᵢ²) with column
    totals Cⱼ and per-doc row sums Rᵢ ∈ 0..3 — exact integer;
    q_milli vs χ²(2) = {COCHRAN_Q_CRIT_MILLI}. Int64: ΣC² needs
    n ≲ 1e9 docs (128-bit promotion past that — Q is count-scaled,
    no stride).

    Scale shape: two md5 groupBys, the guarded shared-shingle pair
    stage, three semijoin flags, a 1-row reduce."""
    from .dedup import _guard_quadratic, _shingles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    _guard_quadratic(
        d.select("doc_id"),
        "cochran_q_detectors",
        "dedup_minhash_verified",
        verification,
    )

    def dup_docs(keycol, flag: str) -> DataFrame:
        return (
            d.groupBy(keycol.alias("h"))
            .agg(
                F.collect_list("doc_id").alias("ids"),
                F.count(F.lit(1)).alias("c"),
            )
            .filter(F.col("c") > 1)
            .select(F.explode("ids").alias("doc_id"))
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    exact_docs = dup_docs(F.md5("text"), "ex")
    prefix_docs = dup_docs(
        F.md5(F.substring("text", 1, PREFIX_DUP_CHARS)), "px"
    )
    from .pipeline72 import NEAR_DUP_PPM

    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    near_pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(
            F.broadcast(
                sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
            ),
            "d1",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
            ),
            "d2",
        )
        .filter(
            F.col("inter") * 1_000_000
            >= NEAR_DUP_PPM * (F.col("n1") + F.col("n2") - F.col("inter"))
        )
    )
    near_docs = (
        near_pairs.select(F.col("d1").alias("doc_id"))
        .unionAll(near_pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
        .withColumn("nr", F.lit(1))
    )
    flags = (
        d.select("doc_id")
        .join(exact_docs, "doc_id", "left")
        .join(prefix_docs, "doc_id", "left")
        .join(near_docs, "doc_id", "left")
        .select(
            F.coalesce("ex", F.lit(0)).alias("ex"),
            F.coalesce("px", F.lit(0)).alias("px"),
            F.coalesce("nr", F.lit(0)).alias("nr"),
        )
    )
    return (
        flags.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ex").alias("ce"),
            F.sum("px").alias("cp"),
            F.sum("nr").alias("cn"),
            F.sum(F.expr("ex + px + nr")).alias("sr"),
            F.sum(
                F.expr("(ex + px + nr) * (ex + px + nr)")
            ).alias("sr2"),
        )
        .select(
            F.col("n_docs").cast("long"),
            F.col("ce").cast("long").alias("c_exact"),
            F.col("cp").cast("long").alias("c_prefix"),
            F.col("cn").cast("long").alias("c_near"),
            F.expr(
                "CASE WHEN 3 * sr - sr2 = 0 THEN CAST(0 AS BIGINT) ELSE"
                " CAST(2 * (3 * (ce * ce + cp * cp + cn * cn)"
                " - (ce + cp + cn) * (ce + cp + cn)) * 1000"
                " div (3 * sr - sr2) AS BIGINT) END"
            ).alias("q_milli"),
        )
        .withColumn(
            "signif_flag", F.col("q_milli") > COCHRAN_Q_CRIT_MILLI
        )
    )


def _cochran_q_sql() -> str:
    from .dedup import SQL_SHINGLES_CTE
    from .pipeline72 import NEAR_DUP_PPM

    return f"""
WITH {SQL_SHINGLES_CTE.strip()},
exact_docs AS (
  SELECT DISTINCT doc_id FROM documents
  WHERE md5(text) IN (
    SELECT md5(text) FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
  )
),
prefix_docs AS (
  SELECT DISTINCT doc_id FROM documents
  WHERE md5(substring(text, 1, {PREFIX_DUP_CHARS})) IN (
    SELECT md5(substring(text, 1, {PREFIX_DUP_CHARS})) FROM documents
    GROUP BY 1 HAVING COUNT(*) > 1
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near_pairs AS (
  SELECT i.d1, i.d2 FROM inter i
  JOIN sizes s1 ON s1.doc_id = i.d1
  JOIN sizes s2 ON s2.doc_id = i.d2
  WHERE i.inter * 1000000 >= {NEAR_DUP_PPM} * (s1.n + s2.n - i.inter)
),
near_docs AS (
  SELECT DISTINCT doc_id FROM (
    SELECT d1 AS doc_id FROM near_pairs
    UNION ALL SELECT d2 FROM near_pairs
  )
),
flags AS (
  SELECT CASE WHEN e.doc_id IS NULL THEN 0 ELSE 1 END AS ex,
         CASE WHEN p.doc_id IS NULL THEN 0 ELSE 1 END AS px,
         CASE WHEN nd.doc_id IS NULL THEN 0 ELSE 1 END AS nr
  FROM documents d
  LEFT JOIN exact_docs e ON e.doc_id = d.doc_id
  LEFT JOIN prefix_docs p ON p.doc_id = d.doc_id
  LEFT JOIN near_docs nd ON nd.doc_id = d.doc_id
),
agg AS (
  SELECT COUNT(*) AS n_docs, SUM(ex) AS ce, SUM(px) AS cp, SUM(nr) AS cn,
         SUM(ex + px + nr) AS sr,
         SUM((ex + px + nr) * (ex + px + nr)) AS sr2
  FROM flags
)
SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(ce AS BIGINT) AS c_exact,
       CAST(cp AS BIGINT) AS c_prefix, CAST(cn AS BIGINT) AS c_near,
       CAST(CASE WHEN 3 * sr - sr2 = 0 THEN 0 ELSE
         2 * (3 * (ce * ce + cp * cp + cn * cn)
              - (ce + cp + cn) * (ce + cp + cn)) * 1000
         // (3 * sr - sr2) END AS BIGINT) AS q_milli,
       CASE WHEN 3 * sr - sr2 = 0 THEN FALSE ELSE
         2 * (3 * (ce * ce + cp * cp + cn * cn)
              - (ce + cp + cn) * (ce + cp + cn)) * 1000
         // (3 * sr - sr2) > {COCHRAN_Q_CRIT_MILLI} END AS signif_flag
FROM agg
"""


COCHRAN_Q_SQL = _cochran_q_sql()
