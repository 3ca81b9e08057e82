"""Batch 72: robust statistics & sequential testing.

- ``trimmed_mean_report`` — exact α-trimmed and winsorized means of the
  per-user value distribution (Tukey's robust location estimates): the
  rank arithmetic rides functions/global_order's range-partitioned
  sort, and one conditional aggregate pass serves all three α levels.
  The robust-mean pair is the standard defense when a metric's tail is
  fat (a winsorized lift that disagrees with the plain mean IS the
  outlier diagnosis).
- ``tukey_fence_outliers`` — the 1.5·IQR fence count over the same
  per-user totals, exact quartiles by rank selection (half-cent
  arithmetic keeps the 1.5 multiplier integer).
- ``mann_kendall_trend`` — the Mann–Kendall S statistic over the daily
  revenue series with the tie-corrected variance (Kendall 1975), z in
  exact milli via the squared form (no float division). THE
  nonparametric monotone-trend test for short business series.
- ``theil_sen_slope`` — the median of pairwise slopes (Sen 1968) over
  the same series, slope quantized to ppm/day; the median is an exact
  rank selection through the global-order helper. Robust-regression
  counterpart to Mann–Kendall's detection.
- ``mcnemar_dedup_agreement`` — McNemar's paired test (continuity
  corrected) on the per-document disagreement between the exact-dup
  detector (md5 text groups) and the verification-grade near-dup
  detector (exact 3-shingle Jaccard ≥ 0.6): b/c discordant counts and
  χ²; near-dup flagging strictly more than exact IS the expected
  significant result, and the margin quantifies it.
- ``page_hinkley_drift`` — the Page–Hinkley cumulative-deviation
  change detector over daily revenue (Page 1954; Hinkley 1971):
  PH_t = m_t − min m, alarm when PH exceeds 3σ (σ via the exact
  n²σ² = n·Σx²−(Σx)² identity — no mean division).
- ``ab_sequential_looks`` — a K=4 group-sequential two-proportion A/B
  readout with O'Brien–Fleming-shaped milli boundaries: users hash
  into arms AND into four deterministic accrual buckets; each look k
  tests the cumulative first k buckets. The z² is exact-integer via
  staged division; int64 headroom documented.

All integer end-to-end under the cross-engine hash (both engines
truncate integer division toward zero — verified, so signed deltas
divide identically). Reference scope note: extends the reference's
analytics surface per SURVEY §2.9-2.10; the reference engine itself
ships data movement only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat
from ..functions.text import hash64, sql_hash64

#: trim fractions (per tail) in ppm.
TRIM_ALPHAS_PPM = (50_000, 100_000, 200_000)
#: |z| 5% two-sided boundary, milli.
MK_Z_CRIT_MILLI = 1_960
#: χ²(1) upper 5%, milli.
MCNEMAR_CHI2_CRIT_MILLI = 3_841
#: exact-Jaccard near-dup threshold, ppm (dedup.py's 0.6).
NEAR_DUP_PPM = 600_000
#: O'Brien–Fleming-shaped two-sided 5% z boundaries for K=4 equal
#: looks, milli (z_k = z_K·√(K/k), z_K ≈ 2.024).
OBF_BOUNDS_MILLI = (4_049, 2_863, 2_337, 2_024)

# ab_sequential_looks int64 headroom: the staged z² division needs
# num·N ≲ 9e18, i.e. ≤ ~3e6 users per look at worst-case imbalance.
# Past that, every count is pre-divided by stride s = 1 + N div this
# constant before the z arithmetic (z is degree-0 homogeneous in the
# counts, so the strided z equals the exact z up to integer rounding —
# ≤1 milli at the scales where s > 1). Raw counts are still reported.
AB_SEQ_STRIDE_N = 3_000_000
#: Page–Hinkley tolerance δ in cents (0 = pure deviation sum).
PH_DELTA_Q = 0


def _user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..events_source import load_events

    return (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr("CAST(floor(value * 100) AS LONG)").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").alias("m"))
    )


_USERS_CTE = """
users AS (
  SELECT user_id, SUM(CAST(floor(value * 100) AS BIGINT)) AS m
  FROM events GROUP BY user_id
)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed-day revenue series (day index, cents sum) — OBSERVED
    days only: zero-filling would plant artificial ties in the rank
    statistics (Mann–Kendall's tie correction exists precisely for
    real ties, not synthetic ones)."""
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.expr(
                "CAST(datediff(o_orderdate, to_date('1992-01-01')) AS LONG)"
            ).alias("day"),
            F.expr("CAST(round(o_totalprice * 100) AS LONG)").alias("rc"),
        )
        .groupBy("day")
        .agg(F.sum("rc").alias("x"))
    )


_DAILY_CTE = """
daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# Trimmed / winsorized means
# ---------------------------------------------------------------------------


def trimmed_mean_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(alpha_ppm, n, k_drop, lo_cents, hi_cents, trimmed_mean_cents,
    winsor_mean_cents): for each α, drop (trim) or clamp (winsorize)
    the k = n·α div 1e6 smallest and largest per-user totals. Exact:
    the boundary elements are rank selections (ties broken by
    user_id), lo = value at rank k+1 = MIN over ranks > k on the
    sorted frame, hi = MAX over ranks ≤ n−k; winsorized sum =
    mid-sum + k·(lo+hi). Means floor-divide (both engines truncate
    alike).

    Scale shape: one scan, one (user) groupBy, ONE range-partitioned
    global rank (functions/global_order), then a single conditional
    aggregate pass computes all three α levels' sums and boundary
    elements; the report assembly is a 3-row literal frame."""
    ranked, n = with_global_order_stat(
        _user_values(spark, sf_dir),
        [F.col("m"), F.col("user_id")],
        out="rn",
    )
    aggs = []
    for i, a in enumerate(TRIM_ALPHAS_PPM):
        k = n * a // 1_000_000
        aggs += [
            F.sum(
                F.when(
                    (F.col("rn") > k) & (F.col("rn") <= n - k), F.col("m")
                )
            ).alias(f"s{i}"),
            F.min(F.when(F.col("rn") > k, F.col("m"))).alias(f"lo{i}"),
            F.max(F.when(F.col("rn") <= n - k, F.col("m"))).alias(f"hi{i}"),
        ]
    stats = ranked.agg(*aggs)
    rows = []
    for i, a in enumerate(TRIM_ALPHAS_PPM):
        k = n * a // 1_000_000
        rows.append((a, n, k, f"s{i}", f"lo{i}", f"hi{i}"))
    parts = [
        stats.select(
            F.lit(a).cast("long").alias("alpha_ppm"),
            F.lit(n).cast("long").alias("n"),
            F.lit(k).cast("long").alias("k_drop"),
            F.col(lo).cast("long").alias("lo_cents"),
            F.col(hi).cast("long").alias("hi_cents"),
            F.expr(f"{s} div ({n} - 2 * {k})").cast("long").alias(
                "trimmed_mean_cents"
            ),
            F.expr(f"({s} + {k} * ({lo} + {hi})) div {n}")
            .cast("long")
            .alias("winsor_mean_cents"),
        )
        for (a, n, k, s, lo, hi) in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("alpha_ppm")


def _trimmed_sql() -> str:
    arms = " UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS alpha_ppm" for a in TRIM_ALPHAS_PPM
    )
    return f"""
WITH {_USERS_CTE.strip()},
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, user_id) AS rn FROM users
),
nn AS (SELECT COUNT(*) AS n FROM users),
alphas AS ({arms}),
ks AS (
  SELECT a.alpha_ppm, nn.n, nn.n * a.alpha_ppm // 1000000 AS k
  FROM alphas a CROSS JOIN nn
)
SELECT ks.alpha_ppm, ks.n, ks.k AS k_drop,
       CAST((SELECT MIN(m) FROM ranked WHERE rn > ks.k) AS BIGINT)
         AS lo_cents,
       CAST((SELECT MAX(m) FROM ranked WHERE rn <= ks.n - ks.k) AS BIGINT)
         AS hi_cents,
       CAST((SELECT SUM(m) FROM ranked
             WHERE rn > ks.k AND rn <= ks.n - ks.k) // (ks.n - 2 * ks.k)
            AS BIGINT) AS trimmed_mean_cents,
       CAST(((SELECT SUM(m) FROM ranked
              WHERE rn > ks.k AND rn <= ks.n - ks.k)
             + ks.k * ((SELECT MIN(m) FROM ranked WHERE rn > ks.k)
                       + (SELECT MAX(m) FROM ranked
                          WHERE rn <= ks.n - ks.k)))
            // ks.n AS BIGINT) AS winsor_mean_cents
FROM ks ORDER BY ks.alpha_ppm
"""


TRIMMED_MEAN_SQL = _trimmed_sql()


# ---------------------------------------------------------------------------
# Tukey fences
# ---------------------------------------------------------------------------


def tukey_fence_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, q1_cents, q3_cents, iqr_cents, n_low, n_high, outlier_ppm):
    Tukey's 1.5·IQR fence over per-user totals. Quartiles are the
    exact lower-quantile elements at ranks (n−1)·q div 4 + 1 (the
    repo's established convention — both engines pick the identical
    element); fences compare in HALF-CENTS (2m vs 2q1−3·iqr /
    2q3+3·iqr) so the 1.5 multiplier stays integer.

    Scale shape: one scan, one (user) groupBy, one range-partitioned
    global rank, two 1-row rank probes, one conditional count pass."""
    ranked, n = with_global_order_stat(
        _user_values(spark, sf_dir),
        [F.col("m"), F.col("user_id")],
        out="rn",
    )
    r1 = (n - 1) * 1 // 4 + 1
    r3 = (n - 1) * 3 // 4 + 1
    q = ranked.agg(
        F.min(F.when(F.col("rn") == r1, F.col("m"))).alias("q1"),
        F.min(F.when(F.col("rn") == r3, F.col("m"))).alias("q3"),
    )
    return (
        ranked.crossJoin(F.broadcast(q))
        .agg(
            F.lit(n).cast("long").alias("n"),
            F.min("q1").cast("long").alias("q1_cents"),
            F.min("q3").cast("long").alias("q3_cents"),
            (F.min("q3") - F.min("q1")).cast("long").alias("iqr_cents"),
            F.sum(
                (
                    2 * F.col("m") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))
                ).cast("long")
            ).alias("n_low"),
            F.sum(
                (
                    2 * F.col("m") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
                ).cast("long")
            ).alias("n_high"),
        )
        .withColumn(
            "outlier_ppm",
            F.expr(f"(n_low + n_high) * 1000000 div {n}").cast("long"),
        )
    )


TUKEY_FENCE_SQL = f"""
WITH {_USERS_CTE.strip()},
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, user_id) AS rn FROM users
),
nn AS (SELECT COUNT(*) AS n FROM users),
q AS (
  SELECT
    (SELECT m FROM ranked, nn WHERE rn = (n - 1) * 1 // 4 + 1) AS q1,
    (SELECT m FROM ranked, nn WHERE rn = (n - 1) * 3 // 4 + 1) AS q3
)
SELECT nn.n,
       CAST(q.q1 AS BIGINT) AS q1_cents, CAST(q.q3 AS BIGINT) AS q3_cents,
       CAST(q.q3 - q.q1 AS BIGINT) AS iqr_cents,
       (SELECT COUNT(*) FROM ranked
        WHERE 2 * m < 2 * q.q1 - 3 * (q.q3 - q.q1)) AS n_low,
       (SELECT COUNT(*) FROM ranked
        WHERE 2 * m > 2 * q.q3 + 3 * (q.q3 - q.q1)) AS n_high,
       ((SELECT COUNT(*) FROM ranked
         WHERE 2 * m < 2 * q.q1 - 3 * (q.q3 - q.q1))
        + (SELECT COUNT(*) FROM ranked
           WHERE 2 * m > 2 * q.q3 + 3 * (q.q3 - q.q1)))
       * 1000000 // nn.n AS outlier_ppm
FROM nn CROSS JOIN q
"""


# ---------------------------------------------------------------------------
# Mann–Kendall trend
# ---------------------------------------------------------------------------


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_days, s_stat, var18_q, z_milli, trend_flag): Mann–Kendall S
    over the observed-day revenue series with the tie-corrected
    variance, var18 = n(n−1)(2n+5) − Σt(t−1)(2t+5) (18·Var — kept
    integer). z is exact milli via the squared form
    z²·1e6 = (|S|−1)²·18e6 div var18, z_milli = sign·isqrt — no float
    division anywhere. trend_flag at |z| > {MK_Z_CRIT_MILLI} milli.

    Scale shape: the day frame is a calendar-bounded aggregate
    (≤|days| rows whatever the data volume); the pair stage is a
    broadcast nested-loop over that aggregate — |days|²/2 sign
    evaluations, data-size-independent — then 1-row reduces."""
    d = _daily(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    s = (
        a.join(F.broadcast(b), F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(F.signum(F.col("b.x") - F.col("a.x")).cast("long")).alias(
                "s"
            )
        )
    )
    ties = d.groupBy("x").agg(F.count(F.lit(1)).alias("t")).agg(
        F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).alias("tsum"),
        F.sum(F.lit(1)).alias("_nvals"),
    )
    n_frame = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        s.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(n_frame))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("s").cast("long").alias("s_stat"),
            F.expr("n * (n - 1) * (2 * n + 5) - tsum")
            .cast("long")
            .alias("var18_q"),
            F.expr(
                "CASE WHEN s = 0 THEN CAST(0 AS BIGINT) ELSE "
                "CAST(sign(s) AS BIGINT) * CAST(FLOOR(SQRT(CAST("
                "(abs(s) - 1) * (abs(s) - 1) * 18000000 div "
                "(n * (n - 1) * (2 * n + 5) - tsum) AS DOUBLE))) AS BIGINT)"
                " END"
            ).alias("z_milli"),
        )
        .withColumn(
            "trend_flag", F.abs(F.col("z_milli")) > MK_Z_CRIT_MILLI
        )
    )


MANN_KENDALL_SQL = f"""
WITH {_DAILY_CTE.strip()},
s AS (
  SELECT SUM(CAST(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END AS BIGINT)) AS s
  FROM daily a JOIN daily b ON b.day > a.day
),
ties AS (
  SELECT SUM(t * (t - 1) * (2 * t + 5)) AS tsum
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)
),
nn AS (SELECT COUNT(*) AS n FROM daily)
SELECT nn.n AS n_days, CAST(s.s AS BIGINT) AS s_stat,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tsum AS BIGINT)
         AS var18_q,
       CASE WHEN s.s = 0 THEN CAST(0 AS BIGINT) ELSE
         CAST(sign(s.s) AS BIGINT) * CAST(FLOOR(SQRT(CAST(
           (abs(s.s) - 1) * (abs(s.s) - 1) * 18000000 //
           (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tsum) AS DOUBLE)))
           AS BIGINT) END AS z_milli,
       CASE WHEN s.s = 0 THEN FALSE ELSE
         abs(CAST(sign(s.s) AS BIGINT) * CAST(FLOOR(SQRT(CAST(
           (abs(s.s) - 1) * (abs(s.s) - 1) * 18000000 //
           (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tsum) AS DOUBLE)))
           AS BIGINT)) > {MK_Z_CRIT_MILLI} END AS trend_flag
FROM s CROSS JOIN ties CROSS JOIN nn
"""


# ---------------------------------------------------------------------------
# Theil–Sen slope
# ---------------------------------------------------------------------------


def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_days, n_pairs, slope_ppm): the Theil–Sen estimator — the
    exact lower median of all pairwise slopes (x_j−x_i)·1e6 div
    (day_j−day_i) over the observed-day series (ppm-cents/day,
    truncation identical in both engines). The median is a rank
    selection at (n_pairs+1) div 2 through functions/global_order —
    the pair frame is calendar-bounded (|days|²/2), so the sort cost
    is data-size-independent.

    Scale shape: day aggregate → broadcast nested-loop pair stage →
    one range-partitioned rank → a 1-row probe.

    r16: the day frame is pinned once — it previously re-ran the
    orders scan + groupBy three times (pair left side, broadcast right
    side, n_days count; guide §5 — the frame is ≤|days| rows)."""
    d = _daily(spark, sf_dir).localCheckpoint(eager=True)
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.day") < F.col("b.day")).select(
        F.expr("(b.x - a.x) * 1000000 div (b.day - a.day)").alias(
            "slope_ppm"
        ),
        F.col("a.day").alias("i"),
        F.col("b.day").alias("j"),
    )
    ranked, n_pairs = with_global_order_stat(
        pairs, [F.col("slope_ppm"), F.col("i"), F.col("j")], out="rn"
    )
    med = (n_pairs + 1) // 2
    n_days = d.count()
    return ranked.filter(F.col("rn") == med).select(
        F.lit(n_days).cast("long").alias("n_days"),
        F.lit(n_pairs).cast("long").alias("n_pairs"),
        F.col("slope_ppm").cast("long"),
    )


THEIL_SEN_SQL = f"""
WITH {_DAILY_CTE.strip()},
pairs AS (
  SELECT (b.x - a.x) * 1000000 // (b.day - a.day) AS slope_ppm,
         a.day AS i, b.day AS j
  FROM daily a JOIN daily b ON b.day > a.day
),
ranked AS (
  SELECT slope_ppm,
         ROW_NUMBER() OVER (ORDER BY slope_ppm, i, j) AS rn
  FROM pairs
),
np AS (SELECT COUNT(*) AS n_pairs FROM pairs),
nd AS (SELECT COUNT(*) AS n_days FROM daily)
SELECT nd.n_days, np.n_pairs, CAST(r.slope_ppm AS BIGINT) AS slope_ppm
FROM ranked r CROSS JOIN np CROSS JOIN nd
WHERE r.rn = (np.n_pairs + 1) // 2
"""


# ---------------------------------------------------------------------------
# McNemar paired detector agreement
# ---------------------------------------------------------------------------


def mcnemar_dedup_agreement(
    spark: SparkSession, sf_dir: str, verification: bool = False
) -> DataFrame:
    """(n_docs, in_both, exact_only, near_only, neither, chi2_milli,
    signif_flag): McNemar's continuity-corrected paired test on the
    per-document disagreement between two dedup detectors — exact
    (md5 text group of size > 1) vs near (member of an exact 3-shingle
    Jaccard ≥ {NEAR_DUP_PPM} ppm pair, integer cross-multiplied).
    χ²_milli = (|b−c|−1)²·1000 div (b+c) on the discordant counts
    (0 when b+c = 0 or |b−c| ≤ 1); significance at
    {MCNEMAR_CHI2_CRIT_MILLI} milli = χ²(1) 5%. An exact dup shares
    every shingle, so exact⊆near up to length edge cases — the test
    quantifies HOW MUCH more the near detector sweeps in.

    Scale shape: one md5 groupBy; the near side rides the
    shared-shingle pair stage (guarded-quadratic at test scale; the
    LSH-verified memo at 100 TB — dedup.py:41's documented posture,
    enforced here by the same _guard_quadratic pre-flight as the two
    baselines that own it); then two semijoin flags and a 1-row
    reduce."""
    from .dedup import _guard_quadratic, _shingles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    _guard_quadratic(
        d.select("doc_id"),
        "mcnemar_dedup_agreement",
        "dedup_minhash_verified",
        verification,
    )
    exact_docs = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(
            F.collect_list("doc_id").alias("ids"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") > 1)
        .select(F.explode("ids").alias("doc_id"))
        .distinct()
        .withColumn("ex", F.lit(1))
    )
    # r16: shingle table pinned once (sizes + the pair stage), pairs
    # expanded row-locally from posting lists (guide §2.4, the shared
    # shingle_pair_intersections plan) — same pair multiset, fewer
    # exchanges; the quadratic GUARD above is unchanged.
    from .dedup import shingle_pair_intersections

    sh = _shingles(spark, sf_dir).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    near_pairs = (
        shingle_pair_intersections(sh)
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
        .join(near_docs, "doc_id", "left")
        .select(
            F.coalesce("ex", F.lit(0)).alias("ex"),
            F.coalesce("nr", F.lit(0)).alias("nr"),
        )
    )
    return (
        flags.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr("CAST(ex = 1 AND nr = 1 AS LONG)")).alias("in_both"),
            F.sum(F.expr("CAST(ex = 1 AND nr = 0 AS LONG)")).alias(
                "exact_only"
            ),
            F.sum(F.expr("CAST(ex = 0 AND nr = 1 AS LONG)")).alias(
                "near_only"
            ),
            F.sum(F.expr("CAST(ex = 0 AND nr = 0 AS LONG)")).alias(
                "neither"
            ),
        )
        .withColumn(
            "chi2_milli",
            F.expr(
                "CASE WHEN exact_only + near_only = 0 THEN CAST(0 AS BIGINT)"
                " ELSE greatest(abs(exact_only - near_only) - 1, 0)"
                " * greatest(abs(exact_only - near_only) - 1, 0)"
                " * 1000 div (exact_only + near_only) END"
            ).cast("long"),
        )
        .withColumn(
            "signif_flag", F.col("chi2_milli") > MCNEMAR_CHI2_CRIT_MILLI
        )
        .select(
            F.col("n_docs").cast("long"),
            F.col("in_both").cast("long"),
            F.col("exact_only").cast("long"),
            F.col("near_only").cast("long"),
            F.col("neither").cast("long"),
            "chi2_milli",
            "signif_flag",
        )
    )


def _mcnemar_sql() -> str:
    from .dedup import SQL_SHINGLES_CTE

    return f"""
WITH {SQL_SHINGLES_CTE.strip()},
exact_docs AS (
  SELECT DISTINCT doc_id FROM documents
  WHERE md5(text) IN (
    SELECT md5(text) FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
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
         CASE WHEN nd.doc_id IS NULL THEN 0 ELSE 1 END AS nr
  FROM documents d
  LEFT JOIN exact_docs e ON e.doc_id = d.doc_id
  LEFT JOIN near_docs nd ON nd.doc_id = d.doc_id
),
cnt AS (
  SELECT COUNT(*) AS n_docs,
         SUM(CASE WHEN ex = 1 AND nr = 1 THEN 1 ELSE 0 END) AS in_both,
         SUM(CASE WHEN ex = 1 AND nr = 0 THEN 1 ELSE 0 END) AS exact_only,
         SUM(CASE WHEN ex = 0 AND nr = 1 THEN 1 ELSE 0 END) AS near_only,
         SUM(CASE WHEN ex = 0 AND nr = 0 THEN 1 ELSE 0 END) AS neither
  FROM flags
)
SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(in_both AS BIGINT) AS in_both,
       CAST(exact_only AS BIGINT) AS exact_only,
       CAST(near_only AS BIGINT) AS near_only,
       CAST(neither AS BIGINT) AS neither,
       CAST(CASE WHEN exact_only + near_only = 0 THEN 0
            ELSE greatest(abs(exact_only - near_only) - 1, 0)
                 * greatest(abs(exact_only - near_only) - 1, 0)
                 * 1000 // (exact_only + near_only) END AS BIGINT)
         AS chi2_milli,
       CASE WHEN exact_only + near_only = 0 THEN FALSE
            ELSE greatest(abs(exact_only - near_only) - 1, 0)
                 * greatest(abs(exact_only - near_only) - 1, 0)
                 * 1000 // (exact_only + near_only)
                 > {MCNEMAR_CHI2_CRIT_MILLI} END AS signif_flag
FROM cnt
"""


MCNEMAR_DEDUP_SQL = _mcnemar_sql()


# ---------------------------------------------------------------------------
# Page–Hinkley drift
# ---------------------------------------------------------------------------

#: σ-computation quantum: daily cents are divided by this before the
#: Σx² moment so n·Σx² stays in int64 (at 1e8-cent days and ~2500
#: days, raw Σx² ≈ 2.4e19 overflows; at $100 units it is ~5.8e14).
PH_SIGMA_QUANT = 10_000


def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_days, ph_max_q, ph_max_day, sigma_n_q, alarm_flag,
    alarm_day): the Page–Hinkley increase detector over daily revenue.
    Per day t (day order): mean_t = cumsum div t (floor — both
    engines truncate alike), dev_t = x_t − mean_t − δ (δ =
    {PH_DELTA_Q}), m_t = Σ dev, PH_t = m_t − min_{{j≤t}} m_j. The
    alarm threshold is 3σ computed exactly via n²σ² = n·Σx²−(Σx)² in
    $100 units ({PH_SIGMA_QUANT} cents — int64 headroom documented on
    the constant): alarm at day t iff (PH_t div {PH_SIGMA_QUANT})·n >
    3·isqrt(nvar) — an integer comparison on both sides. ph_max_q is
    in cents; sigma_n_q = isqrt(nvar) = n·σ in $100 units.

    Scale shape: day-frame windows only (≤|days| rows, the
    calendar-bounded exemption class) over one orders scan + groupBy;
    the alarm reduce is 1 row."""
    d = _daily(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    path = (
        d.withColumn("i", F.row_number().over(Window.orderBy("day")))
        .withColumn("cum", F.sum("x").over(w))
        .withColumn(
            "dev", F.expr(f"x - cum div i - {PH_DELTA_Q}")
        )
        .withColumn("m", F.sum("dev").over(w))
        .withColumn("minm", F.min("m").over(w))
        .withColumn("ph", F.col("m") - F.col("minm"))
    )
    mom = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(f"(x div {PH_SIGMA_QUANT}) * (x div {PH_SIGMA_QUANT})"))
        .alias("sx2"),
        F.sum(F.expr(f"x div {PH_SIGMA_QUANT}")).alias("sx"),
    ).select(
        "n",
        F.expr("CAST(FLOOR(SQRT(CAST(n * sx2 - sx * sx AS DOUBLE))) AS BIGINT)")
        .alias("sigma_n"),
    )
    j = path.crossJoin(F.broadcast(mom))
    top = (
        j.orderBy(F.desc("ph"), F.asc("day"))
        .limit(1)
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("ph").cast("long").alias("ph_max_q"),
            F.col("day").cast("long").alias("ph_max_day"),
            F.col("sigma_n").cast("long").alias("sigma_n_q"),
        )
    )
    alarm = j.filter(
        F.expr(f"(ph div {PH_SIGMA_QUANT}) * n > 3 * sigma_n")
    ).agg(F.coalesce(F.min("day"), F.lit(-1)).alias("alarm_day"))
    return top.crossJoin(F.broadcast(alarm)).select(
        "n_days",
        "ph_max_q",
        "ph_max_day",
        "sigma_n_q",
        (F.col("alarm_day") >= 0).alias("alarm_flag"),
        F.col("alarm_day").cast("long"),
    )


PAGE_HINKLEY_SQL = f"""
WITH {_DAILY_CTE.strip()},
path AS (
  SELECT day, x,
         ROW_NUMBER() OVER (ORDER BY day) AS i,
         SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily
),
devs AS (
  SELECT day, x, i, x - cum // i - {PH_DELTA_Q} AS dev FROM path
),
ms AS (
  SELECT day,
         SUM(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS m
  FROM devs
),
ph AS (
  SELECT day,
         m - MIN(m) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS ph
  FROM ms
),
mom AS (
  SELECT COUNT(*) AS n,
         CAST(FLOOR(SQRT(CAST(
           COUNT(*) * SUM((x // {PH_SIGMA_QUANT}) * (x // {PH_SIGMA_QUANT}))
           - SUM(x // {PH_SIGMA_QUANT}) * SUM(x // {PH_SIGMA_QUANT})
           AS DOUBLE))) AS BIGINT) AS sigma_n
  FROM daily
),
top AS (
  SELECT ph.ph, ph.day FROM ph ORDER BY ph.ph DESC, ph.day ASC LIMIT 1
),
alarm AS (
  SELECT COALESCE(MIN(ph.day), -1) AS alarm_day
  FROM ph CROSS JOIN mom
  WHERE (ph.ph // {PH_SIGMA_QUANT}) * mom.n > 3 * mom.sigma_n
)
SELECT CAST(mom.n AS BIGINT) AS n_days,
       CAST(top.ph AS BIGINT) AS ph_max_q,
       CAST(top.day AS BIGINT) AS ph_max_day,
       CAST(mom.sigma_n AS BIGINT) AS sigma_n_q,
       alarm.alarm_day >= 0 AS alarm_flag,
       CAST(alarm.alarm_day AS BIGINT) AS alarm_day
FROM mom CROSS JOIN top CROSS JOIN alarm
"""


# ---------------------------------------------------------------------------
# Group-sequential A/B looks
# ---------------------------------------------------------------------------


def _ab_z_case(div: str) -> str:
    """Pooled two-proportion z_milli CASE over the STRIDED counts
    sn_a/sn_b/sconv_a/sconv_b (shared between the Spark plan, div =
    'div', and the DuckDB oracle, div = '//'), so the int64-headroom
    stride is applied identically by both engines."""
    return (
        "CASE WHEN sconv_a + sconv_b = 0 OR sconv_a + sconv_b = sn_a + sn_b "
        "OR sn_a = 0 OR sn_b = 0 "
        "THEN CAST(0 AS BIGINT) ELSE "
        "CAST(sign(sconv_b * sn_a - sconv_a * sn_b) AS BIGINT) * "
        "CAST(FLOOR(SQRT(CAST("
        f"((sconv_b * sn_a - sconv_a * sn_b) * (sn_a + sn_b) {div} sn_a)"
        f" * (sconv_b * sn_a - sconv_a * sn_b) {div} sn_b"
        f" * 1000000 {div} (sconv_a + sconv_b)"
        f" {div} (sn_a + sn_b - sconv_a - sconv_b)"
        " AS DOUBLE))) AS BIGINT) END"
    )


def ab_sequential_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(look, n_a, n_b, conv_a, conv_b, z_milli, bound_milli,
    cross_flag): a K=4 group-sequential two-proportion A/B readout.
    Users hash into arms (md5-hash64 pmod 2, srm_bucket_audit's
    assignment) and into 4 deterministic accrual buckets; look k
    analyzes the cumulative first k buckets — the group-sequential
    "information fraction" without wall-clock (accrual order is the
    hash, so both engines see identical looks). Outcome: the user's
    purchase events outnumber their error events (a non-saturated
    binary on this fixture — every user converts, so raw conversion
    is useless). Pooled two-proportion z², exact integer via staged
    division: t1 = num·N div n_a, t2 = t1·num div n_b, z²·1e6 =
    t2·1e6 div C div (N−C) with num = conv_b·n_a − conv_a·n_b;
    z_milli = sign(num)·isqrt. Int64 headroom: num·N ≲ 9e18 needs
    N ≲ 3e6 users per look at worst-case imbalance — ENFORCED: all
    four counts are pre-divided by stride s = 1 + N div
    {AB_SEQ_STRIDE_N} before the z arithmetic (z is degree-0
    homogeneous in the counts, so the strided z matches to ≤1 milli
    wherever s > 1; s = 1 at fixture N, leaving small-N results
    bit-exact). Reported counts stay raw; both engines apply the same
    stride. Boundaries: O'Brien–Fleming-shaped
    z_k = z_K·√(K/k) milli literals {OBF_BOUNDS_MILLI}.

    Scale shape: one events scan → (user) groupBy → (bucket, arm)
    aggregate (8 rows); the look explosion and z arithmetic run on
    literal-sized frames."""
    from ..events_source import load_events

    users = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("np"),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "ne"
            ),
        )
        .select(
            F.pmod(
                hash64(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                F.lit(2),
            ).alias("arm"),
            F.pmod(
                hash64(
                    F.concat(F.lit("look:"), F.col("user_id").cast("string"))
                ),
                F.lit(4),
            ).alias("bucket"),
            (F.col("np") > F.col("ne")).cast("long").alias("conv"),
        )
    )
    cell = users.groupBy("bucket", "arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    looks = spark.range(1, 5).select(F.col("id").alias("look"))
    cum = (
        F.broadcast(looks)
        .join(cell, F.col("bucket") < F.col("look"))
        .groupBy("look")
        .agg(
            F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("c"))).alias("conv_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("c"))).alias("conv_b"),
        )
    )
    bounds_case = "CASE look " + " ".join(
        f"WHEN {k + 1} THEN {b}" for k, b in enumerate(OBF_BOUNDS_MILLI)
    ) + " END"
    z_expr = _ab_z_case("div")
    cum = cum.select(
        "*",
        F.expr(f"1 + (n_a + n_b) div {AB_SEQ_STRIDE_N}").alias("s"),
    ).select(
        "*",
        F.expr("n_a div s").alias("sn_a"),
        F.expr("n_b div s").alias("sn_b"),
        F.expr("conv_a div s").alias("sconv_a"),
        F.expr("conv_b div s").alias("sconv_b"),
    )
    return (
        cum.select(
            F.col("look").cast("long"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.col("conv_a").cast("long"),
            F.col("conv_b").cast("long"),
            F.expr(z_expr).alias("z_milli"),
            F.expr(bounds_case).cast("long").alias("bound_milli"),
        )
        .withColumn(
            "cross_flag", F.abs(F.col("z_milli")) > F.col("bound_milli")
        )
        .orderBy("look")
    )


def _ab_seq_sql() -> str:
    bounds_case = "CASE look " + " ".join(
        f"WHEN {k + 1} THEN {b}" for k, b in enumerate(OBF_BOUNDS_MILLI)
    ) + " END"
    z = _ab_z_case("//")
    return f"""
WITH per_user AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS ne
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT {sql_hash64("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         {sql_hash64("'look:' || CAST(user_id AS VARCHAR)")} % 4 AS bucket,
         CASE WHEN np > ne THEN 1 ELSE 0 END AS conv
  FROM per_user
),
cell AS (
  SELECT bucket, arm, COUNT(*) AS n, SUM(conv) AS c
  FROM assigned GROUP BY 1, 2
),
looks AS (SELECT unnest(range(1, 5)) AS look),
cum AS (
  SELECT l.look,
         SUM(CASE WHEN arm = 0 THEN n END) AS n_a,
         SUM(CASE WHEN arm = 1 THEN n END) AS n_b,
         SUM(CASE WHEN arm = 0 THEN c END) AS conv_a,
         SUM(CASE WHEN arm = 1 THEN c END) AS conv_b
  FROM looks l JOIN cell ON cell.bucket < l.look
  GROUP BY l.look
),
strided AS (
  SELECT cum.*,
         n_a // s AS sn_a, n_b // s AS sn_b,
         conv_a // s AS sconv_a, conv_b // s AS sconv_b
  FROM (SELECT cum.*, 1 + (n_a + n_b) // {AB_SEQ_STRIDE_N} AS s
        FROM cum) cum
)
SELECT CAST(look AS BIGINT) AS look, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_a AS BIGINT) AS conv_a,
       CAST(conv_b AS BIGINT) AS conv_b,
       {z} AS z_milli,
       CAST({bounds_case} AS BIGINT) AS bound_milli,
       abs({z}) > {bounds_case} AS cross_flag
FROM strided ORDER BY look
"""


AB_SEQUENTIAL_SQL = _ab_seq_sql()
