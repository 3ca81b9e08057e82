"""Batch 73: rank-based effect sizes, paired tests, embedding
centroid drift.

- ``cliffs_delta_arms`` — Cliff's δ (Cliff 1993) between the two
  hash-assigned experiment arms: P(B>A) − P(B<A) over per-user totals,
  computed WITHOUT the n·m pair join via the distinct-value cumsum
  identity gt = Σ_v c_B(v)·cumless_A(v) (kruskal's table trick — the
  pair count collapses onto the ~|distinct values| frame). The
  standard nonparametric effect size to report next to an MW-U.
- ``wilcoxon_signed_rank`` — the paired pre/post test (Wilcoxon 1945)
  over each user's value split at the calendar midpoint: signed ranks
  of |post−pre| with average ties carried ×2 (the kruskal closed form
  r2 = 2·cum − c + 1 over the distinct-|d| table), tie-corrected
  variance, z exact in milli via the squared form.
- ``sign_test_paired`` — the distribution-free sign test on the same
  pairs: k = #(d>0) of m = #(d≠0), z = (2k−m)/√m exact in milli.
  Weaker but assumption-free — the pair Wilcoxon/sign disagreement is
  itself a symmetry diagnostic.
- ``hodges_lehmann_shift`` — the HL location-shift estimator between
  the two calendar eras of daily revenue: the exact lower median of
  all cross-era differences (a calendar-bounded |era1|·|era2| pair
  frame), ranked through functions/global_order.
- ``embedding_centroid_drift`` — per-label split-half centroid
  stability: mean vector of even vs odd vec_ids (milli-quantized,
  mean = sum div n so magnitudes stay bounded at ANY n), cosine in
  exact ppm. A collapsing or drifting class shows cos ≪ 1e6.

All integer end-to-end under the cross-engine hash. Reference scope
note: extends the reference's analytics surface per SURVEY §2.9-2.10;
the reference engine itself ships data movement only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat
from ..functions.text import hash64, sql_hash64

DAY_US = 86_400_000_000
#: |z| 5% two-sided boundary, milli.
Z_CRIT_MILLI = 1_960
#: embedding component quantization (milli), matching the repo's
#: established float→integer boundary.
EMB_QUANT = 1_000


def _user_arm_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, arm, m): per-user total cents + the srm/qte hash-arm."""
    from ..events_source import load_events

    return (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr("CAST(floor(value * 100) AS LONG)").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").alias("m"))
        .select(
            "user_id",
            "m",
            F.pmod(
                hash64(F.concat(F.lit("qte:"), F.col("user_id").cast("string"))),
                F.lit(2),
            ).alias("arm"),
        )
    )


_ARM_USERS_CTE = f"""
users AS (
  SELECT user_id, SUM(CAST(floor(value * 100) AS BIGINT)) AS m,
         {sql_hash64("'qte:' || CAST(user_id AS VARCHAR)")} % 2 AS arm
  FROM events GROUP BY user_id
)
"""


def _paired_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, d): post − pre cents per user, calendar-midpoint split
    (ks_two_sample_drift's self-calibrating split), zero diffs kept
    (callers drop them)."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS LONG)").alias("cents"),
        F.expr(f"ts_us div {DAY_US}").alias("day_idx"),
    )
    bounds = e.agg(
        F.expr("(min(day_idx) + max(day_idx) + 1) div 2").alias("mid")
    )
    return (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("day_idx") >= F.col("mid"), F.col("cents"))
                .otherwise(F.lit(0))
            ).alias("post"),
            F.sum(
                F.when(F.col("day_idx") < F.col("mid"), F.col("cents"))
                .otherwise(F.lit(0))
            ).alias("pre"),
        )
        .select("user_id", (F.col("post") - F.col("pre")).alias("d"))
    )


_PAIRED_CTE = """
e AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) // 86400000000 AS day_idx
  FROM events
),
bounds AS (SELECT (MIN(day_idx) + MAX(day_idx) + 1) // 2 AS mid FROM e),
diffs AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN day_idx >= mid THEN cents ELSE 0 END)
              - SUM(CASE WHEN day_idx < mid THEN cents ELSE 0 END)
              AS BIGINT) AS d
  FROM e CROSS JOIN bounds GROUP BY user_id
)
"""


# ---------------------------------------------------------------------------
# Cliff's delta
# ---------------------------------------------------------------------------


def cliffs_delta_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_a, n_b, gt_pairs, lt_pairs, delta_ppm, negligible_flag):
    Cliff's δ = (#(b>a) − #(b<a)) / (n_a·n_b) in exact ppm. The pair
    counts collapse onto the distinct-value table: with per-value arm
    counts c_A(v), c_B(v) and the INCLUSIVE cumsum cum_A over
    ascending v (functions/global_order — the value table is
    ~|distinct cents totals|, never the user table),
    gt = Σ_v c_B(v)·(cum_A(v) − c_A(v)) and
    lt = Σ_v c_B(v)·(n_A − cum_A(v)); ties count in neither.
    |δ| < 0.147 (Romano et al.'s 'negligible') flags in ppm. Int64
    headroom: gt·1e6 needs n_A·n_B ≲ 9e12 — past ~3e6 users/arm,
    pre-divide the pair counts by a common stride (documented, same
    posture as ab_sequential_looks).

    Scale shape: one scan, one (user) groupBy, one (value) groupBy,
    one range-partitioned cumsum over the distinct-value table, a
    1-row reduce. No user-level pair join at any n."""
    users = _user_arm_values(spark, sf_dir)
    vals = users.groupBy("m").agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("ca"),
        F.sum((F.col("arm") == 1).cast("long")).alias("cb"),
    )
    cumdf, n_a = with_global_order_stat(
        vals, [F.col("m")], cumsum_col="ca", out="cuma"
    )
    agg = cumdf.agg(
        F.sum("cb").alias("n_b"),
        F.sum(F.col("cb") * (F.col("cuma") - F.col("ca"))).alias("gt"),
        F.sum(F.col("cb") * (F.lit(n_a) - F.col("cuma"))).alias("lt"),
    )
    return agg.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.col("n_b").cast("long"),
        F.col("gt").cast("long").alias("gt_pairs"),
        F.col("lt").cast("long").alias("lt_pairs"),
        F.expr(f"(gt - lt) * 1000000 div ({n_a} * n_b)")
        .cast("long")
        .alias("delta_ppm"),
    ).withColumn(
        "negligible_flag", F.abs(F.col("delta_ppm")) < 147_000
    )


CLIFFS_DELTA_SQL = f"""
WITH {_ARM_USERS_CTE.strip()},
vals AS (
  SELECT m,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
  FROM users GROUP BY m
),
cums AS (
  SELECT m, ca, cb,
         SUM(ca) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cuma
  FROM vals
),
nn AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM vals),
agg AS (
  SELECT SUM(cb * (cuma - ca)) AS gt, SUM(cb * (nn.n_a - cuma)) AS lt
  FROM cums CROSS JOIN nn
)
SELECT CAST(nn.n_a AS BIGINT) AS n_a, CAST(nn.n_b AS BIGINT) AS n_b,
       CAST(agg.gt AS BIGINT) AS gt_pairs,
       CAST(agg.lt AS BIGINT) AS lt_pairs,
       CAST((agg.gt - agg.lt) * 1000000 // (nn.n_a * nn.n_b) AS BIGINT)
         AS delta_ppm,
       abs(CAST((agg.gt - agg.lt) * 1000000 // (nn.n_a * nn.n_b)
                AS BIGINT)) < 147000 AS negligible_flag
FROM nn CROSS JOIN agg
"""


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_eff, w2_plus, e2, var12_q, z_milli, signif_flag): Wilcoxon
    signed-rank on the pre/post pairs. Zero diffs drop (n_eff);
    |d| ranks with average ties ×2 come from the distinct-|d| cumsum
    (r2 = 2·cum − c + 1, kruskal's closed form through
    functions/global_order); W2+ = Σ_{{d>0}} r2 = 2·W+. Exact moments:
    E[2W+] = n(n+1)/2, var12 = 12·Var(2W+) = 2n(n+1)(2n+1) − Σ(t³−t);
    z²·1e6 = (W2+ − E2)²·12e6 div var12, z_milli = sign·isqrt. Int64
    headroom: (W2+−E2)² ~ n⁴ needs n ≲ 5e4 — past that divide ranks
    by 16 first (kruskal's documented posture).

    Scale shape: one scan, one (user) groupBy, one (|d|) groupBy, one
    range-partitioned cumsum over the distinct-|d| table, a value-
    keyed join back, a 1-row reduce. No fact-sized window."""
    d = _paired_diffs(spark, sf_dir).filter(F.col("d") != 0)
    gx = d.select(
        F.abs(F.col("d")).alias("ad"),
        F.signum(F.col("d")).cast("long").alias("sg"),
    ).groupBy("ad").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.expr("CAST(sg = 1 AS LONG)")).alias("cpos"),
    )
    cumdf, n_eff = with_global_order_stat(
        gx, [F.col("ad")], cumsum_col="c", out="cum"
    )
    agg = cumdf.agg(
        F.sum(
            F.col("cpos") * (2 * F.col("cum") - F.col("c") + 1)
        ).alias("w2p"),
        F.sum(F.expr("c * c * c - c")).alias("tsum"),
    )
    e2 = n_eff * (n_eff + 1) // 2
    var12 = 2 * n_eff * (n_eff + 1) * (2 * n_eff + 1)
    z_expr = (
        f"CASE WHEN w2p = {e2} OR {var12} - tsum <= 0 THEN CAST(0 AS BIGINT)"
        f" ELSE CAST(sign(w2p - {e2}) AS BIGINT) * CAST(FLOOR(SQRT(CAST("
        f"(w2p - {e2}) * (w2p - {e2}) * 12000000 div ({var12} - tsum)"
        " AS DOUBLE))) AS BIGINT) END"
    )
    return agg.select(
        F.lit(n_eff).cast("long").alias("n_eff"),
        F.col("w2p").cast("long").alias("w2_plus"),
        F.lit(e2).cast("long").alias("e2"),
        F.expr(f"{var12} - tsum").cast("long").alias("var12_q"),
        F.expr(z_expr).alias("z_milli"),
    ).withColumn("signif_flag", F.abs(F.col("z_milli")) > Z_CRIT_MILLI)


WILCOXON_SQL = f"""
WITH {_PAIRED_CTE.strip()},
nz AS (SELECT d FROM diffs WHERE d != 0),
gx AS (
  SELECT abs(d) AS ad, COUNT(*) AS c,
         SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cpos
  FROM nz GROUP BY abs(d)
),
cums AS (
  SELECT ad, c, cpos,
         SUM(c) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) AS cum
  FROM gx
),
nn AS (SELECT COUNT(*) AS n FROM nz),
agg AS (
  SELECT SUM(cpos * (2 * cum - c + 1)) AS w2p,
         SUM(c * c * c - c) AS tsum
  FROM cums
),
mom AS (
  SELECT nn.n, nn.n * (nn.n + 1) // 2 AS e2,
         2 * nn.n * (nn.n + 1) * (2 * nn.n + 1) AS v12
  FROM nn
)
SELECT CAST(mom.n AS BIGINT) AS n_eff,
       CAST(agg.w2p AS BIGINT) AS w2_plus,
       CAST(mom.e2 AS BIGINT) AS e2,
       CAST(mom.v12 - agg.tsum AS BIGINT) AS var12_q,
       CASE WHEN agg.w2p = mom.e2 OR mom.v12 - agg.tsum <= 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(sign(agg.w2p - mom.e2) AS BIGINT)
                 * CAST(FLOOR(SQRT(CAST(
                     (agg.w2p - mom.e2) * (agg.w2p - mom.e2) * 12000000
                     // (mom.v12 - agg.tsum) AS DOUBLE))) AS BIGINT)
       END AS z_milli,
       abs(CASE WHEN agg.w2p = mom.e2 OR mom.v12 - agg.tsum <= 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(sign(agg.w2p - mom.e2) AS BIGINT)
                 * CAST(FLOOR(SQRT(CAST(
                     (agg.w2p - mom.e2) * (agg.w2p - mom.e2) * 12000000
                     // (mom.v12 - agg.tsum) AS DOUBLE))) AS BIGINT)
       END) > {Z_CRIT_MILLI} AS signif_flag
FROM mom CROSS JOIN agg
"""


# ---------------------------------------------------------------------------
# Sign test
# ---------------------------------------------------------------------------


def sign_test_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(m_nonzero, k_pos, z_milli, signif_flag): the paired sign test
    on the same pre/post diffs — z = (2k − m)/√m, exact milli via the
    squared form. The weakest-assumption paired test; read next to
    wilcoxon_signed_rank, a large gap between the two flags asymmetry.

    Scale shape: one scan, one (user) groupBy, a 1-row reduce."""
    d = _paired_diffs(spark, sf_dir).filter(F.col("d") != 0)
    agg = d.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.expr("CAST(d > 0 AS LONG)")).alias("k"),
    )
    z = (
        "CASE WHEN 2 * k = m THEN CAST(0 AS BIGINT) ELSE "
        "CAST(sign(2 * k - m) AS BIGINT) * CAST(FLOOR(SQRT(CAST("
        "(2 * k - m) * (2 * k - m) * 1000000 div m AS DOUBLE)))"
        " AS BIGINT) END"
    )
    return agg.select(
        F.col("m").cast("long").alias("m_nonzero"),
        F.col("k").cast("long").alias("k_pos"),
        F.expr(z).alias("z_milli"),
    ).withColumn("signif_flag", F.abs(F.col("z_milli")) > Z_CRIT_MILLI)


SIGN_TEST_SQL = f"""
WITH {_PAIRED_CTE.strip()},
agg AS (
  SELECT COUNT(*) AS m,
         SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS k
  FROM diffs WHERE d != 0
)
SELECT CAST(m AS BIGINT) AS m_nonzero, CAST(k AS BIGINT) AS k_pos,
       CASE WHEN 2 * k = m THEN CAST(0 AS BIGINT) ELSE
         CAST(sign(2 * k - m) AS BIGINT) * CAST(FLOOR(SQRT(CAST(
           (2 * k - m) * (2 * k - m) * 1000000 // m AS DOUBLE)))
           AS BIGINT) END AS z_milli,
       abs(CASE WHEN 2 * k = m THEN CAST(0 AS BIGINT) ELSE
         CAST(sign(2 * k - m) AS BIGINT) * CAST(FLOOR(SQRT(CAST(
           (2 * k - m) * (2 * k - m) * 1000000 // m AS DOUBLE)))
           AS BIGINT) END) > {Z_CRIT_MILLI} AS signif_flag
FROM agg
"""


# ---------------------------------------------------------------------------
# Hodges–Lehmann shift
# ---------------------------------------------------------------------------


def hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_era1, n_era2, n_pairs, hl_shift_cents): the Hodges–Lehmann
    estimator of the revenue shift between the two calendar eras —
    the exact lower median of all cross-era daily differences
    (x₂ − x₁). Era split at the day-range midpoint; the pair frame is
    |era1|·|era2| — CALENDAR-bounded, so the broadcast nested-loop +
    range-partitioned rank cost data-size-independent.

    Scale shape: orders scan → day groupBy → BNL pair stage over the
    day aggregate → one range-partitioned rank → a 1-row probe.

    r16: the day frame is pinned once — it previously re-ran the
    orders scan + groupBy five times (bounds agg, era-1 side, era-2
    broadcast, and the two era counts; guide §5 — ≤|days| rows)."""
    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.expr(
                "CAST(datediff(o_orderdate, to_date('1992-01-01')) AS LONG)"
            ).alias("day"),
            F.expr("CAST(round(o_totalprice * 100) AS LONG)").alias("rc"),
        )
        .groupBy("day")
        .agg(F.sum("rc").alias("x"))
        .localCheckpoint(eager=True)
    )
    bounds = daily.agg(
        F.expr("(min(day) + max(day) + 1) div 2").alias("mid")
    )
    d = daily.crossJoin(F.broadcast(bounds))
    e1 = d.filter(F.col("day") < F.col("mid")).select(
        F.col("day").alias("d1"), F.col("x").alias("x1")
    )
    e2 = d.filter(F.col("day") >= F.col("mid")).select(
        F.col("day").alias("d2"), F.col("x").alias("x2")
    )
    pairs = e1.crossJoin(F.broadcast(e2)).select(
        (F.col("x2") - F.col("x1")).alias("diff"), "d1", "d2"
    )
    ranked, n_pairs = with_global_order_stat(
        pairs, [F.col("diff"), F.col("d1"), F.col("d2")], out="rn"
    )
    n1 = e1.count()
    n2 = e2.count()
    med = (n_pairs + 1) // 2
    return ranked.filter(F.col("rn") == med).select(
        F.lit(n1).cast("long").alias("n_era1"),
        F.lit(n2).cast("long").alias("n_era2"),
        F.lit(n_pairs).cast("long").alias("n_pairs"),
        F.col("diff").cast("long").alias("hl_shift_cents"),
    )


HODGES_LEHMANN_SQL = """
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1
),
bounds AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM daily),
e1 AS (SELECT day AS d1, x AS x1 FROM daily CROSS JOIN bounds
       WHERE day < mid),
e2 AS (SELECT day AS d2, x AS x2 FROM daily CROSS JOIN bounds
       WHERE day >= mid),
pairs AS (
  SELECT CAST(x2 - x1 AS BIGINT) AS diff, d1, d2 FROM e1 CROSS JOIN e2
),
ranked AS (
  SELECT diff, ROW_NUMBER() OVER (ORDER BY diff, d1, d2) AS rn FROM pairs
),
np AS (SELECT COUNT(*) AS n_pairs FROM pairs),
nn AS (SELECT (SELECT COUNT(*) FROM e1) AS n1,
              (SELECT COUNT(*) FROM e2) AS n2)
SELECT CAST(nn.n1 AS BIGINT) AS n_era1, CAST(nn.n2 AS BIGINT) AS n_era2,
       CAST(np.n_pairs AS BIGINT) AS n_pairs,
       CAST(r.diff AS BIGINT) AS hl_shift_cents
FROM ranked r CROSS JOIN np CROSS JOIN nn
WHERE r.rn = (np.n_pairs + 1) // 2
"""


# ---------------------------------------------------------------------------
# Embedding centroid drift
# ---------------------------------------------------------------------------


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_even, n_odd, cos_ppm, stable_flag): per-label
    split-half centroid stability — mean vector of even vs odd
    vec_ids, cosine in exact ppm. Components quantize to milli at the
    float boundary ({EMB_QUANT}, the repo's established convention);
    the centroid is mean = sum div n (floor), so component magnitudes
    stay ≤ {EMB_QUANT}·max|x| at ANY vector count — the dot/norm
    arithmetic is int64-safe without data-volume caveats. A healthy
    class sits near 1e6; drift or collapse reads directly off the
    ppm. cos_ppm = dot·1e6 div (isqrt(|a|²)·isqrt(|b|²)), −1 when a
    half is empty or a norm is zero.

    Scale shape: one posexplode scan → (label, half, dim) integer
    sums (labels·2·dims rows) → per-label fold. No pair joins."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    flat = e.select(
        "label",
        F.pmod(F.col("vec_id"), F.lit(2)).alias("half"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "label",
        "half",
        "dim",
        F.expr(f"CAST(round(x * {EMB_QUANT}) AS LONG)").alias("q"),
    )
    sums = flat.groupBy("label", "half", "dim").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    means = sums.select(
        "label",
        "half",
        "dim",
        F.expr("s div n").alias("mu"),
        "n",
    )
    a = means.filter(F.col("half") == 0).select(
        "label", "dim", F.col("mu").alias("ma"), F.col("n").alias("na")
    )
    b = means.filter(F.col("half") == 1).select(
        "label", "dim", F.col("mu").alias("mb"), F.col("n").alias("nb")
    )
    per_label = (
        a.join(b, ["label", "dim"], "outer")
        .groupBy("label")
        .agg(
            F.max("na").alias("n_even"),
            F.max("nb").alias("n_odd"),
            F.sum(
                F.coalesce("ma", F.lit(0)) * F.coalesce("mb", F.lit(0))
            ).alias("dot"),
            F.sum(
                F.coalesce("ma", F.lit(0)) * F.coalesce("ma", F.lit(0))
            ).alias("na2"),
            F.sum(
                F.coalesce("mb", F.lit(0)) * F.coalesce("mb", F.lit(0))
            ).alias("nb2"),
        )
    )
    cos = (
        "CASE WHEN n_even IS NULL OR n_odd IS NULL OR na2 = 0 OR nb2 = 0"
        " THEN CAST(-1 AS BIGINT) ELSE"
        " CAST(dot * 1000000 div"
        " (CAST(FLOOR(SQRT(CAST(na2 AS DOUBLE))) AS BIGINT)"
        " * CAST(FLOOR(SQRT(CAST(nb2 AS DOUBLE))) AS BIGINT)) AS BIGINT)"
        " END"
    )
    return (
        per_label.select(
            F.col("label").cast("long"),
            F.coalesce("n_even", F.lit(0)).cast("long").alias("n_even"),
            F.coalesce("n_odd", F.lit(0)).cast("long").alias("n_odd"),
            F.expr(cos).alias("cos_ppm"),
        )
        .withColumn("stable_flag", F.col("cos_ppm") > 900_000)
        .orderBy("label")
    )


EMB_CENTROID_DRIFT_SQL = f"""
WITH flat AS (
  SELECT label, vec_id % 2 AS half,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(unnest(embedding) * {EMB_QUANT}) AS BIGINT) AS q
  FROM embeddings
),
sums AS (
  SELECT label, half, dim, SUM(q) AS s, COUNT(*) AS n
  FROM flat GROUP BY 1, 2, 3
),
means AS (
  SELECT label, half, dim, CAST(s // n AS BIGINT) AS mu, n FROM sums
),
j AS (
  SELECT COALESCE(a.label, b.label) AS label,
         MAX(a.n) AS n_even, MAX(b.n) AS n_odd,
         SUM(COALESCE(a.mu, 0) * COALESCE(b.mu, 0)) AS dot,
         SUM(COALESCE(a.mu, 0) * COALESCE(a.mu, 0)) AS na2,
         SUM(COALESCE(b.mu, 0) * COALESCE(b.mu, 0)) AS nb2
  FROM (SELECT * FROM means WHERE half = 0) a
  FULL OUTER JOIN (SELECT * FROM means WHERE half = 1) b
    ON b.label = a.label AND b.dim = a.dim
  GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COALESCE(n_even, 0) AS BIGINT) AS n_even,
       CAST(COALESCE(n_odd, 0) AS BIGINT) AS n_odd,
       CASE WHEN n_even IS NULL OR n_odd IS NULL OR na2 = 0 OR nb2 = 0
            THEN CAST(-1 AS BIGINT)
            ELSE CAST(dot * 1000000 //
                 (CAST(FLOOR(SQRT(CAST(na2 AS DOUBLE))) AS BIGINT)
                  * CAST(FLOOR(SQRT(CAST(nb2 AS DOUBLE))) AS BIGINT))
                 AS BIGINT) END AS cos_ppm,
       CASE WHEN n_even IS NULL OR n_odd IS NULL OR na2 = 0 OR nb2 = 0
            THEN FALSE
            ELSE CAST(dot * 1000000 //
                 (CAST(FLOOR(SQRT(CAST(na2 AS DOUBLE))) AS BIGINT)
                  * CAST(FLOOR(SQRT(CAST(nb2 AS DOUBLE))) AS BIGINT))
                 AS BIGINT) > 900000 END AS stable_flag
FROM j ORDER BY label
"""
