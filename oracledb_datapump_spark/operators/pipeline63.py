"""Batch 63: Wilson intervals, Fellegi–Sunter EM step, Shapley channel
attribution, Simpson's-paradox scan.

- ``wilson_ci_by_arm`` — the Wilson score interval (Wilson 1927) for
  each A/B arm's conversion rate, integer end-to-end via the isqrt of
  the discriminant; the significance verdict is "do the intervals
  overlap" — the robust small-n replacement for the Wald interval
  every experimentation platform ships.
- ``fs_em_iteration`` — one EM step of the Fellegi–Sunter/Winkler
  record-linkage model over BLOCKED candidate pairs (≥2 shared
  shingles): E-step posteriors P(match | agreement pattern) from the
  standard m=0.9/u=0.1/π=0.5 init, M-step re-estimates per-field m, u
  and the class prior. Batch 58's ``fellegi_sunter_weights`` reads m
  off verified labels; this is the UNSUPERVISED estimator used when no
  labels exist (Winkler 1988), one exact integer iteration.
- ``shapley_attribution`` — exact Shapley values (|C|=3 channels, the
  6 permutations in closed form, ×6 to stay integer) for "which
  pre-purchase touch types cause conversions", with the
  characteristic function v(S) = converted users whose touch set ⊆ S.
  The game-theoretic attribution Google/Meta platforms compute;
  u-shaped/last-touch heuristics (pipeline28) are its cheap cousins.
- ``simpsons_reversal_scan`` — per-stratum vs pooled association sign
  of (discount, quantity) via the integer cross-covariance
  n·Σxy − Σx·Σy: a stratum whose sign OPPOSES the pooled sign is a
  Simpson's-paradox reversal, the canonical aggregation-audit before
  anyone trusts a pooled correlation.

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .pipeline58 import FS_FIELDS, _fs_fields_df

#: z(97.5%) and z² scaled by 1e4 — Wilson's only constants.
WILSON_Z_Q = 19_600
WILSON_Z2_Q = 38_416
#: EM initialization (Winkler's standard starting point), in ppm.
EM_M0 = 900_000
EM_U0 = 100_000
EM_PI0 = 500_000
#: blocking floor for the EM candidate-pair population.
EM_MIN_SHARED = 2
#: the three attribution channels (pre-purchase touch types).
SHAPLEY_CHANNELS = ("click", "view", "signup")


# ---------------------------------------------------------------------------
# Wilson score intervals per arm
# ---------------------------------------------------------------------------


def wilson_ci_by_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, n_users, conversions, p_ppm, lo_ppm, hi_ppm, sig_flag):
    Wilson 95% score interval of the user-conversion rate (user
    converted = has ≥1 purchase event) per md5-hash-assigned arm. With
    x successes of n, the bounds are
    (x·1e4 + z²/2 ± isqrt(z²·1e4·(x(n−x) div n) + z⁴/4)) scaled into
    the denominator n·1e4 + z² — the x(n−x) div n inner division keeps
    the discriminant < 4e8·n, so the form survives ~1e9-user arms
    before rescaling (documented; the naive x(n−x) product dies at
    n≈3e9 anyway). sig_flag (same verdict both rows) = the two
    intervals are disjoint — the no-overlap significance read.

    Scale shape: one scan, one (user) groupBy, a 2-row arm aggregate,
    a 2×2 self-join for the verdict."""
    from ..functions.text import hash64
    from ..events_source import load_events

    users = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("long")).alias(
                "conv"
            )
        )
        .select(
            F.pmod(
                hash64(
                    F.concat(F.lit("ab:"), F.col("user_id").cast("string"))
                ),
                F.lit(2),
            ).alias("arm"),
            "conv",
        )
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    z2 = WILSON_Z2_Q
    half = (
        f"CAST(FLOOR(SQRT(CAST({WILSON_Z_Q} * {WILSON_Z_Q} "
        f"* (x * (n - x) div n) + {z2} * {z2} div 4 AS DOUBLE))) AS BIGINT)"
    )
    ci = arms.select(
        "arm",
        F.col("n").cast("long").alias("n_users"),
        F.col("x").cast("long").alias("conversions"),
        F.expr("x * 1000000 div n").cast("long").alias("p_ppm"),
        F.expr(
            f"greatest((x * 10000 + {z2} div 2 - {half}) * 1000000 "
            f"div (n * 10000 + {z2}), 0)"
        )
        .cast("long")
        .alias("lo_ppm"),
        F.expr(
            f"least((x * 10000 + {z2} div 2 + {half}) * 1000000 "
            f"div (n * 10000 + {z2}), 1000000)"
        )
        .cast("long")
        .alias("hi_ppm"),
    )
    verdict = (
        ci.alias("a")
        .crossJoin(ci.alias("b"))
        .filter(F.col("a.arm") != F.col("b.arm"))
        .select(
            F.col("a.arm").alias("arm"),
            (
                (F.col("a.lo_ppm") > F.col("b.hi_ppm"))
                | (F.col("b.lo_ppm") > F.col("a.hi_ppm"))
            ).alias("sig_flag"),
        )
    )
    return (
        ci.join(verdict, "arm")
        .select(
            F.col("arm").cast("long"),
            "n_users",
            "conversions",
            "p_ppm",
            "lo_ppm",
            "hi_ppm",
            "sig_flag",
        )
        .orderBy("arm")
    )


def _wilson_sql() -> str:
    from ..functions.text import sql_hash64

    z2 = WILSON_Z2_Q
    half = (
        f"CAST(FLOOR(SQRT(CAST({WILSON_Z_Q} * {WILSON_Z_Q}"
        f" * (x * (n - x) // n) + {z2} * {z2} // 4 AS DOUBLE))) AS BIGINT)"
    )
    return f"""
WITH users AS (
  SELECT {sql_hash64("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
arms AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS x FROM users GROUP BY arm),
ci AS (
  SELECT arm, CAST(n AS BIGINT) AS n_users, CAST(x AS BIGINT) AS conversions,
         CAST(x * 1000000 // n AS BIGINT) AS p_ppm,
         CAST(GREATEST((x * 10000 + {z2} // 2 - {half}) * 1000000
              // (n * 10000 + {z2}), 0) AS BIGINT) AS lo_ppm,
         CAST(LEAST((x * 10000 + {z2} // 2 + {half}) * 1000000
              // (n * 10000 + {z2}), 1000000) AS BIGINT) AS hi_ppm
  FROM arms
)
SELECT CAST(a.arm AS BIGINT) AS arm, a.n_users, a.conversions, a.p_ppm,
       a.lo_ppm, a.hi_ppm,
       (a.lo_ppm > b.hi_ppm OR b.lo_ppm > a.hi_ppm) AS sig_flag
FROM ci a JOIN ci b ON b.arm != a.arm
ORDER BY a.arm
"""


WILSON_CI_SQL = _wilson_sql()


# ---------------------------------------------------------------------------
# Fellegi–Sunter EM iteration
# ---------------------------------------------------------------------------


def fs_em_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(field, m1_ppm, u1_ppm, pi1_ppm, weight_q): one exact EM step of
    the unsupervised Fellegi–Sunter model. Population = blocked
    candidate pairs (≥{EM_MIN_SHARED} shared 3-shingles — at 100 TB
    this side rides the banded LSH candidates instead of the
    by-shared-shingle join, dedup.py's documented guarded-quadratic
    posture). Each pair reduces to its 4-bit agreement pattern over
    the {FS_FIELDS} comparison fields; the E-step posterior per
    pattern is π·∏m̂ / (π·∏m̂ + (1−π)·∏û) with the factors folded in
    ppm one at a time (each partial product ≤ 1e12 — never the 1e24 a
    naive 4-way ppm product needs), and the M-step re-estimates are
    ratio-of-weighted-counts over the ≤16-row pattern table. weight_q
    = bitlen((m1·1024) div u1), batch 58's agreement-weight surrogate,
    now from UNSUPERVISED estimates.

    Scale shape: the pair stage is the blocked candidate join; after
    the pattern groupBy everything is a ≤16-row frame."""
    from .dedup import _shingles

    d = _fs_fields_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).localCheckpoint(eager=True)
    # r16: pairs expand row-locally from posting lists (guide §2.4, the
    # shared shingle_pair_intersections plan) — same blocked pair set,
    # one exchange instead of two + SMJ sorts, shingles computed once
    from .dedup import shingle_pair_intersections

    pairs = (
        shingle_pair_intersections(_shingles(spark, sf_dir))
        .filter(F.col("inter") >= EM_MIN_SHARED)
        .select(
            F.col("d1").alias("doc_a"), F.col("d2").alias("doc_b")
        )
    )
    fa = d.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f).alias(f"a_{f}") for f in FS_FIELDS],
    )
    fb = d.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f).alias(f"b_{f}") for f in FS_FIELDS],
    )
    pat = (
        pairs.join(F.broadcast(fa), "doc_a")
        .join(F.broadcast(fb), "doc_b")
        .select(
            *[
                (F.col(f"a_{f}") == F.col(f"b_{f}"))
                .cast("long")
                .alias(f"g_{f}")
                for f in FS_FIELDS
            ]
        )
        .groupBy(*[f"g_{f}" for f in FS_FIELDS])
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pm = f"CAST({EM_PI0} AS BIGINT)"
    pu = f"CAST({1_000_000 - EM_PI0} AS BIGINT)"
    for f in FS_FIELDS:
        pm = (
            f"({pm} * (CASE WHEN g_{f} = 1 THEN {EM_M0} "
            f"ELSE {1_000_000 - EM_M0} END) div 1000000)"
        )
        pu = (
            f"({pu} * (CASE WHEN g_{f} = 1 THEN {EM_U0} "
            f"ELSE {1_000_000 - EM_U0} END) div 1000000)"
        )
    w = pat.withColumn(
        "w_ppm", F.expr(f"{pm} * 1000000 div ({pm} + {pu})")
        # r16: pinned — the totals and the per-field stack both consume
        # the ≤16-row pattern table; unpinned, the whole blocked-pair
        # pipeline executed twice
    ).localCheckpoint(eager=True)
    tot = w.agg(
        F.sum("c").alias("nc"),
        F.sum(F.col("c") * F.col("w_ppm")).alias("cw"),
        F.sum(F.col("c") * (1_000_000 - F.col("w_ppm"))).alias("cu"),
    )
    per_field = w.selectExpr(
        "c",
        "w_ppm",
        "stack("
        + str(len(FS_FIELDS))
        + ", "
        + ", ".join(f"'{f}', g_{f}" for f in FS_FIELDS)
        + ") AS (field, g)",
    ).groupBy("field").agg(
        F.sum(F.col("g") * F.col("c") * F.col("w_ppm")).alias("agw"),
        F.sum(
            F.col("g") * F.col("c") * (1_000_000 - F.col("w_ppm"))
        ).alias("agu"),
    )
    return (
        per_field.crossJoin(F.broadcast(tot))
        .select(
            "field",
            # agw/cw is a plain fraction (the w_ppm scale cancels), so
            # the ppm form re-multiplies by 1e6; int64-safe to ~9e6
            # blocked pairs, past which divide agw and cw by 1024 first
            F.expr("agw * 1000000 div greatest(cw, 1)")
            .cast("long")
            .alias("m1_ppm"),
            F.expr("agu * 1000000 div greatest(cu, 1)")
            .cast("long")
            .alias("u1_ppm"),
            F.expr("cw div nc").cast("long").alias("pi1_ppm"),
        )
        .withColumn(
            "weight_q",
            F.expr(
                "CAST(length(bin((m1_ppm * 1024) div greatest(u1_ppm, 1)))"
                " AS BIGINT)"
            ),
        )
        .orderBy("field")
    )


def _fs_em_sql() -> str:
    from .dedup import SQL_SHINGLES_CTE

    pm = f"CAST({EM_PI0} AS BIGINT)"
    pu = f"CAST({1_000_000 - EM_PI0} AS BIGINT)"
    for f in FS_FIELDS:
        pm = (
            f"({pm} * (CASE WHEN g_{f} = 1 THEN {EM_M0} "
            f"ELSE {1_000_000 - EM_M0} END) // 1000000)"
        )
        pu = (
            f"({pu} * (CASE WHEN g_{f} = 1 THEN {EM_U0} "
            f"ELSE {1_000_000 - EM_U0} END) // 1000000)"
        )
    stack = "\n  UNION ALL\n".join(
        f"  SELECT '{f}' AS field, g_{f} AS g, c, w_ppm FROM w" for f in FS_FIELDS
    )
    return f"""
WITH {SQL_SHINGLES_CTE.strip()},
fields AS (
  SELECT doc_id, lang, source,
         CAST(n_chars // 256 AS VARCHAR) AS len_band,
         substr(lower(text), 1, 8) AS prefix8
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shingles a JOIN shingles b
    ON b.shingle = a.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {EM_MIN_SHARED}
),
pat AS (
  SELECT CASE WHEN fa.lang = fb.lang THEN 1 ELSE 0 END AS g_lang,
         CASE WHEN fa.source = fb.source THEN 1 ELSE 0 END AS g_source,
         CASE WHEN fa.len_band = fb.len_band THEN 1 ELSE 0 END AS g_len_band,
         CASE WHEN fa.prefix8 = fb.prefix8 THEN 1 ELSE 0 END AS g_prefix8,
         COUNT(*) AS c
  FROM pairs p JOIN fields fa ON fa.doc_id = p.doc_a
               JOIN fields fb ON fb.doc_id = p.doc_b
  GROUP BY 1, 2, 3, 4
),
w AS (SELECT *, {pm} * 1000000 // ({pm} + {pu}) AS w_ppm FROM pat),
tot AS (
  SELECT SUM(c) AS nc, SUM(c * w_ppm) AS cw,
         SUM(c * (1000000 - w_ppm)) AS cu
  FROM w
),
stacked AS (
{stack}
),
per_field AS (
  SELECT field, SUM(g * c * w_ppm) AS agw,
         SUM(g * c * (1000000 - w_ppm)) AS agu
  FROM stacked GROUP BY field
)
SELECT field,
       CAST(agw * 1000000 // GREATEST(cw, 1) AS BIGINT) AS m1_ppm,
       CAST(agu * 1000000 // GREATEST(cu, 1) AS BIGINT) AS u1_ppm,
       CAST(cw // nc AS BIGINT) AS pi1_ppm,
       CAST(length(bin((agw * 1000000 // GREATEST(cw, 1)) * 1024
            // GREATEST(agu * 1000000 // GREATEST(cu, 1), 1)))
            AS BIGINT) AS weight_q
FROM per_field CROSS JOIN tot
ORDER BY field
"""


FS_EM_SQL = _fs_em_sql()


# ---------------------------------------------------------------------------
# Shapley channel attribution
# ---------------------------------------------------------------------------


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(channel, phi_q6, share_ppm): exact Shapley attribution of
    conversions to the three pre-purchase touch channels
    {SHAPLEY_CHANNELS} plus the 'direct' bucket (converted with no
    prior touch). v(S) = number of converted users whose pre-purchase
    touch set ⊆ S (∅ ⊆ S always, so direct conversions cancel in every
    marginal and surface only in the 'direct' row). With |C| = 3 the
    permutation weights are 2/6, 1/6, 1/6, 2/6 by coalition size —
    φ is carried ×6 (phi_q6) so it stays integer and
    Σ_channels phi_q6 = 6·(v(C) − v(∅)) exactly; share_ppm divides by
    6·v(C). The bitmask subset lattice has 8 coalitions — the whole
    Shapley computation is an 8×8 bounded join, independent of user
    count.

    Scale shape: one scan, one (user) groupBy with a conditional min
    + bitmask agg, an 8-row mask table, an 8×8 subset join.

    r16 optimization (guide §2.3/§2.4 — aggregate before you shuffle,
    remove shuffles outright): the original plan scanned events twice
    and paid three user-keyed shuffles (per_user groupBy; events ⋈
    per_user + touches groupBy; per_user ⋈ touches). "Channel i was
    touched before conversion" ≡ "min event ts of channel i < min
    purchase ts", so ONE groupBy computes the conversion ts and every
    channel's first-touch ts together; the mask is row-local
    arithmetic on that single aggregate. Same v(S) counts bit-exactly
    (strict < preserved; users with no channel-i events yield NULL min
    → bit 0, exactly the old left-join coalesce). Isolated sf0.1
    noop-sink median: 10.4 s → one-scan plan (see OPTIMIZATION_r16.md
    for the after number); 2 scans + 3 fact shuffles → 1 scan +
    1 shuffle."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    per_user = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("conv_ts"),
        *[
            F.min(
                F.when(F.col("event_type") == ch, F.col("ts_us"))
            ).alias(f"first_{i}")
            for i, ch in enumerate(SHAPLEY_CHANNELS)
        ],
    )
    masks = (
        per_user.filter(F.col("conv_ts").isNotNull())
        .select(
            sum(
                F.when(
                    F.col(f"first_{i}") < F.col("conv_ts"), F.lit(1 << i)
                ).otherwise(F.lit(0))
                for i in range(len(SHAPLEY_CHANNELS))
            ).alias("mask")
        )
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # r16 (guide §2.1/§5): everything below the masks aggregate is the
    # 8-coalition lattice — model-state sized at ANY corpus scale — yet
    # it used to cost more than the fact scan: coal (spark.range → 32
    # partitions) ⋈ masks planned as a 32×32-task join, and at sf0.1 the
    # chan × v cross join's size ESTIMATE crossed the broadcast
    # threshold, silently degrading BroadcastNestedLoopJoin →
    # CartesianProduct (1024 near-empty tasks, pure scheduler overhead —
    # and the exact plan shape the no-cartesian contract exists to ban;
    # the sf0.001 contract run planned BNL, so only the bench SF hit
    # it). Single-partition pins + explicit broadcast hints make every
    # lattice stage one task and the plan SF-independent.
    coal = spark.range(0, 8).coalesce(1).select(F.col("id").alias("s"))
    v = (
        coal.join(F.broadcast(masks), F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    # per channel i: phi6 = sum over S not containing i of
    # w(|S|) * (v(S|i) - v(S)), w = [2, 1, 1, 2][|S|] (x6 weights)
    # (chan is built from spark.range + element_at, not
    # createDataFrame(list): a Python-built local frame plants a
    # PythonRDD leaf that every job below re-evaluates through a Python
    # worker round-trip — guide §4's boundary cost on a 3-row table)
    chan = (
        spark.range(0, len(SHAPLEY_CHANNELS))
        .coalesce(1)
        .select(
            F.col("id").alias("i"),
            F.element_at(
                F.array(*[F.lit(ch) for ch in SHAPLEY_CHANNELS]),
                (F.col("id") + 1).cast("int"),
            ).alias("channel"),
        )
    )
    marg = (
        chan.crossJoin(
            F.broadcast(
                v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
            )
        )
        .filter(F.expr("(s0 & (1 << i)) = 0"))
        .join(
            F.broadcast(
                v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
            ),
            F.expr("s1 = (s0 | (1 << i))"),
        )
        .withColumn(
            "wgt",
            F.expr("CASE bit_count(s0) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END"),
        )
        .groupBy("channel")
        .agg(F.sum(F.expr("wgt * (v1 - v0)")).alias("phi_q6"))
    )
    vtot = v.filter(F.col("s") == 7).select(
        F.col("v").alias("vc")
    )
    vempty = v.filter(F.col("s") == 0).select(F.col("v").alias("v0"))
    rows = marg.unionByName(
        vempty.select(
            F.lit("direct").alias("channel"),
            (F.col("v0") * 6).cast("long").alias("phi_q6"),
        )
    )
    return (
        rows.crossJoin(F.broadcast(vtot))
        .select(
            "channel",
            F.col("phi_q6").cast("long"),
            F.expr("phi_q6 * 1000000 div greatest(6 * vc, 1)")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("channel")
    )


def _shapley_sql() -> str:
    has_cols = ", ".join(
        f"MAX(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END) AS has_{i}"
        for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    mask_expr = " + ".join(
        f"COALESCE(t.has_{i}, 0) * {1 << i}"
        for i in range(len(SHAPLEY_CHANNELS))
    )
    chan_rows = ", ".join(
        f"({i}, '{ch}')" for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    return f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS conv_ts
  FROM events GROUP BY user_id
),
touches AS (
  SELECT e.user_id, {has_cols}
  FROM events e JOIN per_user p ON p.user_id = e.user_id
  WHERE p.conv_ts IS NOT NULL AND epoch_us(e.ts) < p.conv_ts
  GROUP BY e.user_id
),
masks AS (
  SELECT {mask_expr} AS mask, COUNT(*) AS n
  FROM per_user p LEFT JOIN touches t ON t.user_id = p.user_id
  WHERE p.conv_ts IS NOT NULL
  GROUP BY 1
),
coal AS (SELECT unnest(range(8)) AS s),
v AS (
  SELECT s, COALESCE(SUM(n), 0) AS v
  FROM coal LEFT JOIN masks ON (mask & s) = mask
  GROUP BY s
),
chan AS (SELECT * FROM (VALUES {chan_rows}) AS c(i, channel)),
marg AS (
  SELECT c.channel,
         SUM((CASE bit_count(v0.s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
             * (v1.v - v0.v)) AS phi_q6
  FROM chan c
  JOIN v v0 ON (v0.s & (1 << c.i)) = 0
  JOIN v v1 ON v1.s = (v0.s | (1 << c.i))
  GROUP BY c.channel
),
rows_ AS (
  SELECT channel, phi_q6 FROM marg
  UNION ALL
  SELECT 'direct', (SELECT v * 6 FROM v WHERE s = 0)
)
SELECT channel, CAST(phi_q6 AS BIGINT) AS phi_q6,
       CAST(phi_q6 * 1000000
            // GREATEST(6 * (SELECT v FROM v WHERE s = 7), 1) AS BIGINT)
         AS share_ppm
FROM rows_
ORDER BY channel
"""


SHAPLEY_SQL = _shapley_sql()


# ---------------------------------------------------------------------------
# Simpson's-paradox reversal scan
# ---------------------------------------------------------------------------


def simpsons_reversal_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stratum, n_rows, cov_sign, pooled_sign, reversal_flag): the
    aggregation audit — the sign of the (discount, quantity)
    association per return-flag stratum vs pooled, via the exact integer
    cross-covariance n·Σxy − Σx·Σy (discount in integer percent,
    quantity in units; sign only, so no normalization needed — Pearson
    shares the covariance's sign). reversal_flag marks strata whose
    association OPPOSES the pooled one while both are non-zero:
    Simpson's paradox, the reason a pooled correlation is never
    trusted before a stratified scan. Int64 headroom: n·Σxy grows as
    n²·5e3 — exact to n ≈ 4e7 rows per stratum; past that, center x,y
    on their global integer means first (documented rescale).

    Scale shape: one scan, one ≤|returnflags| groupBy, broadcast pooled
    moments. Trivially scan-bound."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_returnflag").alias("stratum"),
        F.expr("CAST(floor(l_discount * 100) AS LONG)").alias("x"),
        F.expr("CAST(l_quantity AS LONG)").alias("y"),
    )
    per = li.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    pooled = per.agg(
        F.sum("n").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
    )
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "stratum",
            F.col("n").cast("long").alias("n_rows"),
            F.expr("CAST(sign(n * sxy - sx * sy) AS BIGINT)").alias(
                "cov_sign"
            ),
            F.expr("CAST(sign(pn * psxy - psx * psy) AS BIGINT)").alias(
                "pooled_sign"
            ),
        )
        .withColumn(
            "reversal_flag",
            (F.col("cov_sign") * F.col("pooled_sign")) < 0,
        )
        .orderBy("stratum")
    )


SIMPSONS_SQL = """
WITH li AS (
  SELECT l_returnflag AS stratum,
         CAST(floor(l_discount * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
per AS (
  SELECT stratum, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy
  FROM li GROUP BY stratum
),
pooled AS (
  SELECT SUM(n) AS pn, SUM(sx) AS psx, SUM(sy) AS psy, SUM(sxy) AS psxy
  FROM per
)
SELECT stratum, CAST(n AS BIGINT) AS n_rows,
       CAST(SIGN(n * sxy - sx * sy) AS BIGINT) AS cov_sign,
       CAST(SIGN(pn * psxy - psx * psy) AS BIGINT) AS pooled_sign,
       (SIGN(n * sxy - sx * sy) * SIGN(pn * psxy - psx * psy)) < 0
         AS reversal_flag
FROM per CROSS JOIN pooled
ORDER BY stratum
"""
