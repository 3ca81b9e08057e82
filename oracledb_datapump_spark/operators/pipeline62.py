"""Batch 62: Gini feature ranking, quantile treatment effects,
sorted-neighborhood blocking, deterministic bootstrap CI.

- ``gini_gain_feature_rank`` — the decision-stump feature ranking
  (CART's split criterion, Breiman et al. 1984): for each candidate
  categorical feature, the Gini-impurity reduction it buys on a binary
  label, exact in ppm. Gini is a RATIONAL impurity (unlike entropy),
  so the whole ranking stays integer without log surrogates — the
  feature-selection primitive of a training-data pipeline.
- ``quantile_treatment_effect`` — per-decile A/B effect (Koenker's
  quantile-regression view of an experiment): users hash into two
  arms, the per-user value deciles difference arm B − arm A at every
  decile. Means hide distributional effects; QTE is how experiment
  platforms see winsorized-tail movement.
- ``snm_candidate_pairs`` — sorted-neighborhood blocking (Hernández &
  Stolfo 1995): sort by a derived key, candidate pairs = records ≤ w
  apart; report the recall of each window offset against the
  verification-grade exact-Jaccard truth set. The third blocking
  family next to LSH banding and prefix-filtering, with its
  window-vs-recall curve.
- ``hash_bootstrap_ci`` — a deterministic bootstrap over the daily
  value series: {BOOT_B} resamples with md5-derived integer weights
  in {{0,1,2}} (the mean-1 multinomial surrogate batch 58 established
  for randomized response), exact rank quantiles of the resampled
  means as the CI. Conformal (batch 59) calibrates a predictor;
  bootstrap quantifies the METRIC's sampling noise.

All integer end-to-end under the cross-engine hash. Reference scope
note: extends the reference's analytics surface per SURVEY §2.9-2.10;
the reference engine itself ships data movement only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat
from ..functions.text import hash64, sql_hash64
from .dedup import SQL_SHINGLES_CTE, _shingles, shingle_pair_intersections
from ..functions.local_table import values_df

#: exact-Jaccard ppm threshold for the SNM truth set (dedup.py's 0.6).
SNM_TRUTH_PPM = 600_000
#: SNM sort-key length (alnum-normalized prefix).
SNM_KEY_LEN = 16
#: largest window offset reported.
SNM_MAX_W = 3
#: bootstrap resamples.
BOOT_B = 32
DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Gini-gain feature ranking
# ---------------------------------------------------------------------------


def gini_gain_feature_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(feature, n_values, parent_gini_ppm, weighted_gini_ppm, gain_ppm,
    rnk): decision-stump ranking of three categorical features
    (customer market segment, order priority, order month) for the
    binary label "order is fulfilled" (o_orderstatus = 'F'). Gini in
    ppm via the share form 1e6 − (p_ppm² + q_ppm²) div 1e6 — shares
    first, THEN squares, so every intermediate stays < 1e12 regardless
    of row count (the count-squared form overflows int64 past ~3e6 rows
    per value). gain = parent − Σ n_v·child_v div n; truncation can
    shave single digits off either side, so a mathematically-zero gain
    may print as −1 or −2 ppm — documented, not noise.

    Scale shape: one orders scan + broadcast customer dim, one stack
    (row-local), one groupBy(feature, value) — ≤ Σ|feature domains|
    rows — and a 3-row ranking window."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).selectExpr(
        "CAST(o_orderstatus = 'F' AS LONG) AS pos",
        "stack(3, 'mktsegment', c_mktsegment, "
        "'orderpriority', o_orderpriority, "
        "'month', CAST(month(o_orderdate) AS STRING)) AS (feature, val)",
    )
    cells = base.groupBy("feature", "val").agg(
        F.count(F.lit(1)).alias("n_v"), F.sum("pos").alias("pos_v")
    )
    parent = cells.groupBy("feature").agg(
        F.sum("n_v").alias("n"), F.sum("pos_v").alias("pos")
    )
    child = cells.select(
        "feature",
        "n_v",
        F.expr(
            "1000000 - ((pos_v * 1000000 div n_v) * (pos_v * 1000000 div n_v)"
            " + ((n_v - pos_v) * 1000000 div n_v) * "
            "((n_v - pos_v) * 1000000 div n_v)) div 1000000"
        ).alias("child_gini_ppm"),
    )
    per_feat = (
        child.join(F.broadcast(parent), "feature")
        .groupBy("feature", "n", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(F.col("n_v") * F.col("child_gini_ppm")).alias("wsum"),
        )
        .select(
            "feature",
            F.col("n_values").cast("long"),
            F.expr(
                "1000000 - ((pos * 1000000 div n) * (pos * 1000000 div n)"
                " + ((n - pos) * 1000000 div n) * ((n - pos) * 1000000 div n)"
                ") div 1000000"
            )
            .cast("long")
            .alias("parent_gini_ppm"),
            F.expr("wsum div n").cast("long").alias("weighted_gini_ppm"),
        )
        .withColumn(
            "gain_ppm",
            (F.col("parent_gini_ppm") - F.col("weighted_gini_ppm")).cast(
                "long"
            ),
        )
    )
    rnk = Window.orderBy(F.desc("gain_ppm"), F.asc("feature"))
    return (
        per_feat.withColumn("rnk", F.row_number().over(rnk).cast("long"))
        .orderBy("rnk")
    )


GINI_GAIN_SQL = """
WITH joined AS (
  SELECT CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         c.c_mktsegment, o.o_orderpriority,
         CAST(month(o.o_orderdate) AS VARCHAR) AS omonth
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
base AS (
  SELECT pos, 'mktsegment' AS feature, c_mktsegment AS val FROM joined
  UNION ALL
  SELECT pos, 'orderpriority', o_orderpriority FROM joined
  UNION ALL
  SELECT pos, 'month', omonth FROM joined
),
cells AS (
  SELECT feature, val, COUNT(*) AS n_v, SUM(pos) AS pos_v
  FROM base GROUP BY feature, val
),
parent AS (
  SELECT feature, SUM(n_v) AS n, SUM(pos_v) AS pos
  FROM cells GROUP BY feature
),
child AS (
  SELECT feature, n_v,
         1000000 - ((pos_v * 1000000 // n_v) * (pos_v * 1000000 // n_v)
                    + ((n_v - pos_v) * 1000000 // n_v)
                      * ((n_v - pos_v) * 1000000 // n_v)) // 1000000
           AS child_gini_ppm
  FROM cells
),
per_feat AS (
  SELECT c.feature, p.n, p.pos, COUNT(*) AS n_values,
         SUM(c.n_v * c.child_gini_ppm) AS wsum
  FROM child c JOIN parent p ON p.feature = c.feature
  GROUP BY c.feature, p.n, p.pos
)
SELECT feature, CAST(n_values AS BIGINT) AS n_values,
       CAST(1000000 - ((pos * 1000000 // n) * (pos * 1000000 // n)
            + ((n - pos) * 1000000 // n) * ((n - pos) * 1000000 // n))
            // 1000000 AS BIGINT) AS parent_gini_ppm,
       CAST(wsum // n AS BIGINT) AS weighted_gini_ppm,
       CAST((1000000 - ((pos * 1000000 // n) * (pos * 1000000 // n)
            + ((n - pos) * 1000000 // n) * ((n - pos) * 1000000 // n))
            // 1000000) - (wsum // n) AS BIGINT) AS gain_ppm,
       CAST(ROW_NUMBER() OVER (
         ORDER BY (1000000 - ((pos * 1000000 // n) * (pos * 1000000 // n)
                   + ((n - pos) * 1000000 // n) * ((n - pos) * 1000000 // n))
                   // 1000000) - (wsum // n) DESC, feature)
         AS BIGINT) AS rnk
FROM per_feat
ORDER BY rnk
"""


# ---------------------------------------------------------------------------
# Quantile treatment effect
# ---------------------------------------------------------------------------


def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_a, n_b, qa_cents, qb_cents, qte_cents): per-decile
    difference of the per-user total-value distribution between two
    hash-assigned arms (pmod(md5-hash64, 2) — srm_bucket_audit's
    assignment). Quantiles are EXACT lower quantiles: sorted ascending
    (ties → user_id), decile d is the element at row (n−1)·d div 10
    + 1 — both engines pick the identical element, no interpolation.
    qte = qb − qa per decile: the distributional view a mean-only A/B
    readout hides (a treatment that moves only the tail shows a flat
    median and a moving d9).

    Scale shape: one scan, one groupBy(user), ONE range-partitioned
    total sort over (arm, m, user_id) via
    functions/global_order.with_global_order_stat — per-arm ranks are
    the global rank minus the preceding arm's count (a 2-value
    model-state pull off the checkpointed partitioning), so no
    per-arm single-task window exists anywhere in the plan — then a
    broadcast 18-row decile-target probe."""
    from ..events_source import load_events

    users = (
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
    ranked_raw, _ = with_global_order_stat(
        users, [F.col("arm"), F.col("m"), F.col("user_id")], out="grn"
    )
    arm_counts = {
        int(r["arm"]): int(r["n"])
        for r in ranked_raw.groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # per-arm rank = global rank − count of all preceding arms (arm 0
    # sorts first under the (arm, m, user_id) total order)
    off0 = arm_counts.get(0, 0)
    ranked = ranked_raw.withColumn(
        "rn",
        F.col("grn")
        - F.when(F.col("arm") == 1, F.lit(off0)).otherwise(F.lit(0)),
    )
    targets = values_df(spark,
        [
            (a, n, d)
            for a, n in sorted(arm_counts.items())
            for d in range(1, 10)
        ],
        "arm long, n long, decile long",
    ).withColumn("idx", F.expr("(n - 1) * decile div 10 + 1"))
    picked = F.broadcast(targets).join(
        ranked,
        (targets.arm == ranked.arm) & (targets.idx == ranked.rn),
    ).select(targets.arm, "decile", "n", F.col("m").alias("q_cents"))
    a = picked.filter(F.col("arm") == 0).select(
        "decile", F.col("n").alias("n_a"), F.col("q_cents").alias("qa_cents")
    )
    b = picked.filter(F.col("arm") == 1).select(
        "decile", F.col("n").alias("n_b"), F.col("q_cents").alias("qb_cents")
    )
    return (
        a.join(b, "decile")
        .select(
            F.col("decile").cast("long"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.col("qa_cents").cast("long"),
            F.col("qb_cents").cast("long"),
            (F.col("qb_cents") - F.col("qa_cents"))
            .cast("long")
            .alias("qte_cents"),
        )
        .orderBy("decile")
    )


QTE_SQL = f"""
WITH users AS (
  SELECT user_id, SUM(CAST(floor(value * 100) AS BIGINT)) AS m,
         {sql_hash64("'qte:' || CAST(user_id AS VARCHAR)")} % 2 AS arm
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT arm, m, ROW_NUMBER() OVER (PARTITION BY arm
                                    ORDER BY m, user_id) AS rn
  FROM users
),
counts AS (SELECT arm, COUNT(*) AS n FROM users GROUP BY arm),
targets AS (
  SELECT arm, n, d.decile, (n - 1) * d.decile // 10 + 1 AS idx
  FROM counts CROSS JOIN (SELECT unnest(range(1, 10)) AS decile) d
),
picked AS (
  SELECT t.arm, t.decile, t.n, r.m AS q_cents
  FROM targets t JOIN ranked r ON r.arm = t.arm AND r.rn = t.idx
)
SELECT CAST(a.decile AS BIGINT) AS decile,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       CAST(a.q_cents AS BIGINT) AS qa_cents,
       CAST(b.q_cents AS BIGINT) AS qb_cents,
       CAST(b.q_cents - a.q_cents AS BIGINT) AS qte_cents
FROM picked a JOIN picked b ON b.decile = a.decile
WHERE a.arm = 0 AND b.arm = 1
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking
# ---------------------------------------------------------------------------


def snm_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, cand_pairs_cum, n_truth, hits_cum, recall_ppm): the
    sorted-neighborhood method's window-vs-recall curve. Records sort
    by key = first {SNM_KEY_LEN} alnum chars of the lowered text (no
    lang prefix — the fixture plants CROSS-language near-dups, and a
    lang-first key would sort those apart: the multi-pass-key lesson
    of the original SNM paper), i.e. the
    lowered text; offset-k candidates are records exactly k apart in
    that order, so the candidate VOLUME is closed-form (Σ_j≤w n−j —
    never materialized) and a truth pair is a hit at window w iff its
    two docs sit ≤ w apart. Truth = the verification-grade exact
    3-shingle Jaccard ≥ {SNM_TRUTH_PPM} ppm pairs (dedup.py's 0.6
    threshold, integer cross-multiplied) — at 100 TB the truth side
    rides the LSH-verified memo instead of the by-shared-shingle join
    (the documented guarded-quadratic posture, dedup.py:41); the SNM
    side itself is one total sort at any scale.

    Scale shape: one shingle groupBy pair join for the truth set
    (bounded by shared-shingle fan-out at test scale), one
    range-partitioned total sort for ranks, a |truth|-row gap join, a
    {SNM_MAX_W}-row output."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keyed = d.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""),
            1,
            SNM_KEY_LEN,
        ).alias("k"),
    )
    rnk, _ = with_global_order_stat(
        keyed, [F.col("k"), F.col("doc_id")], out="rn"
    )
    rnk = rnk.select("doc_id", "rn")
    n_docs = d.count()

    # r16: pin the shingle table once (sizes + the pair stage both ride
    # it — the tokenize→shingle lineage used to run once per consumer)
    # and build the pair intersections with the shared row-local
    # posting-list expansion instead of the shingle self-join.
    sh = _shingles(spark, sf_dir).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = shingle_pair_intersections(sh)
    truth = (
        inter.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))),
            "d1",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))),
            "d2",
        )
        .filter(
            F.col("inter") * 1_000_000
            >= SNM_TRUTH_PPM * (F.col("n1") + F.col("n2") - F.col("inter"))
        )
        .select("d1", "d2")
    )
    gaps = (
        truth.join(rnk.withColumnRenamed("doc_id", "d1").withColumnRenamed("rn", "r1"), "d1")
        .join(rnk.withColumnRenamed("doc_id", "d2").withColumnRenamed("rn", "r2"), "d2")
        .select(F.abs(F.col("r1") - F.col("r2")).alias("gap"))
        # r16: the gap list feeds BOTH the n_truth count and the window
        # curve — without the pin the whole truth stage (shingle pair
        # join included) executed twice
        .localCheckpoint(eager=True)
    )
    n_truth = gaps.count()
    ws = spark.range(1, SNM_MAX_W + 1).select(F.col("id").alias("w"))
    hit = ws.join(gaps, F.col("gap") <= F.col("w"), "left").groupBy("w").agg(
        F.sum(F.when(F.col("gap").isNotNull(), 1).otherwise(0)).alias(
            "hits_cum"
        )
    )
    return (
        hit.select(
            F.col("w").cast("long"),
            F.expr(f"{n_docs} * w - w * (w + 1) div 2")
            .cast("long")
            .alias("cand_pairs_cum"),
            F.lit(n_truth).cast("long").alias("n_truth"),
            F.col("hits_cum").cast("long"),
            F.expr(f"hits_cum * 1000000 div greatest({n_truth}, 1)")
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("w")
    )


SNM_CANDIDATE_SQL = f"""
WITH {SQL_SHINGLES_CTE.strip()},
keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, {SNM_KEY_LEN}) AS k
  FROM documents
),
rnk AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM keyed
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM shingles a JOIN shingles b
    ON b.shingle = a.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT i.d1, i.d2
  FROM inter i JOIN sizes s1 ON s1.doc_id = i.d1
               JOIN sizes s2 ON s2.doc_id = i.d2
  WHERE i.inter * 1000000 >= {SNM_TRUTH_PPM} * (s1.n + s2.n - i.inter)
),
gaps AS (
  SELECT ABS(r1.rn - r2.rn) AS gap
  FROM truth t JOIN rnk r1 ON r1.doc_id = t.d1
               JOIN rnk r2 ON r2.doc_id = t.d2
),
nt AS (SELECT COUNT(*) AS n_truth FROM gaps),
ws AS (SELECT unnest(range(1, {SNM_MAX_W + 1})) AS w)
SELECT CAST(ws.w AS BIGINT) AS w,
       CAST(nd.n_docs * ws.w - ws.w * (ws.w + 1) // 2 AS BIGINT)
         AS cand_pairs_cum,
       CAST(nt.n_truth AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM gaps g WHERE g.gap <= ws.w) AS BIGINT)
         AS hits_cum,
       CAST((SELECT COUNT(*) FROM gaps g WHERE g.gap <= ws.w) * 1000000
            // GREATEST(nt.n_truth, 1) AS BIGINT) AS recall_ppm
FROM ws CROSS JOIN nd CROSS JOIN nt
ORDER BY w
"""


# ---------------------------------------------------------------------------
# Deterministic bootstrap CI
# ---------------------------------------------------------------------------


def hash_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stat, value_cents): the sampling noise of "mean event value"
    quantified by a deterministic day-level bootstrap — {BOOT_B}
    resamples, each day re-weighted by pmod(md5-hash64('bs:'||b||':'||
    day), 3) ∈ {{0,1,2}} (mean-1 multinomial surrogate, batch 58's
    hash-noise convention), resampled mean = Σ w·day_total div
    Σ w·day_events. Rows: the unresampled point estimate, the bootstrap
    median (rank 16 of 32), and the ~94% percentile CI endpoints
    (ranks 2 and 31 — exact order statistics, no interpolation).

    Scale shape: one scan → |days| rows, explode ×{BOOT_B} (bounded:
    days·B), one groupBy(b), one 32-row window. Day-level resampling is
    the block bootstrap that respects within-day correlation."""
    from ..events_source import load_events

    days = (
        load_events(spark, sf_dir)
        .select(
            F.expr(f"ts_us div {DAY_US}").alias("day"),
            F.expr("CAST(floor(value * 100) AS LONG)").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("tot"), F.count(F.lit(1)).alias("cnt"))
    )
    point = days.agg(
        F.expr("sum(tot) div sum(cnt)").cast("long").alias("v")
    )
    boots = (
        days.select(
            "day",
            "tot",
            "cnt",
            F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        )
        .withColumn(
            "wt",
            F.pmod(
                hash64(
                    F.concat(
                        F.lit("bs:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("day").cast("string"),
                    )
                ),
                F.lit(3),
            ),
        )
        .groupBy("b")
        .agg(
            F.expr("sum(wt * tot) div greatest(sum(wt * cnt), 1)").alias(
                "mean_b"
            )
        )
    )
    ranked = boots.withColumn(
        "rn", F.row_number().over(Window.orderBy("mean_b", "b"))
    )
    stats = ranked.select(
        F.when(F.col("rn") == 2, "ci_lo")
        .when(F.col("rn") == BOOT_B // 2, "boot_median")
        .when(F.col("rn") == BOOT_B - 1, "ci_hi")
        .alias("stat"),
        F.col("mean_b").cast("long").alias("value_cents"),
    ).filter(F.col("stat").isNotNull())
    return (
        stats.unionByName(
            point.select(
                F.lit("point").alias("stat"), F.col("v").alias("value_cents")
            )
        )
        .orderBy("stat")
    )


HASH_BOOTSTRAP_SQL = f"""
WITH days AS (
  SELECT epoch_us(ts) // {DAY_US} AS day,
         SUM(CAST(floor(value * 100) AS BIGINT)) AS tot,
         COUNT(*) AS cnt
  FROM events GROUP BY 1
),
point AS (SELECT SUM(tot) // SUM(cnt) AS v FROM days),
boots AS (
  SELECT b.b,
         SUM(({sql_hash64("'bs:' || CAST(b.b AS VARCHAR) || ':' || CAST(day AS VARCHAR)")} % 3) * tot)
         // GREATEST(SUM(({sql_hash64("'bs:' || CAST(b.b AS VARCHAR) || ':' || CAST(day AS VARCHAR)")} % 3) * cnt), 1)
           AS mean_b
  FROM days CROSS JOIN (SELECT unnest(range({BOOT_B})) AS b) b
  GROUP BY b.b
),
ranked AS (
  SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM boots
)
SELECT stat, CAST(value_cents AS BIGINT) AS value_cents FROM (
  SELECT CASE WHEN rn = 2 THEN 'ci_lo'
              WHEN rn = {BOOT_B // 2} THEN 'boot_median'
              WHEN rn = {BOOT_B - 1} THEN 'ci_hi' END AS stat,
         mean_b AS value_cents
  FROM ranked
  WHERE rn IN (2, {BOOT_B // 2}, {BOOT_B - 1})
  UNION ALL
  SELECT 'point', v FROM point
)
ORDER BY stat
"""
