"""Batch 65: difference-in-differences, cumulative gains/AUC,
consistent-hashing movement audit.

- ``did_estimate`` — the difference-in-differences estimator over
  hash-assigned arms × timeline halves (Card–Krueger's design):
  DiD = (B_post − B_pre) − (A_post − A_pre) of the mean event value,
  PLUS the placebo DiD on the two pre-period quarters — the
  parallel-trends check that separates a real effect from drift. The
  causal companion to the CUPED/QTE/Wilson experimentation family.
- ``cumulative_gains_auc`` — the campaign-targeting gains chart:
  users ranked by activity (non-purchase event count), outcome = user
  is a top-30% spender (purchase total above the exact 70th
  percentile); per descending-score decile the cumulative capture of
  positives, per-decile lift, and the exact trapezoid AUC of the
  gains curve. The model-eval readout (CAP curve / accuracy ratio)
  credit scoring and marketing run before deploying any ranker.
- ``consistent_hash_movement`` — the hash-ring resharding audit: keys
  placed on an md5 ring with {CH_VNODES} virtual nodes per shard; what
  fraction of keys MOVES when {CH_SHARDS_A} shards become
  {CH_SHARDS_B}, vs the same resize under naive mod-N placement.
  Consistent hashing's ~1/(N+1) movement against mod-N's ~N/(N+1) is
  the entire point of the technique (Karger et al. 1997) — here
  measured exactly, plus the max-shard-load balance both before and
  after.

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat
from ..functions.text import hash64, sql_hash64

DAY_US = 86_400_000_000
#: consistent-hash ring geometry.
CH_SHARDS_A = 8
CH_SHARDS_B = 9
CH_VNODES = 16


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------


def did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, pre_mean_q, post_mean_q, delta_q, did_q, placebo_q): DiD of
    the mean event value (milli-cents) between hash arms across the
    timeline midpoint, with the placebo DiD computed the same way on
    the two pre-period quarters. did_q/placebo_q repeat on both rows
    (the shared verdict). A |placebo| comparable to |did| means the
    arms were NOT on parallel trends and the DiD is uninterpretable —
    the check is the deliverable as much as the estimate.

    Scale shape: one scan, one 2-row groupBy with conditional sums, a
    2×2 self-join. Mean_q = Σcents·1000 div n keeps everything integer
    (int64-safe to ~9e15 total cents per cell)."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        F.pmod(
            hash64(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
            F.lit(2),
        ).alias("arm"),
        F.expr("CAST(floor(value * 100) AS LONG)").alias("cents"),
        F.expr(f"ts_us div {DAY_US}").alias("day"),
    )
    bounds = e.agg(
        F.min("day").alias("d0"),
        F.expr("(min(day) + max(day) + 1) div 2").alias("mid"),
    ).withColumn("pmid", F.expr("(d0 + mid) div 2"))
    cells = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("arm")
        .agg(
            F.expr(
                "sum(CASE WHEN day < mid THEN cents ELSE 0 END) * 1000 div "
                "sum(CASE WHEN day < mid THEN 1 ELSE 0 END)"
            ).alias("pre_mean_q"),
            F.expr(
                "sum(CASE WHEN day >= mid THEN cents ELSE 0 END) * 1000 div "
                "sum(CASE WHEN day >= mid THEN 1 ELSE 0 END)"
            ).alias("post_mean_q"),
            F.expr(
                "sum(CASE WHEN day < pmid THEN cents ELSE 0 END) * 1000 div "
                "sum(CASE WHEN day < pmid THEN 1 ELSE 0 END)"
            ).alias("pre1_mean_q"),
            F.expr(
                "sum(CASE WHEN day >= pmid AND day < mid THEN cents ELSE 0 "
                "END) * 1000 div "
                "sum(CASE WHEN day >= pmid AND day < mid THEN 1 ELSE 0 END)"
            ).alias("pre2_mean_q"),
        )
        .withColumn("delta_q", F.col("post_mean_q") - F.col("pre_mean_q"))
        .withColumn("pdelta_q", F.col("pre2_mean_q") - F.col("pre1_mean_q"))
    )
    other = cells.select(
        (1 - F.col("arm")).alias("arm"),
        F.col("delta_q").alias("o_delta_q"),
        F.col("pdelta_q").alias("o_pdelta_q"),
    )
    return (
        cells.join(other, "arm")
        .select(
            F.col("arm").cast("long"),
            F.col("pre_mean_q").cast("long"),
            F.col("post_mean_q").cast("long"),
            F.col("delta_q").cast("long"),
            # signed so both rows agree: B(arm 1) minus A(arm 0)
            F.expr(
                "CAST(CASE WHEN arm = 1 THEN delta_q - o_delta_q "
                "ELSE o_delta_q - delta_q END AS BIGINT)"
            ).alias("did_q"),
            F.expr(
                "CAST(CASE WHEN arm = 1 THEN pdelta_q - o_pdelta_q "
                "ELSE o_pdelta_q - pdelta_q END AS BIGINT)"
            ).alias("placebo_q"),
        )
        .orderBy("arm")
    )


DID_SQL = f"""
WITH e AS (
  SELECT {sql_hash64("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) // {DAY_US} AS day
  FROM events
),
bounds AS (
  SELECT MIN(day) AS d0, (MIN(day) + MAX(day) + 1) // 2 AS mid,
         (MIN(day) + (MIN(day) + MAX(day) + 1) // 2) // 2 AS pmid
  FROM e
),
cells AS (
  SELECT arm,
         SUM(CASE WHEN day < mid THEN cents ELSE 0 END) * 1000
           // SUM(CASE WHEN day < mid THEN 1 ELSE 0 END) AS pre_mean_q,
         SUM(CASE WHEN day >= mid THEN cents ELSE 0 END) * 1000
           // SUM(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS post_mean_q,
         SUM(CASE WHEN day < pmid THEN cents ELSE 0 END) * 1000
           // SUM(CASE WHEN day < pmid THEN 1 ELSE 0 END) AS pre1_mean_q,
         SUM(CASE WHEN day >= pmid AND day < mid THEN cents ELSE 0 END)
           * 1000
           // SUM(CASE WHEN day >= pmid AND day < mid THEN 1 ELSE 0 END)
           AS pre2_mean_q
  FROM e CROSS JOIN bounds GROUP BY arm
),
deltas AS (
  SELECT arm, pre_mean_q, post_mean_q,
         post_mean_q - pre_mean_q AS delta_q,
         pre2_mean_q - pre1_mean_q AS pdelta_q
  FROM cells
)
SELECT CAST(a.arm AS BIGINT) AS arm,
       CAST(a.pre_mean_q AS BIGINT) AS pre_mean_q,
       CAST(a.post_mean_q AS BIGINT) AS post_mean_q,
       CAST(a.delta_q AS BIGINT) AS delta_q,
       CAST(CASE WHEN a.arm = 1 THEN a.delta_q - b.delta_q
            ELSE b.delta_q - a.delta_q END AS BIGINT) AS did_q,
       CAST(CASE WHEN a.arm = 1 THEN a.pdelta_q - b.pdelta_q
            ELSE b.pdelta_q - a.pdelta_q END AS BIGINT) AS placebo_q
FROM deltas a JOIN deltas b ON b.arm = 1 - a.arm
ORDER BY a.arm
"""


# ---------------------------------------------------------------------------
# Cumulative gains / AUC
# ---------------------------------------------------------------------------


def cumulative_gains_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_users, n_pos, cum_gain_ppm, lift_ppm, auc_ppm): the
    gains (CAP) chart of an engagement score predicting top-spender
    status — users rank by their NON-purchase event count desc (ties →
    user_id); outcome = the user's purchase total STRICTLY exceeds the
    exact lower 70th-percentile element (rank (n−1)·7 div 10 + 1 of
    the ascending sort — both engines pick the identical element, and
    the fixture's every-user-converts saturation is why the label is
    spend-rank, not conversion). Per decile the cumulative capture of
    positives, lift vs random, and the exact trapezoid AUC (5e5 =
    random targeting). Activity drives purchase count drives total:
    the signal is real but not the label itself.

    Scale shape: one scan, one (user) groupBy, then TWO
    range-partitioned total sorts via functions/global_order (the
    70th-percentile spend element, then the gains ranking — no
    single-partition window anywhere), a 10-row decile frame; the AUC
    is a reduce over those 10 rows."""
    from ..events_source import load_events

    base = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.col("event_type") != "purchase").cast("long")
            ).alias("score_q"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(floor(value * 100) AS LONG)"),
                ).otherwise(F.lit(0))
            ).alias("purch"),
        )
    )
    # range-partitioned global rank (functions/global_order) for the
    # 70th-percentile spend element — the helper's grand total IS
    # n_tot, and its checkpoint feeds both the threshold probe and the
    # labeled frame below (one events pass, no single-task sort).
    pranked, n_tot = with_global_order_stat(
        base, [F.col("purch"), F.col("user_id")], out="prn"
    )
    thr = pranked.filter(
        F.col("prn") == (n_tot - 1) * 7 // 10 + 1
    ).select(F.col("purch").alias("t"))
    users = pranked.crossJoin(F.broadcast(thr)).select(
        "user_id",
        "score_q",
        (F.col("purch") > F.col("t")).cast("long").alias("pos"),
    )
    # second range-partitioned total sort: the gains ranking itself
    rnk, _ = with_global_order_stat(
        users, [F.desc("score_q"), F.asc("user_id")], out="rn"
    )
    rnk = rnk.withColumn("decile", F.expr(f"(rn - 1) * 10 div {n_tot} + 1"))
    dec = rnk.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("pos").alias("n_pos")
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = dec.agg(F.sum("n_pos").alias("p"))
    cum = (
        dec.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(wc))
        .withColumn("cum_n", F.sum("n_users").over(wc))
    )
    auc = cum.agg(
        F.expr(
            "sum((2 * cum_pos - n_pos) * n_users) * 1000000 div "
            f"(2 * max(p) * {n_tot})"
        ).alias("auc_ppm")
    )
    return (
        cum.crossJoin(F.broadcast(auc))
        .select(
            F.col("decile").cast("long"),
            F.col("n_users").cast("long"),
            F.col("n_pos").cast("long"),
            F.expr("cum_pos * 1000000 div greatest(p, 1)")
            .cast("long")
            .alias("cum_gain_ppm"),
            F.expr(
                f"cum_pos * {n_tot} * 1000000 div greatest(p * cum_n, 1)"
            )
            .cast("long")
            .alias("lift_ppm"),
            F.col("auc_ppm").cast("long"),
        )
        .orderBy("decile")
    )


GAINS_AUC_SQL = """
WITH base AS (
  SELECT user_id,
         SUM(CASE WHEN event_type != 'purchase' THEN 1 ELSE 0 END)
           AS score_q,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
           AS purch
  FROM events GROUP BY user_id
),
nt AS (SELECT COUNT(*) AS n_tot FROM base),
thr AS (
  SELECT purch AS t FROM (
    SELECT purch, ROW_NUMBER() OVER (ORDER BY purch, user_id) AS prn
    FROM base
  ) WHERE prn = ((SELECT n_tot FROM nt) - 1) * 7 // 10 + 1
),
users AS (
  SELECT user_id, score_q,
         CASE WHEN purch > (SELECT t FROM thr) THEN 1 ELSE 0 END AS pos
  FROM base
),
rnk AS (
  SELECT pos,
         (ROW_NUMBER() OVER (ORDER BY score_q DESC, user_id) - 1) * 10
           // (SELECT n_tot FROM nt) + 1 AS decile
  FROM users
),
dec AS (
  SELECT decile, COUNT(*) AS n_users, SUM(pos) AS n_pos
  FROM rnk GROUP BY decile
),
tot AS (SELECT SUM(n_pos) AS p FROM dec),
cum AS (
  SELECT decile, n_users, n_pos,
         SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
           AS cum_pos,
         SUM(n_users) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
           AS cum_n
  FROM dec
),
auc AS (
  SELECT SUM((2 * cum_pos - n_pos) * n_users) * 1000000
           // (2 * (SELECT p FROM tot) * (SELECT n_tot FROM nt)) AS auc_ppm
  FROM cum
)
SELECT CAST(decile AS BIGINT) AS decile, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(cum_pos * 1000000 // GREATEST((SELECT p FROM tot), 1)
            AS BIGINT) AS cum_gain_ppm,
       CAST(cum_pos * (SELECT n_tot FROM nt) * 1000000
            // GREATEST((SELECT p FROM tot) * cum_n, 1) AS BIGINT)
         AS lift_ppm,
       CAST((SELECT auc_ppm FROM auc) AS BIGINT) AS auc_ppm
FROM cum
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Consistent-hash movement audit
# ---------------------------------------------------------------------------


def consistent_hash_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_keys, ch_moved_ppm, mod_moved_ppm, max_load_a_ppm,
    max_load_b_ppm): resize {CH_SHARDS_A} → {CH_SHARDS_B} shards under
    (a) a consistent-hash ring with {CH_VNODES} virtual nodes per
    shard and (b) naive mod-N placement, over the distinct user-id key
    set. A key's ring owner is the vnode with the smallest position ≥
    the key's position (wrapping to the ring minimum). Consistent
    hashing moves ≈ 1/{CH_SHARDS_B} of keys; mod-N moves ≈
    {CH_SHARDS_B - 1}/{CH_SHARDS_B} — this measures both EXACTLY, plus
    the max-shard-load (ppm of keys) before the resize under each ring
    (vnodes are what keep that near 1/N).

    Scale shape: the ring is a ≤{(CH_SHARDS_A + CH_SHARDS_B) * CH_VNODES}-row
    literal broadcast; each key probes it via a broadcast range join +
    min_by — one pass over distinct keys, no shuffle beyond the
    distinct. The 1-row report is a scalar reduce."""
    # both rings share vnode positions ("ring:<shard>:<v>"): ring B is
    # ring A plus one more shard's vnodes - the invariant consistent
    # hashing depends on (a re-salted ring would move EVERY key)
    rings = {}
    for tag, n_shards in (("a", CH_SHARDS_A), ("b", CH_SHARDS_B)):
        ring = (
            spark.range(n_shards)
            .select(F.col("id").alias("shard"))
            .crossJoin(
                spark.range(CH_VNODES).select(F.col("id").alias("v"))
            )
            .select(
                "shard",
                hash64(
                    F.concat(
                        F.lit("ring:"),
                        F.col("shard").cast("string"),
                        F.lit(":"),
                        F.col("v").cast("string"),
                    )
                ).alias("pos"),
            )
        )
        rings[tag] = ring.localCheckpoint(eager=True)

    keys = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            hash64(
                F.concat(F.lit("key:"), F.col("user_id").cast("string"))
            ).alias("kpos"),
        )
    )

    def assign(tag: str, out: str):
        ring = rings[tag]
        wrap = ring.orderBy("pos").limit(1).select(
            F.col("shard").alias(f"{out}_wrap")
        )
        cand = (
            keys.join(
                F.broadcast(ring), F.col("pos") >= F.col("kpos"), "left"
            )
            .groupBy("user_id", "kpos")
            .agg(F.expr("min_by(shard, pos)").alias(f"{out}_own"))
        )
        return cand.crossJoin(F.broadcast(wrap)).select(
            "user_id",
            "kpos",
            F.coalesce(F.col(f"{out}_own"), F.col(f"{out}_wrap")).alias(out),
        )

    aa = assign("a", "sa")
    bb = assign("b", "sb").select("user_id", "sb")
    both = aa.join(bb, "user_id").select(
        "user_id",
        "sa",
        "sb",
        F.expr(f"kpos % {CH_SHARDS_A}").alias("ma"),
        F.expr(f"kpos % {CH_SHARDS_B}").alias("mb"),
    ).localCheckpoint(eager=True)
    n = both.count()
    loads_a = both.groupBy("sa").count().agg(F.max("count").alias("mx"))
    loads_b = both.groupBy("sb").count().agg(F.max("count").alias("mx"))
    moved = both.agg(
        F.sum((F.col("sa") != F.col("sb")).cast("long")).alias("chm"),
        F.sum((F.col("ma") != F.col("mb")).cast("long")).alias("mdm"),
    )
    return (
        moved.crossJoin(F.broadcast(loads_a.select(F.col("mx").alias("la"))))
        .crossJoin(F.broadcast(loads_b.select(F.col("mx").alias("lb"))))
        .select(
            F.lit(n).cast("long").alias("n_keys"),
            F.expr(f"chm * 1000000 div {n}").cast("long").alias(
                "ch_moved_ppm"
            ),
            F.expr(f"mdm * 1000000 div {n}").cast("long").alias(
                "mod_moved_ppm"
            ),
            F.expr(f"la * 1000000 div {n}").cast("long").alias(
                "max_load_a_ppm"
            ),
            F.expr(f"lb * 1000000 div {n}").cast("long").alias(
                "max_load_b_ppm"
            ),
        )
    )


def _ch_sql() -> str:
    ring_pos = sql_hash64(
        "'ring:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)"
    )
    kh = sql_hash64("'key:' || CAST(user_id AS VARCHAR)")
    return f"""
WITH ringa AS (
  SELECT s.s AS shard, {ring_pos} AS pos
  FROM (SELECT unnest(range({CH_SHARDS_A})) AS s) s
  CROSS JOIN (SELECT unnest(range({CH_VNODES})) AS v) v
),
ringb AS (
  SELECT s.s AS shard, {ring_pos} AS pos
  FROM (SELECT unnest(range({CH_SHARDS_B})) AS s) s
  CROSS JOIN (SELECT unnest(range({CH_VNODES})) AS v) v
),
keys AS (
  SELECT DISTINCT user_id, {kh} AS kpos FROM events
),
asg AS (
  SELECT k.user_id, k.kpos,
         COALESCE(
           (SELECT arg_min(r.shard, r.pos) FROM ringa r
            WHERE r.pos >= k.kpos),
           (SELECT arg_min(shard, pos) FROM ringa)) AS sa,
         COALESCE(
           (SELECT arg_min(r.shard, r.pos) FROM ringb r
            WHERE r.pos >= k.kpos),
           (SELECT arg_min(shard, pos) FROM ringb)) AS sb,
         k.kpos % {CH_SHARDS_A} AS ma,
         k.kpos % {CH_SHARDS_B} AS mb
  FROM keys k
),
n AS (SELECT COUNT(*) AS n FROM asg),
la AS (SELECT MAX(c) AS mx FROM (SELECT COUNT(*) c FROM asg GROUP BY sa)),
lb AS (SELECT MAX(c) AS mx FROM (SELECT COUNT(*) c FROM asg GROUP BY sb))
SELECT CAST(n.n AS BIGINT) AS n_keys,
       CAST((SELECT SUM(CASE WHEN sa != sb THEN 1 ELSE 0 END) FROM asg)
            * 1000000 // n.n AS BIGINT) AS ch_moved_ppm,
       CAST((SELECT SUM(CASE WHEN ma != mb THEN 1 ELSE 0 END) FROM asg)
            * 1000000 // n.n AS BIGINT) AS mod_moved_ppm,
       CAST(la.mx * 1000000 // n.n AS BIGINT) AS max_load_a_ppm,
       CAST(lb.mx * 1000000 // n.n AS BIGINT) AS max_load_b_ppm
FROM n CROSS JOIN la CROSS JOIN lb
"""


CONSISTENT_HASH_SQL = _ch_sql()
