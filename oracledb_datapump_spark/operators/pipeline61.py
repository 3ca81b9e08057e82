"""Batch 61: distribution drift (KS), embedding isotropy, UCB1
allocation, submodular greedy coverage selection.

- ``ks_two_sample_drift`` — the exact two-sample Kolmogorov–Smirnov
  distance between the first-half and second-half value distribution of
  each event type, kept integer by cross-multiplying the two empirical
  CDFs (D·n1·n2 = max |F1·n2 − F2·n1|). PSI (batch 60) covers the
  CATEGORICAL mix shift; KS is its continuous-distribution partner —
  the classic "did the metric's shape move" test, with the 5%
  critical value 1.3581·√((n1+n2)/(n1·n2)) carried as an integer ppm.
- ``embedding_isotropy_report`` — per-label mean pairwise cosine via
  the ‖Σu‖² identity: Σ_{i≠j} u_i·u_j = ‖Σ_i u_i‖² − Σ_i ‖u_i‖², so
  the all-pairs average needs ONE pass and a |dims|-row aggregate, no
  pair join at any scale. High mean cosine = anisotropic cone
  (Ethayarajh 2019's contextual-embedding finding); the dominant-axis
  share names the cone's direction.
- ``ucb_allocation_plan`` — UCB1 (Auer et al. 2002) allocation order
  over event-type arms: mean reward + √(2·log₂N / n_i) exploration
  bonus, log₂ via the repo's bitlen surrogate (documented ~1.44× the
  textbook ln form — a constant factor shared by every arm, so the
  ORDER is the textbook order).
- ``greedy_coverage_select`` — the submodular maximum-coverage greedy
  (Nemhauser et al. 1978, the (1−1/e) guarantee): pick
  {COVERAGE_STEPS} documents that together cover the most distinct
  3-word shingles, re-scoring marginal gain each step. The data-
  selection primitive behind facility-location corpus subsetting; the
  oracle unrolls the greedy as a {COVERAGE_STEPS}-step CTE chain.

All four stay in integer arithmetic end-to-end for the cross-engine
hash. Reference scope note: the reference engine (oracledb_datapump)
ships data movement only; these extend the analytics surface the way
SURVEY §2.9-2.10 prescribes for pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import SQL_SHINGLES_CTE, _shingles
from ..functions.local_table import values_df

DAY_US = 86_400_000_000
#: c(α=0.05)² · 1e6 for the KS critical value — 1.358102² = 1.844441.
KS_CRIT_Q = 1_844_441
#: embedding component quantization (|x| ≤ 0.6 in the fixture → ≤ 6e3).
ISO_QUANT = 10_000
#: unit-vector component scale after norm division (dot scale = 1e10).
ISO_UNIT = 100_000
#: reward threshold for the UCB arms: value ≥ $50.00 (≈ p60 of the
#: fixture's value mix) is a "win".
UCB_REWARD_CENTS = 5_000
#: greedy coverage steps (k of the (1−1/e)-approximate max-coverage).
COVERAGE_STEPS = 5


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift
# ---------------------------------------------------------------------------


def ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_ref, n_cur, d_cross, ks_ppm, crit_ppm,
    drift_flag): exact two-sample KS per event type between the
    reference era (first half of the observed day range — batch 60's
    self-calibrating split) and the current era. Values are
    cent-quantized; both CDFs ride ONE cumulative window over the
    per-(type, value) count table, and the statistic is the integer
    cross-multiplied form

        d_cross = max_v |F_ref(v)·n_cur − F_cur(v)·n_ref|

    so ks_ppm = d_cross·1e6 div (n_ref·n_cur) is the exact D in ppm.
    crit_ppm is the 5% rejection boundary 1.3581·√((n1+n2)/(n1·n2)) as
    isqrt(((n1+n2)·1e6 div max(n1,n2)) · {KS_CRIT_Q} div min(n1,n2)).
    Dividing by the LARGER arm first pins the first quotient into
    [1e6, 2e6] (relative quantization < 1e-6) and the running product
    below 2·{KS_CRIT_Q}·1e6 < 4e12, so the staged form is int64-safe
    AND keeps sub-ppm precision out to trillion-row arms — unlike a
    (n1+n2)·1e6 div (n1·n2) inner quotient, which collapses to 0-2 as
    the arms grow (0 at n=1e9, flagging drift for any nonzero D), or
    the naive product {KS_CRIT_Q}·(n1+n2)·1e6, which overflows past
    n≈5e6.

    Scale shape: one scan, one groupBy(type, value) — cardinality
    bounded by distinct cent values per type — one window per type over
    that aggregate, one max. No pair joins, no collect."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS LONG)").alias("v"),
        F.expr(f"ts_us div {DAY_US}").alias("day_idx"),
    )
    bounds = e.agg(
        F.expr("(min(day_idx) + max(day_idx) + 1) div 2").alias("mid")
    )
    cell = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", "v")
        .agg(
            F.sum((F.col("day_idx") < F.col("mid")).cast("long")).alias("c1"),
            F.sum((F.col("day_idx") >= F.col("mid")).cast("long")).alias("c2"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.select(
        "event_type",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("c1").alias("n_ref"), F.sum("c2").alias("n_cur")
    )
    d = (
        cum.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(
            F.max(
                F.abs(F.col("f1") * F.col("n_cur") - F.col("f2") * F.col("n_ref"))
            ).alias("d_cross")
        )
    )
    return (
        d.select(
            "event_type",
            F.col("n_ref").cast("long"),
            F.col("n_cur").cast("long"),
            F.col("d_cross").cast("long"),
            F.expr("d_cross * 1000000 div (n_ref * n_cur)")
            .cast("long")
            .alias("ks_ppm"),
            F.expr(
                "CAST(FLOOR(SQRT(CAST("
                "(n_ref + n_cur) * 1000000 div greatest(n_ref, n_cur) "
                f"* {KS_CRIT_Q} div least(n_ref, n_cur) "
                "AS DOUBLE))) AS BIGINT)"
            ).alias("crit_ppm"),
        )
        .withColumn("drift_flag", F.col("ks_ppm") > F.col("crit_ppm"))
        .orderBy("event_type")
    )


KS_TWO_SAMPLE_SQL = f"""
WITH e AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v,
         epoch_us(ts) // {DAY_US} AS day_idx
  FROM events
),
bounds AS (SELECT (MIN(day_idx) + MAX(day_idx) + 1) // 2 AS mid FROM e),
cell AS (
  SELECT event_type, v,
         SUM(CASE WHEN day_idx < mid THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN day_idx >= mid THEN 1 ELSE 0 END) AS c2
  FROM e CROSS JOIN bounds GROUP BY event_type, v
),
cum AS (
  SELECT event_type,
         SUM(c1) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS f1,
         SUM(c2) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS f2
  FROM cell
),
tot AS (
  SELECT event_type, SUM(c1) AS n_ref, SUM(c2) AS n_cur
  FROM cell GROUP BY event_type
),
d AS (
  SELECT c.event_type, t.n_ref, t.n_cur,
         MAX(ABS(c.f1 * t.n_cur - c.f2 * t.n_ref)) AS d_cross
  FROM cum c JOIN tot t ON t.event_type = c.event_type
  GROUP BY c.event_type, t.n_ref, t.n_cur
)
SELECT event_type, CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       CAST(d_cross AS BIGINT) AS d_cross,
       CAST(d_cross * 1000000 // (n_ref * n_cur) AS BIGINT) AS ks_ppm,
       CAST(FLOOR(SQRT(CAST(
            (n_ref + n_cur) * 1000000 // greatest(n_ref, n_cur)
            * {KS_CRIT_Q} // least(n_ref, n_cur)
            AS DOUBLE))) AS BIGINT) AS crit_ppm,
       d_cross * 1000000 // (n_ref * n_cur) >
         CAST(FLOOR(SQRT(CAST(
              (n_ref + n_cur) * 1000000 // greatest(n_ref, n_cur)
              * {KS_CRIT_Q} // least(n_ref, n_cur)
              AS DOUBLE))) AS BIGINT) AS drift_flag
FROM d
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Embedding isotropy via the ‖Σu‖² identity
# ---------------------------------------------------------------------------


def embedding_isotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_vecs, mean_pair_cos_ppm, dominant_dim,
    dominant_share_ppm): per-label anisotropy of the embedding space.
    Components quantize at {ISO_QUANT}, each vector integer-normalizes
    to scale {ISO_UNIT} (x·{ISO_UNIT} div (isqrt(Σx²)+1) — pipeline42's
    guarded integer cosine), then

        Σ_{{i≠j}} u_i·u_j = ‖Σ_i u_i‖² − Σ_i ‖u_i‖²

    turns the n² pairwise-cosine average into one per-dim sum table
    (|dims| rows) plus one self-dot aggregate — the reason this runs at
    ANY n without a pair join. mean_pair_cos_ppm uses the shared
    sign·(|num| div d) form so truncation agrees across engines on
    near-zero (isotropic) numerators. dominant_dim = argmax |Σ_i u_id|
    (ties → smaller dim) and its share of Σ_d |S_d| names the cone
    axis when the space is anisotropic.

    Scale shape: one posexplode (row-local), one (label, dim) groupBy
    (≤ labels·dims rows), one label groupBy. Int64 headroom: |S_d| ≤
    n·{ISO_UNIT}, so Σ_d S_d² needs n ≤ ~3e9 per label at 64 dims —
    past that, drop ISO_UNIT one decade per 100× n (posture documented,
    the identity itself is exact at any scale)."""
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.expr(
            f"transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {ISO_QUANT}) AS BIGINT))"
        ).alias("q"),
    )
    unit = vecs.select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x * x)"
        ).alias("na"),
        "q",
    ).select(
        "vec_id",
        "label",
        F.expr(
            f"transform(q, x -> x * {ISO_UNIT} div "
            "(CAST(FLOOR(SQRT(CAST(na AS DOUBLE))) AS BIGINT) + 1))"
        ).alias("u"),
    )
    comp = unit.select(
        "label", F.posexplode("u").alias("dim", "ux")
    )
    per_dim = comp.groupBy("label", "dim").agg(
        F.sum("ux").alias("s"), F.sum(F.col("ux") * F.col("ux")).alias("self_d")
    )
    dom = Window.partitionBy("label").orderBy(
        F.desc(F.abs(F.col("s"))), F.asc("dim")
    )
    ranked = per_dim.withColumn("rnk", F.row_number().over(dom))
    agg = ranked.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("sumsq"),
        F.sum("self_d").alias("selfdot"),
        F.sum(F.abs(F.col("s"))).alias("abs_s_tot"),
        F.max(F.when(F.col("rnk") == 1, F.col("dim"))).alias("dominant_dim"),
        F.max(F.when(F.col("rnk") == 1, F.abs(F.col("s")))).alias("dom_s"),
    )
    n_by = vecs.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        agg.join(F.broadcast(n_by), "label")
        .select(
            "label",
            F.col("n_vecs").cast("long"),
            F.expr(
                "CAST(sign(sumsq - selfdot) AS BIGINT) * "
                "(abs(sumsq - selfdot) div (n_vecs * (n_vecs - 1)) div 10000)"
            )
            .cast("long")
            .alias("mean_pair_cos_ppm"),
            F.col("dominant_dim").cast("long"),
            F.expr("dom_s * 1000000 div greatest(abs_s_tot, 1)")
            .cast("long")
            .alias("dominant_share_ppm"),
        )
        .orderBy("label")
    )


EMBEDDING_ISOTROPY_SQL = f"""
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {ISO_QUANT}) AS BIGINT)) AS qv
  FROM embeddings
),
normed AS (
  SELECT vec_id, label,
         list_transform(qv, x -> x * {ISO_UNIT} //
           (CAST(FLOOR(SQRT(CAST(
              list_aggregate(list_transform(qv, y -> y * y), 'sum')
            AS DOUBLE))) AS BIGINT) + 1)) AS u
  FROM q
),
comp AS (
  SELECT label, generate_subscripts(u, 1) - 1 AS dim, unnest(u) AS ux
  FROM normed
),
per_dim AS (
  SELECT label, dim, SUM(ux) AS s, SUM(ux * ux) AS self_d
  FROM comp GROUP BY label, dim
),
ranked AS (
  SELECT label, dim, s, self_d,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY ABS(s) DESC, dim) AS rnk
  FROM per_dim
),
agg AS (
  SELECT label, SUM(s * s) AS sumsq, SUM(self_d) AS selfdot,
         SUM(ABS(s)) AS abs_s_tot,
         MAX(CASE WHEN rnk = 1 THEN dim END) AS dominant_dim,
         MAX(CASE WHEN rnk = 1 THEN ABS(s) END) AS dom_s
  FROM ranked GROUP BY label
),
n_by AS (SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs
         FROM embeddings GROUP BY label)
SELECT a.label, CAST(n.n_vecs AS BIGINT) AS n_vecs,
       CAST(CASE WHEN a.sumsq >= a.selfdot THEN 1 ELSE -1 END
            * (ABS(a.sumsq - a.selfdot)
               // (n.n_vecs * (n.n_vecs - 1)) // 10000)
            AS BIGINT) AS mean_pair_cos_ppm,
       CAST(a.dominant_dim AS BIGINT) AS dominant_dim,
       CAST(a.dom_s * 1000000 // GREATEST(a.abs_s_tot, 1) AS BIGINT)
         AS dominant_share_ppm
FROM agg a JOIN n_by n ON n.label = a.label
ORDER BY a.label
"""


# ---------------------------------------------------------------------------
# UCB1 allocation plan
# ---------------------------------------------------------------------------


def ucb_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, n_trials, wins, mean_ppm, bonus_ppm, ucb_ppm, alloc_rank):
    UCB1 over event-type arms — each event is a pull, a value of
    ≥ {UCB_REWARD_CENTS} cents is a win. Score = empirical mean (ppm)
    + isqrt(2·(bitlen(N)−1)·1e12 div n_i): the √(2·log₂N/n_i)
    exploration bonus with log₂ via the repo's bitlen surrogate
    (~1.44× the textbook ln bonus — one shared constant, so the
    allocation ORDER equals the textbook order whenever means differ
    by more than the scaling gap, and ties stay deterministic).
    alloc_rank is the explore-next order the bandit would pull.

    Scale shape: one scan, one ≤|types| groupBy, broadcast total.
    Every quantity fits int64 to n ~ 9e12 pulls."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        F.col("event_type").alias("arm"),
        (F.expr("CAST(floor(value * 100) AS LONG)") >= UCB_REWARD_CENTS)
        .cast("long")
        .alias("win"),
    )
    arms = e.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_trials"), F.sum("win").alias("wins")
    )
    tot = arms.agg(F.sum("n_trials").alias("nn"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        F.col("n_trials").cast("long"),
        F.col("wins").cast("long"),
        F.expr("wins * 1000000 div n_trials").cast("long").alias("mean_ppm"),
        F.expr(
            "CAST(FLOOR(SQRT(CAST("
            "2 * (CAST(length(bin(nn)) AS BIGINT) - 1) * 1000000000000 "
            "div n_trials AS DOUBLE))) AS BIGINT)"
        ).alias("bonus_ppm"),
    )
    rnk = Window.orderBy(
        F.desc(F.col("mean_ppm") + F.col("bonus_ppm")), F.asc("arm")
    )
    return (
        scored.withColumn(
            "ucb_ppm", (F.col("mean_ppm") + F.col("bonus_ppm")).cast("long")
        )
        .withColumn("alloc_rank", F.row_number().over(rnk).cast("long"))
        .orderBy("alloc_rank")
    )


UCB_ALLOCATION_SQL = f"""
WITH e AS (
  SELECT event_type AS arm,
         CASE WHEN CAST(floor(value * 100) AS BIGINT)
                   >= {UCB_REWARD_CENTS} THEN 1 ELSE 0 END AS win
  FROM events
),
arms AS (
  SELECT arm, COUNT(*) AS n_trials, SUM(win) AS wins FROM e GROUP BY arm
),
tot AS (SELECT SUM(n_trials) AS nn FROM arms),
scored AS (
  SELECT arm, CAST(n_trials AS BIGINT) AS n_trials,
         CAST(wins AS BIGINT) AS wins,
         CAST(wins * 1000000 // n_trials AS BIGINT) AS mean_ppm,
         CAST(FLOOR(SQRT(CAST(
           2 * (CAST(length(bin(nn)) AS BIGINT) - 1) * 1000000000000
           // n_trials AS DOUBLE))) AS BIGINT) AS bonus_ppm
  FROM arms CROSS JOIN tot
)
SELECT arm, n_trials, wins, mean_ppm, bonus_ppm,
       mean_ppm + bonus_ppm AS ucb_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY mean_ppm + bonus_ppm DESC, arm)
            AS BIGINT) AS alloc_rank
FROM scored
ORDER BY alloc_rank
"""


# ---------------------------------------------------------------------------
# Greedy maximum-coverage document selection
# ---------------------------------------------------------------------------


def greedy_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, doc_id, gain, covered_cum): {COVERAGE_STEPS} rounds of the
    submodular max-coverage greedy over distinct 3-word shingles — each
    round scores every document by its MARGINAL gain (shingles not yet
    covered by the picks so far), takes the argmax (ties → smaller
    doc_id), and folds its shingles into the covered set. The
    facility-location/data-subset-selection primitive with the
    (1−1/e) guarantee; ``covered_cum`` is the running universe covered.

    Scale shape: the shingle table builds once (row-local transform,
    batch-shared with dedup) and localCheckpoints; each round is one
    shuffle-free broadcast anti-join against the covered set (bounded:
    ≤ steps·shingles-per-doc rows — model-state, not data-sized) plus
    one groupBy(doc_id). k rounds = k bounded passes, never a pair
    join; the only collect is the 1-row argmax per round.

    r16 optimization (guide §5 — materialize only what is reused; §2.4):
    the loop used to localCheckpoint the ENTIRE remaining shingle table
    every round (k full materializations of a fact-sized frame whose
    only purpose was to carry the shrinking set forward). The covered
    set is model-state (≤ steps·shingles-per-doc), so each round now
    anti-joins the ONE checkpointed base table against a broadcast of
    the accumulated covered shingles instead — identical remaining set,
    zero per-round materialization, lineage depth constant at one
    broadcast anti-join."""
    sh = _shingles(spark, sf_dir).localCheckpoint(eager=True)
    covered: list[str] = []
    chosen: list[tuple[int, int, int, int]] = []
    for step in range(1, COVERAGE_STEPS + 1):
        if covered:
            cov_df = values_df(spark,
                [(s,) for s in covered], "shingle string"
            )
            remaining = sh.join(F.broadcast(cov_df), "shingle", "left_anti")
        else:
            remaining = sh
        gains = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )
        if not gains:
            break
        doc_id, gain = int(gains[0]["doc_id"]), int(gains[0]["gain"])
        new_sh = [
            r["shingle"]
            for r in remaining.filter(F.col("doc_id") == doc_id)
            .select("shingle")
            .collect()
        ]
        covered.extend(new_sh)
        chosen.append((step, doc_id, gain, len(covered)))
    return values_df(spark,
        chosen, "step long, doc_id long, gain long, covered_cum long"
    ).orderBy("step")


def _greedy_coverage_sql() -> str:
    """Unrolled {COVERAGE_STEPS}-step greedy as a CTE chain: r{{k}} is
    the uncovered shingle table entering step k, s{{k}} the argmax pick,
    cov{{k}} the cumulative covered set."""
    parts = [f"WITH {SQL_SHINGLES_CTE.strip()}", "r1 AS (SELECT * FROM shingles)"]
    sel = []
    for k in range(1, COVERAGE_STEPS + 1):
        parts.append(
            f"""s{k} AS (
  SELECT doc_id, COUNT(*) AS gain FROM r{k}
  GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1
)"""
        )
        prev = (
            f"SELECT shingle FROM cov{k - 1} UNION " if k > 1 else ""
        )
        parts.append(
            f"""cov{k} AS MATERIALIZED (
  {prev}SELECT DISTINCT shingle FROM shingles
  WHERE doc_id IN (SELECT doc_id FROM s{k})
)"""
        )
        if k < COVERAGE_STEPS:
            parts.append(
                f"""r{k + 1} AS (
  SELECT * FROM r{k}
  WHERE shingle NOT IN (SELECT shingle FROM cov{k})
)"""
            )
        sel.append(
            f"SELECT {k} AS step, CAST(doc_id AS BIGINT) AS doc_id, "
            f"CAST(gain AS BIGINT) AS gain, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM cov{k}) AS covered_cum "
            f"FROM s{k}"
        )

    union = "\nUNION ALL\n".join(sel)
    return ",\n".join(parts) + f"\nSELECT CAST(step AS BIGINT) AS step, doc_id, gain, covered_cum FROM (\n{union}\n)\nORDER BY step"


GREEDY_COVERAGE_SQL = _greedy_coverage_sql()
