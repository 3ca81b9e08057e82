"""Batch 48: evaluation + experimentation completers — NDCG, CUPED,
power planning.

- ``retrieval_eval_ndcg`` — NDCG@k over the BM25 result (Järvelin &
  Kekäläinen 2002), the graded companion to retrieval_eval_mrr: DCG
  with the standard 1/log₂(rank+1) discount, normalized by the ideal
  DCG at the query's relevant-hit count. The irrational discounts are
  COMPILE-TIME ppm literals (rank ≤ k = 5), injected identically into
  both engines — the scurve-literal device — so the score arithmetic
  itself is pure int64.
- ``cuped_adjusted_ab`` — CUPED variance reduction (Deng, Xu, Kohavi &
  Walker 2013): per-user pre-period spend (first half of the timeline)
  as the covariate, θ = cov(x,y)/var(x) as a signed-ratio ppm from
  DECIMAL(38,0) integer moments, per-arm adjusted means
  ȳ − θ·(x̄_arm − x̄) with every signed division routed through the
  sign·(abs div) recipe both engines agree on. The experimentation
  team's standard pre-experiment-data adjustment.
- ``ab_power_plan`` — the sample-size side of the same workflow: per
  event type, the per-arm N needed to detect a 1/2/5/10% lift on the
  per-user value metric at α=0.05, power 0.8, via the classic
  n ≈ 16·σ²/δ² rule of thumb — exact integer arithmetic over the
  same per-user moments.

Scale posture: NDCG rides the BM25 top-k (|queries|·k rows) plus two
broadcast literal maps; CUPED/power are two partial-aggregated
groupBys over per-user rollups plus 1-row global broadcasts — the
user-keyed shuffle any per-user metric already pays.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64
from ..functions.local_table import values_df

# ---------------------------------------------------------------------------
# retrieval_eval_ndcg
# ---------------------------------------------------------------------------

NDCG_K = 5  # = sparse_text.BM25_TOP_K
#: 10⁶/log₂(rank+1) for rank 1..k — compile-time literals shared by both
#: engines (the irrational discounts never touch runtime float math)
DISC_PPM = {r: round(1_000_000 / math.log2(r + 1)) for r in range(1, NDCG_K + 1)}
#: ideal DCG at m relevant hits = Σ_{i≤m} disc[i]
IDCG_PPM = {
    m: sum(DISC_PPM[i] for i in range(1, m + 1)) for m in range(1, NDCG_K + 1)
}


def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_doc, n_rel_topk, dcg_ppm, ndcg_ppm): NDCG@{NDCG_K} of the
    BM25 retrieval path against the embeddings.label ground truth (the
    retrieval_eval_mrr relevance convention). dcg_ppm sums the
    rank-discount literals over relevant hits; ndcg_ppm = dcg·10⁶ div
    IDCG(n_rel) (0 when nothing relevant) — binary relevance, exact
    integers end to end.

    Plan: the BM25 result is |queries|·k rows; the label joins
    broadcast; the discount and IDCG maps are broadcast literal
    frames. Nothing scales beyond the underlying search."""
    from .emb_source import load_embeddings
    from .sparse_text import bm25_search_topk

    r = bm25_search_topk(spark, sf_dir)
    labels = load_embeddings(spark, sf_dir).select(
        F.col("vec_id"), F.col("label").cast("long").alias("label")
    )
    ql = labels.select(
        F.col("vec_id").alias("query_doc"), F.col("label").alias("q_label")
    )
    ml = labels.select(
        F.col("vec_id").alias("match_doc"), F.col("label").alias("m_label")
    )
    disc = values_df(spark,
        [(r_, d) for r_, d in sorted(DISC_PPM.items())], "rank long, disc long"
    )
    idcg = values_df(spark,
        [(m, v) for m, v in sorted(IDCG_PPM.items())],
        "n_rel_topk long, idcg long",
    )
    rel = (
        r.join(F.broadcast(ql), "query_doc")
        .join(F.broadcast(ml), "match_doc")
        .join(F.broadcast(disc), "rank")
        .select(
            "query_doc",
            (F.col("q_label") == F.col("m_label")).cast("long").alias("rel"),
            "disc",
        )
    )
    per_q = rel.groupBy("query_doc").agg(
        F.sum("rel").cast("long").alias("n_rel_topk"),
        F.sum(F.col("rel") * F.col("disc")).cast("long").alias("dcg_ppm"),
    )
    return (
        per_q.join(F.broadcast(idcg), "n_rel_topk", "left")
        .select(
            "query_doc",
            "n_rel_topk",
            "dcg_ppm",
            F.when(F.col("n_rel_topk") == 0, F.lit(0))
            .otherwise(F.expr("dcg_ppm * 1000000 div idcg"))
            .cast("long")
            .alias("ndcg_ppm"),
        )
        .orderBy("query_doc")
    )


def _ndcg_sql() -> str:
    from .sparse_text import BM25_SEARCH_SQL

    bm25 = BM25_SEARCH_SQL.replace("ORDER BY query_doc, rank", "")
    disc_vals = ", ".join(f"({r}, {d})" for r, d in sorted(DISC_PPM.items()))
    idcg_vals = ", ".join(f"({m}, {v})" for m, v in sorted(IDCG_PPM.items()))
    return f"""
WITH bm25 AS ({bm25}),
disc(rank, disc) AS (VALUES {disc_vals}),
idcg(n_rel_topk, idcg) AS (VALUES {idcg_vals}),
rel AS (
  SELECT b.query_doc,
         CAST(ql.label = ml.label AS BIGINT) AS rel, d.disc
  FROM bm25 b
  JOIN embeddings ql ON ql.vec_id = b.query_doc
  JOIN embeddings ml ON ml.vec_id = b.match_doc
  JOIN disc d ON d.rank = b.rank
),
per_q AS (
  SELECT query_doc, CAST(SUM(rel) AS BIGINT) AS n_rel_topk,
         CAST(SUM(rel * disc) AS BIGINT) AS dcg_ppm
  FROM rel GROUP BY query_doc
)
SELECT p.query_doc, p.n_rel_topk, p.dcg_ppm,
       CAST(CASE WHEN p.n_rel_topk = 0 THEN 0
                 ELSE p.dcg_ppm * 1000000 // i.idcg END AS BIGINT)
         AS ndcg_ppm
FROM per_q p LEFT JOIN idcg i USING (n_rel_topk)
ORDER BY p.query_doc
"""


RETRIEVAL_EVAL_NDCG_SQL = _ndcg_sql()


# ---------------------------------------------------------------------------
# cuped_adjusted_ab
# ---------------------------------------------------------------------------


def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, n_users, mean_x_milli, mean_y_milli, theta_ppm,
    adj_mean_milli): CUPED-adjusted per-arm spend. Metric y = a user's
    value-cents in the SECOND half of the timeline; covariate x = the
    same user's FIRST-half spend (the pre-experiment period CUPED
    requires); arms are the ab_test_report hash split.
    θ_ppm = (nΣxy − ΣxΣy)·10⁶ div (nΣx² − (Σx)²) as a signed ratio in
    DECIMAL(38,0); each arm's adjusted mean is
    ȳ_arm − θ·(x̄_arm − x̄_all) in milli-cents, with the signed product
    routed through sign·(abs div 10⁶) so truncating and flooring
    division agree. θ and x̄_all are experiment-level and repeat on
    both rows (the ab_test_report convention).

    Plan: one per-user two-sided conditional aggregate (the user-keyed
    shuffle), one 2-row arm rollup, two 1-row global broadcasts."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        "user_id",
        "ts_us",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    mid = e.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")).select(
        F.expr("(lo + hi) div 2").alias("mid")
    )
    per_user = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts_us") < F.col("mid"), F.col("cents")).otherwise(0))
            .alias("x"),
            F.sum(F.when(F.col("ts_us") >= F.col("mid"), F.col("cents")).otherwise(0))
            .alias("y"),
        )
        .withColumn(
            "arm", (hash64(F.col("user_id").cast("string")) % 2).cast("long")
        )
    )
    glob = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    ).select(
        F.expr(
            "CASE WHEN n * sxy - sx * CAST(sy AS DECIMAL(38,0)) < 0"
            " THEN -1 ELSE 1 END"
            " * CAST((abs(n * sxy - sx * CAST(sy AS DECIMAL(38,0))) * 1000000)"
            " div (n * sxx - sx * CAST(sx AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("theta_ppm"),
        F.expr("sx * 1000 div n").cast("long").alias("mean_x_all_milli"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("sxa"),
        F.sum("y").alias("sya"),
    )
    out = arms.crossJoin(F.broadcast(glob)).select(
        "arm",
        F.col("n_users").cast("long").alias("n_users"),
        F.expr("sxa * 1000 div n_users").cast("long").alias("mean_x_milli"),
        F.expr("sya * 1000 div n_users").cast("long").alias("mean_y_milli"),
        "theta_ppm",
        # sign read off the two factors (never their product — the
        # product only ever exists in DECIMAL(38,0) under abs())
        F.expr(
            "sya * 1000 div n_users"
            " - (CASE WHEN (theta_ppm < 0) != ((sxa * 1000 div n_users"
            "                                   - mean_x_all_milli) < 0)"
            "    THEN -1 ELSE 1 END)"
            " * (abs(CAST(theta_ppm AS DECIMAL(38,0))"
            "        * (sxa * 1000 div n_users - mean_x_all_milli))"
            "    div 1000000)"
        )
        .cast("long")
        .alias("adj_mean_milli"),
    )
    return out.orderBy("arm")


CUPED_ADJUSTED_AB_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
mid AS (SELECT CAST((MIN(ts_us) + MAX(ts_us)) // 2 AS BIGINT) AS mid FROM e),
per_user AS (
  SELECT user_id,
         SUM(CASE WHEN ts_us < mid THEN cents ELSE 0 END) AS x,
         SUM(CASE WHEN ts_us >= mid THEN cents ELSE 0 END) AS y,
         ({sql_hash64("CAST(user_id AS VARCHAR)")}) % 2 AS arm
  FROM e, mid GROUP BY user_id
),
gmom AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM per_user
),
theta AS (
  SELECT CAST((CASE WHEN n * sxy - sx * CAST(sy AS HUGEINT) < 0
                    THEN -1 ELSE 1 END)
              * (abs(n * sxy - sx * CAST(sy AS HUGEINT)) * 1000000
                 // (n * sxx - sx * CAST(sx AS HUGEINT))) AS BIGINT)
           AS theta_ppm,
         CAST(sx * 1000 // n AS BIGINT) AS mean_x_all_milli
  FROM gmom
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         SUM(x) AS sxa, SUM(y) AS sya
  FROM per_user GROUP BY arm
)
SELECT arm, n_users,
       CAST(sxa * 1000 // n_users AS BIGINT) AS mean_x_milli,
       CAST(sya * 1000 // n_users AS BIGINT) AS mean_y_milli,
       theta_ppm,
       CAST(sya * 1000 // n_users
            - (CASE WHEN (theta_ppm < 0) <> ((sxa * 1000 // n_users
                                              - mean_x_all_milli) < 0)
               THEN -1 ELSE 1 END)
            * (abs(CAST(theta_ppm AS HUGEINT)
                   * (sxa * 1000 // n_users - mean_x_all_milli))
               // 1000000) AS BIGINT) AS adj_mean_milli
FROM arms, theta
ORDER BY arm
"""


# ---------------------------------------------------------------------------
# ab_power_plan
# ---------------------------------------------------------------------------

MDE_PCTS = [1, 2, 5, 10]


def ab_power_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, mde_pct, n_users, mean_cents, required_n_per_arm):
    experiment sizing per event type — the per-arm sample size needed
    to detect a relative lift of mde_pct on the per-user value metric
    at α=0.05 / power 0.8 via the public n ≈ 16·σ²/δ² rule
    (Kohavi et al., *Trustworthy Online Controlled Experiments*, the
    '16 rule'). Exact integer form: with per-user moments (n, s, s²),
    σ²·n² = n·Σy²−S² and δ = mean·pct/100, so
    required = 16·(nΣy²−S²)·10⁴ div (n²·mean²·pct²) — DECIMAL(38,0)
    keeps every product exact at any corpus size. Types whose mean
    rounds to 0 cents are dropped (no detectable lift to size).

    Plan: one (event_type, user) partial-aggregated rollup, one
    event_type moment aggregate, a 4-row literal explode — the same
    keyed shuffle every per-user metric pays."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        "event_type",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per_user = e.groupBy("event_type", "user_id").agg(
        F.sum("cents").alias("y")
    )
    mom = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("s2"),
    )
    mde = F.explode(F.array(*[F.lit(p) for p in MDE_PCTS])).alias("mde_pct")
    out = (
        mom.select("event_type", "n", "s", "s2", mde)
        .withColumn("mean_cents", F.expr("s div n"))
        .filter(F.col("mean_cents") > 0)
        .select(
            "event_type",
            F.col("mde_pct").cast("long").alias("mde_pct"),
            F.col("n").cast("long").alias("n_users"),
            F.col("mean_cents").cast("long").alias("mean_cents"),
            F.expr(
                "CAST((16 * (n * s2 - CAST(s AS DECIMAL(38,0)) * s) * 10000)"
                " div (CAST(n AS DECIMAL(38,0)) * n * (s div n) * (s div n)"
                "      * mde_pct * mde_pct) AS BIGINT)"
            ).alias("required_n_per_arm"),
        )
    )
    return out.orderBy("event_type", "mde_pct")


AB_POWER_PLAN_SQL = f"""
WITH e AS (
  SELECT event_type, user_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
per_user AS (
  SELECT event_type, user_id, SUM(cents) AS y
  FROM e GROUP BY event_type, user_id
),
mom AS (
  SELECT event_type, COUNT(*) AS n, SUM(y) AS s,
         SUM(CAST(y AS HUGEINT) * y) AS s2
  FROM per_user GROUP BY event_type
)
SELECT event_type,
       CAST(mde_pct AS BIGINT) AS mde_pct,
       CAST(n AS BIGINT) AS n_users,
       CAST(s // n AS BIGINT) AS mean_cents,
       CAST((16 * (n * s2 - CAST(s AS HUGEINT) * s) * 10000)
            // (CAST(n AS HUGEINT) * n * (s // n) * (s // n)
                * mde_pct * mde_pct) AS BIGINT) AS required_n_per_arm
FROM mom CROSS JOIN (VALUES {", ".join(f"({p})" for p in MDE_PCTS)}) m(mde_pct)
WHERE s // n > 0
ORDER BY event_type, mde_pct
"""
