"""Batch 70: MASE seasonal backtest, rich-club coefficient, rank-biased
overlap of rankers.

- ``mase_seasonal_backtest`` — the MASE-style comparison (Hyndman &
  Koehler 2006) of the seasonal-naive forecaster (ŷ_d = y_{d−7})
  against the naive one (ŷ_d = y_{d−1}) on the daily event-count
  series: Σ|e_seasonal| / Σ|e_naive| in ppm over the days where both
  are defined. < 1e6 means the weekly pattern is real signal a
  forecaster must model — the scale-free forecast-eval standard.
- ``rich_club_curve`` — the rich-club coefficient φ(t) =
  2·E_t/(N_t(N_t−1)) of the co-supplier graph for degree thresholds
  t ∈ {RICH_THRESHOLDS}: how densely the best-connected nodes
  interconnect (Zhou & Mondragón 2004). A rising curve = an elite core
  — the topology question degree histograms can't answer.
- ``rbo_ranker_overlap`` — Rank-Biased Overlap (Webber et al. 2010,
  p = 0.9, depth 5) between the BM25 and TF-IDF top-k lists per
  query, EXACT in integers: each shared doc contributes the
  closed-form tail weight C(max(rank_a, rank_b)) (precomputed
  rationals over the common denominator), normalized by the
  full-agreement mass. The top-weighted list similarity that
  ranker_agreement_report's flat rank-L1 is blind to.

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_table import values_df

DAY_US = 86_400_000_000
SEASON_DAYS = 7
#: rich-club degree thresholds.
RICH_THRESHOLDS = (2, 4, 8, 16)
#: co-supplier edge support floor (graph.py's rule).
RICH_MIN_CO = 3
#: RBO(p=0.9, depth 5): per-shared-doc tail weights C(m) = Σ_{d≥m}
#: (1−p)p^{d−1}·(60/d) over the 1e5·60 common denominator, and the
#: full-agreement normalizer Σ_d C(d).
RBO_C = (1_220_082, 620_082, 350_082, 188_082, 78_732)
RBO_DENOM = 2_457_060


# ---------------------------------------------------------------------------
# MASE seasonal backtest
# ---------------------------------------------------------------------------


def mase_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_days, sae_naive, sae_seasonal, mase_ppm, seasonal_wins): on
    the dense daily event-count series, the sum of absolute one-step
    errors of the lag-1 naive vs the lag-{SEASON_DAYS} seasonal-naive
    forecaster, scored on the common day range (d > {SEASON_DAYS}).
    mase_ppm = sae_seasonal·1e6 div sae_naive — below 1e6 the weekly
    cycle beats persistence and a real forecaster must model it.

    Scale shape: one scan → (day) groupBy → dense axis (calendar-
    bounded), two lag windows, one 1-row reduce."""
    from ..events_source import load_events

    daily = (
        load_events(spark, sf_dir)
        .select(F.expr(f"ts_us div {DAY_US}").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    axis = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.expr("sequence(lo, hi)")).alias("day")
    )
    dense = axis.join(daily, "day", "left").select(
        "day", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    errs = (
        dense.withColumn("y1", F.lag("x", 1).over(w))
        .withColumn("y7", F.lag("x", SEASON_DAYS).over(w))
        .filter(F.col("y7").isNotNull())
    )
    agg = errs.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("x") - F.col("y1"))).cast("long").alias("sae_naive"),
        F.sum(F.abs(F.col("x") - F.col("y7")))
        .cast("long")
        .alias("sae_seasonal"),
    )
    return agg.select(
        "n_days",
        "sae_naive",
        "sae_seasonal",
        F.expr("sae_seasonal * 1000000 div greatest(sae_naive, 1)")
        .cast("long")
        .alias("mase_ppm"),
        (F.col("sae_seasonal") < F.col("sae_naive")).alias("seasonal_wins"),
    )


MASE_SQL = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
dense AS (
  SELECT g.day, COALESCE(d.x, 0) AS x
  FROM (SELECT unnest(range((SELECT MIN(day) FROM daily),
                            (SELECT MAX(day) FROM daily) + 1)) AS day) g
  LEFT JOIN daily d ON d.day = g.day
),
errs AS (
  SELECT x, LAG(x, 1) OVER (ORDER BY day) AS y1,
         LAG(x, {SEASON_DAYS}) OVER (ORDER BY day) AS y7
  FROM dense
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(x - y1)) AS BIGINT) AS sae_naive,
       CAST(SUM(ABS(x - y7)) AS BIGINT) AS sae_seasonal,
       CAST(SUM(ABS(x - y7)) * 1000000
            // GREATEST(SUM(ABS(x - y1)), 1) AS BIGINT) AS mase_ppm,
       SUM(ABS(x - y7)) < SUM(ABS(x - y1)) AS seasonal_wins
FROM errs WHERE y7 IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Rich-club coefficient
# ---------------------------------------------------------------------------


def rich_club_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(deg_threshold, n_rich, e_rich, phi_ppm): the rich-club
    coefficient of the co-supplier graph at degree thresholds
    {RICH_THRESHOLDS} — φ = 2·E_t·1e6 div (N_t·(N_t−1)) over the
    subgraph induced on nodes of degree > t (0 when fewer than two
    qualify). Monotone-rising φ(t) = the hubs form an elite core.

    Scale shape: the edge list and degree table are the shared graph
    aggregates; every threshold arm rides ONE conditional aggregation.

    r16 optimization (guide §2.4 / §1.2 — don't run |thresholds|
    separate jobs over the same frame): the old loop launched two count
    jobs per threshold (2·|T| passes over the edge list). The degrees
    attach once via two broadcast joins; all e_rich_t then fall out of
    a single conditional-sum pass, and all n_rich_t of one pass over
    the |V|-row degree table. Counts — and therefore φ — are
    bit-identical."""
    from .graph import _co_supplier_edges

    edges = _co_supplier_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    n_row = deg.agg(
        *[
            F.sum(F.when(F.col("d") > t, 1).otherwise(0)).alias(f"n_{t}")
            for t in RICH_THRESHOLDS
        ]
    ).collect()[0]
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    e_row = (
        edges.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .agg(
            *[
                F.sum(
                    F.when((F.col("du") > t) & (F.col("dv") > t), 1).otherwise(0)
                ).alias(f"e_{t}")
                for t in RICH_THRESHOLDS
            ]
        )
        .collect()[0]
    )
    rows = []
    for t in RICH_THRESHOLDS:
        n_rich = int(n_row[f"n_{t}"] or 0)
        e_rich = int(e_row[f"e_{t}"] or 0)
        phi = (
            2 * e_rich * 1_000_000 // (n_rich * (n_rich - 1))
            if n_rich >= 2
            else 0
        )
        rows.append((t, n_rich, e_rich, phi))
    return values_df(spark,
        rows,
        "deg_threshold long, n_rich long, e_rich long, phi_ppm long",
    ).orderBy("deg_threshold")


def _rich_sql() -> str:
    arms = []
    for t in RICH_THRESHOLDS:
        arms.append(
            f"""  SELECT {t} AS deg_threshold,
         (SELECT COUNT(*) FROM deg WHERE d > {t}) AS n_rich,
         (SELECT COUNT(*) FROM edges e
          WHERE e.u IN (SELECT n FROM deg WHERE d > {t})
            AND e.v IN (SELECT n FROM deg WHERE d > {t})) AS e_rich"""
        )
    union = "\n  UNION ALL\n".join(arms)
    return f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, CAST(l_suppkey AS BIGINT) AS sk FROM lineitem
),
edges AS (
  SELECT a.sk AS u, b.sk AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.sk < b.sk
  GROUP BY a.sk, b.sk
  HAVING COUNT(*) >= {RICH_MIN_CO}
),
deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v AS n FROM edges
  ) GROUP BY n
),
arms AS (
{union}
)
SELECT CAST(deg_threshold AS BIGINT) AS deg_threshold,
       CAST(n_rich AS BIGINT) AS n_rich, CAST(e_rich AS BIGINT) AS e_rich,
       CAST(CASE WHEN n_rich >= 2
            THEN 2 * e_rich * 1000000 // (n_rich * (n_rich - 1))
            ELSE 0 END AS BIGINT) AS phi_ppm
FROM arms
ORDER BY deg_threshold
"""


RICH_CLUB_SQL = _rich_sql()


# ---------------------------------------------------------------------------
# Rank-biased overlap
# ---------------------------------------------------------------------------


def rbo_ranker_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_doc, n_common, rbo_ppm): RBO(p=0.9) at depth 5 between
    the BM25 and TF-IDF top-5 lists per query. Each doc both rankers
    retrieve contributes the precomputed tail weight
    C(max(rank_bm25, rank_tfidf)) — the exact rational
    Σ_{{d≥m}}(1−p)p^{{d−1}}/d over a common denominator — and
    rbo_ppm = Σ contributions ·1e6 div {RBO_DENOM} (1e6 = identical
    lists, 0 = disjoint). Top-weighted: swapping ranks 1↔2 costs more
    than 4↔5, which the flat rank-L1 of ranker_agreement_report
    cannot see.

    Scale shape: rides the two benched inverted-index searches; the
    overlap join is |queries|·k rows, the lookup a 5-way CASE.

    r16 (guide §2.4): both searches consume the identical
    (doc, tok, tf) table — build it once, checkpoint it, and hand it
    to both scorers; each search's own plan (and its gated results)
    are untouched, this op just stops tokenizing the corpus twice."""
    from .sparse_text import _tf_table, bm25_search_topk, tfidf_search_topk

    tf_shared = _tf_table(spark, sf_dir).localCheckpoint(eager=True)

    bm = bm25_search_topk(spark, sf_dir, tf=tf_shared).select(
        F.col("query_doc"), F.col("match_doc"), F.col("rank").alias("ra")
    )
    tf = tfidf_search_topk(spark, sf_dir, tf=tf_shared).select(
        F.col("query_doc"), F.col("match_doc"), F.col("rank").alias("rb")
    )
    lookup = "CASE greatest(ra, rb) " + " ".join(
        f"WHEN {m + 1} THEN {c}" for m, c in enumerate(RBO_C)
    ) + " ELSE 0 END"
    both = bm.join(tf, ["query_doc", "match_doc"])
    queries = bm.select("query_doc").distinct()
    per = (
        both.withColumn("contrib", F.expr(lookup))
        .groupBy("query_doc")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("contrib").alias("raw"),
        )
    )
    return (
        queries.join(per, "query_doc", "left")
        .select(
            F.col("query_doc").cast("long"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.expr(
                f"coalesce(raw, 0) * 1000000 div {RBO_DENOM}"
            )
            .cast("long")
            .alias("rbo_ppm"),
        )
        .orderBy("query_doc")
    )


def _rbo_sql() -> str:
    from .sparse_text import BM25_SEARCH_SQL, TFIDF_SEARCH_SQL

    lookup = "CASE GREATEST(b.rank, t.rank) " + " ".join(
        f"WHEN {m + 1} THEN {c}" for m, c in enumerate(RBO_C)
    ) + " ELSE 0 END"
    return f"""
WITH bm AS ({BM25_SEARCH_SQL.strip().rstrip(';')}),
tf AS ({TFIDF_SEARCH_SQL.strip().rstrip(';')}),
per AS (
  SELECT b.query_doc, COUNT(*) AS n_common,
         SUM({lookup}) AS raw
  FROM bm b JOIN tf t
    ON t.query_doc = b.query_doc AND t.match_doc = b.match_doc
  GROUP BY b.query_doc
),
queries AS (SELECT DISTINCT query_doc FROM bm)
SELECT CAST(q.query_doc AS BIGINT) AS query_doc,
       CAST(COALESCE(p.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(p.raw, 0) * 1000000 // {RBO_DENOM} AS BIGINT)
         AS rbo_ppm
FROM queries q LEFT JOIN per p ON p.query_doc = q.query_doc
ORDER BY q.query_doc
"""


RBO_OVERLAP_SQL = _rbo_sql()
