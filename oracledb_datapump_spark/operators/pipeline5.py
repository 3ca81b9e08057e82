"""Pipeline QA dashboards, batch 6 (round 6; queued behind pipeline4
for the round-7 gated prefix — hash-verified locally at both fixture
scales by tests/test_queries_oracle.py until then).

- ``peak_concurrent_sessions``  per-hour active-session concurrency
- ``dup_degree_histogram``      near-dup graph degree distribution
- ``dup_cross_lang_pairs``      near-dup pair language matrix
- ``order_priority_mix_by_month`` priority mix shares per month
- ``part_brand_price_spread``   per-brand price spread (exact cents)

Same contracts as operators/pipeline.py: integer-exact statistics,
oracles composed from the primitives' own SQL. No reference analog
(SURVEY.md §2.3 — the reference delegates analytics to Oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D
from .docs_source import load_docs


# ---------------------------------------------------------------------------
# per-hour active-session concurrency
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000


def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_epoch, n_active_sessions): how many sessions OVERLAP each
    hour (session_start < hour_end AND session_end >= hour_start) — the
    capacity-planning view of the sessionizer's output (events-style
    interval analytics: the interval-overlap count every monitoring
    stack needs).

    Plan: rides the sessionizer's one user-keyed shuffle; each session
    then explodes into its covered hours via sequence() — fan-out
    bounded by session DURATION in hours (gap-capped sessions are
    short; a pathological week-long session emits 168 rows, never
    |events|), then one |hours|-row groupBy. The same bounded-expansion
    argument as gapfill_hourly; no interval self-join, no window over
    the timeline."""
    from .analytics import events_sessionize

    s = events_sessionize(spark, sf_dir)
    hours = F.expr(
        f"sequence(session_start_us div {HOUR_US}, session_end_us div {HOUR_US})"
    )
    return (
        s.select(F.explode(hours).alias("hour_idx"))
        .groupBy((F.col("hour_idx") * 3600).cast("long").alias("hour_epoch"))
        .agg(F.count(F.lit(1)).alias("n_active_sessions"))
        .orderBy("hour_epoch")
    )


def _peak_concurrent_sessions_sql() -> str:
    from .analytics import EVENTS_SESSIONIZE_SQL

    base = EVENTS_SESSIONIZE_SQL.replace("ORDER BY user_id, session_seq", "")
    return f"""
WITH s AS ({base}),
hrs AS (
  SELECT unnest(generate_series(session_start_us // {HOUR_US},
                                session_end_us // {HOUR_US})) AS hour_idx
  FROM s
)
SELECT CAST(hour_idx * 3600 AS BIGINT) AS hour_epoch,
       COUNT(*) AS n_active_sessions
FROM hrs GROUP BY 1 ORDER BY 1
"""


PEAK_CONCURRENT_SESSIONS_SQL = _peak_concurrent_sessions_sql()


# ---------------------------------------------------------------------------
# near-dup graph degree distribution
# ---------------------------------------------------------------------------


def dup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(degree, n_docs): distribution of per-document degree in the
    verified near-dup pair graph — the structural screen that separates
    a corpus of isolated mirror pairs (all degree 1) from template
    explosions (a few hub documents with huge degree, where
    connected-component dedup collapses whole families and the
    keep-best policy matters).

    Plan: rides the driver-memoized verified pair list (dedup OUTPUT
    sized); a both-endpoint stack, one degree groupBy, one bounded
    histogram groupBy."""
    p = D.verified_pairs_cached(spark, sf_dir)
    ends = p.select(F.col("doc_a").alias("doc_id")).unionAll(
        p.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("degree")
    )


def _dup_degree_histogram_sql() -> str:
    verified = D.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH v AS ({verified}),
ends AS (
  SELECT doc_a AS doc_id FROM v UNION ALL SELECT doc_b FROM v
),
deg AS (SELECT doc_id, COUNT(*) AS degree FROM ends GROUP BY doc_id)
SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY degree ORDER BY degree
"""


DUP_DEGREE_HISTOGRAM_SQL = _dup_degree_histogram_sql()


# ---------------------------------------------------------------------------
# near-dup pair language matrix
# ---------------------------------------------------------------------------


def dup_cross_lang_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang_a, lang_b, n_pairs): the labeled-language matrix of
    verified near-dup pairs — off-diagonal mass means near-identical
    documents labeled as DIFFERENT languages (either mislabeled docs or
    boilerplate that survives translation), both of which corrupt
    per-language token budgets if dedup runs per-language.

    Plan: the memoized pair list is broadcast against the documents
    id→lang projection twice (pairs are dedup OUTPUT sized — the
    corpus-side join stays shuffle-free), then a |langs|²-bounded
    groupBy."""
    p = D.verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    langs = load_docs(spark, sf_dir).select("doc_id", "lang")
    # corpus side streams through BOTH joins; the broadcast side is
    # always pair-sized (the pair list, then the half-resolved pairs)
    half = langs.join(F.broadcast(p), langs.doc_id == p.doc_a).select(
        F.col("lang").alias("lang_a"), "doc_b"
    )
    j = langs.join(F.broadcast(half), langs.doc_id == half.doc_b).select(
        "lang_a", F.col("lang").alias("lang_b")
    )
    return (
        j.groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("lang_a", "lang_b")
    )


def _dup_cross_lang_pairs_sql() -> str:
    verified = D.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH v AS ({verified})
SELECT da.lang AS lang_a, db.lang AS lang_b, COUNT(*) AS n_pairs
FROM v
JOIN documents da ON v.doc_a = da.doc_id
JOIN documents db ON v.doc_b = db.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


DUP_CROSS_LANG_PAIRS_SQL = _dup_cross_lang_pairs_sql()


# ---------------------------------------------------------------------------
# order-priority mix per month
# ---------------------------------------------------------------------------


def order_priority_mix_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, priority, n_orders, share_ppm): the monthly mix of order
    priorities with each cell's within-month share in ppm — the
    SLA-drift dashboard (a rising URGENT share predicts queue pressure
    long before q21's late-supplier counts move).

    Plan: one partial-aggregated groupBy to |months|·|priorities| rows,
    month totals re-derived from those cells (no second scan) and
    broadcast back."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    months = cells.groupBy("ym").agg(F.sum("n_orders").alias("m_tot"))
    return (
        cells.join(F.broadcast(months), "ym")
        .select(
            "ym",
            "priority",
            "n_orders",
            F.expr(
                "CAST((CAST(n_orders AS DECIMAL(38,0)) * 1000000)"
                " div m_tot AS LONG)"
            ).alias("share_ppm"),
        )
        .orderBy("ym", "priority")
    )


ORDER_PRIORITY_MIX_SQL = """
WITH cells AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         o_orderpriority AS priority, COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
),
months AS (SELECT ym, SUM(n_orders) AS m_tot FROM cells GROUP BY ym)
SELECT ym, priority, n_orders,
       CAST((CAST(n_orders AS HUGEINT) * 1000000) // m_tot AS BIGINT)
         AS share_ppm
FROM cells JOIN months USING (ym)
ORDER BY ym, priority
"""


# ---------------------------------------------------------------------------
# per-brand price spread
# ---------------------------------------------------------------------------


def part_brand_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, n_parts, min_cents, max_cents, sum_cents): exact-cents
    retail price spread per part brand (the catalog-pricing QA table;
    DECIMAL(25,2) money recipe, never a float aggregate).

    Plan: one |brands|-row partial-aggregated groupBy, no join."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    cents = (F.col("p_retailprice").cast("decimal(25,2)") * 100).cast("long")
    return (
        p.select(F.col("p_brand").alias("brand"), cents.alias("cents"))
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("brand")
    )


PART_BRAND_PRICE_SPREAD_SQL = """
SELECT p_brand AS brand, COUNT(*) AS n_parts,
       MIN(CAST(CAST(p_retailprice AS DECIMAL(25,2)) * 100 AS BIGINT))
         AS min_cents,
       MAX(CAST(CAST(p_retailprice AS DECIMAL(25,2)) * 100 AS BIGINT))
         AS max_cents,
       CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(25,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""
