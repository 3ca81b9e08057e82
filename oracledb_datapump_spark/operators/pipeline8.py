"""Pipeline QA dashboards, batch 9 (round 6; queued for the round-7
gated prefix — hash-verified locally at both fixture scales by
tests/test_queries_oracle.py until then).

- ``rolling_retention_7d``          day-over-window return rates
- ``dedup_token_savings``           token ROI of keep-best dedup
- ``ship_lag_quartiles_by_priority`` discrete lag quartiles per priority

Same contracts as operators/pipeline.py: integer-exact statistics,
oracles composed from the primitives' own SQL. No reference analog
(SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..events_source import load_events
from . import dedup as D


# ---------------------------------------------------------------------------
# rolling 7-day retention
# ---------------------------------------------------------------------------

RETENTION_WINDOW_DAYS = 7


def rolling_retention_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day_idx, n_active, n_retained, retained_ppm): for each day, how
    many of its active users return within the next
    {RETENTION_WINDOW_DAYS} days — the rolling-retention curve, computed
    WITHOUT a day×day self-join: per user the sorted distinct-day
    sequence gives next-active-day via one lead(), and "returned" is a
    row-local gap test. The last-window days are reported as the data
    shows them (right-censored — their retained_ppm is a floor, the
    standard caveat of any retention curve's tail).

    Plan: one (user, day) identity collapse (map-side combinable), one
    user-keyed lead window, a |days|-row reduce."""
    e = load_events(spark, sf_dir)
    days = (
        e.select(
            "user_id", F.expr("ts_us div 86400000000").cast("long").alias("day_idx")
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day_idx")
    g = days.withColumn("next_day", F.lead("day_idx").over(w))
    retained = (
        F.col("next_day").isNotNull()
        & ((F.col("next_day") - F.col("day_idx")) <= RETENTION_WINDOW_DAYS)
    ).cast("long")
    return (
        g.groupBy("day_idx")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(retained).cast("long").alias("n_retained"),
        )
        .select(
            "day_idx",
            "n_active",
            "n_retained",
            F.expr("(n_retained * 1000000) div n_active").alias("retained_ppm"),
        )
        .orderBy("day_idx")
    )


ROLLING_RETENTION_7D_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_idx
  FROM events
),
g AS (
  SELECT day_idx,
         LEAD(day_idx) OVER (PARTITION BY user_id ORDER BY day_idx)
           AS next_day
  FROM days
)
SELECT CAST(day_idx AS BIGINT) AS day_idx, COUNT(*) AS n_active,
       CAST(SUM(CASE WHEN next_day IS NOT NULL
                      AND next_day - day_idx <= {RETENTION_WINDOW_DAYS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST((SUM(CASE WHEN next_day IS NOT NULL
                       AND next_day - day_idx <= {RETENTION_WINDOW_DAYS}
                 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
         AS retained_ppm
FROM g GROUP BY day_idx ORDER BY day_idx
"""


# ---------------------------------------------------------------------------
# token ROI of keep-best dedup
# ---------------------------------------------------------------------------


def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_docs, n_losers, tokens_total, tokens_dropped, save_ppm): the
    one-row business case for the near-dup pipeline — how many
    BPE-ish training tokens the keep-losers-out policy removes from
    the corpus (loser = doc_b of any verified pair, the same convention
    every curation arm uses). The number that decides whether the LSH
    pass pays for itself at 100 TB.

    Plan: rides the memoized verified pair list (loser set broadcast —
    dedup OUTPUT sized) over token_count's linear pass; two 1-row
    aggregates."""
    from .textstats import token_count

    t = token_count(spark, sf_dir).select("doc_id", "bpe_ish_tokens")
    losers = (
        D.verified_pairs_cached(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("l", F.lit(1))
    )
    j = t.join(F.broadcast(losers), "doc_id", "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("l").isNotNull().cast("long")).cast("long").alias("n_losers"),
        F.sum("bpe_ish_tokens").cast("long").alias("tokens_total"),
        F.sum(
            F.when(F.col("l").isNotNull(), F.col("bpe_ish_tokens")).otherwise(0)
        )
        .cast("long")
        .alias("tokens_dropped"),
    ).select(
        "n_docs",
        "n_losers",
        "tokens_total",
        "tokens_dropped",
        F.expr(
            "CAST((CAST(tokens_dropped AS DECIMAL(38,0)) * 1000000)"
            " div tokens_total AS LONG)"
        ).alias("save_ppm"),
    )


def _dedup_token_savings_sql() -> str:
    from .textstats import TOKEN_COUNT_SQL

    verified = D.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    tokens = TOKEN_COUNT_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH v AS ({verified}),
t AS ({tokens}),
losers AS (SELECT DISTINCT doc_b AS doc_id FROM v),
j AS (
  SELECT t.bpe_ish_tokens, l.doc_id IS NOT NULL AS is_loser
  FROM t LEFT JOIN losers l USING (doc_id)
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN is_loser THEN 1 ELSE 0 END) AS BIGINT) AS n_losers,
       CAST(SUM(bpe_ish_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN is_loser THEN bpe_ish_tokens ELSE 0 END) AS BIGINT)
         AS tokens_dropped,
       CAST((CAST(SUM(CASE WHEN is_loser THEN bpe_ish_tokens ELSE 0 END)
                  AS HUGEINT) * 1000000)
            // SUM(bpe_ish_tokens) AS BIGINT) AS save_ppm
FROM j
"""


DEDUP_TOKEN_SAVINGS_SQL = _dedup_token_savings_sql()


# ---------------------------------------------------------------------------
# ship-lag quartiles per order priority
# ---------------------------------------------------------------------------


def ship_lag_quartiles_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(priority, n_items, p25_days, p50_days, p75_days): the
    order→ship latency distribution per order priority — the SLA view
    that tells whether URGENT orders actually ship faster. Discrete
    rank statistics (value_quartiles_by_type's recipe) over the
    fulfillment-lag days of nation_fulfillment_lag.

    Plan: the lineitem⋈orders orderkey shuffle, a priority-keyed sort
    window, a |priorities|-row conditional aggregation."""
    from ..events_source import pin_utc

    pin_utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lag = F.expr(
        "(unix_micros(CAST(l_shipdate AS TIMESTAMP))"
        " - unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000"
    )
    vals = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"), lag.alias("lag_days")
    )
    w = W.partitionBy("priority").orderBy("lag_days")
    ranked = vals.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("priority"))
    )
    pick = lambda k: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.expr(f"CAST(ceil(n * {k} / 4.0) AS BIGINT)"),
            F.col("lag_days"),
        )
    )
    return (
        ranked.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("n_items"),
            pick(1).alias("p25_days"),
            pick(2).alias("p50_days"),
            pick(3).alias("p75_days"),
        )
        .orderBy("priority")
    )


SHIP_LAG_QUARTILES_SQL = """
WITH vals AS (
  SELECT o.o_orderpriority AS priority,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
           AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ranked AS (
  SELECT priority, lag_days,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY lag_days) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM vals
)
SELECT priority, CAST(MAX(n) AS BIGINT) AS n_items,
       MAX(CASE WHEN rn = CAST(ceil(n * 1 / 4.0) AS BIGINT)
           THEN lag_days END) AS p25_days,
       MAX(CASE WHEN rn = CAST(ceil(n * 2 / 4.0) AS BIGINT)
           THEN lag_days END) AS p50_days,
       MAX(CASE WHEN rn = CAST(ceil(n * 3 / 4.0) AS BIGINT)
           THEN lag_days END) AS p75_days
FROM ranked GROUP BY priority ORDER BY priority
"""
