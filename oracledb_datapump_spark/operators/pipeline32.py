"""Batch 32: skip-gram negative-sampling table, activity streaks
(gaps-and-islands), churn training-set builder.

Tokenizer/embedding-training support, the classic islands window
pattern, and an ML label/feature builder — all integer-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Skip-gram negative-sampling table (unigram^0.75)
# ---------------------------------------------------------------------------

NEG_VOCAB = 100
DAY_US = 86_400 * 1_000_000


def skipgram_negative_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, token, freq, weight, cum_weight): the word2vec negative-
    sampling table for the top-{NEG_VOCAB} corpus tokens — sampling
    weight ∝ freq^0.75 (Mikolov et al.'s smoothing), computed EXACTLY
    in integers as ⌊√⌊√(freq³)⌋⌋ (x^(3/4) by two floor-sqrts; freq³
    stays under 2^63 for any fixture, and the IEEE sqrt of an int64 is
    correctly rounded in both engines). cum_weight is the running sum
    in rank order — the alias-table ranges a sampler would binary-
    search into.

    Scale shape: tokenize is row-local, the vocab count is one
    partial-aggregated groupBy, and everything after the top-{NEG_VOCAB}
    cut is model-scale (a {NEG_VOCAB}-row window)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda t: F.length(t) >= 2
    )
    freq = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    top = (
        freq.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= NEG_VOCAB)
        .withColumn(
            "weight",
            F.expr(
                "CAST(FLOOR(SQRT(CAST(FLOOR(SQRT(CAST(freq * freq * freq "
                "AS DOUBLE))) AS DOUBLE))) AS BIGINT)"
            ),
        )
    )
    w2 = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("cum_weight", F.sum("weight").over(w2).cast("long"))
        .select("rnk", "token", F.col("freq").cast("long").alias("freq"),
                "weight", "cum_weight")
        .orderBy("rnk")
    )


SKIPGRAM_NEGATIVE_TABLE_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> len(t) >= 2)) AS token
  FROM documents
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY token
), top AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rnk
  FROM freq
), weighted AS (
  SELECT CAST(rnk AS BIGINT) AS rnk, token, freq,
         CAST(FLOOR(SQRT(CAST(FLOOR(SQRT(CAST(freq * freq * freq AS DOUBLE)))
              AS DOUBLE))) AS BIGINT) AS weight
  FROM top WHERE rnk <= {NEG_VOCAB}
)
SELECT rnk, token, freq, weight,
       CAST(SUM(weight) OVER (ORDER BY rnk
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
FROM weighted
ORDER BY rnk
"""


# ---------------------------------------------------------------------------
# Activity streaks (gaps and islands)
# ---------------------------------------------------------------------------


def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_active_days, n_islands, longest_streak): per-user
    consecutive-active-day streaks over the event log — the canonical
    gaps-and-islands window pattern (island key = day − row_number over
    days), which subtracts out consecutive runs so one groupBy yields
    the islands. Retention analytics' 'longest streak' feature.

    Scale shape: one distinct on (user, day), one user-keyed window,
    two partial-aggregated groupBys — everything shuffles on user_id
    once (the window and both aggs share the partitioning)."""
    days = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {DAY_US}").alias(
                "day"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.col("day") - F.row_number().over(w)
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.sum("run_len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.max("run_len").cast("long").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


USER_LONGEST_STREAK_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // {DAY_US} AS day
  FROM events
), islands AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM days
), runs AS (
  SELECT user_id, island, COUNT(*) AS run_len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(run_len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak
FROM runs
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Churn training-set builder
# ---------------------------------------------------------------------------

CHURN_HOLDOUT_DAYS = 7
CHURN_WINDOW_DAYS = 14


def churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_events_window, n_purchases_window, recency_days,
    churned): the supervised churn dataset a training pipeline emits —
    features from the observation window (everything before the last
    {CHURN_HOLDOUT_DAYS} days of the log), label = no activity in the
    holdout. The cutoffs derive from the global max event day, so the
    dataset is reproducible from the log alone (no wall clock — the
    determinism contract).

    Scale shape: one global max (scalar), one filtered user groupBy
    for features, one anti-join-shaped flag (max activity day vs
    cutoff) folded into the same agg — a single shuffle on user_id."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {DAY_US}").alias(
            "day"
        ),
    )
    max_day = ev.agg(F.max("day")).collect()[0][0]
    cutoff = max_day - CHURN_HOLDOUT_DAYS
    win_lo = cutoff - CHURN_WINDOW_DAYS
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                ((F.col("day") > win_lo) & (F.col("day") <= cutoff)).cast(
                    "long"
                )
            ).alias("n_events_window"),
            F.sum(
                (
                    (F.col("day") > win_lo)
                    & (F.col("day") <= cutoff)
                    & (F.col("event_type") == "purchase")
                ).cast("long")
            ).alias("n_purchases_window"),
            F.max(F.when(F.col("day") <= cutoff, F.col("day"))).alias(
                "last_obs_day"
            ),
            F.max("day").alias("last_day"),
        )
        .filter(F.col("last_obs_day").isNotNull())  # active pre-cutoff only
        .select(
            "user_id",
            "n_events_window",
            "n_purchases_window",
            (F.lit(cutoff) - F.col("last_obs_day")).cast("long").alias(
                "recency_days"
            ),
            (F.col("last_day") <= cutoff).alias("churned"),
        )
        .orderBy("user_id")
    )


CHURN_TRAINING_SET_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // {DAY_US} AS day
  FROM events
), mx AS (SELECT MAX(day) AS max_day FROM ev),
agg AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN day > mx.max_day - {CHURN_HOLDOUT_DAYS}
                            - {CHURN_WINDOW_DAYS}
                        AND day <= mx.max_day - {CHURN_HOLDOUT_DAYS}
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_events_window,
         CAST(SUM(CASE WHEN day > mx.max_day - {CHURN_HOLDOUT_DAYS}
                            - {CHURN_WINDOW_DAYS}
                        AND day <= mx.max_day - {CHURN_HOLDOUT_DAYS}
                        AND event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases_window,
         MAX(CASE WHEN day <= mx.max_day - {CHURN_HOLDOUT_DAYS}
             THEN day END) AS last_obs_day,
         MAX(day) AS last_day,
         ANY_VALUE(mx.max_day) AS max_day
  FROM ev, mx
  GROUP BY user_id
)
SELECT user_id, n_events_window, n_purchases_window,
       CAST(max_day - {CHURN_HOLDOUT_DAYS} - last_obs_day AS BIGINT)
         AS recency_days,
       (last_day <= max_day - {CHURN_HOLDOUT_DAYS}) AS churned
FROM agg
WHERE last_obs_day IS NOT NULL
ORDER BY user_id
"""
