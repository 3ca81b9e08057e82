"""Temporal operators: as-of join — the classic time-series primitive
Spark has no built-in operator for (DuckDB ships it as ASOF JOIN, which
is what the oracle uses).

The Spark implementation is the scale-correct *composition*: tag and
union the two streams, then one carry-forward window per key — a single
hash shuffle on the join key, no range-condition join (Spark would plan
that as a broadcast-nested-loop or a skewy theta join), no per-row
probing. State per key is one row (the last right-side match), so the
same plan holds on a 1000-executor cluster with billions of events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_left: str,
    ts_right: str,
    carry: list[str],
) -> DataFrame:
    """For every left row, attach the ``carry`` columns of the latest
    right row with the same ``by`` key and ``ts_right <= ts_left``
    (inclusive; right-before-left at equal timestamps). Left rows with
    no prior right row keep nulls — ASOF LEFT JOIN semantics.

    One shuffle (hash on ``by``), one ordered window pass; right-side
    carry state is a single row per key regardless of history length."""
    # The carry travels as ONE struct per right row, not per-column:
    # per-column last(ignorenulls) would (a) replace a legitimate NULL
    # in the latest right row with a stale value from an OLDER row and
    # (b) mix fields from different right rows — neither is ASOF
    # semantics (which attach the latest right ROW atomically, nulls
    # included). A right row whose timestamp is NULL is excluded up
    # front: ascending sort puts nulls FIRST, where it would otherwise
    # masquerade as the earliest match (SQL NULL comparison = no match).
    r = right.filter(F.col(ts_right).isNotNull()).select(
        F.col(by).alias("__by"),
        F.col(ts_right).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in carry]).alias("__carry"),
    )
    l = left.select(
        F.col(by).alias("__by"),
        F.col(ts_left).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__carry"].dataType).alias("__carry"),
        F.struct(*left.columns).alias("__row"),
    )
    r = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType))
    w = (
        W.partitionBy("__by")
        .orderBy("__ts", "__tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l.unionByName(r).select(
        "__tag",
        "__row",
        F.last("__carry", ignorenulls=True).over(w).alias("__carry"),
    )
    out_left = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out_carry = [F.col(f"__carry.{c}").alias(c) for c in carry]
    return carried.filter(F.col("__tag") == 1).select(*out_left, *out_carry)


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(purchase_id, user_id, purchase_ts_us, click_id, click_ts_us,
    gap_us): each purchase attributed to the user's latest prior click —
    the canonical as-of workload. Timestamps follow the repo's events
    convention (epoch-microsecond bigints, see analytics._events: the
    NANOS parquet type is read as long and integer-DIVed to µs so values
    are engine-portable). Purchases with no prior click keep nulls."""
    from .analytics import _events

    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us"),
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_ts_us"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        ts_left="purchase_ts_us",
        ts_right="ts_us",
        carry=["click_id", "click_ts_us"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts_us",
        "click_id",
        "click_ts_us",
        (F.col("purchase_ts_us") - F.col("click_ts_us")).alias("gap_us"),
    ).orderBy("purchase_id")


ASOF_ATTRIBUTION_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       c.event_id AS click_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
"""


# ---------------------------------------------------------------------------
# interval/range join: bin-bucketed equi-join (Spark has no range join)
# ---------------------------------------------------------------------------

RANGE_W_US = 120_000_000  # +/- 2 minutes


def range_join_nearby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, n_nearby): for every purchase event, how many events
    (any type, any user, self included) happened within +/-2 minutes.

    A naive range-predicate join plans as broadcast-nested-loop (O(n*m)
    probes). The scale path bins both sides at the window width W:
    every match within +/-W lands in the probe bin or an adjacent one,
    so the probe side expands to exactly 3 (bin, probe) rows and the
    join is a plain hash equi-join on bin, followed by the exact |dt|
    filter. Shuffle volume is 3x probes + 1x build regardless of W's
    selectivity; hot bins (event bursts) are the skew lever — salt the
    bin key or let AQE split them.

    Oracle: DuckDB runs the literal inequality join (its optimizer
    plans IEJoin, fine at fixture scale)."""
    from .analytics import _events

    e = _events(spark, sf_dir)
    build = e.select(
        (F.col("ts_us") - (F.col("ts_us") % RANGE_W_US)).alias("bin"),
        F.col("ts_us").alias("b_ts"),
    )
    probes = (
        e.filter(F.col("event_type") == "purchase")
        .select("event_id", "ts_us")
        .withColumn("__off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "event_id",
            "ts_us",
            (
                F.col("ts_us")
                - (F.col("ts_us") % RANGE_W_US)
                + F.col("__off") * RANGE_W_US
            ).alias("bin"),
        )
    )
    return (
        probes.join(build, "bin")
        .filter(F.abs(F.col("b_ts") - F.col("ts_us")) <= RANGE_W_US)
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_nearby"))
        .orderBy("event_id")
    )


RANGE_JOIN_NEARBY_SQL = f"""
WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events)
SELECT p.event_id, COUNT(*) AS n_nearby
FROM (SELECT event_id, ts_us FROM e WHERE event_type = 'purchase') p
JOIN e b ON b.ts_us BETWEEN p.ts_us - {RANGE_W_US} AND p.ts_us + {RANGE_W_US}
GROUP BY p.event_id
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# rolling time-range window: trailing-hour activity per user
# ---------------------------------------------------------------------------

ROLL_W_US = 3_600_000_000  # 1 hour


def rolling_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, ts_us, n_prev_hour, max_value_prev_hour):
    per-user trailing-1-hour event count and max value — a RANGE-frame
    window (peers by timestamp, not row position), one hash shuffle on
    user_id; per-user state is the in-frame buffer only. Aggregates are
    COUNT and MAX (order-independent), never a float SUM, so the frame
    evaluation order of either engine cannot perturb the hash."""
    from .analytics import _events

    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ROLL_W_US, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_prev_hour"),
        F.max("value").over(w).alias("max_value_prev_hour"),
    ).orderBy("event_id")


ROLLING_WINDOW_SQL = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       COUNT(*) OVER w AS n_prev_hour,
       MAX(value) OVER w AS max_value_prev_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {ROLL_W_US} PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# SCD2 dimension build
# ---------------------------------------------------------------------------

SCD2_EVENT = "purchase"


def scd2_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, version, value_cents, valid_from_us, valid_to_us,
    is_current): a type-2 slowly-changing dimension built from the
    '{SCD2_EVENT}' event stream — each change to a user's value opens a
    new version row; the previous version closes at the new row's
    timestamp (valid_to is NULL on the current version).

    One window per user (lead for the closing edge, row_number for the
    version) — a single hash shuffle on user_id, per-user state is rank
    bookkeeping; exactly the plan that builds billion-row SCD2
    dimensions from CDC feeds. value is compared in integer cents so
    the change-detection predicate is bit-stable cross-engine."""
    from .analytics import _events

    e = _events(spark, sf_dir).filter(F.col("event_type") == SCD2_EVENT)
    rows = e.select(
        "user_id",
        "ts_us",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    # keep only CHANGE rows (value differs from the previous event)
    changes = (
        rows.withColumn("prev_cents", F.lag("value_cents").over(w))
        .filter(
            F.col("prev_cents").isNull()
            | (F.col("value_cents") != F.col("prev_cents"))
        )
        .drop("prev_cents")
    )
    w2 = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        changes.select(
            "user_id",
            F.row_number().over(w2).cast("long").alias("version"),
            "value_cents",
            F.col("ts_us").alias("valid_from_us"),
            F.lead("ts_us").over(w2).alias("valid_to_us"),
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# cohort retention: the classic growth-analytics matrix
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_day, day_offset, n_users): users cohorted by first-seen
    epoch-day; each cell counts distinct cohort users active again
    day_offset days later — the retention matrix every product/growth
    pipeline derives from an event stream.

    Plan: the first-seen day is a min() window over the user_id
    partition (one hash shuffle, reused straight from the scan); the
    (cohort, offset, user) triples are then distinct-ed and counted —
    both aggregates partial-combine map-side, so shuffle volume is
    |users| x |active offsets|, not |events|. The same plan holds when
    the stream is billions of events: per-user state in the window is
    one running min."""
    from .analytics import _events

    e = _events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us DIV {DAY_US}").alias("day")
    )
    w = W.partitionBy("user_id")
    return (
        e.withColumn("cohort_day", F.min("day").over(w))
        .select(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


COHORT_RETENTION_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
), cohorted AS (
  SELECT DISTINCT MIN(day) OVER (PARTITION BY user_id) AS cohort_day,
         day - MIN(day) OVER (PARTITION BY user_id) AS day_offset,
         user_id
  FROM e
)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM cohorted
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# gap-filled resample: dense hourly series with zero-filled holes
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000


def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hour, n_events): dense hourly count series per
    event_type — hours with no events appear with n_events = 0, between
    that type's first and last active hour. Downstream time-series
    models (and SCALE.md's streaming rollups) need the dense spine.

    Plan: the sparse counts are one groupBy; the spine is generated
    from the tiny per-type (min,max) aggregate via sequence+explode —
    |types| rows exploding to |types| x |hours|, never a driver loop —
    then a hash left-join back onto the sparse counts. Spine size is
    independent of |events|, so the join's build side stays small
    enough to broadcast at any data scale."""
    from .analytics import _events

    e = _events(spark, sf_dir).select(
        "event_type", F.expr(f"ts_us DIV {HOUR_US}").alias("hour")
    )
    sparse = e.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    spine = (
        e.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1")).alias("hour"),
        )
    )
    return (
        spine.join(sparse, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("event_type", "hour")
    )


GAPFILL_HOURLY_SQL = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {HOUR_US} AS hour FROM events
), sparse AS (
  SELECT event_type, hour, COUNT(*) AS n_events
  FROM e GROUP BY event_type, hour
), spine AS (
  SELECT event_type, UNNEST(generate_series(MIN(hour), MAX(hour))) AS hour
  FROM e GROUP BY event_type
)
SELECT s.event_type, s.hour, COALESCE(sp.n_events, 0) AS n_events
FROM spine s
LEFT JOIN sparse sp ON s.event_type = sp.event_type AND s.hour = sp.hour
ORDER BY s.event_type, s.hour
"""


SCD2_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
  FROM events WHERE event_type = '{SCD2_EVENT}'
), changes AS (
  SELECT user_id, ts_us, event_id, value_cents
  FROM (SELECT *, LAG(value_cents) OVER w AS prev_cents
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
  WHERE prev_cents IS NULL OR value_cents != prev_cents
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
       value_cents,
       ts_us AS valid_from_us,
       LEAD(ts_us) OVER w2 AS valid_to_us,
       LEAD(ts_us) OVER w2 IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY user_id, version
"""
