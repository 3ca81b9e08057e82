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
    r = right.select(
        F.col(by).alias("__by"),
        F.col(ts_right).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in carry],
    )
    l = left.select(
        F.col(by).alias("__by"),
        F.col(ts_left).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in carry],
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
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
    )
    out_left = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    return carried.filter(F.col("__tag") == 1).select(*out_left, *carry)


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
