"""Watermarked stream-stream interval join: click→purchase attribution
over an unbounded event feed — the last Structured Streaming operator
family the extension suite lacked (windowed agg, dropDuplicates state,
applyInPandasWithState sessionizer/CMS live in the sibling modules).

Semantics: every purchase is joined to every click by the SAME user
whose click time is within [purchase_time - HORIZON, purchase_time]
(inclusive) — the interval-bounded attribution that the batch as-of
join (operators.temporal.asof_attribution) answers with "latest prior
click only". Inner-join multiplicity is kept: a purchase inside two
clicks' horizons emits two rows, exactly like the batch twin below, so
stream and batch converge row-for-row on a static source.

At scale: both sides are watermarked and the join condition bounds
event-time distance, so each side's state store holds only
HORIZON+LATENESS of history per user — the textbook bounded-state
stream-stream join. Without the time bound Spark would (correctly)
refuse to run it append-mode; with it, state GC follows the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import event_time_expr, pin_utc, stream_events_raw

# single source of truth for the horizon: the SQL oracle derives its
# microsecond literal from this value, so tuning it cannot silently
# desynchronize the streaming join from its hash-gate twin
ATTRIBUTION_HORIZON_US = 3_600_000_000
ATTRIBUTION_HORIZON = f"{ATTRIBUTION_HORIZON_US // 1_000_000} seconds"
LATENESS = "30 minutes"


def _sides(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clicks, purchases) with event_time and per-side watermarks."""
    et = event_time_expr(raw)
    clicks = (
        raw.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            et.alias("click_time"),
        )
        .withWatermark("click_time", LATENESS)
    )
    purchases = (
        raw.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            et.alias("purchase_time"),
        )
        .withWatermark("purchase_time", LATENESS)
    )
    return clicks, purchases


def _joined(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("click_time") <= F.col("purchase_time"))
        & (
            F.col("click_time")
            >= F.col("purchase_time") - F.expr(f"INTERVAL {ATTRIBUTION_HORIZON}")
        )
    )
    return purchases.join(clicks, cond).select(
        "purchase_id",
        F.col("purchase_user").alias("user_id"),
        "click_id",
        (
            F.unix_micros("purchase_time") - F.unix_micros("click_time")
        ).alias("gap_us"),
    )


def stream_attribution(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming click→purchase interval join (returns the streaming DF;
    caller attaches a sink)."""
    raw = stream_events_raw(spark, src_dir)
    clicks, purchases = _sides(raw)
    return _joined(clicks, purchases)


def run_attribution_export(
    spark: SparkSession, src_dir: str, out_dir: str
) -> dict:
    """One availableNow cycle: attributed (purchase, click) pairs
    appended to parquet with checkpointed join state across cycles."""
    q = (
        stream_attribution(spark, src_dir)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "attributed"))
        .option("checkpointLocation", os.path.join(out_dir, "_attr_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "attributed")}


def batch_equivalent(spark: SparkSession, src_dir: str) -> DataFrame:
    """The batch query the stream must converge to on a static source
    (same expressions, no watermarks)."""
    pin_utc(spark)
    raw = spark.read.parquet(src_dir)
    et = event_time_expr(raw)
    clicks = raw.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        et.alias("click_time"),
    )
    purchases = raw.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        et.alias("purchase_time"),
    )
    return _joined(clicks, purchases)


def streaming_attribution_pairs(spark: SparkSession, src_dir: str) -> DataFrame:
    """(purchase_id, user_id, click_id, gap_us): one availableNow cycle
    of the watermarked stream-stream interval join, hash-gated against
    the plain batch interval-join SQL. A single staged file drains in
    one micro-batch, and inner stream-stream joins emit matches
    immediately, so the emitted set equals the batch join exactly
    (verified at both fixture SFs); a multi-batch drain may withhold
    pairs whose click-side state the watermark already evicted — that
    subset-vs-convergence contract is covered in
    tests/test_streaming_joins.py.

    Runs against throwaway source/sink/checkpoint dirs; result pinned
    with localCheckpoint before cleanup."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="dp_attr_src_")
    out = tempfile.mkdtemp(prefix="dp_attr_out_")
    try:
        shutil.copy(
            os.path.join(src_dir, "events.parquet"),
            os.path.join(src, "events.parquet"),
        )
        info = run_attribution_export(spark, src, out)
        return (
            spark.read.parquet(info["sink_path"])
            .orderBy("purchase_id", "click_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STREAMING_ATTRIBUTION_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
c AS (SELECT event_id AS click_id, user_id, us AS cus FROM e
      WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, us AS pus FROM e
      WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, c.click_id, p.pus - c.cus AS gap_us
FROM p JOIN c ON p.user_id = c.user_id
             AND c.cus <= p.pus
             AND c.cus >= p.pus - {ATTRIBUTION_HORIZON_US}
ORDER BY purchase_id, click_id
"""
