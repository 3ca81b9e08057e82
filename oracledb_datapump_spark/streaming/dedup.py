"""Streaming deduplication: exactly-once event feeds from at-least-once
sources (the stream-side twin of operators.dedup.dedup_exact).

``dropDuplicates`` over a watermarked stream keeps one state entry per key
inside the watermark horizon — duplicates arriving within the horizon
(retries, replays, overlapping file drops) are suppressed; state is GC'd
as the watermark advances, so memory is bounded by the horizon, not the
stream length. At 100 TB/day this is the standard ingestion front-door.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import event_time_expr, stream_events_raw

DEDUP_HORIZON = "2 hours"


def stream_dedup_events(spark: SparkSession, src_dir: str) -> DataFrame:
    raw = stream_events_raw(spark, src_dir)
    events = raw.withColumn("event_time", event_time_expr(raw))
    return events.withWatermark("event_time", DEDUP_HORIZON).dropDuplicates(
        ["event_id", "event_time"]
    )


def run_dedup_export(spark: SparkSession, src_dir: str, out_dir: str) -> dict:
    """availableNow cycle: deduplicated events appended to parquet;
    re-delivered events (same event_id+time inside the horizon) are
    suppressed, including across cycles via the checkpointed state."""
    q = (
        stream_dedup_events(spark, src_dir)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "deduped"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "deduped")}


# ---------------------------------------------------------------------------
# watermarked windowed aggregation (streaming twin of events_hourly_rollup)
# ---------------------------------------------------------------------------

ROLLUP_LATENESS = "30 minutes"


def stream_hourly_rollup(spark: SparkSession, src_dir: str) -> DataFrame:
    """Tumbling 1-hour (event_type, window) counts over a watermarked
    stream — the standard late-data-tolerant windowed aggregation.
    Events later than ROLLUP_LATENESS behind the max seen event time are
    dropped; closed windows are emitted once (append mode) and their
    state GC'd, so state is bounded by windows-in-horizon, not stream
    length. Batch twin: operators.analytics.events_hourly_rollup."""
    raw = stream_events_raw(spark, src_dir)
    events = raw.withColumn("event_time", event_time_expr(raw))
    return (
        events.withWatermark("event_time", ROLLUP_LATENESS)
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_start"),
            "event_type",
            "n_events",
        )
    )


def run_rollup_export(spark: SparkSession, src_dir: str, out_dir: str) -> dict:
    """availableNow cycle: closed hourly windows appended to parquet with
    checkpointed state across cycles."""
    q = (
        stream_hourly_rollup(spark, src_dir)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "rollup"))
        .option("checkpointLocation", os.path.join(out_dir, "_rollup_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "rollup")}
