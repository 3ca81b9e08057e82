"""Incremental / CDC-style export over the ``events`` stream.

The reference is batch-only (SURVEY.md §2.9); this is the M5 extension:
an append-mode incremental pipeline that (a) tails an event source, (b)
windows + watermarks for late data, (c) writes an append-only Parquet dump
set with the same manifest/event-log layout as batch exports, so an
importer can't tell the difference.

Batch parity: each streaming query has a batch twin (used by the oracle
checks and by `events_hourly_rollup`); Structured Streaming guarantees the
incremental result converges to the batch result for these aggregations.

At scale: the file source here stands in for Kafka; watermark bounds state
size; `availableNow` triggers give catch-up batch semantics on the same
code path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import event_time_expr, stream_events_raw


def _with_event_time(df: DataFrame) -> DataFrame:
    return df.withColumn("event_time", event_time_expr(df))


def stream_events(spark: SparkSession, src_dir: str) -> DataFrame:
    """readStream over a parquet directory (stand-in for Kafka); ``ts``
    schema sniffed from the files present (ns-as-long or timestamp[us])."""
    return _with_event_time(stream_events_raw(spark, src_dir))


def windowed_counts(events: DataFrame, window: str = "1 hour", late: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    data — the streaming twin of analytics.events_hourly_rollup."""
    return (
        events.withWatermark("event_time", late)
        .groupBy(F.window("event_time", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
    )


def run_incremental_export(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> dict:
    """One availableNow cycle: consume whatever is in ``src_dir``, append
    windowed aggregates to ``out_dir`` as Parquet. Returns progress info.
    Re-running after new files land continues from the checkpoint —
    exactly-once append (CDC-style incremental export)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    events = stream_events(spark, src_dir)
    agg = windowed_counts(events)
    flat = agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n_events",
        "approx_users",
    )
    q = (
        flat.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "windowed"))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # recentProgress covers only THIS run's micro-batches; lastProgress's
    # batchId is cumulative across the checkpoint's lifetime and would
    # over-report every cycle after the first
    return {
        "batches": len(q.recentProgress),
        "sink_path": os.path.join(out_dir, "windowed"),
    }


def batch_equivalent(spark: SparkSession, src_dir: str) -> DataFrame:
    """The batch query the stream must converge to (same expressions)."""
    from ..events_source import pin_utc

    pin_utc(spark)
    df = _with_event_time(spark.read.parquet(src_dir))
    return (
        df.groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )
