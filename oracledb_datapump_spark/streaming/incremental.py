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
    # over-report every cycle after the first. Count via the batchId SPAN
    # within this run, not len(): the recentProgress buffer is capped at
    # spark.sql.streaming.numRecentProgressUpdates (default 100), so a
    # single drain spanning >100 micro-batches would under-report by len().
    progress = list(q.recentProgress)
    if progress:
        batches = int(progress[-1].batchId) - int(progress[0].batchId) + 1
    else:
        batches = 0
    return {
        "batches": batches,
        "sink_path": os.path.join(out_dir, "windowed"),
    }


INCREMENTAL_LATENESS_US = 30 * 60 * 1_000_000  # windowed_counts' "30 minutes"


def incremental_export_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_start, event_type, n_events): TWO checkpointed availableNow
    cycles of ``run_incremental_export`` over a time-split events source
    — the early half drained in cycle 1, the late half landing as a new
    file and drained in cycle 2 from cycle 1's checkpoint. The
    accumulated parquet dump (append-only, exactly-once via the file
    source's checkpointed log) must equal the declarative batch
    aggregate restricted to CLOSED windows: window end at or before the
    final watermark (max event time − 30 min lateness). The oracle
    states exactly that, putting the CDC-style incremental-export path
    (previously pytest-only) under the full cross-engine hash gate.

    ``approx_users`` (HLL sketch) is excluded from the gated projection:
    approximate-distinct is engine-specific by construction; its
    streaming-equals-batch property is covered by
    tests/test_incremental_export.py.

    Split point is mid-timeline, so every cycle-2 event is newer than
    cycle 1's watermark (no cross-cycle late drops) — the real
    streaming-ingestion contract: arrival ordered to within the
    watermark tolerance. Runs against throwaway source/sink/checkpoint
    dirs; result pinned with localCheckpoint before cleanup."""
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = tempfile.mkdtemp(prefix="dp_increxp_src_")
    out = tempfile.mkdtemp(prefix="dp_increxp_out_")
    try:
        tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        ts = tbl.column("ts")
        lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
        mid = lo + (hi - lo) // 2 if isinstance(lo, int) else lo + (hi - lo) / 2
        early = tbl.filter(pc.less(ts, mid))
        late = tbl.filter(pc.greater_equal(ts, mid))
        if early.num_rows == 0 or late.num_rows == 0:
            # degenerate timeline (all-equal ts): single-cycle fallback
            pq.write_table(tbl, os.path.join(src, "events-0.parquet"))
            info = run_incremental_export(spark, src, out)
        else:
            pq.write_table(early, os.path.join(src, "events-0.parquet"))
            run_incremental_export(spark, src, out)
            pq.write_table(late, os.path.join(src, "events-1.parquet"))
            info = run_incremental_export(spark, src, out)
        return (
            spark.read.parquet(info["sink_path"])
            .select(
                F.unix_timestamp("window_start").alias("hour_start"),
                "event_type",
                "n_events",
            )
            .orderBy("hour_start", "event_type")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


INCREMENTAL_EXPORT_CYCLES_SQL = f"""
WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
mx AS (SELECT MAX(us) AS m FROM e),
agg AS (
  SELECT (us // 3600000000) * 3600 AS hour_start, event_type,
         COUNT(*) AS n_events
  FROM e GROUP BY 1, 2
)
SELECT hour_start, event_type, n_events FROM agg, mx
WHERE (hour_start + 3600) * 1000000 <= m - {INCREMENTAL_LATENESS_US}
ORDER BY hour_start, event_type
"""


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
