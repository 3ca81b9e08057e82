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

# lateness in µs first; the interval string AND the SQL oracle's
# eviction literal both derive from it (no silent drift on retune)
ROLLUP_LATENESS_US = 1_800_000_000
ROLLUP_LATENESS = f"{ROLLUP_LATENESS_US // 1_000_000} seconds"


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


def streaming_rollup_closed(spark: SparkSession, src_dir: str) -> DataFrame:
    """(hour_start, event_type, n_events): TWO availableNow cycles of the
    watermarked streaming hourly rollup over the events fixture —
    time-split into an early file (cycle 1) and a late file (cycle 2,
    resuming from cycle 1's checkpoint) — returning the CLOSED windows.
    This is the driver-gated proof that the Structured Streaming path
    executes INCREMENTALLY: watermark + window state survive the
    checkpoint/restart between cycles, cycle 2 appends only newly-closed
    windows, and the union equals the declarative definition of
    "closed": window end at or before the final watermark (max event
    time − {ROLLUP_LATENESS}). The oracle states exactly that in SQL,
    so streaming output sits under the full cross-engine hash gate.

    The split point is mid-timeline, so every cycle-2 event is NEWER
    than cycle 1's watermark (no cross-cycle late drops) and any window
    closed in cycle 1 ended ≥{ROLLUP_LATENESS} before the split —
    append-once output therefore matches the batch aggregate exactly.
    That is the real streaming ingestion contract: arrival ordered to
    within the watermark tolerance.

    (An exact window_end == watermark tie is pinned by
    tests/test_streaming.py::test_rollup_watermark_tie_boundary: Spark
    EMITS the tied window, matching this oracle's <= comparator — so an
    hour-aligned regenerated fixture cannot flip the gate.)

    Runs against throwaway source/sink/checkpoint dirs; the result is
    pinned with localCheckpoint before cleanup."""
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = tempfile.mkdtemp(prefix="dp_rollup_src_")
    out = tempfile.mkdtemp(prefix="dp_rollup_out_")
    try:
        tbl = pq.read_table(os.path.join(src_dir, "events.parquet"))
        ts = tbl.column("ts")
        lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
        mid = lo + (hi - lo) // 2 if isinstance(lo, int) else lo + (hi - lo) / 2
        early = tbl.filter(pc.less(ts, mid))
        late = tbl.filter(pc.greater_equal(ts, mid))
        if early.num_rows == 0 or late.num_rows == 0:
            # degenerate timeline (all-equal ts): single-cycle fallback
            pq.write_table(tbl, os.path.join(src, "events-0.parquet"))
            info = run_rollup_export(spark, src, out)
        else:
            pq.write_table(early, os.path.join(src, "events-0.parquet"))
            run_rollup_export(spark, src, out)
            pq.write_table(late, os.path.join(src, "events-1.parquet"))
            info = run_rollup_export(spark, src, out)
        return (
            spark.read.parquet(info["sink_path"])
            .orderBy("hour_start", "event_type")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STREAMING_ROLLUP_CLOSED_SQL = f"""
WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
mx AS (SELECT MAX(us) AS m FROM e),
agg AS (
  SELECT (us // 3600000000) * 3600 AS hour_start, event_type,
         COUNT(*) AS n_events
  FROM e GROUP BY 1, 2
)
SELECT hour_start, event_type, n_events FROM agg, mx
WHERE (hour_start + 3600) * 1000000 <= m - {ROLLUP_LATENESS_US}
ORDER BY hour_start, event_type
"""


def streaming_dedup_unique(spark: SparkSession, src_dir: str) -> DataFrame:
    """(event_type, n_events): one availableNow cycle of the watermarked
    streaming deduplicator over a DOUBLED events source — the fixture
    file staged twice, i.e. an at-least-once delivery where every event
    arrives exactly twice. dropDuplicates state suppresses the second
    copy of each (event_id, event_time), so the deduplicated sink
    aggregates to exactly the batch DISTINCT — stated in SQL, putting
    the exactly-once ingestion front-door under the cross-engine hash
    gate (previously pytest-only). Both copies land before the stream
    starts, so the availableNow file source drains them in one
    micro-batch and no event can be dropped as late; the suppression is
    pure dedup state, not watermark eviction.

    Runs against throwaway source/sink/checkpoint dirs; result pinned
    with localCheckpoint before cleanup."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="dp_dedup_src_")
    out = tempfile.mkdtemp(prefix="dp_dedup_out_")
    try:
        for copy in ("events-0.parquet", "events-1.parquet"):
            shutil.copy(
                os.path.join(src_dir, "events.parquet"),
                os.path.join(src, copy),
            )
        info = run_dedup_export(spark, src, out)
        return (
            spark.read.parquet(info["sink_path"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy("event_type")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STREAMING_DEDUP_UNIQUE_SQL = """
WITH uniq AS (
  SELECT DISTINCT event_id, ts, event_type FROM events
)
SELECT event_type, COUNT(*) AS n_events
FROM uniq
GROUP BY event_type
ORDER BY event_type
"""
