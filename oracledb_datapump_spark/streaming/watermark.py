"""Watermark-policy comparison: the lateness-tolerance / emission-latency
trade-off, measured on the same arrival sequence.

``streaming_watermark_policy`` replays one deterministic out-of-order
arrival of the events fixture through the SAME windowed aggregation
under two watermark delays (30 minutes vs 12 hours) and returns both
policies' emitted (closed) windows. The short policy drops most of the
deliberately-delayed rows but publishes windows almost immediately; the
long policy counts the late rows at the price of holding back the final
12 hours of windows. That pair of outputs IS the report an ingestion
team reads before choosing ``withWatermark``'s delay — here it sits
under the cross-engine hash because Spark's drop/emit rules (late row
dropped iff its window end ≤ the pre-batch watermark; window emitted
iff its end ≤ the final watermark; watermark = max seen event time −
delay, advanced between micro-batches) are restated declaratively in
the DuckDB oracle.

Arrival sequence (Spark-side split, no driver row transfer): half the
events in the 24 h before the timeline midpoint — picked by a stable
event-id hash — are withheld from cycle 1 and delivered in cycle 2
together with everything after the midpoint. Cycle 1 therefore runs
the watermark up to ~mid − delay, making the withheld rows genuinely
late on redelivery.

No reference counterpart (the reference has no streaming surface);
extends the streaming extension family. At 100 TB/day the same two-run
replay against a retained arrival log is how a watermark retune is
validated before rollout.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import event_time_expr, load_events, stream_events_raw
from ..functions.text import hash64, sql_hash64
from .incremental import _land_single_parquet

# all µs-first; interval strings derive from them (no drift on retune)
POLICY_DELAYS_US = {"short_30m": 1_800_000_000, "long_12h": 43_200_000_000}
LATE_SPAN_US = 86_400_000_000  # delayed rows live in the 24h before mid


def _delay_interval(us: int) -> str:
    return f"{us // 1_000_000} seconds"


def _delayed_pred(ts_us, event_id, mid: int):
    """Row-local membership test for the withheld (late) set."""
    return (
        (ts_us >= F.lit(mid - LATE_SPAN_US))
        & (ts_us < F.lit(mid))
        & (hash64(F.concat(F.lit("late:"), event_id.cast("string"))) % 2 == 0)
    )


def _run_policy(
    spark: SparkSession, delay_us: int, cycle1: DataFrame, cycle2: DataFrame
) -> DataFrame:
    """Two availableNow cycles of a 1-hour windowed count under the given
    watermark delay; returns the appended (closed-window) sink rows."""
    src = tempfile.mkdtemp(prefix="dp_wm_src_")
    out = tempfile.mkdtemp(prefix="dp_wm_out_")
    try:
        for i, cyc in enumerate((cycle1, cycle2)):
            _land_single_parquet(cyc, os.path.join(src, f"events-{i}.parquet"))
            raw = stream_events_raw(spark, src)
            events = raw.withColumn("event_time", event_time_expr(raw))
            q = (
                events.withWatermark("event_time", _delay_interval(delay_us))
                .groupBy(F.window("event_time", "1 hour"))
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(
                    F.unix_timestamp(F.col("window.start")).alias(
                        "hour_start"
                    ),
                    "n_events",
                )
                .writeStream.format("parquet")
                .option("path", os.path.join(out, "sink"))
                .option("checkpointLocation", os.path.join(out, "_ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return (
            spark.read.parquet(os.path.join(out, "sink"))
            .select("hour_start", "n_events")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def streaming_watermark_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(policy, hour_start, n_events): closed hourly windows emitted by
    each watermark policy over the same late-arrival replay. See module
    docstring for the arrival construction and the drop/emit algebra
    the oracle restates."""
    ev = load_events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    mid = lo + (hi - lo) // 2
    delayed = _delayed_pred(F.col("ts_us"), F.col("event_id"), mid)
    pre = ev.filter(F.col("ts_us") < F.lit(mid))
    cycle1 = pre.filter(~delayed).drop("ts_us")
    cycle2 = (
        pre.filter(delayed)
        .unionByName(ev.filter(F.col("ts_us") >= F.lit(mid)))
        .drop("ts_us")
    )
    outs = []
    for policy, delay_us in POLICY_DELAYS_US.items():
        sink = _run_policy(spark, delay_us, cycle1, cycle2)
        outs.append(
            sink.select(
                F.lit(policy).alias("policy"), "hour_start", "n_events"
            )
        )
    return outs[0].unionByName(outs[1]).orderBy("policy", "hour_start")


def _policy_arm_sql(policy: str, delay_us: int) -> str:
    late_hash = sql_hash64("'late:' || CAST(event_id AS VARCHAR)")
    delayed = (
        f"(us >= mid - {LATE_SPAN_US} AND us < mid AND "
        f"{late_hash} % 2 = 0)"
    )
    return f"""
  SELECT '{policy}' AS policy, hour_start, n_events FROM (
    WITH marked AS (
      SELECT us, {delayed} AS delayed FROM e_mid
    ),
    w1 AS (
      SELECT MAX(us) - {delay_us} AS w FROM marked
      WHERE us < (SELECT mid FROM b2) AND NOT delayed
    ),
    accepted AS (
      SELECT us FROM marked, w1
      WHERE NOT delayed OR (us // 3600000000 + 1) * 3600000000 > w1.w
    )
    SELECT (us // 3600000000) * 3600 AS hour_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM accepted
    GROUP BY 1
    HAVING (MIN(us) // 3600000000 + 1) * 3600000000
           <= (SELECT MAX(us) FROM e_mid) - {delay_us}
  )"""


def _watermark_policy_sql() -> str:
    arms = " UNION ALL ".join(
        _policy_arm_sql(p, d) for p, d in POLICY_DELAYS_US.items()
    )
    return f"""
WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM e),
b2 AS (SELECT lo + (hi - lo) // 2 AS mid FROM b),
e_mid AS (SELECT event_id, us, (SELECT mid FROM b2) AS mid FROM e)
SELECT policy, hour_start, n_events FROM ({arms})
ORDER BY policy, hour_start
"""


STREAMING_WATERMARK_POLICY_SQL = _watermark_policy_sql()
