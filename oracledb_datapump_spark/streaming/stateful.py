"""Custom stateful streaming operator: session tracking with
``applyInPandasWithState``.

The batch sessionizer (operators.analytics.events_sessionize) is a window
function; the streaming form needs explicit state because sessions span
micro-batches. State per user = (session_seq, last_ts_us, n_events,
session_start_us); a 30-minute event-time gap closes a session and emits
it; a processing-time timeout flushes idle users' open sessions.

At scale: state is partitioned by user_id across executors (RocksDB state
store in production configs); the timeout bounds state size exactly like
a watermark would.
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..events_source import stream_events_raw, ts_us_expr, validate_events_source

SESSION_GAP_US = 30 * 60 * 1_000_000
# Idle-flush timer (processing time), for CONTINUOUS deployments only:
# pending timers keep a trigger(availableNow) query alive indefinitely
# (observed: the drain never completes), so catch-up runs use
# idle_flush_ms=0 → NoTimeout, and open sessions simply persist in the
# checkpointed state store until the next run — the correct incremental
# semantic anyway.
DEFAULT_IDLE_FLUSH_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # 'gap' | 'timeout'
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
    ]
)


def make_tracker(idle_flush_ms: int):
    def track_sessions(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user session tracker. Emits a row per CLOSED session; the open
        session lives in ``state`` between micro-batches."""
        (user_id,) = key
        closed: list[dict[str, Any]] = []

        if state.hasTimedOut:
            if state.exists:
                seq, last, n, start = state.get
                if n and last is not None:
                    closed.append(
                        dict(
                            user_id=user_id,
                            session_seq=seq,
                            n_events=n,
                            session_start_us=start,
                            session_end_us=last,
                            closed_by="timeout",
                        )
                    )
                    # KEEP the numbering memory: removing state here made
                    # the user's next session restart at seq 1, colliding
                    # with this emitted (user_id, seq) key. The keep-alive
                    # placeholder persists WITHOUT a timeout — under
                    # ProcessingTimeTimeout a key whose handler sets no new
                    # duration never fires again, so an idle user costs one
                    # dormant (seq, None) row instead of a wakeup every
                    # idle window for the stream's lifetime. The next real
                    # event re-reads seq and re-arms. State cost: one row
                    # per distinct user ever seen — the same cardinality
                    # class as stream dedup state, and the minimum any
                    # strictly-unique numbering scheme must remember.
                    state.update((seq + 1, None, 0, None))
                else:
                    # n == 0 placeholder timing out: unreachable now that
                    # placeholders are persisted un-armed, but if a legacy
                    # checkpoint carries an armed one, persist it un-armed
                    # (numbering survives, timer churn stops here).
                    state.update((seq, last, n, start))
            else:
                state.remove()
        else:
            if state.exists:
                seq, last, n, start = state.get
            else:
                # session_seq starts at 1, matching the batch sessionizer
                # (its cumulative-sum numbering counts the opening flag)
                seq, last, n, start = 1, None, 0, None
            # list() first: `pdfs` is a generator (always truthy), so the
            # old `if pdfs` guard was dead and pd.concat([]) would raise
            chunks = list(pdfs)
            rows = pd.concat(chunks) if chunks else pd.DataFrame()
            if len(rows):
                rows = rows.sort_values(["ts_us", "event_id"])
                for ts in rows["ts_us"]:
                    ts = int(ts)
                    if last is not None and ts - last > SESSION_GAP_US:
                        closed.append(
                            dict(
                                user_id=user_id,
                                session_seq=seq,
                                n_events=n,
                                session_start_us=start,
                                session_end_us=last,
                                closed_by="gap",
                            )
                        )
                        seq, n, start = seq + 1, 0, ts
                    if start is None:
                        start = ts
                    n += 1
                    # a LATE event (earlier micro-batch disorder) must not
                    # rewind the session clock: a rewound `last` fakes a
                    # gap on the next on-time event and can emit
                    # session_end < session_start. It still counts into
                    # the open session and may extend its start backward.
                    last = ts if last is None else max(last, ts)
                    start = ts if start is None else min(start, ts)
                state.update((seq, last, n, start))
                if idle_flush_ms > 0:
                    # idle users flush idle_flush_ms after their last batch
                    state.setTimeoutDuration(idle_flush_ms)

        if closed:
            yield pd.DataFrame(closed)

    return track_sessions


def _validate_ns_source(spark: SparkSession, src_dir: str) -> None:
    """Guard: a ``ts`` type the schema sniffer can't map silently yields
    zero rows instead of erroring (observed), so check one footer up
    front. Accepts ns-as-long AND µs/ms timestamps (the sniffer maps
    both); kept under its historical name for callers/tests."""
    validate_events_source(spark, src_dir)


def stream_sessions(
    spark: SparkSession, src_dir: str, idle_flush_ms: int = DEFAULT_IDLE_FLUSH_MS
) -> DataFrame:
    """readStream → stateful session tracking (returns the streaming DF;
    caller attaches a sink)."""
    raw = stream_events_raw(spark, src_dir)
    events = raw.withColumn("ts_us", ts_us_expr(raw))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_flush_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        make_tracker(idle_flush_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_session_export(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    idle_flush_ms: int = 0,  # availableNow catch-up: NoTimeout (see above)
) -> dict:
    """One availableNow cycle of the stateful sessionizer → parquet."""
    q = (
        stream_sessions(spark, src_dir, idle_flush_ms)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "sessions")}


def streaming_sessions_closed(spark: SparkSession, src_dir: str) -> DataFrame:
    """(user_id, session_seq, n_events, session_start_us,
    session_end_us): one availableNow catch-up cycle of the stateful
    sessionizer (applyInPandasWithState), returning the sessions CLOSED
    by a gap — declaratively, every session except each user's LAST
    (the open tail stays in the checkpointed state store for the next
    cycle). The oracle composes the batch sessionizer SQL with exactly
    that predicate, so the custom stateful operator's output sits under
    the full cross-engine hash gate.

    Runs against throwaway source/sink/checkpoint dirs; result pinned
    with localCheckpoint before cleanup."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="dp_sess_src_")
    out = tempfile.mkdtemp(prefix="dp_sess_out_")
    try:
        shutil.copy(
            os.path.join(src_dir, "events.parquet"),
            os.path.join(src, "events.parquet"),
        )
        info = run_session_export(spark, src, out, idle_flush_ms=0)
        return (
            spark.read.parquet(info["sink_path"])
            .select(
                "user_id",
                "session_seq",
                "n_events",
                "session_start_us",
                "session_end_us",
            )
            .orderBy("user_id", "session_seq")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def _sessions_closed_sql() -> str:
    from ..operators.analytics import EVENTS_SESSIONIZE_SQL

    batch = EVENTS_SESSIONIZE_SQL.replace("ORDER BY user_id, session_seq", "")
    return f"""
WITH all_sessions AS ({batch})
SELECT user_id, session_seq, n_events, session_start_us, session_end_us
FROM (
  SELECT *, MAX(session_seq) OVER (PARTITION BY user_id) AS last_seq
  FROM all_sessions
)
WHERE session_seq < last_seq
ORDER BY user_id, session_seq
"""


STREAMING_SESSIONS_CLOSED_SQL = _sessions_closed_sql()


# -- native session_window in streaming mode ---------------------------------

SW_NATIVE_GAP = "30 minutes"


def streaming_session_window_native(
    spark: SparkSession, src_dir: str
) -> DataFrame:
    """(user_id, n_events, session_start_us, session_end_us): Spark's
    NATIVE ``session_window`` aggregate run as a STRUCTURED STREAMING
    query (watermarked, append mode) over three checkpointed
    availableNow cycles — the declarative counterpart of this module's
    applyInPandasWithState sessionizer, under the same cross-engine
    hash.

    Cycle mechanics (watermarks apply one batch late): cycle 1 drains
    the real events (watermark still at epoch → nothing emits, state
    accumulates); cycle 2 lands a sentinel event +30 days out (the
    batch runs against the cycle-1 watermark = max real event time,
    emitting every session closed strictly before it); cycle 3 lands a
    second sentinel +60 days (running against the cycle-2 watermark =
    sentinel-1's time, which closes EVERY real session — no boundary
    sensitivity at the stream tail). The sentinel user (-1) stays open
    in state and is filtered from the result; the oracle is the plain
    batch gap-islands sessionization of all real events, so the hash
    also re-proves the merge-at-exactly-gap boundary convention the
    batch probe established (session_window_builtin).

    At scale this is the production shape: session_window state is
    merged map-side inside the aggregate, the watermark bounds state
    size, and each cycle is one user-keyed shuffle."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .incremental import _land_single_parquet

    src = tempfile.mkdtemp(prefix="dp_swn_src_")
    out = tempfile.mkdtemp(prefix="dp_swn_out_")
    sink = os.path.join(out, "sessions")
    ckpt = os.path.join(out, "_ckpt")
    try:
        base = spark.read.parquet(os.path.join(src_dir, "events.parquet"))

        def sentinel(days: int) -> DataFrame:
            one = base.orderBy(F.desc("ts"), F.desc("event_id")).limit(1)
            return one.select(
                F.col("event_id") + days,  # unique, deterministic
                F.expr(f"ts + INTERVAL {days} DAYS").alias("ts"),
                F.lit(-1).cast(dict(base.dtypes)["user_id"]).alias(
                    "user_id"
                ),
                *[
                    F.col(c)
                    for c in base.columns
                    if c not in ("event_id", "ts", "user_id")
                ],
            ).toDF(*base.columns)

        def cycle() -> None:
            raw = stream_events_raw(spark, src)
            from ..events_source import event_time_expr

            ev = raw.withColumn("event_time", event_time_expr(raw))
            sess = (
                ev.withWatermark("event_time", "0 seconds")
                .groupBy(
                    "user_id",
                    F.session_window("event_time", SW_NATIVE_GAP),
                )
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.expr("unix_micros(min(event_time))").alias(
                        "session_start_us"
                    ),
                    F.expr("unix_micros(max(event_time))").alias(
                        "session_end_us"
                    ),
                )
                .select(
                    "user_id", "n_events", "session_start_us",
                    "session_end_us",
                )
            )
            q = (
                sess.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _land_single_parquet(base, os.path.join(src, "events-0.parquet"))
        cycle()
        _land_single_parquet(
            sentinel(30), os.path.join(src, "events-1.parquet")
        )
        cycle()
        _land_single_parquet(
            sentinel(60), os.path.join(src, "events-2.parquet")
        )
        cycle()
        return (
            spark.read.parquet(sink)
            .filter(F.col("user_id") >= 0)
            .orderBy("user_id", "session_start_us")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STREAMING_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""
