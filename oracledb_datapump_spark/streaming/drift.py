"""Streaming Page–Hinkley control chart: bounded-state drift detection
over an order stream, exact-parity with the batch detector.

operators.pipeline72.page_hinkley_drift computes the PH trajectory in
one batch pass; this module maintains the SAME trajectory incrementally
across micro-batches. The scale posture is the control-chart one:

  * the per-batch heavy lifting — rolling the micro-batch up to
    (day, revenue) — is a DISTRIBUTED groupBy inside ``foreachBatch``
    (the raw rows never funnel through one task);
  * the fold state is O(1): (n, cum, m, min m, last_day, batch_id) —
    six scalars, checkpointed as JSON next to the sink, so a later
    cycle resumes the chart exactly where the previous one stopped;
  * each processed day emits one (day, i, m_q, ph_q) trajectory row to
    the parquet sink — the sink IS the control chart. Rows land in a
    per-batch partition dir written with overwrite, and the state file
    records the last committed batch_id, so at-least-once batch replay
    neither duplicates trajectory rows nor wedges on the day-order
    contract (see apply_batch).

Day-order contract: cycles deliver whole days strictly AFTER the
state's last_day (the CDC-append semantics every control chart assumes
— a day is only charted once it is complete). A violation raises
loudly rather than silently corrupting the fold.

The integer fold is bit-identical to the batch operator: mean_i =
cum div i (floor), dev_i = x_i − mean_i − δ, m_i = Σ dev, PH_i =
m_i − min_{j≤i} m_j — the gated query runs TWO availableNow cycles
(first/second calendar half) and hash-matches the full-data SQL
trajectory, proving cross-cycle state resume is exact.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline72 import PH_DELTA_Q
from ..functions.local_table import values_df

_STATE_FILE = "_ph_state.json"


def _load_state(out_dir: str) -> dict:
    p = os.path.join(out_dir, _STATE_FILE)
    if os.path.exists(p):
        st = json.load(open(p))
        st.setdefault("batch_id", None)
        return st
    return {
        "n": 0,
        "cum": 0,
        "m": 0,
        "minm": 0,
        "last_day": None,
        "batch_id": None,
    }


def _save_state(out_dir: str, st: dict) -> None:
    with open(os.path.join(out_dir, _STATE_FILE), "w") as f:
        json.dump(st, f)


def run_ph_cycle(spark: SparkSession, src_dir: str, out_dir: str) -> dict:
    """One availableNow catch-up cycle: drain the staged order files,
    roll up per day (distributed), fold the calendar-bounded day rows
    into the PH state, append trajectory rows to the sink."""
    os.makedirs(out_dir, exist_ok=True)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Structured Streaming delivers at-least-once: after a failure (or
        # a lost checkpoint commit) the same batch replays. The fold is
        # made idempotent two ways: (1) a batch whose id the state file
        # already records is fully committed — skip it instead of tripping
        # the day-order contract; (2) trajectory rows land in a
        # per-batch partition dir written with overwrite, so a replay
        # that re-folds from stale state (deterministically — availableNow
        # re-delivers identical content) rewrites the same rows in place
        # rather than appending duplicates.
        st = _load_state(out_dir)
        if st["batch_id"] is not None and batch_id <= st["batch_id"]:
            return
        daily = (
            batch_df.select(
                F.expr(
                    "CAST(datediff(o_orderdate, to_date('1992-01-01'))"
                    " AS LONG)"
                ).alias("day"),
                F.expr(
                    "CAST(round(o_totalprice * 100) AS LONG)"
                ).alias("rc"),
            )
            .groupBy("day")
            .agg(F.sum("rc").alias("x"))
            .orderBy("day")
            .collect()  # |days in batch| rows — calendar-bounded
        )
        if not daily:
            return
        if st["last_day"] is not None and daily[0]["day"] <= st["last_day"]:
            raise RuntimeError(
                "page-hinkley stream: day order violated — batch starts at "
                f"{daily[0]['day']} but state already folded day "
                f"{st['last_day']} (cycles must deliver whole days strictly "
                "after the charted prefix)"
            )
        rows = []
        for r in daily:
            st["n"] += 1
            st["cum"] += int(r["x"])
            dev = int(r["x"]) - st["cum"] // st["n"] - PH_DELTA_Q
            st["m"] += dev
            if st["n"] == 1 or st["m"] < st["minm"]:
                st["minm"] = st["m"]
            st["last_day"] = int(r["day"])
            rows.append(
                (int(r["day"]), st["n"], st["m"], st["m"] - st["minm"])
            )
        values_df(spark,
            rows, "day long, i long, m_q long, ph_q long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "trajectory", f"batch_id={batch_id}")
        )
        st["batch_id"] = batch_id
        _save_state(out_dir, st)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation", os.path.join(out_dir, "_ph_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "trajectory")}


def streaming_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, i, m_q, ph_q): the PH trajectory built by TWO checkpointed
    availableNow cycles — the orders fixture split at its calendar
    midpoint, first half staged for cycle 1, second half arriving for
    cycle 2 — hash-gated against the one-pass SQL trajectory over the
    full data. The match proves the five-long JSON state resumes the
    integer fold exactly across cycles (the streaming control chart a
    100 TB/day pipeline would run nightly).

    Runs against throwaway source/sink/checkpoint dirs; result pinned
    with localCheckpoint before cleanup."""
    import glob
    import shutil
    import tempfile

    from ..events_source import pin_utc

    def _stage_flat(df, dest: str) -> None:
        """Land a frame as ONE flat parquet file (the file-source layout
        the fixtures use — the stream reader lists flat files only)."""
        tmp = tempfile.mkdtemp(prefix="dp_ph_stage_")
        try:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
            shutil.move(part, dest)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    pin_utc(spark)
    src = tempfile.mkdtemp(prefix="dp_ph_src_")
    out = tempfile.mkdtemp(prefix="dp_ph_out_")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        day = F.expr(
            "CAST(datediff(o_orderdate, to_date('1992-01-01')) AS LONG)"
        )
        bounds = orders.agg(
            F.expr(
                "(CAST(datediff(min(o_orderdate), to_date('1992-01-01'))"
                " AS LONG) + CAST(datediff(max(o_orderdate),"
                " to_date('1992-01-01')) AS LONG) + 1) div 2"
            ).alias("mid")
        ).collect()[0]
        mid = int(bounds["mid"])
        _stage_flat(orders.filter(day < mid), os.path.join(src, "o1.parquet"))
        run_ph_cycle(spark, src, out)
        _stage_flat(
            orders.filter(day >= mid), os.path.join(src, "o2.parquet")
        )
        run_ph_cycle(spark, src, out)
        return (
            spark.read.parquet(os.path.join(out, "trajectory"))
            .select("day", "i", "m_q", "ph_q")
            .orderBy("day")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STREAMING_PAGE_HINKLEY_SQL = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1
),
path AS (
  SELECT day, x,
         ROW_NUMBER() OVER (ORDER BY day) AS i,
         SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily
),
devs AS (
  SELECT day, i, x - cum // i - {PH_DELTA_Q} AS dev FROM path
),
ms AS (
  SELECT day, i,
         SUM(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS m
  FROM devs
)
SELECT CAST(day AS BIGINT) AS day, CAST(i AS BIGINT) AS i,
       CAST(m AS BIGINT) AS m_q,
       CAST(m - MIN(m) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS ph_q
FROM ms ORDER BY day
"""
