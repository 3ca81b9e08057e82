"""Streaming two-sided CUSUM control chart: fixed-reference drift
detection over an order stream, exact-parity with a one-pass SQL twin.

streaming/drift.py charts Page–Hinkley (adaptive running mean); this is
its fixed-reference sibling — the classic CUSUM chart a pipeline runs
when the expected level is CALIBRATED first and deviations from THAT
level are what matters. The first {CUSUM_BURN_DAYS} observed days are
the burn-in: μ_q = Σx div {CUSUM_BURN_DAYS}, allowance
k_q = μ_q div {CUSUM_K_DIV} and decision interval h_q = μ_q div
{CUSUM_H_DIV} are frozen from them (integer, so both engines derive
identical constants from the data). Post-burn-in days fold

    S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k))     upward drift
    S⁻_t = max(0, S⁻_{t-1} − (x_t − μ) − k)     downward drift

via the exact cumsum identity S_t = C_t − min_{0≤j≤t} C_j (C_0 = 0),
which is what the SQL twin computes with a window — the gated query
runs TWO availableNow cycles and hash-matches the full-data SQL chart,
proving the burn-in → fold state resumes exactly across cycles.

Scale/idempotency posture identical to drift.py: the per-batch rollup
is a distributed groupBy, the fold state is O(1) scalars in a JSON
file, trajectory rows land in per-batch partition dirs written with
overwrite, the state records the last committed batch_id, and a
replayed batch is skipped or rewritten in place — never duplicated,
never wedged on the day-order contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.local_table import values_df

#: burn-in length (observed days) that freezes the reference level.
CUSUM_BURN_DAYS = 28
#: allowance k = μ div this (0.5% of the reference level).
CUSUM_K_DIV = 200
#: decision interval h = μ div this (5% of the reference level).
CUSUM_H_DIV = 20

_STATE_FILE = "_cusum_state.json"


def _load_state(out_dir: str) -> dict:
    p = os.path.join(out_dir, _STATE_FILE)
    if os.path.exists(p):
        return json.load(open(p))
    return {
        "bn": 0,
        "bsum": 0,
        "mu_q": None,
        "k_q": None,
        "h_q": None,
        "c1": 0,
        "min1": 0,
        "c2": 0,
        "min2": 0,
        "i": 0,
        "last_day": None,
        "batch_id": None,
    }


def _save_state(out_dir: str, st: dict) -> None:
    with open(os.path.join(out_dir, _STATE_FILE), "w") as f:
        json.dump(st, f)


def run_cusum_cycle(spark: SparkSession, src_dir: str, out_dir: str) -> dict:
    """One availableNow catch-up cycle: drain staged order files, roll
    up per day (distributed), feed burn-in then fold the CUSUM pair,
    append post-burn-in chart rows to the sink."""
    os.makedirs(out_dir, exist_ok=True)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # drift.py's at-least-once contract: committed batches skip,
        # re-folded batches rewrite their own partition in place.
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
                "cusum stream: day order violated — batch starts at "
                f"{daily[0]['day']} but state already folded day "
                f"{st['last_day']} (cycles must deliver whole days "
                "strictly after the charted prefix)"
            )
        rows = []
        for r in daily:
            x = int(r["x"])
            st["last_day"] = int(r["day"])
            if st["bn"] < CUSUM_BURN_DAYS:
                st["bn"] += 1
                st["bsum"] += x
                if st["bn"] == CUSUM_BURN_DAYS:
                    st["mu_q"] = st["bsum"] // CUSUM_BURN_DAYS
                    st["k_q"] = st["mu_q"] // CUSUM_K_DIV
                    st["h_q"] = st["mu_q"] // CUSUM_H_DIV
                continue
            st["i"] += 1
            st["c1"] += x - st["mu_q"] - st["k_q"]
            st["min1"] = min(st["min1"], st["c1"])
            st["c2"] += -(x - st["mu_q"]) - st["k_q"]
            st["min2"] = min(st["min2"], st["c2"])
            splus = st["c1"] - st["min1"]
            sminus = st["c2"] - st["min2"]
            rows.append(
                (
                    int(r["day"]),
                    st["i"],
                    splus,
                    sminus,
                    bool(splus > st["h_q"] or sminus > st["h_q"]),
                )
            )
        if rows:
            values_df(spark,
                rows,
                "day long, i long, splus_q long, sminus_q long,"
                " alarm_flag boolean",
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, "chart", f"batch_id={batch_id}")
            )
        st["batch_id"] = batch_id
        _save_state(out_dir, st)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation", os.path.join(out_dir, "_cusum_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "chart")}


def streaming_cusum_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, i, splus_q, sminus_q, alarm_flag): the post-burn-in CUSUM
    chart built by TWO checkpointed availableNow cycles (orders split
    at the calendar midpoint), hash-gated against the one-pass SQL
    chart over the full data — the burn-in constants AND the fold
    state must resume exactly across the cycle boundary for the gate
    to pass.

    Runs against throwaway source/sink/checkpoint dirs; result pinned
    with localCheckpoint before cleanup."""
    import glob
    import shutil
    import tempfile

    from ..events_source import pin_utc

    def _stage_flat(df, dest: str) -> None:
        tmp = tempfile.mkdtemp(prefix="dp_cusum_stage_")
        try:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
            shutil.move(part, dest)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    pin_utc(spark)
    src = tempfile.mkdtemp(prefix="dp_cusum_src_")
    out = tempfile.mkdtemp(prefix="dp_cusum_out_")
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
        run_cusum_cycle(spark, src, out)
        _stage_flat(
            orders.filter(day >= mid), os.path.join(src, "o2.parquet")
        )
        run_cusum_cycle(spark, src, out)
        return (
            spark.read.parquet(os.path.join(out, "chart"))
            .select("day", "i", "splus_q", "sminus_q", "alarm_flag")
            .orderBy("day")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STREAMING_CUSUM_SQL = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1
),
path AS (
  SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
),
burn AS (
  SELECT SUM(x) // {CUSUM_BURN_DAYS} AS mu
  FROM path WHERE rn <= {CUSUM_BURN_DAYS}
),
consts AS (
  SELECT mu, mu // {CUSUM_K_DIV} AS k, mu // {CUSUM_H_DIV} AS h FROM burn
),
post AS (
  SELECT day, x, rn - {CUSUM_BURN_DAYS} AS i, mu, k, h
  FROM path CROSS JOIN consts
  WHERE rn > {CUSUM_BURN_DAYS}
),
cums AS (
  SELECT day, i, h,
         SUM(x - mu - k) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS c1,
         SUM(-(x - mu) - k) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS c2
  FROM post
),
chart AS (
  SELECT day, i, h,
         c1 - LEAST(MIN(c1) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
                    0) AS splus,
         c2 - LEAST(MIN(c2) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
                    0) AS sminus
  FROM cums
)
SELECT CAST(day AS BIGINT) AS day, CAST(i AS BIGINT) AS i,
       CAST(splus AS BIGINT) AS splus_q,
       CAST(sminus AS BIGINT) AS sminus_q,
       splus > h OR sminus > h AS alarm_flag
FROM chart ORDER BY day
"""
