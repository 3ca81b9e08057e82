"""Streaming Page-Hinkley: two-cycle checkpointed fold equals the
one-pass batch trajectory."""

import duckdb
import pytest

from oracledb_datapump_spark.streaming.drift import (
    STREAMING_PAGE_HINKLEY_SQL,
    streaming_page_hinkley,
)


def test_two_cycle_trajectory_matches_batch_sql(spark, sf_dir):
    sdf = streaming_page_hinkley(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    ddf = con.sql(STREAMING_PAGE_HINKLEY_SQL).df()
    con.close()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols].sort_values(cols).reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)
    # the trajectory is per-day, exactly once, monotone i
    assert list(sdf.sort_values("day")["i"]) == list(range(1, len(sdf) + 1))


def test_out_of_order_day_refused(spark, sf_dir, tmp_path):
    """A cycle that re-delivers an already-charted day must fail loudly."""
    import os

    from pyspark.sql import functions as F

    from oracledb_datapump_spark.streaming.drift import run_ph_cycle

    import glob
    import shutil

    def _stage_flat(df, dest):
        tmp = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(part, dest)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _stage_flat(orders.limit(200), os.path.join(src, "o1.parquet"))
    run_ph_cycle(spark, src, out)
    # stage the SAME rows again (days <= last charted day)
    _stage_flat(orders.limit(50), os.path.join(src, "o2.parquet"))
    with pytest.raises(Exception, match="day order violated"):
        run_ph_cycle(spark, src, out)


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    """At-least-once replay semantics: a re-delivered batch neither
    duplicates trajectory rows nor trips the day-order contract.

    Two failure windows are simulated:
      * checkpoint commit lost AFTER state save → the whole batch
        replays with batch_id <= state.batch_id → skipped;
      * crash BETWEEN the trajectory write and the state save → the
        state file is one batch stale → the replayed fold rewrites the
        same per-batch partition in place (overwrite, not append).
    """
    import glob
    import json
    import os
    import shutil

    from oracledb_datapump_spark.streaming.drift import (
        _STATE_FILE,
        run_ph_cycle,
    )

    def _stage_flat(df, dest):
        tmp = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(part, dest)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _stage_flat(orders.limit(200), os.path.join(src, "o1.parquet"))
    run_ph_cycle(spark, src, out)
    traj = os.path.join(out, "trajectory")
    first = sorted(
        tuple(r)
        for r in spark.read.parquet(traj)
        .select("day", "i", "m_q", "ph_q")
        .collect()
    )
    n1 = len(first)
    state1 = json.load(open(os.path.join(out, _STATE_FILE)))
    assert state1["batch_id"] is not None

    # window 1: checkpoint lost after full commit -> batch replays, skipped
    shutil.rmtree(os.path.join(out, "_ph_ckpt"))
    run_ph_cycle(spark, src, out)
    assert spark.read.parquet(traj).count() == n1
    assert json.load(open(os.path.join(out, _STATE_FILE))) == state1

    # window 2: crash between trajectory write and state save -> state is
    # stale (pre-batch), trajectory partition exists; replay must rewrite
    # it in place and converge to the same state
    shutil.rmtree(os.path.join(out, "_ph_ckpt"))
    with open(os.path.join(out, _STATE_FILE), "w") as f:
        json.dump(
            {"n": 0, "cum": 0, "m": 0, "minm": 0, "last_day": None,
             "batch_id": None},
            f,
        )
    run_ph_cycle(spark, src, out)
    replayed = sorted(
        tuple(r)
        for r in spark.read.parquet(traj)
        .select("day", "i", "m_q", "ph_q")
        .collect()
    )
    assert replayed == first
    assert json.load(open(os.path.join(out, _STATE_FILE))) == state1
