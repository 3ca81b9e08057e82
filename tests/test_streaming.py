"""Structured Streaming incremental export: availableNow cycles must
converge to the batch result, and a second cycle after new data appends
only the new windows (exactly-once)."""

import os
import shutil

from oracledb_datapump_spark.streaming import incremental as I


def _copy_parquet(src_file: str, dst_dir: str, name: str):
    os.makedirs(dst_dir, exist_ok=True)
    shutil.copy(src_file, os.path.join(dst_dir, name))


def test_incremental_converges_to_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "stream_out")
    _copy_parquet(f"{sf_dir}/events.parquet", src, "part-0.parquet")

    info = I.run_incremental_export(spark, src, out)
    assert info["batches"] >= 1

    got = spark.read.parquet(info["sink_path"])
    want = I.batch_equivalent(spark, src)
    g = {(r.window_start, r.window_end, r.event_type): r.n_events for r in got.collect()}
    w = {(r.window_start, r.window_end, r.event_type): r.n_events for r in want.collect()}
    # append mode only emits windows the watermark has passed: every
    # emitted window must match batch exactly, and anything missing must
    # sit within the 30-minute watermark horizon of the max event time.
    assert g, "stream emitted nothing"
    for k, v in g.items():
        assert w.get(k) == v, k
    horizon = max(ws for (ws, _, _) in w) if w else None
    import datetime as dt

    for k in set(w) - set(g):
        assert k[0] >= horizon - dt.timedelta(hours=1), f"non-tail window missing: {k}"


def test_second_cycle_is_incremental(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    _copy_parquet(f"{sf_dir}/events.parquet", src, "a.parquet")
    I.run_incremental_export(spark, src, out)
    n1 = spark.read.parquet(os.path.join(out, "windowed")).count()

    # no new data → no new rows
    I.run_incremental_export(spark, src, out)
    n2 = spark.read.parquet(os.path.join(out, "windowed")).count()
    assert n2 == n1
