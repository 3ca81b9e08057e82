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


def test_stream_cms_converges_to_batch(spark, sf_dir, tmp_path):
    """The streaming CMS's checkpointed cell state must equal the batch
    sketch after an availableNow drain, and a second cycle over new data
    must fold in only the increment (state survives the restart)."""
    from pyspark.sql import functions as F

    from oracledb_datapump_spark.streaming import sketch as SK

    src = str(tmp_path / "cms_src")
    out = str(tmp_path / "cms_out")
    _copy_parquet(f"{sf_dir}/events.parquet", src, "part-0.parquet")

    info = SK.run_cms_cycle(spark, src, out)
    got = (
        spark.read.parquet(info["sink_path"])
        .groupBy("row", "counter")
        .agg(F.max("c").alias("c"))
    )
    want = SK.batch_cms_cells(spark, src)
    g = {(r.row, r.counter): r.c for r in got.collect()}
    w = {(r.row, r.counter): r.c for r in want.collect()}
    assert g == w

    # cycle 2: duplicate the data; totals must double, via state + delta
    _copy_parquet(f"{sf_dir}/events.parquet", src, "part-1.parquet")
    SK.run_cms_cycle(spark, src, out)
    got2 = (
        spark.read.parquet(info["sink_path"])
        .groupBy("row", "counter")
        .agg(F.max("c").alias("c"))
    )
    g2 = {(r.row, r.counter): r.c for r in got2.collect()}
    assert g2 == {k: 2 * v for k, v in w.items()}
