"""Watermarked streaming dedup: replayed events are suppressed within
the horizon, including across availableNow cycles."""

import os

import pyarrow.parquet as pq

from oracledb_datapump_spark.streaming import dedup as SD


def test_stream_dedup_suppresses_replays(spark, sf_dir, tmp_path):
    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    head = t.slice(0, 400)
    # file a: events 0-399; file b: the SAME 400 events replayed + 100 new
    pq.write_table(head, os.path.join(src, "a.parquet"), version="2.6", coerce_timestamps=None)
    out = str(tmp_path / "dout")
    info = SD.run_dedup_export(spark, src, out)
    n1 = spark.read.parquet(info["sink_path"]).count()
    assert n1 == 400

    pq.write_table(
        t.slice(0, 500), os.path.join(src, "b.parquet"), version="2.6", coerce_timestamps=None
    )
    SD.run_dedup_export(spark, src, out)
    df = spark.read.parquet(info["sink_path"])
    total = df.count()
    distinct = df.select("event_id").distinct().count()
    # replays of the first 400 suppressed by checkpointed dedup state
    # (events within the watermark horizon); only genuinely new ids added
    assert distinct == 500
    assert total == distinct, f"duplicates leaked: {total} rows, {distinct} ids"
