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


def test_stream_hourly_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Closed windows emitted by the watermarked streaming rollup must
    carry exactly the batch counts; open windows (inside the lateness
    horizon of the max event time) are withheld, not wrong."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "rsrc")
    os.makedirs(src)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    pq.write_table(t, os.path.join(src, "a.parquet"), version="2.6", coerce_timestamps=None)
    out = str(tmp_path / "rout")
    info = SD.run_rollup_export(spark, src, out)
    got = {
        (r.hour_start, r.event_type): r.n_events
        for r in spark.read.parquet(info["sink_path"]).collect()
    }
    assert got, "some windows must have closed"
    from oracledb_datapump_spark.events_source import event_time_expr, pin_utc

    pin_utc(spark)
    raw = spark.read.parquet(src)
    batch = (
        raw.withColumn("event_time", event_time_expr(raw))
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp("window.start").alias("h"), "event_type", "n"
        )
    )
    expect = {(r.h, r.event_type): r.n for r in batch.collect()}
    for k, v in got.items():
        assert expect[k] == v, (k, v, expect[k])
    # the open tail is withheld: emitted windows < all windows
    assert len(got) < len(expect)
