"""Watermarked stream-stream interval join: the streamed attribution
pairs must converge to the batch twin on a static source, modulo the
open tail the watermark has not yet closed."""

import os

import pyarrow.parquet as pq

from oracledb_datapump_spark.streaming import joins as SJ


def test_stream_attribution_converges_to_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "jsrc")
    os.makedirs(src)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    pq.write_table(
        t, os.path.join(src, "a.parquet"), version="2.6", coerce_timestamps=None
    )
    out = str(tmp_path / "jout")
    info = SJ.run_attribution_export(spark, src, out)
    got = {
        (r.purchase_id, r.click_id, r.gap_us)
        for r in spark.read.parquet(info["sink_path"]).collect()
    }
    assert got, "some pairs must have been emitted"
    expect = {
        (r.purchase_id, r.click_id, r.gap_us)
        for r in SJ.batch_equivalent(spark, src).collect()
    }
    # every emitted pair is a batch pair (no inventions, exact gaps) ...
    assert got <= expect
    # ... and the withheld remainder is only the un-closed tail
    assert len(got) >= len(expect) * 0.5, (len(got), len(expect))

    # gap bound respected on every emitted pair
    horizon_us = 3_600_000_000
    assert all(0 <= g <= horizon_us for _, _, g in got)


def test_stream_attribution_incremental_cycles(spark, sf_dir, tmp_path):
    """A second availableNow cycle over new files continues from the
    checkpoint: no duplicate pairs, new purchases attributed."""
    src = str(tmp_path / "isrc")
    os.makedirs(src)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    pq.write_table(
        t.slice(0, len(t) // 2),
        os.path.join(src, "a.parquet"),
        version="2.6",
        coerce_timestamps=None,
    )
    out = str(tmp_path / "iout")
    info = SJ.run_attribution_export(spark, src, out)
    n1 = spark.read.parquet(info["sink_path"]).count()

    pq.write_table(
        t.slice(len(t) // 2),
        os.path.join(src, "b.parquet"),
        version="2.6",
        coerce_timestamps=None,
    )
    SJ.run_attribution_export(spark, src, out)
    df = spark.read.parquet(info["sink_path"])
    n2 = df.count()
    assert n2 >= n1  # strictly grows (or holds) across cycles
    # exactly-once: no (purchase, click) pair emitted twice
    assert df.count() == df.select("purchase_id", "click_id").distinct().count()
