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
