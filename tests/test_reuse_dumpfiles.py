"""REUSE_DUMPFILES (public Oracle Data Pump parameter, default NO:
expdp raises ORA-27038 'file already exists' rather than clobbering a
dump; the reference never wraps it)."""

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.exceptions import JobError
from oracledb_datapump_spark.job import Job


def _export(spark, sf_dir, dump, extra=()):
    return Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("nation")]
        + list(extra),
    ).run(wait=True, connection=ParquetConnector(sf_dir), spark=spark)


def test_reexport_refused_by_default(spark, sf_dir, tmp_path):
    dump = str(tmp_path / "dump")
    assert _export(spark, sf_dir, dump).job_state == "COMPLETED"
    with pytest.raises(JobError, match="REUSE_DUMPFILES"):
        _export(spark, sf_dir, dump)


def test_reexport_allowed_with_reuse(spark, sf_dir, tmp_path):
    dump = str(tmp_path / "dump")
    assert _export(spark, sf_dir, dump).job_state == "COMPLETED"
    st = _export(spark, sf_dir, dump, [D.REUSE_DUMPFILES(True)])
    assert st.job_state == "COMPLETED", st.error
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from oracledb_datapump_spark.dumpset import DumpSet

    assert (
        spark.read.parquet(DumpSet(dump).table_dir("main", "nation")).count()
        == n
    )


def test_incremental_append_exempt(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    stage = str(tmp_path / "stage")
    dump = str(tmp_path / "dump")
    df = spark.range(10).select(
        F.col("id"), F.col("id").cast("long").alias("ver")
    )
    df.write.parquet(os.path.join(stage, "t.parquet"))
    dirs = [
        D.INCLUDE_SCHEMA("main"),
        D.INCLUDE_TABLE("t"),
        D.INCREMENTAL_COLUMN("ver"),
    ]
    for _ in range(2):  # second cycle appends past the watermark — no guard
        st = Job(
            Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
            directives=dirs,
        ).run(wait=True, connection=ParquetConnector(stage), spark=spark)
        assert st.job_state == "COMPLETED", st.error
