"""End-to-end export → import round-trip (the reference's own test oracle:
export TEST1, import into TEST2 with remap — reference tests/test_export.py
+ tests/test_import.py:34-61)."""

import pytest
from pyspark.sql import functions as F

from oracledb_datapump_spark import Job, JobMode, JobState, Operation
from oracledb_datapump_spark.directives import DirectiveBase as D


def row_fingerprint(df):
    """Order/partitioning-insensitive table fingerprint (FIXTURES.md recipe):
    sha2 per row over sorted columns, summed commutatively."""
    cols = sorted(df.columns)
    h = df.select(
        F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256).alias("h")
    )
    return (
        h.select(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("fp"))
        .collect()[0]["fp"],
        df.count(),
    )


@pytest.fixture(scope="module")
def dumpdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("dumps"))


def test_export_import_roundtrip(spark, duck, dumpdir):
    dump = f"{dumpdir}/rt1"
    exp = Job(
        operation=Operation.EXPORT,
        mode=JobMode.SCHEMA,
        dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("test1"),
            D.PARALLEL(2),
            D.COMPRESSION("ALL"),
        ],
    )
    status = exp.run(wait=True, connection=duck, spark=spark)
    assert status.job_state == JobState.COMPLETED.value

    imp = Job(
        operation=Operation.IMPORT,
        mode=JobMode.SCHEMA,
        dumpfiles=dump,
        directives=[
            D.REMAP_SCHEMA("test1", "test2"),
            D.TABLE_EXISTS_ACTION("REPLACE"),
            D.PARALLEL(2),
        ],
    )
    status = imp.run(wait=True, connection=duck, spark=spark)
    assert status.job_state == JobState.COMPLETED.value

    # every table hash-matches source vs imported target
    for t in duck.list_tables("test1"):
        src = duck.read_table(spark, "test1", t)
        dst = duck.read_table(spark, "test2", t)
        assert row_fingerprint(src) == row_fingerprint(dst), t


def test_import_requires_dumpfiles():
    from oracledb_datapump_spark.exceptions import UsageError

    with pytest.raises(UsageError):
        Job(operation="IMPORT", mode="SCHEMA")


def test_manifest_and_dumpfile_info(spark, duck, dumpdir):
    from oracledb_datapump_spark import DataPump
    from oracledb_datapump_spark.dumpset import DumpSet

    dump = f"{dumpdir}/rt2"
    Job(
        "EXPORT",
        "TABLE",
        dumpfiles=dump,
        directives=[D.INCLUDE_SCHEMA("test1"), D.INCLUDE_TABLE("region")],
    ).run(connection=duck, spark=spark)
    ds = DumpSet(dump)
    meta = ds.read_manifest()
    assert meta.operation == "EXPORT"
    assert meta.as_of  # auto-flashback captured (reference job.py:261-269)
    assert "test1.region" in meta.tables
    info = DataPump.get_dumpfile_info(dump, "test1", "region")
    assert info.row_count == 5
    assert info.file_count >= 1
    log = DataPump.get_logfile(dump)
    assert "TABLE_EXPORT_DONE" in log
