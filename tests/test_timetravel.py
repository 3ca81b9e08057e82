"""AS_OF_VERSION time travel: every export run records its added data
files in the manifest (``snapshots``); imports can read the dump as of
any earlier run. datapump_roundtrip_timetravel gates the two-run CDC
case under the cross-engine hash; these tests pin the directive-level
contract — version bounds, three-run histories, overwrite reset."""

import os
import tempfile

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.dumpset import DumpSet
from oracledb_datapump_spark.exceptions import UsageError
from oracledb_datapump_spark.job import Job


@pytest.fixture()
def dirs():
    import shutil

    stage = tempfile.mkdtemp(prefix="dp_tt_stage_")
    dump = tempfile.mkdtemp(prefix="dp_tt_dump_")
    wh = tempfile.mkdtemp(prefix="dp_tt_wh_")
    yield stage, dump, wh
    for d in (stage, dump, wh):
        shutil.rmtree(d, ignore_errors=True)


def _write_source(spark, stage, rows):
    spark.createDataFrame(rows, "id long, v string").write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "tx.parquet"))


def _export(spark, stage, dump, incremental=True):
    directives = [D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("tx")]
    if incremental:
        directives.append(D.INCREMENTAL_COLUMN("id", object_path="tx"))
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=directives,
    ).run(wait=True, connection=ParquetConnector(stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    return st


def _import_as_of(spark, dump, wh, version):
    st = Job(
        Operation.IMPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[
            D.TABLE_EXISTS_ACTION("REPLACE"),
            D.AS_OF_VERSION(version),
        ],
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    return st


def _ids(spark, wh):
    return sorted(
        r["id"]
        for r in ParquetConnector(wh).read_table(spark, "main", "tx").collect()
    )


def test_three_version_history(spark, dirs):
    """Each incremental run is a readable version; the latest version
    equals the full table."""
    stage, dump, wh = dirs
    _write_source(spark, stage, [(1, "a"), (2, "b")])
    _export(spark, stage, dump)
    _write_source(spark, stage, [(1, "a"), (2, "b"), (3, "c")])
    _export(spark, stage, dump)
    _write_source(spark, stage, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    _export(spark, stage, dump)
    snaps = DumpSet(dump).read_manifest().tables["main.tx"]["snapshots"]
    assert [s["version"] for s in snaps] == [1, 2, 3]
    for version, expect in ((1, [1, 2]), (2, [1, 2, 3]), (3, [1, 2, 3, 4])):
        st = _import_as_of(spark, dump, wh, version)
        assert st.job_state == "COMPLETED", st.error
        assert _ids(spark, wh) == expect


def test_version_out_of_range_raises(spark, dirs):
    stage, dump, wh = dirs
    _write_source(spark, stage, [(1, "a")])
    _export(spark, stage, dump)
    st = _import_as_of(spark, dump, wh, 9)
    assert st.job_state != "COMPLETED"
    assert "AS_OF_VERSION" in str(st.error)


def test_as_of_version_zero_rejected_at_parse(spark):
    with pytest.raises(UsageError):
        from oracledb_datapump_spark.directives import PlanConfig

        D.AS_OF_VERSION(0).apply(PlanConfig())


def test_overwrite_resets_history(spark, dirs):
    """A non-incremental export rewrites every file: history restarts at
    version 1 and old versions are no longer addressable."""
    stage, dump, wh = dirs
    _write_source(spark, stage, [(1, "a")])
    _export(spark, stage, dump)
    _write_source(spark, stage, [(1, "a"), (2, "b")])
    _export(spark, stage, dump)
    _write_source(spark, stage, [(9, "z")])
    _export(spark, stage, dump, incremental=False)
    snaps = DumpSet(dump).read_manifest().tables["main.tx"]["snapshots"]
    assert [s["version"] for s in snaps] == [1]
    st = _import_as_of(spark, dump, wh, 1)
    assert st.job_state == "COMPLETED", st.error
    assert _ids(spark, wh) == [9]
    st = _import_as_of(spark, dump, wh, 2)
    assert st.job_state != "COMPLETED"
