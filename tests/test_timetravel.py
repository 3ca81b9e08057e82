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
    else:
        # a non-incremental export onto an existing dump is the clobber
        # REUSE_DUMPFILES(NO) refuses by default (Oracle ORA-27038
        # parity); this flow overwrites deliberately
        directives.append(D.REUSE_DUMPFILES(True))
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


def _strip_snapshots(dump):
    ds = DumpSet(dump)
    meta = ds.read_manifest()
    meta.tables["main.tx"].pop("snapshots", None)
    ds.write_manifest(meta)


def test_append_onto_presnapshot_dump_seeds_base_as_v1(spark, dirs):
    """Starting snapshot history mid-dump (the base files predate
    tracking) must seed the base as version 1 — otherwise AS_OF_VERSION
    at ANY version silently drops the whole base table (round-9
    advisor finding)."""
    stage, dump, wh = dirs
    _write_source(spark, stage, [(1, "a"), (2, "b")])
    _export(spark, stage, dump)
    _strip_snapshots(dump)  # simulate a dump written before tracking
    _write_source(spark, stage, [(1, "a"), (2, "b"), (3, "c")])
    _export(spark, stage, dump)
    snaps = DumpSet(dump).read_manifest().tables["main.tx"]["snapshots"]
    assert [s["version"] for s in snaps] == [1, 2]
    assert snaps[0]["files"], "base files must belong to version 1"
    st = _import_as_of(spark, dump, wh, 1)
    assert st.job_state == "COMPLETED", st.error
    assert _ids(spark, wh) == [1, 2]
    st = _import_as_of(spark, dump, wh, 2)
    assert st.job_state == "COMPLETED", st.error
    assert _ids(spark, wh) == [1, 2, 3]


def test_as_of_refuses_incomplete_history(spark, dirs):
    """If the union of snapshot file lists does not cover the dump
    directory, AS_OF_VERSION must refuse instead of time-traveling to a
    silently partial table."""
    stage, dump, wh = dirs
    _write_source(spark, stage, [(1, "a"), (2, "b")])
    _export(spark, stage, dump)
    _write_source(spark, stage, [(1, "a"), (2, "b"), (3, "c")])
    _export(spark, stage, dump)
    ds = DumpSet(dump)
    meta = ds.read_manifest()
    snaps = meta.tables["main.tx"]["snapshots"]
    snaps[0]["files"] = snaps[0]["files"][1:]  # drop a tracked base file
    ds.write_manifest(meta)
    st = _import_as_of(spark, dump, wh, 2)
    assert st.job_state != "COMPLETED"
    assert "does not match" in str(st.error)


def test_compact_collapses_snapshot_history(spark, dirs):
    """compact() rewrites every part-file: it must rewrite the snapshot
    history too (collapse to the prior latest version over the new
    files), or time travel references deleted filenames (round-9
    advisor finding). Post-compact: latest version = full table, prior
    versions fail loud, history loss is logged."""
    stage, dump, wh = dirs
    _write_source(spark, stage, [(1, "a"), (2, "b")])
    _export(spark, stage, dump)
    _write_source(spark, stage, [(1, "a"), (2, "b"), (3, "c")])
    _export(spark, stage, dump)
    ds = DumpSet(dump)
    report = ds.compact(spark, min_files=2)
    assert report["main.tx"]["files_after"] < report["main.tx"]["files_before"]
    snaps = ds.read_manifest().tables["main.tx"]["snapshots"]
    assert len(snaps) == 1 and snaps[0]["version"] == 2
    st = _import_as_of(spark, dump, wh, 2)
    assert st.job_state == "COMPLETED", st.error
    assert _ids(spark, wh) == [1, 2, 3]
    st = _import_as_of(spark, dump, wh, 1)
    assert st.job_state != "COMPLETED"  # loud, not silently partial
    events = [e["event"] for e in ds.read_events()]
    assert "SNAPSHOT_HISTORY_COLLAPSED" in events
