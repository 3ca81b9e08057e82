"""MERGE_ORDER: last-writer-by-version semantics for
TABLE_EXISTS_ACTION(MERGE) (out-of-order CDC arrivals).

The reference's MERGE surface has no version column (its merge is
arrival-ordered); MERGE_ORDER is the extension that makes the apply
path arrival-order-independent — streaming_merge_late puts it under the
cross-engine value hash, these tests pin the directive-level contract."""

import os
import tempfile

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.exceptions import JobError, UsageError
from oracledb_datapump_spark.job import Job


def _export_import(spark, rows, schema, stage, wh, imp_directives):
    dump = tempfile.mkdtemp(prefix="dp_mo_dump_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(stage, "t.parquet")
    )
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("t")],
    ).run(wait=True, connection=ParquetConnector(stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    st = Job(
        Operation.IMPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=imp_directives,
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    return st


SCHEMA = "k long, ver long, v string"


@pytest.fixture()
def dirs():
    import shutil

    stage = tempfile.mkdtemp(prefix="dp_mo_stage_")
    wh = tempfile.mkdtemp(prefix="dp_mo_wh_")
    yield stage, wh
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(wh, ignore_errors=True)


def _seed(spark, stage, wh):
    st = _export_import(
        spark, [(1, 100, "new"), (2, 200, "old")], SCHEMA, stage, wh, []
    )
    assert st.job_state == "COMPLETED", st.error


def _rows(spark, wh):
    return {
        r["k"]: (r["ver"], r["v"])
        for r in ParquetConnector(wh).read_table(spark, "main", "t").collect()
    }


def test_merge_order_keeps_newer_existing(spark, dirs):
    """A late batch with an OLDER version must not clobber newer state;
    a NEWER version must still win."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    st = _export_import(
        spark,
        [(1, 50, "stale"), (2, 300, "newest")],
        SCHEMA,
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("ver"),
        ],
    )
    assert st.job_state == "COMPLETED", st.error
    assert _rows(spark, wh) == {1: (100, "new"), 2: (300, "newest")}


def test_merge_without_order_is_arrival_ordered(spark, dirs):
    """The default (no MERGE_ORDER) stays incoming-beats-existing — the
    documented arrival-order semantics MERGE_ORDER exists to override."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    st = _export_import(
        spark,
        [(1, 50, "stale")],
        SCHEMA,
        stage,
        wh,
        [D.TABLE_EXISTS_ACTION("MERGE"), D.MERGE_KEY("k")],
    )
    assert st.job_state == "COMPLETED", st.error
    assert _rows(spark, wh)[1] == (50, "stale")


def test_merge_order_missing_column_raises(spark, dirs):
    """An order column absent from both sides is a usage error, not a
    silent arrival-order fallback."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    st = _export_import(
        spark,
        [(1, 50, "stale")],
        SCHEMA,
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("no_such_col"),
        ],
    )
    assert st.job_state != "COMPLETED"
    assert "MERGE_ORDER" in str(st.error)


DSCHEMA = "k long, ver long, v string, is_del boolean"


def test_merge_delete_tombstone_removes_key(spark, dirs):
    """A winning tombstone deletes its key; other keys upsert normally;
    the transport column never lands in the stored table."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    st = _export_import(
        spark,
        [(1, 300, "x", True), (2, 300, "newest", False)],
        DSCHEMA,
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("ver"),
            D.MERGE_DELETE_COL("is_del"),
        ],
    )
    assert st.job_state == "COMPLETED", st.error
    rows = _rows(spark, wh)
    assert rows == {2: (300, "newest")}
    cols = ParquetConnector(wh).read_table(spark, "main", "t").columns
    assert "is_del" not in cols


def test_merge_delete_stale_tombstone_loses(spark, dirs):
    """A tombstone carrying an OLDER version than the warehouse state is
    a late retraction of an already-superseded row — under MERGE_ORDER
    it loses the survivor window and the key stays."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    st = _export_import(
        spark,
        [(1, 50, "stale", True)],
        DSCHEMA,
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("ver"),
            D.MERGE_DELETE_COL("is_del"),
        ],
    )
    assert st.job_state == "COMPLETED", st.error
    assert _rows(spark, wh)[1] == (100, "new")


def test_merge_delete_missing_column_raises(spark, dirs):
    stage, wh = dirs
    _seed(spark, stage, wh)
    st = _export_import(
        spark,
        [(1, 50, "stale")],
        SCHEMA,
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_DELETE_COL("nope"),
        ],
    )
    assert st.job_state != "COMPLETED"
    assert "MERGE_DELETE_COL" in str(st.error)


def test_merge_order_tie_resolves_incoming_first(spark, dirs):
    """Equal versions on both sides: the incoming row wins (the
    documented tiebreak), keeping re-applied batches idempotent."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    st = _export_import(
        spark,
        [(1, 100, "rewrite")],
        SCHEMA,
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("ver"),
        ],
    )
    assert st.job_state == "COMPLETED", st.error
    assert _rows(spark, wh)[1] == (100, "rewrite")
