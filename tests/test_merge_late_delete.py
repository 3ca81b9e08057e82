"""MERGE_ORDER × MERGE_DELETE_COL: out-of-order tombstones.

streaming_merge_late proves last-writer-by-version and
streaming_merge_delete proves tombstones; their COMPOSITION — a
tombstone whose version is older than applied state must NOT delete,
one whose version is newer must — is the corner real CDC feeds hit
(partition rebalance, backfill replay). streaming_merge_late_delete
puts it under the cross-engine hash; these tests pin the
directive-level matrix and both negative proofs."""

import os
import tempfile

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.job import Job

SCHEMA = "k long, ver long, v string, dead boolean"


@pytest.fixture()
def dirs():
    import shutil

    stage = tempfile.mkdtemp(prefix="dp_ld_stage_")
    wh = tempfile.mkdtemp(prefix="dp_ld_wh_")
    yield stage, wh
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(wh, ignore_errors=True)


def _apply(spark, rows, stage, wh, imp_directives):
    dump = tempfile.mkdtemp(prefix="dp_ld_dump_")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
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
    assert st.job_state == "COMPLETED", st.error


def _state(spark, wh):
    return {
        r.k: (r.ver, r.v)
        for r in ParquetConnector(wh).read_table(spark, "main", "t").collect()
    }


def _seed(spark, stage, wh):
    _apply(
        spark,
        [(1, 100, "live", False), (2, 200, "live", False)],
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("ver"),
            D.MERGE_DELETE_COL("dead"),
        ],
    )


def test_tombstone_version_matrix(spark, dirs):
    """Stale tombstone (ver 50 < applied 100) must NOT delete; newer
    tombstone (ver 300 > applied 200) must; a live row on a fresh key
    upserts — all in one merge batch."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    _apply(
        spark,
        [(1, 50, "gone", True), (2, 300, "gone", True), (3, 10, "new", False)],
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("ver"),
            D.MERGE_DELETE_COL("dead"),
        ],
    )
    assert _state(spark, wh) == {1: (100, "live"), 3: (10, "new")}


def test_without_merge_order_stale_tombstone_wrongly_deletes(spark, dirs):
    """Negative proof #1: drop MERGE_ORDER and the arrival-ordered merge
    lets the STALE tombstone erase key 1 despite its newer applied
    state — exactly the wrong answer MERGE_ORDER exists to prevent."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    _apply(
        spark,
        [(1, 50, "gone", True)],
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_DELETE_COL("dead"),
        ],
    )
    assert 1 not in _state(spark, wh)


def test_without_delete_col_nothing_deletes(spark, dirs):
    """Negative proof #2: without MERGE_DELETE_COL the 'dead' column is
    ordinary data (landed via schema evolution — without which the merge
    refuses loudly on the column-count mismatch, itself the right
    behavior): the newer tombstone row upserts instead of deleting, and
    the stale one still loses to MERGE_ORDER."""
    stage, wh = dirs
    _seed(spark, stage, wh)
    _apply(
        spark,
        [(1, 50, "gone", True), (2, 300, "gone", True)],
        stage,
        wh,
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k"),
            D.MERGE_ORDER("ver"),
            D.DATA_OPTIONS("ALLOW_SCHEMA_EVOLUTION"),
        ],
    )
    assert _state(spark, wh) == {1: (100, "live"), 2: (300, "gone")}


def test_operator_matches_oracle_and_both_directions_fire(spark, sf_dir):
    """The gated operator equals its DuckDB twin on the events fixture,
    and the fixture exercises BOTH directions of the matrix: every
    user_id % 3 = 0 user is erased by a WINNING tombstone (ts+1), every
    other user is protected from a STALE one (ts−1) — non-vacuous by
    construction at every scale."""
    import duckdb

    from oracledb_datapump_spark.streaming.incremental import (
        STREAMING_MERGE_LATE_DELETE_SQL,
        streaming_merge_late_delete,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    oracle = con.sql(STREAMING_MERGE_LATE_DELETE_SQL).df()
    got = streaming_merge_late_delete(spark, sf_dir).toPandas()
    assert len(got) == len(oracle)
    assert list(got.user_id) == list(oracle.user_id)
    assert list(got.last_ts_us) == list(oracle.last_ts_us)
    all_users = {
        u for (u,) in con.sql("SELECT DISTINCT user_id FROM events").fetchall()
    }
    erased = {u for u in all_users if u % 3 == 0}
    protected = all_users - erased
    assert erased and protected, "fixture can't exercise both directions"
    survivors = set(got.user_id)
    assert survivors == protected
    assert not (survivors & erased)
