"""DEDUP_KEEP_BEST export directive (r10 verdict ask #8): keep-best
dedup applied inside the EXPORT, with the drop manifest-recorded. The
full lifecycle is gated via datapump_roundtrip_dedup_export; these pin
the directive contract edges (parsing, tie-break determinism, NULL-key
grouping, accounting)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.dumpset import DumpSet
from oracledb_datapump_spark.exceptions import UsageError
from oracledb_datapump_spark.job import Job


@pytest.fixture()
def dirs():
    stage = tempfile.mkdtemp(prefix="dp_dkb_stage_")
    wh = tempfile.mkdtemp(prefix="dp_dkb_wh_")
    dump = tempfile.mkdtemp(prefix="dp_dkb_dump_")
    yield stage, wh, dump
    for d in (stage, wh, dump):
        shutil.rmtree(d, ignore_errors=True)


def _export(spark, stage, dump, directives):
    return Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("t")]
        + directives,
    ).run(wait=True, connection=ParquetConnector(stage), spark=spark)


def _stage(spark, stage, rows, schema):
    spark.createDataFrame(rows, schema).repartition(2).write.parquet(
        os.path.join(stage, "t.parquet")
    )


def test_value_parsing_negatives():
    for bad in ("k", "k:s", "k:s:t:x", "k::t", ":s:t", ""):
        with pytest.raises(UsageError, match="DEDUP_KEEP_BEST"):
            D.DEDUP_KEEP_BEST(bad).apply(
                __import__(
                    "oracledb_datapump_spark.directives", fromlist=["PlanConfig"]
                ).PlanConfig()
            )


def test_keep_best_and_tiebreak(spark, dirs):
    stage, wh, dump = dirs
    _stage(
        spark, stage,
        [
            # key 1: score winner is unique
            (1, 10, 100), (1, 30, 200), (1, 20, 300),
            # key 2: score TIE — smallest tiebreak must win
            (2, 50, 900), (2, 50, 400), (2, 50, 700),
            # key 3: singleton passes through
            (3, 1, 1),
        ],
        "k long, score long, tie long",
    )
    st = _export(spark, stage, dump, [D.DEDUP_KEEP_BEST("k:score:tie")])
    assert st.job_state == "COMPLETED", st.error
    out = sorted(
        map(tuple, spark.read.parquet(os.path.join(dump, "main", "t")).collect())
    )
    assert out == [(1, 30, 200), (2, 50, 400), (3, 1, 1)]
    meta = DumpSet(dump).read_manifest().tables["main.t"]["dedup_keep_best"]
    assert meta["rows_dropped"] == 4
    ev = [
        e for e in DumpSet(dump).read_events()
        if e["event"] == "TABLE_EXPORT_DEDUPED"
    ]
    assert ev and ev[0]["rows_dropped"] == 4 and ev[0]["key"] == "k"


def test_null_keys_group_together(spark, dirs):
    stage, wh, dump = dirs
    _stage(
        spark, stage,
        [(None, 5, 1), (None, 9, 2), (4, 1, 1)],
        "k long, score long, tie long",
    )
    st = _export(spark, stage, dump, [D.DEDUP_KEEP_BEST("k:score:tie")])
    assert st.job_state == "COMPLETED", st.error
    out = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(dump, "main", "t")).collect(),
        ),
        key=str,
    )
    # SQL window semantics: the NULL partition keeps its best row too
    assert (None, 9, 2) in out and (4, 1, 1) in out and len(out) == 2


def test_no_dups_is_noop_with_zero_drop(spark, dirs):
    stage, wh, dump = dirs
    _stage(
        spark, stage,
        [(i, i, i) for i in range(10)],
        "k long, score long, tie long",
    )
    st = _export(spark, stage, dump, [D.DEDUP_KEEP_BEST("k:score:tie")])
    assert st.job_state == "COMPLETED", st.error
    assert spark.read.parquet(os.path.join(dump, "main", "t")).count() == 10
    meta = DumpSet(dump).read_manifest().tables["main.t"]["dedup_keep_best"]
    assert meta["rows_dropped"] == 0


def test_refuses_incremental_composition(spark, dirs):
    """ADVICE r11: DEDUP_KEEP_BEST x INCREMENTAL_COLUMN would run the
    keep-best window only over the post-watermark slice and append
    survivors — a key dumped in a prior increment could gain a second
    row, violating the one-row-per-key contract. The composition must
    refuse at plan time (same posture as ENCRYPTION x INCREMENTAL)."""
    from oracledb_datapump_spark.exceptions import JobError

    stage, wh, dump = dirs
    _stage(
        spark,
        stage,
        [(1, 10, 1, "2024-01-01")],
        "k int, score int, tb int, ts string",
    )
    with pytest.raises(JobError, match="DEDUP_KEEP_BEST.*INCREMENTAL"):
        _export(
            spark, stage, dump,
            [D.DEDUP_KEEP_BEST("k:score:tb"), D.INCREMENTAL_COLUMN("ts")],
        )
