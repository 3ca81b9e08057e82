"""MERGE_PRUNE: zone-map file pruning for TABLE_EXISTS_ACTION(MERGE).

The contract: pruned merge result ≡ full merge result (row for row),
untouched files stay byte-identical, and the fallback paths (multi-key,
NULL incoming keys, every-file-touched) silently take the full rewrite
and stay correct."""

import hashlib
import os
import tempfile

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.dumpset import DumpSet
from oracledb_datapump_spark.job import Job


@pytest.fixture()
def dirs():
    import shutil

    stage = tempfile.mkdtemp(prefix="dp_mp_stage_")
    wh = tempfile.mkdtemp(prefix="dp_mp_wh_")
    dump = tempfile.mkdtemp(prefix="dp_mp_dump_")
    yield stage, wh, dump
    for d in (stage, wh, dump):
        shutil.rmtree(d, ignore_errors=True)


def _seed_base(spark, wh, n=4000, files=4):
    """Range-clustered base table: k 0..n-1 over `files` files."""
    df = spark.range(n).selectExpr(
        "id AS k", "CAST(id * 7 AS long) AS v", "'base' AS tag"
    )
    df.repartitionByRange(files, "k").write.parquet(
        os.path.join(wh, "main", "t.parquet")
    )


def _table_files(wh):
    d = os.path.join(wh, "main", "t.parquet")
    return {
        n: hashlib.md5(open(os.path.join(d, n), "rb").read()).hexdigest()
        for n in os.listdir(d)
        if n.startswith("part-") and n.endswith(".parquet")
    }


def _merge(spark, stage, wh, dump, rows, schema, directives):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "t.parquet"))
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
        directives=directives,
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    assert st.job_state == "COMPLETED", st.error


def _state(spark, wh):
    return {
        r.k: (r.v, r.tag)
        for r in ParquetConnector(wh).read_table(spark, "main", "t").collect()
    }


MERGE_DIRS = [
    D.TABLE_EXISTS_ACTION("MERGE"),
    D.MERGE_KEY("k"),
    D.MERGE_PRUNE("ON"),
]


def test_pruned_merge_equals_full_and_keeps_untouched_files(spark, dirs):
    stage, wh, dump = dirs
    _seed_base(spark, wh)
    before = _table_files(wh)
    assert len(before) == 4
    # delta: updates confined to the low key range + brand-new keys
    rows = [(k, k * 100, "upd") for k in range(0, 50)] + [
        (9000 + k, 1, "new") for k in range(5)
    ]
    _merge(spark, stage, wh, dump, rows, "k long, v long, tag string", MERGE_DIRS)
    after = _table_files(wh)
    # untouched files byte-identical (same name, same md5)
    kept = set(before) & set(after)
    assert len(kept) >= 2, "pruning rewrote (nearly) everything"
    for n in kept:
        assert before[n] == after[n]
    # event log records the prune
    ev = [
        e
        for e in DumpSet(dump).read_events()
        if e["event"] == "TABLE_MERGE_PRUNED"
    ]
    assert ev and ev[0]["files_touched"] < ev[0]["files_total"] == 4
    # content equals the full-merge semantics
    st = _state(spark, wh)
    assert len(st) == 4000 + 5
    for k in range(0, 50):
        assert st[k] == (k * 100, "upd")
    for k in range(50, 4000):
        assert st[k] == (k * 7, "base")
    for k in range(5):
        assert st[9000 + k] == (1, "new")


def test_new_keys_only_batch_keeps_all_files(spark, dirs):
    """touched == []: every stored file survives byte-identical and the
    batch still dedups intra-batch duplicate keys via the window."""
    stage, wh, dump = dirs
    _seed_base(spark, wh)
    before = _table_files(wh)
    rows = [(10_000, 1, "a"), (10_000, 2, "b"), (10_001, 3, "c")]
    _merge(spark, stage, wh, dump, rows, "k long, v long, tag string", MERGE_DIRS)
    after = _table_files(wh)
    assert set(before) <= set(after)
    for n in before:
        assert before[n] == after[n]
    st = _state(spark, wh)
    assert len(st) == 4002
    assert 10_000 in st and 10_001 in st  # deduped to one survivor each


def test_null_incoming_key_falls_back_to_full_merge(spark, dirs):
    stage, wh, dump = dirs
    _seed_base(spark, wh, n=100, files=2)
    rows = [(None, 5, "nullk"), (1, 6, "upd")]
    _merge(spark, stage, wh, dump, rows, "k long, v long, tag string", MERGE_DIRS)
    ev = [
        e
        for e in DumpSet(dump).read_events()
        if e["event"] == "TABLE_MERGE_PRUNED"
    ]
    assert not ev, "NULL incoming keys must disable pruning"
    st = _state(spark, wh)
    assert st[1] == (6, "upd") and st[None] == (5, "nullk")


def test_multi_key_falls_back(spark, dirs):
    stage, wh, dump = dirs
    _seed_base(spark, wh, n=100, files=2)
    rows = [(1, 7, "upd")]
    _merge(
        spark,
        stage,
        wh,
        dump,
        rows,
        "k long, v long, tag string",
        [
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("k,tag"),
            D.MERGE_PRUNE("ON"),
        ],
    )
    ev = [
        e
        for e in DumpSet(dump).read_events()
        if e["event"] == "TABLE_MERGE_PRUNED"
    ]
    assert not ev, "multi-column MERGE_KEY must disable pruning"


def test_pruned_tombstone_deletes_only_touched(spark, dirs):
    stage, wh, dump = dirs
    _seed_base(spark, wh)
    before = _table_files(wh)
    rows = [(k, 0, "x", True) for k in range(10)]
    _merge(
        spark,
        stage,
        wh,
        dump,
        rows,
        "k long, v long, tag string, dead boolean",
        MERGE_DIRS + [D.MERGE_DELETE_COL("dead")],
    )
    after = _table_files(wh)
    kept = set(before) & set(after)
    assert len(kept) >= 2
    st = _state(spark, wh)
    assert len(st) == 3990
    assert all(k not in st for k in range(10))


@pytest.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    ids=["sf0.001", "sf0.01"],
)
def test_query_wrapper_survives_temp_dir_teardown(spark, sf):
    """Round-9 regression: the QUERY wrapper (not the engine) tears down
    its temp warehouse in a `finally` before the caller ever runs an
    action. The returned DataFrame must therefore be pinned
    (localCheckpoint) — materialize only AFTER the wrapper returns, the
    exact order the driver gate uses."""
    from __spark_entry__ import queries

    fn = queries()["datapump_roundtrip_merge_pruned"]
    df = fn(spark, sf)  # temp dirs are gone once this returns
    rows = df.collect()  # first action happens after teardown
    assert len(rows) > 0
    assert rows[0]["was_pruned"] is True
    assert rows[0]["untouched_kept"] is True
    marked = [r for r in rows if r["o_orderstatus"] == "M"]
    assert 0 < len(marked) < len(rows)


def test_composed_prune_order_tombstone_matrix(spark):
    """MERGE_PRUNE × MERGE_ORDER × MERGE_DELETE_COL version matrix,
    through the query wrapper, materialized after teardown: k%3==0 →
    v2 'M' wins; k%3==1 → v2 'W' wins and the STALE v1 tombstone is
    ignored; k%3==2 → winning v3 tombstone deletes the key."""
    from __spark_entry__ import queries

    fn = queries()["datapump_roundtrip_merge_pruned_ordered"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert rows[0]["was_pruned"] is True
    assert rows[0]["untouched_kept"] is True
    maxk = max(r["o_orderkey"] for r in rows)
    cut = maxk // 8
    in_octile = [r for r in rows if r["o_orderkey"] <= cut]
    assert in_octile, "octile empty — fixture too small"
    for r in in_octile:
        m = r["o_orderkey"] % 3
        assert m != 2, f"winning tombstone failed to delete {r['o_orderkey']}"
        assert (m, r["o_orderstatus"], r["ver"]) in (
            (0, "M", 2),
            (1, "W", 2),
        ), r
    # every class actually occurred (no vacuous pass)
    assert {r["o_orderkey"] % 3 for r in in_octile} == {0, 1}
    # stale tombstone's status 'X' must appear nowhere
    assert all(r["o_orderstatus"] != "X" for r in rows)
