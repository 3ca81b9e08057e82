"""Regression pins for the round-5 core-audit fixes: GC safety without
an event log, filtered-import validation, attach observing cross-process
completion, skip-path progress accounting, registry leak on failed
planning, and positional-insert column binding."""

import os

from pyspark.sql import functions as F

from oracledb_datapump_spark import Job
from oracledb_datapump_spark.catalog import DuckDbConnector
from oracledb_datapump_spark.directives import DirectiveBase as D


def _src(tmp_path):
    con = DuckDbConnector(str(tmp_path / "s.duckdb"))
    con.load_parquet_dir("hr", "/root/testdata/sf0.001")
    return con


def test_cleanup_orphans_keeps_dump_without_event_log(spark, tmp_path):
    """A manifest-bearing dump whose events file was pruned may be a
    COMPLETED job's archive — GC must keep it (it used to fall through
    the age guard and rmtree it)."""
    from oracledb_datapump_spark.dumpset import EVENTS_NAME, cleanup_orphans

    src = _src(tmp_path)
    root = tmp_path / "dumps"
    dump = str(root / "job1")
    st = Job("EXPORT", "TABLE", dumpfiles=dump,
             directives=[D.INCLUDE_SCHEMA("hr"), D.INCLUDE_TABLE("nation")],
             ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED"
    os.remove(os.path.join(dump, EVENTS_NAME))
    removed = cleanup_orphans(str(root), min_age_s=0.0)
    assert removed == [] and os.path.isdir(dump)


def test_validate_tbl_data_with_query_predicate(spark, tmp_path):
    """A QUERY-filtered import writes fewer rows than the dump holds —
    VALIDATE_TBL_DATA must verify against the filtered count, not fail
    the correct import."""
    src = _src(tmp_path)
    dump = str(tmp_path / "dq")
    st = Job("EXPORT", "TABLE", dumpfiles=dump,
             directives=[D.INCLUDE_SCHEMA("hr"), D.INCLUDE_TABLE("nation")],
             ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED"
    st = Job("IMPORT", "TABLE", dumpfiles=dump,
             directives=[
                 D.REMAP_SCHEMA("hr", "flt"),
                 D.QUERY("n_nationkey < 5"),
                 D.DATA_OPTIONS("VALIDATE_TBL_DATA"),
             ]).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.job_state
    assert src.execute("SELECT COUNT(*) FROM flt.nation").fetchone()[0] == 5


def test_attach_sees_completion_from_event_log(spark, tmp_path):
    """An attached job's status must adopt the event log's terminal
    state (the attach-time snapshot used to freeze it at EXECUTING
    forever)."""
    from oracledb_datapump_spark.dumpset import DumpSet

    src = _src(tmp_path)
    dump = str(tmp_path / "att")
    st = Job("EXPORT", "TABLE", dumpfiles=dump,
             directives=[D.INCLUDE_SCHEMA("hr"), D.INCLUDE_TABLE("nation")],
             ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED"
    ds = DumpSet(dump)
    # simulate attaching mid-run: strip the JOB_DONE line, attach, then
    # let "the other process" finish by appending it back
    lines = open(ds.events_path).read().splitlines(keepends=True)
    done = [ln for ln in lines if '"JOB_DONE"' in ln]
    open(ds.events_path, "w").writelines(
        [ln for ln in lines if '"JOB_DONE"' not in ln]
    )
    job = Job.attach("whatever", dumpdir=dump)
    assert job.get_status().job_state not in ("COMPLETED",)
    open(ds.events_path, "a").writelines(done)
    assert job.get_status().job_state == "COMPLETED"
    assert job.poll_for_completion(rate=0.01).job_state == "COMPLETED"


def test_skip_paths_reach_done_in_status(spark, tmp_path):
    """TABLE_EXISTS_ACTION(SKIP) workers must log _DONE so status shows
    completed workers, not a finished job stuck at EXECUTING."""
    from oracledb_datapump_spark.dumpset import DumpSet

    src = _src(tmp_path)
    dump = str(tmp_path / "skip")
    for _ in range(2):  # second import skips every existing table
        st = Job("IMPORT" if _ else "EXPORT", "TABLE", dumpfiles=dump,
                 directives=[D.INCLUDE_SCHEMA("hr"), D.INCLUDE_TABLE("nation")]
                 if not _ else [D.REMAP_SCHEMA("hr", "tgt")],
                 ).run(connection=src, spark=spark)
        assert st.job_state == "COMPLETED"
    st = Job("IMPORT", "TABLE", dumpfiles=dump,
             directives=[D.REMAP_SCHEMA("hr", "tgt"),
                         D.TABLE_EXISTS_ACTION("SKIP")],
             ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED"
    events = list(DumpSet(dump).read_events())
    skips = [e for e in events if e.get("event") == "TABLE_IMPORT_SKIP_EXISTS"]
    assert skips, "expected a skip event"
    dones = [e for e in events if e.get("event") == "TABLE_IMPORT_DONE"]
    assert len(dones) >= len(skips) + 1


def test_failed_planning_deregisters_job(spark, tmp_path):
    """A planning failure after registration must not leak a live
    registry entry (attach would find a permanently DEFINING job)."""
    import pytest

    from oracledb_datapump_spark.exceptions import JobError, UsageError
    from oracledb_datapump_spark.status import job_exists

    src = _src(tmp_path)
    job = Job("EXPORT", "SCHEMA", job_name="leaky",
              dumpfiles=str(tmp_path / "leak"),
              directives=[D.INCLUDE_SCHEMA("no_such_schema")])
    with pytest.raises((JobError, UsageError)):
        job.run(connection=src, spark=spark)
    assert not job_exists("leaky")


def test_duckdb_append_binds_columns_by_name(spark, tmp_path):
    """Appending a frame whose column order differs from the target DDL
    must bind by name (positional SELECT * silently swapped same-typed
    columns)."""
    src = _src(tmp_path)
    src.execute("CREATE SCHEMA IF NOT EXISTS bn; "
                "CREATE TABLE bn.t (a INT, b INT); "
                "INSERT INTO bn.t VALUES (1, 100)")
    swapped = spark.createDataFrame([(200, 2)], "b int, a int")
    src.write_table(swapped, "bn", "t", mode="append")
    rows = sorted(src.execute("SELECT a, b FROM bn.t").fetchall())
    assert rows == [(1, 100), (2, 200)]


def test_oracle_as_of_timestamp_handles_tz_offset():
    """The auto-captured flashback marker is a tz-aware isoformat; the
    oracle dialect must parse the offset with TO_TIMESTAMP_TZ (a plain
    TO_TIMESTAMP mask leaves '+00:00' unconsumed → ORA-01830 on every
    default flashback export)."""
    from oracledb_datapump_spark.catalog import JdbcConnector

    c = JdbcConnector.__new__(JdbcConnector)
    c.dialect = "oracle"
    c.url = "jdbc:oracle:thin:@x"
    aware = c.as_of_subquery("HR", "T", "TS(2026-08-14T12:34:56.789012+00:00)")
    assert "TO_TIMESTAMP_TZ" in aware and "TZH:TZM" in aware
    zulu = c.as_of_subquery("HR", "T", "TS(2026-08-14T12:34:56.789012Z)")
    assert "TO_TIMESTAMP_TZ" in zulu and "+00:00" in zulu
    naive = c.as_of_subquery("HR", "T", "TS(2026-08-14T12:34:56.789012)")
    assert "TO_TIMESTAMP(" in naive and "TZ" not in naive.split("TO_")[1][:12]
    scn = c.as_of_subquery("HR", "T", "SCN(12345)")
    assert "AS OF SCN 12345" in scn
