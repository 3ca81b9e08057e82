"""DATA_OPTIONS(ALLOW_SCHEMA_EVOLUTION): by-name schema drift on
APPEND/MERGE imports reconciles instead of failing — narrow incoming
null-fills, widening incoming rewrites the target once; without the
flag the strict behavior (job error on drift) stands."""

from oracledb_datapump_spark import Job
from oracledb_datapump_spark.catalog import DuckDbConnector
from oracledb_datapump_spark.directives import DirectiveBase as D


def _export(src, spark, schema, dumpdir):
    st = Job(
        "EXPORT", "TABLE", dumpfiles=dumpdir,
        directives=[D.INCLUDE_SCHEMA(schema), D.INCLUDE_TABLE("nation")],
    ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.job_state


def _setup(spark, tmp_path):
    src = DuckDbConnector(":memory:")
    src.load_parquet_dir("hr", "/root/testdata/sf0.001")
    d1 = f"{tmp_path}/d1"
    _export(src, spark, "hr", d1)
    st = Job(
        "IMPORT", "SCHEMA", dumpfiles=d1,
        directives=[D.REMAP_SCHEMA("hr", "tgt")],
    ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED"
    return src


def test_append_narrow_incoming_null_fills(spark, tmp_path):
    src = _setup(spark, tmp_path)
    # incoming drops n_regionkey
    src.execute(
        "CREATE SCHEMA IF NOT EXISTS hn; "
        "CREATE TABLE hn.nation AS "
        "SELECT n_nationkey + 100 AS n_nationkey, n_name FROM hr.nation LIMIT 2"
    )
    d2 = f"{tmp_path}/d2"
    _export(src, spark, "hn", d2)
    st = Job(
        "IMPORT", "SCHEMA", dumpfiles=d2,
        directives=[
            D.REMAP_SCHEMA("hn", "tgt"),
            D.TABLE_EXISTS_ACTION("APPEND"),
            D.DATA_OPTIONS("ALLOW_SCHEMA_EVOLUTION"),
        ],
    ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.job_state
    n, nulls = src.execute(
        "SELECT COUNT(*), SUM(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END)"
        " FROM tgt.nation"
    ).fetchone()
    assert n == 27 and nulls == 2


def test_append_widening_incoming_rewrites_target(spark, tmp_path):
    src = _setup(spark, tmp_path)
    src.execute(
        "CREATE SCHEMA IF NOT EXISTS hw; "
        "CREATE TABLE hw.nation AS "
        "SELECT n_nationkey + 200 AS n_nationkey, n_name, n_regionkey, "
        "       'new' AS n_extra FROM hr.nation LIMIT 3"
    )
    d2 = f"{tmp_path}/d2w"
    _export(src, spark, "hw", d2)
    st = Job(
        "IMPORT", "SCHEMA", dumpfiles=d2,
        directives=[
            D.REMAP_SCHEMA("hw", "tgt"),
            D.TABLE_EXISTS_ACTION("APPEND"),
            D.DATA_OPTIONS("ALLOW_SCHEMA_EVOLUTION"),
        ],
    ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.job_state
    n, with_extra = src.execute(
        "SELECT COUNT(*), SUM(CASE WHEN n_extra IS NOT NULL THEN 1 ELSE 0 END)"
        " FROM tgt.nation"
    ).fetchone()
    assert n == 28 and with_extra == 3  # 25 widened-with-null + 3 new


def test_append_drift_without_flag_errors(spark, tmp_path):
    src = _setup(spark, tmp_path)
    src.execute(
        "CREATE SCHEMA IF NOT EXISTS hx; "
        "CREATE TABLE hx.nation AS "
        "SELECT n_nationkey + 300 AS n_nationkey, n_name FROM hr.nation LIMIT 1"
    )
    d2 = f"{tmp_path}/d2x"
    _export(src, spark, "hx", d2)
    st = Job(
        "IMPORT", "SCHEMA", dumpfiles=d2,
        directives=[
            D.REMAP_SCHEMA("hx", "tgt"),
            D.TABLE_EXISTS_ACTION("APPEND"),
        ],
    ).run(connection=src, spark=spark)
    assert st.job_state in ("COMPLETED_WITH_ERRORS", "ERROR", "STOPPED"), (
        st.job_state
    )


def test_merge_with_evolution_null_fills_missing(spark, tmp_path):
    src = _setup(spark, tmp_path)
    src.execute(
        "CREATE SCHEMA IF NOT EXISTS hm; "
        "CREATE TABLE hm.nation AS "
        "SELECT n_nationkey, n_name || '_V9' AS n_name FROM hr.nation "
        "WHERE n_nationkey < 2"
    )
    d2 = f"{tmp_path}/d2m"
    _export(src, spark, "hm", d2)
    st = Job(
        "IMPORT", "SCHEMA", dumpfiles=d2,
        directives=[
            D.REMAP_SCHEMA("hm", "tgt"),
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("n_nationkey"),
            D.DATA_OPTIONS("ALLOW_SCHEMA_EVOLUTION"),
        ],
    ).run(connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.job_state
    rows = dict(
        src.execute(
            "SELECT n_nationkey, n_name FROM tgt.nation ORDER BY 1"
        ).fetchall()
    )
    assert len(rows) == 25
    assert rows[0].endswith("_V9") and rows[1].endswith("_V9")
    assert not rows[5].endswith("_V9")
    # merged winners came from the narrow side → their n_regionkey is null
    nulls = src.execute(
        "SELECT COUNT(*) FROM tgt.nation WHERE n_regionkey IS NULL"
    ).fetchone()[0]
    assert nulls == 2


def test_merge_evolution_refuses_missing_merge_key(spark, tmp_path):
    """Schema evolution must never null-fill a MERGE_KEY column — a
    keyless side would collapse into one null-key partition and
    row_number()==1 would silently keep a single survivor. The job must
    fail loudly instead."""
    src = _setup(spark, tmp_path)
    # incoming lacks n_nationkey entirely
    src.execute(
        "CREATE SCHEMA IF NOT EXISTS hk; "
        "CREATE TABLE hk.nation AS "
        "SELECT n_name, n_regionkey FROM hr.nation LIMIT 2"
    )
    d2 = f"{tmp_path}/d2k"
    _export(src, spark, "hk", d2)
    st = Job(
        "IMPORT", "SCHEMA", dumpfiles=d2,
        directives=[
            D.REMAP_SCHEMA("hk", "tgt"),
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("n_nationkey"),
            D.DATA_OPTIONS("ALLOW_SCHEMA_EVOLUTION"),
        ],
    ).run(connection=src, spark=spark)
    assert st.job_state in ("COMPLETED_WITH_ERRORS", "ERROR", "STOPPED"), (
        st.job_state
    )
    # target must be untouched (the strict-failure guarantee)
    assert src.execute("SELECT COUNT(*) FROM tgt.nation").fetchone()[0] == 25
