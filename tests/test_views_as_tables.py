"""VIEWS_AS_TABLES (extension; public Oracle Data Pump parameter the
reference never implements): plan-time error paths + export surface."""

import tempfile

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import DuckDbConnector, ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.job import Job


def _src(sf_dir):
    src = DuckDbConnector(":memory:")
    src.load_parquet_dir("main", sf_dir)
    src.execute(
        "CREATE VIEW main.v_small AS SELECT n_nationkey, n_name "
        "FROM main.nation WHERE n_nationkey < 5"
    )
    return src


def test_view_exports_and_lists(spark, sf_dir):
    src = _src(sf_dir)
    assert "v_small" in src.list_views("main")
    assert "v_small" not in src.list_tables("main")
    dump = tempfile.mkdtemp(prefix="dp_vat_t_")
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[D.INCLUDE_SCHEMA("main"), D.VIEWS_AS_TABLES("v_small")],
    ).run(wait=True, connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.error
    wh = tempfile.mkdtemp(prefix="dp_vat_wh_t_")
    st = Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[D.TABLE_EXISTS_ACTION("REPLACE")],
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    out = ParquetConnector(wh).read_table(spark, "main", "v_small")
    assert out.count() == 5


def test_unknown_view_fails_at_plan_time(spark, sf_dir):
    """Plan-time validation RAISES (Oracle's ORA-31655 posture) — the
    job never starts moving data for a mis-named view."""
    from oracledb_datapump_spark.exceptions import JobError

    src = _src(sf_dir)
    dump = tempfile.mkdtemp(prefix="dp_vat_e_")
    with pytest.raises(JobError, match="not found"):
        Job(
            Operation.EXPORT,
            JobMode.TABLE,
            dumpfiles=dump,
            directives=[D.INCLUDE_SCHEMA("main"), D.VIEWS_AS_TABLES("nope")],
        ).run(wait=True, connection=src, spark=spark)


def test_connector_without_view_catalog_fails_loudly(spark, sf_dir):
    from oracledb_datapump_spark.exceptions import JobError

    dump = tempfile.mkdtemp(prefix="dp_vat_p_")
    with pytest.raises(JobError, match="not found"):
        Job(
            Operation.EXPORT,
            JobMode.TABLE,
            dumpfiles=dump,
            directives=[
                D.INCLUDE_SCHEMA("main"),
                D.VIEWS_AS_TABLES("whatever"),
            ],
        ).run(wait=True, connection=ParquetConnector(sf_dir), spark=spark)


def test_table_mode_accepts_views_only(spark, sf_dir):
    """TABLE mode with VIEWS_AS_TABLES and no INCLUDE_TABLE plans the
    view alone — no base tables sneak into the dump."""
    from oracledb_datapump_spark.dumpset import DumpSet

    src = _src(sf_dir)
    dump = tempfile.mkdtemp(prefix="dp_vat_only_")
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[D.INCLUDE_SCHEMA("main"), D.VIEWS_AS_TABLES("v_small")],
    ).run(wait=True, connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.error
    assert DumpSet(dump).list_tables() == [("main", "v_small")]
