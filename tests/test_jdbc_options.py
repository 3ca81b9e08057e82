"""JdbcConnector option assembly + as-of pushdown (unit-level; a live DB
exercises the same strings through spark.read.jdbc)."""

from oracledb_datapump_spark.catalog import JdbcConnector, resolve_connector


def test_as_of_scn_subquery_oracle_dialect():
    c = JdbcConnector("jdbc:oracle:thin:@//h/db", dialect="oracle")
    assert (
        c.as_of_subquery("hr", "emp", "SCN(12345)")
        == "(SELECT * FROM hr.emp AS OF SCN 12345)"
    )
    ts = c.as_of_subquery("hr", "emp", "TS(2026-01-01T00:00:00.000001)")
    assert "AS OF TIMESTAMP" in ts and "2026-01-01T00:00:00.000001" in ts


def test_as_of_generic_dialect_falls_back():
    c = JdbcConnector("jdbc:postgresql://h/db")
    assert c.as_of_subquery("s", "t", "SCN(1)") == "s.t"


def test_partitioned_read_options():
    c = JdbcConnector("jdbc:oracle:thin:@//h/db", {"user": "u"}, dialect="oracle")
    opts = c.read_options(
        "hr",
        "emp",
        as_of="SCN(7)",
        parallel=8,
        partition_column="employee_id",
        bounds=(1, 100000),
    )
    assert opts["numPartitions"] == "8"
    assert opts["partitionColumn"] == "employee_id"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "100000"
    assert opts["dbtable"].startswith("(SELECT * FROM hr.emp AS OF SCN 7)")
    assert opts["user"] == "u"
    assert int(opts["fetchsize"]) >= 1000  # batches, not row-at-a-time


def test_no_partitioning_without_bounds():
    c = JdbcConnector("jdbc:oracle:thin:@//h/db")
    opts = c.read_options(
        "s", "t", as_of=None, parallel=8, partition_column=None, bounds=None
    )
    assert "numPartitions" not in opts


def test_resolve_connector_urls(tmp_path):
    from oracledb_datapump_spark.catalog import DuckDbConnector, ParquetConnector

    assert isinstance(resolve_connector("jdbc:oracle:thin:@//h/db"), JdbcConnector)
    assert isinstance(resolve_connector("duckdb://:memory:"), DuckDbConnector)
    assert isinstance(resolve_connector(f"parquet://{tmp_path}"), ParquetConnector)
    j = resolve_connector({"url": "jdbc:x://h", "user": "u", "password": "p"})
    assert isinstance(j, JdbcConnector) and j.properties["user"] == "u"


def test_jdbc_catalog_introspection_generic_dialect():
    """The generic-dialect catalog SQL is ANSI information_schema; drive
    it through a DuckDB cursor via the catalog_executor seam — same SQL,
    same code path as a live JDBC source."""
    import duckdb

    from oracledb_datapump_spark.catalog import JdbcConnector

    con = duckdb.connect()
    con.sql("CREATE SCHEMA hr")
    con.sql("CREATE TABLE hr.emp AS SELECT 1 AS id")
    con.sql("CREATE TABLE hr.dept AS SELECT 1 AS id")
    jc = JdbcConnector(
        "jdbc:duckdb:memory",
        catalog_executor=lambda sql: con.sql(sql).fetchall(),
    )
    assert "hr" in jc.list_schemas()
    assert jc.list_tables("hr") == ["dept", "emp"]
    assert jc.table_exists("hr", "emp")
    assert not jc.table_exists("hr", "nope")
    assert jc.list_tablespaces("hr") == []  # no tablespaces outside Oracle


def test_jdbc_catalog_sql_oracle_dialect_shapes():
    """Oracle-dialect SQL matches the reference's enumeration sources
    (all_users, all_tables, dba_segments) and escapes literals."""
    from oracledb_datapump_spark.catalog import JdbcConnector

    seen = []
    jc = JdbcConnector(
        "jdbc:oracle:thin:@db:1521/x",
        dialect="oracle",
        catalog_executor=lambda sql: seen.append(sql) or [],
    )
    jc.list_schemas()
    jc.list_tables("o'brien")
    jc.list_tablespaces("hr")
    assert "all_users" in seen[0]
    assert "all_tables" in seen[1] and "o''brien" in seen[1]
    assert "dba_segments" in seen[2]


def test_jdbc_full_mode_planning_via_introspection():
    """FULL-mode export planning enumerates schemas/tables through the
    introspection path (the round-1 gap: this raised NotImplementedError)."""
    import duckdb

    from oracledb_datapump_spark.base import JobMode, Operation
    from oracledb_datapump_spark.catalog import JdbcConnector
    from oracledb_datapump_spark.directives import PlanConfig
    from oracledb_datapump_spark.planner import plan_export

    con = duckdb.connect()
    con.sql("CREATE SCHEMA s1")
    con.sql("CREATE TABLE s1.a AS SELECT 1 AS id")
    con.sql("CREATE SCHEMA s2")
    con.sql("CREATE TABLE s2.b AS SELECT 1 AS id")
    jc = JdbcConnector(
        "jdbc:duckdb:memory",
        catalog_executor=lambda sql: con.sql(sql).fetchall(),
    )
    plans = plan_export(jc, Operation.EXPORT, JobMode.FULL, PlanConfig())
    keys = {f"{p.schema}.{p.table}" for p in plans}
    assert {"s1.a", "s2.b"} <= keys
