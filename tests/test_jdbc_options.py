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
