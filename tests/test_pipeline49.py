"""Batch 49: rolling-origin forecast backtest, minhash permutation QA,
and the SQL_FILE lifecycle (DDL effect gated against the catalog)."""

import datetime

import duckdb

from oracledb_datapump_spark.operators import etl as E
from oracledb_datapump_spark.operators import pipeline49 as P49


def test_forecast_backtest_hand_computed(spark, tmp_path):
    """y = 100..500 cents by month: evaluated months are 4 and 5, both
    with forecast 200/300 → bias +200 each, MAE 200."""
    spark.createDataFrame(
        [
            (m, 1, datetime.date(2024, m, 10), float(m))
            for m in range(1, 6)
        ],
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 0)], "c_custkey long, c_nationkey long"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(0, "ALPHA")], "n_nationkey long, n_name string"
    ).write.parquet(str(tmp_path / "nation.parquet"))
    [r] = P49.naive_forecast_backtest(spark, str(tmp_path)).collect()
    assert (r.nation, r.n_eval, r.mae_cents, r.mean_bias_cents) == (
        "ALPHA", 2, 200, 200,
    )
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    assert con.sql(P49.NAIVE_FORECAST_BACKTEST_SQL).fetchall() == [
        ("ALPHA", 2, 200, 200)
    ]


def test_perm_quality_sixteen_healthy_rows(spark, tmp_path):
    spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j}" for j in range(20)), "en", "s", 1)
            for i in range(8)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = P49.minhash_perm_quality(spark, str(tmp_path)).collect()
    assert [r.seed for r in rows] == list(range(16))
    for r in rows:
        assert r.n_docs == 8
        assert r.min_mh <= r.mean_mh <= r.max_mh
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = con.sql(P49.MINHASH_PERM_QUALITY_SQL).fetchall()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))


def test_sqlfile_recreates_typed_shapes(spark, tmp_path):
    """A staged table with date/double/timestamp columns: the generated
    DDL, executed in a fresh DuckDB, reproduces each column with the
    mapped type and the original ordinal order."""
    import os

    from oracledb_datapump_spark import Job
    from oracledb_datapump_spark.catalog import ParquetConnector
    from oracledb_datapump_spark.directives import DirectiveBase as D
    from oracledb_datapump_spark.dumpset import DumpSet

    stage = tmp_path / "stage"
    dump = tmp_path / "dump"
    spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1), 1.5, datetime.datetime(2024, 1, 1))],
        "k long, d date, v double, ts timestamp",
    ).write.parquet(str(stage / "typed.parquet"))
    st = Job(
        "EXPORT",
        "TABLE",
        dumpfiles=str(dump),
        directives=[D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("typed")],
    ).run(connection=ParquetConnector(str(stage)), spark=spark)
    assert st.job_state == "COMPLETED"
    st = Job("SQL_FILE", "TABLE", dumpfiles=str(dump)).run(spark=spark)
    assert st.job_state == "COMPLETED"
    [path] = [
        e["path"]
        for e in DumpSet(str(dump)).read_events()
        if e["event"] == "SQL_FILE_DONE"
    ]
    con = duckdb.connect()
    for stmt in open(path).read().split(";"):
        if stmt.strip():
            con.sql(stmt)
    got = con.sql(
        "SELECT column_name, data_type FROM information_schema.columns"
        " WHERE table_name = 'typed' ORDER BY ordinal_position"
    ).fetchall()
    assert got == [
        ("k", "BIGINT"),
        ("d", "DATE"),
        ("v", "DOUBLE"),
        ("ts", "TIMESTAMP"),
    ]


def test_sqlfile_unique_check_constraints(spark, sf_dir):
    """The gated SQL_FILE lifecycle now carries UNIQUE + CHECK: all four
    restored-sentinels and all three enforced-sentinels must be true —
    i.e. the regenerated fresh catalog REJECTS a duplicated r_name and
    a negative n_nationkey, exactly like the source catalog would."""
    row = E.datapump_sqlfile_script(spark, sf_dir).collect()[0]
    for flag in (
        "script_executed",
        "fk_ordered",
        "pk_restored",
        "fk_restored",
        "fk_enforced",
        "unique_restored",
        "unique_enforced",
        "check_restored",
        "check_enforced",
    ):
        assert row[flag] is True, flag


def test_duckdb_connector_captures_unique_and_check():
    from oracledb_datapump_spark.catalog import DuckDbConnector

    src = DuckDbConnector(":memory:")
    src.execute(
        "CREATE TABLE main.t (a INTEGER PRIMARY KEY, b VARCHAR,"
        " c INTEGER, UNIQUE (b), CHECK (c >= 0))"
    )
    keys = src.constraint_columns("main")["t"]
    assert keys["primary_key"] == ["a"]
    assert ["b"] in keys["unique"]
    assert any("c >= 0" in e for e in keys["checks"])


def test_sqlite_connector_captures_unique(tmp_path):
    from oracledb_datapump_spark.catalog import SqliteConnector

    con = SqliteConnector(str(tmp_path / "u.db"))
    con.execute(
        "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE)"
    )
    keys = con.constraint_columns("main")["t"]
    assert keys["unique"] == [["b"]]
    assert keys["checks"] == []


def test_sqlfile_secondary_index_restored(spark, sf_dir):
    row = E.datapump_sqlfile_script(spark, sf_dir).collect()[0]
    assert row["index_restored"] is True


def test_duckdb_connector_captures_secondary_indexes():
    from oracledb_datapump_spark.catalog import DuckDbConnector

    src = DuckDbConnector(":memory:")
    src.execute("CREATE TABLE main.t (a INTEGER PRIMARY KEY, b INTEGER, c INTEGER)")
    src.execute("CREATE INDEX i_b ON main.t (b)")
    src.execute("CREATE UNIQUE INDEX i_bc ON main.t (b, c)")
    keys = src.constraint_columns("main")["t"]
    assert keys["indexes"] == [
        {"name": "i_b", "unique": False, "columns": ["b"]},
        {"name": "i_bc", "unique": True, "columns": ["b", "c"]},
    ]


def test_sqlite_connector_captures_secondary_indexes(tmp_path):
    from oracledb_datapump_spark.catalog import SqliteConnector

    con = SqliteConnector(str(tmp_path / "i.db"))
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT, c INTEGER)")
    con.execute("CREATE INDEX i_c ON t (c)")
    keys = con.constraint_columns("main")["t"]
    assert keys["indexes"] == [
        {"name": "i_c", "unique": False, "columns": ["c"]}
    ]
