"""SqliteConnector (catalog.py): the stdlib second-RDBMS path. The
full datapump lifecycle is gated via datapump_roundtrip_sqlite; these
pin the connector contract edges."""

import os
import tempfile

import pytest

from oracledb_datapump_spark.catalog import SqliteConnector, resolve_connector
from oracledb_datapump_spark.exceptions import FileError, UsageError


@pytest.fixture()
def db():
    d = tempfile.mkdtemp(prefix="dp_sqlite_")
    yield os.path.join(d, "t.db")
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _seed(spark, con, table="orders"):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    con.write_table(df, "main", table, mode="error")
    return df


def test_url_scheme_resolves(db):
    con = resolve_connector(f"sqlite://{db}")
    assert isinstance(con, SqliteConnector)


def test_partitioned_read_covers_all_rows_exactly_once(spark, db):
    con = SqliteConnector(db)
    df = _seed(spark, con)
    for par in (1, 3, 7):
        back = con.read_table(spark, "main", "orders", parallel=par)
        assert back.rdd.getNumPartitions() == par
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )


def test_type_mapping_roundtrip(spark, db):
    con = SqliteConnector(db)
    df = _seed(spark, con)
    back = con.read_table(spark, "main", "orders", parallel=2)
    assert dict(back.dtypes) == dict(df.dtypes)


def test_predicate_and_column_pushdown(spark, db):
    con = SqliteConnector(db)
    _seed(spark, con)
    sub = con.read_table(
        spark, "main", "orders", parallel=2,
        predicate="o_orderkey <= 100",
        columns=["o_orderkey", "o_totalprice"],
    )
    assert sub.columns == ["o_orderkey", "o_totalprice"]
    assert sub.count() == 101  # keys 1..100 plus... fixture keys start at 0
    assert sub.agg({"o_orderkey": "max"}).collect()[0][0] <= 100


def test_empty_table_read(spark, db):
    con = SqliteConnector(db)
    df = _seed(spark, con)
    con.write_table(df.limit(0), "main", "empty_t", mode="error")
    back = con.read_table(spark, "main", "empty_t", parallel=4)
    assert back.count() == 0
    assert dict(back.dtypes) == dict(df.dtypes)


def test_write_modes_and_drift(spark, db):
    con = SqliteConnector(db)
    df = _seed(spark, con)
    with pytest.raises(FileError, match="exists"):
        con.write_table(df, "main", "orders", mode="error")
    con.write_table(df, "main", "orders", mode="append")
    assert con.read_table(spark, "main", "orders").count() == 2 * df.count()
    con.write_table(df, "main", "orders", mode="overwrite", truncate=True)
    assert con.read_table(spark, "main", "orders").count() == df.count()
    with pytest.raises(FileError, match="drift"):
        con.write_table(
            df.withColumnRenamed("o_orderstatus", "zzz"),
            "main", "orders", mode="append",
        )


def test_schema_creation_refused(spark, db):
    con = SqliteConnector(db)
    with pytest.raises(UsageError, match="ATTACH"):
        con.ensure_schema("not_attached")


def test_views_as_tables_materializes_sqlite_view(spark, db):
    """The VIEWS_AS_TABLES directive works against the SQLite catalog:
    the view body runs in SQLite, the dump holds materialized rows."""
    import shutil
    import tempfile

    from oracledb_datapump_spark.base import JobMode, Operation
    from oracledb_datapump_spark.catalog import ParquetConnector
    from oracledb_datapump_spark.directives import DirectiveBase as D
    from oracledb_datapump_spark.job import Job

    con = SqliteConnector(db)
    df = _seed(spark, con)
    con.execute(
        "CREATE VIEW main.big_orders AS "
        "SELECT o_orderkey, o_totalprice FROM main.orders "
        "WHERE o_totalprice > 200000"
    )
    assert con.list_views("main") == ["big_orders"]
    dump = tempfile.mkdtemp(prefix="dp_sq_vat_")
    try:
        st = Job(
            Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
            directives=[D.INCLUDE_SCHEMA("main"),
                        D.VIEWS_AS_TABLES("big_orders")],
        ).run(wait=True, connection=con, spark=spark)
        assert st.job_state == "COMPLETED", st.error
        got = spark.read.parquet(os.path.join(dump, "main", "big_orders"))
        want = df.filter("o_totalprice > 200000").count()
        assert got.count() == want and got.columns == [
            "o_orderkey", "o_totalprice",
        ]
    finally:
        shutil.rmtree(dump, ignore_errors=True)


def test_external_second_precision_timestamps(spark, tmp_path):
    """ADVICE r11: externally-created SQLite databases store the common
    second-precision form ('YYYY-MM-DD HH:MM:SS') or bare dates — the
    reader must parse them, not just its own self-written
    microsecond-precision round-trips."""
    import sqlite3

    p = str(tmp_path / "ext.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE ev (id INTEGER, ts TIMESTAMP, d DATE)")
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, ?)",
        [
            (1, "2024-01-02 10:11:12", "2024-01-02"),
            (2, "2024-01-03 00:00:00", "2024-01-03"),
            (3, "2024-01-04 10:11:12.123456", "2024-01-04"),
        ],
    )
    con.commit()
    con.close()
    df = SqliteConnector(p).read_table(spark, "main", "ev").orderBy("id")
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["ts"].second == 12 and rows[0]["ts"].microsecond == 0
    assert rows[2]["ts"].microsecond == 123456
