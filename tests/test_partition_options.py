"""EXPORT_PARTITION_BY + PARTITION_OPTIONS (MERGE vs DEPARTITION)."""

import os

from oracledb_datapump_spark import Job, JobState
from oracledb_datapump_spark.directives import DirectiveBase as D


def test_partitioned_export_merge_and_departition(spark, duck, tmp_path):
    dump = str(tmp_path / "pdump")
    st = Job(
        "EXPORT", "TABLE", dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("test1"),
            D.INCLUDE_TABLE("orders"),
            D.EXPORT_PARTITION_BY("o_orderstatus", object_path="orders"),
        ],
    ).run(connection=duck, spark=spark)
    assert st.job_state == JobState.COMPLETED.value
    tdir = os.path.join(dump, "test1", "orders")
    part_dirs = [d for d in os.listdir(tdir) if d.startswith("o_orderstatus=")]
    assert part_dirs, os.listdir(tdir)

    # MERGE (default): one table back, all rows
    Job(
        "IMPORT", "TABLE", dumpfiles=dump,
        directives=[D.REMAP_SCHEMA("test1", "pm"), D.TABLE_EXISTS_ACTION("REPLACE")],
    ).run(connection=duck, spark=spark)
    n_src = duck.execute("SELECT count(*) FROM test1.orders").fetchone()[0]
    assert duck.execute("SELECT count(*) FROM pm.orders").fetchone()[0] == n_src

    # DEPARTITION: one table per partition value
    Job(
        "IMPORT", "TABLE", dumpfiles=dump,
        directives=[
            D.REMAP_SCHEMA("test1", "pd"),
            D.TABLE_EXISTS_ACTION("REPLACE"),
            D.PARTITION_OPTIONS("DEPARTITION"),
        ],
    ).run(connection=duck, spark=spark)
    tables = duck.list_tables("pd")
    assert all(t.startswith("orders_o_orderstatus_") for t in tables), tables
    total = sum(
        duck.execute(f"SELECT count(*) FROM pd.{t}").fetchone()[0] for t in tables
    )
    assert total == n_src
    # departitioned tables keep the FULL column set — the partition column
    # is restored (Oracle DEPARTITION promotes partitions to standalone
    # tables, not projections)
    t0 = sorted(tables)[0]
    cols = [
        r[0]
        for r in duck.execute(
            "SELECT column_name FROM information_schema.columns "
            f"WHERE table_schema='pd' AND table_name='{t0}'"
        ).fetchall()
    ]
    assert "o_orderstatus" in cols, cols
    # and its value is uniform within the split
    vals = duck.execute(
        f"SELECT DISTINCT o_orderstatus FROM pd.{t0}"
    ).fetchall()
    assert len(vals) == 1
