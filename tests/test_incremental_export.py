"""CDC-style incremental export (INCREMENTAL_COLUMN directive): first run
full, later runs append only rows past the manifest watermark."""

from oracledb_datapump_spark import Job, JobState
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.dumpset import DumpSet


def _export(duck, spark, dump):
    return Job(
        "EXPORT", "TABLE", dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("inc1"),
            D.INCLUDE_TABLE("tx"),
            D.INCREMENTAL_COLUMN("id", object_path="tx"),
        ],
    ).run(connection=duck, spark=spark)


def test_incremental_export_appends_only_new_rows(spark, tmp_path):
    from oracledb_datapump_spark.catalog import DuckDbConnector

    duck = DuckDbConnector(":memory:")
    duck.execute("CREATE SCHEMA inc1")
    duck.execute("CREATE TABLE inc1.tx(id BIGINT, amount DOUBLE)")
    duck.execute("INSERT INTO inc1.tx SELECT range, range * 1.5 FROM range(100)")

    dump = str(tmp_path / "incdump")
    st = _export(duck, spark, dump)
    assert st.job_state == JobState.COMPLETED.value
    meta = DumpSet(dump).read_manifest()
    assert meta.tables["inc1.tx"]["watermark"] == 99
    assert spark.read.parquet(f"{dump}/inc1/tx").count() == 100

    # new rows land in the source; re-export appends exactly those
    duck.execute(
        "INSERT INTO inc1.tx SELECT range, range * 1.5 FROM range(100, 150)"
    )
    st = _export(duck, spark, dump)
    assert st.job_state == JobState.COMPLETED.value
    df = spark.read.parquet(f"{dump}/inc1/tx")
    assert df.count() == 150  # no duplicates of the first 100
    assert df.select("id").distinct().count() == 150
    meta = DumpSet(dump).read_manifest()
    assert meta.tables["inc1.tx"]["watermark"] == 149
    assert meta.tables["inc1.tx"]["row_count"] == 150

    # idle run: nothing new → nothing appended
    st = _export(duck, spark, dump)
    assert st.job_state == JobState.COMPLETED.value
    assert spark.read.parquet(f"{dump}/inc1/tx").count() == 150
