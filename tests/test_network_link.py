"""NETWORK_LINK analog (public Oracle Data Pump parameter: impdp
NETWORK_LINK loads straight from the source database over a dblink —
the reference never wraps it). Direct connector→connector transfer, no
dump set materialized; the dumpfiles root holds only events + manifest.
"""

import os

import pytest
from pyspark.sql import functions as F

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.dumpset import DumpSet
from oracledb_datapump_spark.exceptions import JobError
from oracledb_datapump_spark.job import Job


def _link_import(spark, sf_dir, events, wh, directives):
    return Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=events,
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.NETWORK_LINK(f"parquet://{sf_dir}"),
        ] + directives,
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)


def test_transfer_no_dump_files(spark, sf_dir, tmp_path):
    events, wh = str(tmp_path / "ev"), str(tmp_path / "wh")
    st = _link_import(
        spark, sf_dir, events, wh,
        [
            D.INCLUDE_TABLE("nation"),
            D.REMAP_SCHEMA("main", "hr"),
            D.TABLE_EXISTS_ACTION("REPLACE"),
        ],
    )
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(events)
    assert ds.dumpfiles() == []  # zero data files ever produced
    evs = [e["event"] for e in ds.read_events()]
    assert "NETWORK_TRANSFER" in evs
    assert "TABLE_TRANSFER_DONE" in evs
    assert not any(e.startswith("TABLE_EXPORT") for e in evs)
    assert not any(e.startswith("TABLE_IMPORT") for e in evs)
    n_src = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    assert ParquetConnector(wh).read_table(spark, "hr", "nation").count() == n_src
    # manifest written (events root is the master table), no dumpfiles
    m = ds.read_manifest()
    assert m.dumpfiles == [] and m.tables["main.nation"]["ok"]


def test_transfer_predicate_and_columns(spark, sf_dir, tmp_path):
    events, wh = str(tmp_path / "ev"), str(tmp_path / "wh")
    st = _link_import(
        spark, sf_dir, events, wh,
        [
            D.INCLUDE_TABLE("orders"),
            D.QUERY("o_orderkey <= 100"),
            D.COLUMNS("o_orderkey,o_totalprice"),
            D.TABLE_EXISTS_ACTION("REPLACE"),
        ],
    )
    assert st.job_state == "COMPLETED", st.error
    out = ParquetConnector(wh).read_table(spark, "main", "orders")
    assert out.columns == ["o_orderkey", "o_totalprice"]
    expect = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderkey <= 100")
        .count()
    )
    assert out.count() == expect


def test_transfer_merge_upserts(spark, sf_dir, tmp_path):
    events, wh = str(tmp_path / "ev"), str(tmp_path / "wh")
    tgt = ParquetConnector(wh)
    seed = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .withColumn("n_name", F.lit("STALE"))
    )
    tgt.write_table(seed, "main", "nation", mode="overwrite")
    st = _link_import(
        spark, sf_dir, events, wh,
        [
            D.INCLUDE_TABLE("nation"),
            D.TABLE_EXISTS_ACTION("MERGE"),
            D.MERGE_KEY("n_nationkey"),
        ],
    )
    assert st.job_state == "COMPLETED", st.error
    out = tgt.read_table(spark, "main", "nation")
    assert out.filter("n_name = 'STALE'").count() == 0  # all upserted
    assert out.count() == seed.count()


def test_transfer_skip_exists(spark, sf_dir, tmp_path):
    events, wh = str(tmp_path / "ev"), str(tmp_path / "wh")
    tgt = ParquetConnector(wh)
    tgt.write_table(
        spark.read.parquet(f"{sf_dir}/region.parquet").limit(1),
        "main", "region", mode="overwrite",
    )
    st = _link_import(
        spark, sf_dir, events, wh,
        [D.INCLUDE_TABLE("region"), D.TABLE_EXISTS_ACTION("SKIP")],
    )
    assert st.job_state == "COMPLETED", st.error
    assert tgt.read_table(spark, "main", "region").count() == 1  # untouched
    evs = [e["event"] for e in DumpSet(events).read_events()]
    assert "TABLE_TRANSFER_SKIP_EXISTS" in evs


@pytest.mark.parametrize(
    "bad, msg",
    [
        ([D.VERIFY_CHECKSUM(True)], "NETWORK_LINK transfer produces none"),
        ([D.AS_OF_VERSION(1)], "has no dump"),
        (
            [D.ENCRYPTION("ALL"), D.ENCRYPTION_PASSWORD("pw")],
            "transfer produces none",
        ),
    ],
)
def test_transfer_refuses_dump_directives(spark, sf_dir, tmp_path, bad, msg):
    events, wh = str(tmp_path / "ev"), str(tmp_path / "wh")
    with pytest.raises(JobError, match=msg):
        _link_import(
            spark, sf_dir, events, wh,
            [D.INCLUDE_TABLE("nation"), D.TABLE_EXISTS_ACTION("REPLACE")]
            + bad,
        )


def test_transfer_estimate_only(spark, sf_dir, tmp_path):
    events, wh = str(tmp_path / "ev"), str(tmp_path / "wh")
    job = Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=events,
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE("nation"),
            D.NETWORK_LINK(f"parquet://{sf_dir}"),
            D.ESTIMATE_ONLY(True),
        ],
    )
    st = job.run(wait=True, connection=ParquetConnector(wh), spark=spark)
    assert st.job_state == "COMPLETED"
    assert job.estimates and job.estimates[0]["estimated_rows"] == 25
    assert not os.path.isdir(os.path.join(wh, "main"))  # nothing moved
