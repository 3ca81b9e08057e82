"""TABLE:PARTITION job scope (Oracle expdp TABLES syntax — utilities
guide; the reference never wraps it). The hive analog of a partition
name is the leaf dir 'col=value': the scoped export lists and reads
ONLY that leaf's files, records the pruning evidence in
TABLE_EXPORT_PARTITION_SCOPED, and composes with EXPORT_PARTITION_BY /
PARTITION_OPTIONS."""

import os

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D, PlanConfig
from oracledb_datapump_spark.dumpset import DumpSet
from oracledb_datapump_spark.exceptions import InvalidDirective, JobError
from oracledb_datapump_spark.job import Job

PART = "o_orderpriority=1-URGENT"


@pytest.fixture()
def hive_stage(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "stage")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.partitionBy("o_orderpriority")
        .parquet(os.path.join(stage, "orders.parquet"))
    )
    return stage


def test_scope_parsing():
    cfg = PlanConfig()
    D.INCLUDE_TABLE(f"orders:{PART}").apply(cfg)
    assert cfg.include_tables == ["orders"]
    assert cfg.table_partition_scope == {"orders": [PART]}
    with pytest.raises(InvalidDirective, match="column=value"):
        D.INCLUDE_TABLE("orders:P1").apply(PlanConfig())


def test_scope_parsing_multi_partition():
    # Oracle's TABLES=(t:p1,t:p2): two partitions of ONE table both make
    # the scope (overwriting would silently drop p1 from the dump)
    cfg = PlanConfig()
    D.INCLUDE_TABLE(f"orders:{PART}").apply(cfg)
    D.INCLUDE_TABLE("orders:o_orderpriority=2-HIGH").apply(cfg)
    D.INCLUDE_TABLE(f"orders:{PART}").apply(cfg)  # dup mention: no-op
    assert cfg.include_tables == ["orders"]
    assert cfg.table_partition_scope == {
        "orders": [PART, "o_orderpriority=2-HIGH"]
    }


def test_partition_scoped_export_prunes_files(spark, sf_dir, hive_stage, tmp_path):
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE(f"orders:{PART}"),
        ],
    ).run(wait=True, connection=ParquetConnector(hive_stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    evs = [
        e for e in ds.read_events()
        if e["event"] == "TABLE_EXPORT_PARTITION_SCOPED"
    ]
    assert len(evs) == 1
    ev = evs[0]
    assert ev["partition"] == [PART]
    assert 1 <= ev["files_scanned"] < ev["files_total"]  # real pruning
    # the dump holds exactly the partition's rows, full column set
    out = spark.read.parquet(ds.table_dir("main", "orders"))
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = src.filter("o_orderpriority = '1-URGENT'").count()
    assert out.count() == want > 0
    assert out.filter("o_orderpriority <> '1-URGENT'").count() == 0
    assert set(out.columns) == set(src.columns)


def test_missing_partition_fails_loud(spark, hive_stage, tmp_path):
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=str(tmp_path / "d"),
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE("orders:o_orderpriority=9-BOGUS"),
        ],
    ).run(wait=True, connection=ParquetConnector(hive_stage), spark=spark)
    assert st.job_state == "COMPLETED_WITH_ERRORS"
    assert "available" in str(st.error)


def test_unsupported_connector_refuses(spark, tmp_path, duck):
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=str(tmp_path / "d"),
        directives=[
            D.INCLUDE_SCHEMA("test1"),
            D.INCLUDE_TABLE(f"orders:{PART}"),
        ],
    ).run(wait=True, connection=duck, spark=spark)
    assert st.job_state == "COMPLETED_WITH_ERRORS"
    assert "does not support" in str(st.error)


def test_composes_with_departition_import(spark, sf_dir, hive_stage, tmp_path):
    dump, wh = str(tmp_path / "dump"), str(tmp_path / "wh")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE(f"orders:{PART}"),
            D.EXPORT_PARTITION_BY("o_orderpriority"),
        ],
    ).run(wait=True, connection=ParquetConnector(hive_stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    # the dump is hive-layout with exactly ONE leaf — the named partition
    tdir = DumpSet(dump).table_dir("main", "orders")
    leaves = [d for d in os.listdir(tdir) if "=" in d]
    assert leaves == [PART]
    st = Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.TABLE_EXISTS_ACTION("REPLACE"),
            D.PARTITION_OPTIONS("DEPARTITION"),
        ],
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    target = "orders_o_orderpriority_1-urgent"
    out = ParquetConnector(wh).read_table(spark, "main", target)
    want = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
        .count()
    )
    assert out.count() == want


def test_multi_partition_scoped_export(spark, sf_dir, hive_stage, tmp_path):
    """Oracle TABLES=(t:p1,t:p2): BOTH named leaves make the dump (the
    r12 scope map kept only the last mention — silent data loss)."""
    dump = str(tmp_path / "dump")
    p2 = "o_orderpriority=2-HIGH"
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE(f"orders:{PART}"),
            D.INCLUDE_TABLE(f"orders:{p2}"),
        ],
    ).run(wait=True, connection=ParquetConnector(hive_stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    evs = [
        e for e in ds.read_events()
        if e["event"] == "TABLE_EXPORT_PARTITION_SCOPED"
    ]
    assert len(evs) == 1
    assert evs[0]["partition"] == [PART, p2]
    assert 2 <= evs[0]["files_scanned"] < evs[0]["files_total"]
    out = spark.read.parquet(ds.table_dir("main", "orders"))
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = src.filter(
        "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    ).count()
    assert out.count() == want > 0
    assert set(
        r[0] for r in out.select("o_orderpriority").distinct().collect()
    ) == {"1-URGENT", "2-HIGH"}
