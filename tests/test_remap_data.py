"""REMAP_DATA directive: validation, engine behavior, privacy property."""

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.exceptions import UsageError
from oracledb_datapump_spark.functions.remap_data import parse_remap
from oracledb_datapump_spark.job import Job


def test_parse_validation():
    assert parse_remap("c_name:hash_mask") == ("c_name", "hash_mask")
    with pytest.raises(UsageError, match="not registered"):
        parse_remap("c_name:rot13")
    with pytest.raises(UsageError, match="column.*function"):
        parse_remap("c_name")
    with pytest.raises(UsageError):
        parse_remap(":hash_mask")


def test_unknown_function_fails_at_submit():
    """Registry validation runs when the directive applies, not
    mid-export."""
    from oracledb_datapump_spark.directives import PlanConfig

    with pytest.raises(UsageError, match="rot13"):
        D.REMAP_DATA("c_name:rot13").apply(PlanConfig())
    cfg = PlanConfig()
    D.REMAP_DATA("c_name:hash_mask", object_path="customer").apply(cfg)
    D.REMAP_DATA("c_acctbal:null_out", object_path="customer").apply(cfg)
    assert cfg.table_remap_data["customer"] == [
        ("c_name", "hash_mask"),
        ("c_acctbal", "null_out"),
    ]


def test_export_masks_values(spark, sf_dir, tmp_path):
    """The dump on disk never contains raw values: names are anon_
    tokens (joinability preserved — distinct count unchanged), balances
    are NULL with the DOUBLE type kept, untouched columns byte-equal."""
    src = ParquetConnector(sf_dir)
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE("customer"),
            D.REMAP_DATA("c_name:hash_mask", object_path="customer"),
            D.REMAP_DATA("c_acctbal:null_out", object_path="customer"),
        ],
    ).run(wait=True, connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.error
    raw = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dumped = spark.read.parquet(f"{dump}/main/customer")
    assert dict(dumped.dtypes)["c_acctbal"] == "double"
    n = dumped.count()
    assert n == raw.count()
    assert dumped.filter("c_acctbal IS NOT NULL").count() == 0
    assert dumped.filter("c_name NOT LIKE 'anon\\_%'").count() == 0
    assert (
        dumped.select("c_name").distinct().count()
        == raw.select("c_name").distinct().count()
    )
    # no raw name survives anywhere in the masked column
    raw_names = {r.c_name for r in raw.select("c_name").distinct().collect()}
    masked = {r.c_name for r in dumped.select("c_name").distinct().collect()}
    assert not raw_names & masked
    # untouched column round-trips exactly
    assert sorted(
        (r.c_mktsegment, r["count"])
        for r in dumped.groupBy("c_mktsegment").count().collect()
    ) == sorted(
        (r.c_mktsegment, r["count"])
        for r in raw.groupBy("c_mktsegment").count().collect()
    )


def test_missing_column_fails_loudly(spark, sf_dir, tmp_path):
    """Remapping a column COLUMNS projected away names both facts."""
    src = ParquetConnector(sf_dir)
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=str(tmp_path / "dump2"),
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE("customer"),
            D.COLUMNS("c_custkey,c_mktsegment", object_path="customer"),
            D.REMAP_DATA("c_name:hash_mask", object_path="customer"),
        ],
    ).run(wait=True, connection=src, spark=spark)
    assert st.job_state != "COMPLETED"
    assert "REMAP_DATA" in str(st.error)
