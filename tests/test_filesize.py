"""FILESIZE directive (public Oracle Data Pump parameter — utilities
guide FILESIZE=integer[B|KB|MB|GB|TB]; the reference never wraps it).
Spark analog: maxRecordsPerFile from an estimate-derived bytes/row, with
a corrective observed-bytes/row rewrite (atomic swap) when the estimate
overshot. Composes with CHECKSUM: digests are recorded AFTER enforcement
so the integrity map covers the final layout."""

import os

import pytest
from pyspark.sql import functions as F

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D, PlanConfig
from oracledb_datapump_spark.dumpset import DumpSet
from oracledb_datapump_spark.exceptions import InvalidDirective, JobError
from oracledb_datapump_spark.job import Job

KB64 = 64 * 1024


def _data_files(tdir: str) -> list[str]:
    return [
        os.path.join(tdir, p)
        for p in os.listdir(tdir)
        if not p.startswith(("_", "."))
    ]


def test_filesize_parsing():
    cfg = PlanConfig()
    D.FILESIZE("1MB").apply(cfg)
    assert cfg.filesize == 1 << 20
    D.FILESIZE("64KB").apply(cfg)
    assert cfg.filesize == KB64
    D.FILESIZE(2 << 20).apply(cfg)
    assert cfg.filesize == 2 << 20
    D.FILESIZE("2G").apply(cfg)
    assert cfg.filesize == 2 << 30
    for bad in ("", "12XB", "MB", "1.5MB", True, 1024):
        with pytest.raises(InvalidDirective):
            D.FILESIZE(bad)


def test_filesize_splits_dump_within_envelope(spark, sf_dir, tmp_path):
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("lineitem"),
            D.FILESIZE("64KB"),
        ],
    ).run(wait=True, connection=ParquetConnector(sf_dir), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    files = _data_files(ds.table_dir("main", "lineitem"))
    assert len(files) >= 2
    # the estimate errs toward under-full, never oversized
    assert max(os.path.getsize(p) for p in files) <= KB64 * 1.05
    detail = ds.read_manifest().tables["main.lineitem"]["filesize"]
    assert detail["target_bytes"] == KB64
    assert detail["max_file_bytes"] <= KB64 * 1.05
    # roundtrip intact
    wh = str(tmp_path / "wh")
    st = Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[D.TABLE_EXISTS_ACTION("REPLACE")],
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    assert st.job_state == "COMPLETED"
    n_src = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert ParquetConnector(wh).read_table(spark, "main", "lineitem").count() == n_src


def test_filesize_corrective_rewrite_on_wide_rows(spark, tmp_path):
    """Rows ~40x wider than the schema estimate (a long near-random text
    column): the first write overshoots the cap, the corrective pass
    rewrites with the OBSERVED bytes/row and logs
    TABLE_FILESIZE_ENFORCED."""
    stage = str(tmp_path / "stage")
    # ~4.3KB of hex per row (md5 chains — poorly compressible), 200 rows
    df = (
        spark.range(200)
        .withColumn("body", F.md5(F.col("id").cast("string")))
    )
    for _ in range(7):
        df = df.withColumn("body", F.concat("body", F.md5("body"), F.col("body")))
    df.coalesce(1).write.parquet(os.path.join(stage, "wide.parquet"))
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("wide"),
            D.FILESIZE("64KB"),
        ],
    ).run(wait=True, connection=ParquetConnector(stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    evs = [e for e in ds.read_events() if e["event"] == "TABLE_FILESIZE_ENFORCED"]
    assert len(evs) == 1 and evs[0]["target_bytes"] == KB64
    files = _data_files(ds.table_dir("main", "wide"))
    assert len(files) >= 2
    # 1.25 envelope: parquet row-group/footer slop on top of the 0.9 aim
    assert max(os.path.getsize(p) for p in files) <= KB64 * 1.25
    assert spark.read.parquet(ds.table_dir("main", "wide")).count() == 200


def test_filesize_refuses_encryption(spark, sf_dir, tmp_path):
    with pytest.raises(JobError, match="FILESIZE.*ENCRYPTION"):
        Job(
            Operation.EXPORT, JobMode.TABLE,
            dumpfiles=str(tmp_path / "d"),
            directives=[
                D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("nation"),
                D.FILESIZE("1MB"), D.ENCRYPTION("ALL"),
                D.ENCRYPTION_PASSWORD("pw"),
            ],
        ).run(wait=True, connection=ParquetConnector(sf_dir), spark=spark)


def test_filesize_checksum_covers_final_files(spark, sf_dir, tmp_path):
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("orders"),
            D.FILESIZE("64KB"), D.CHECKSUM(True),
        ],
    ).run(wait=True, connection=ParquetConnector(sf_dir), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    entry = ds.read_manifest().tables["main.orders"]
    files = _data_files(ds.table_dir("main", "orders"))
    assert len(entry["checksums"]["files"]) == len(files) >= 2
    # verified import accepts the split layout
    wh = str(tmp_path / "wh")
    st = Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.TABLE_EXISTS_ACTION("REPLACE"), D.VERIFY_CHECKSUM(True),
        ],
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    assert st.job_state == "COMPLETED", st.error


def test_filesize_orc_splits_and_roundtrips(spark, sf_dir, tmp_path):
    """DUMP_FORMAT(ORC) x FILESIZE: the cap must hold on the format the
    dump officially supports, not just the parquet default — the writer
    path is format-generic (maxRecordsPerFile + footer accounting both
    work on ORC), and this pins it."""
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("lineitem"),
            D.DUMP_FORMAT("ORC"), D.FILESIZE("64KB"),
        ],
    ).run(wait=True, connection=ParquetConnector(sf_dir), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    files = _data_files(ds.table_dir("main", "lineitem"))
    assert len(files) >= 2
    assert all(p.endswith(".orc") for p in files)
    # estimate path errs under-full; corrective pass bounds overshoot
    assert max(os.path.getsize(p) for p in files) <= KB64 * 1.25
    detail = ds.read_manifest().tables["main.lineitem"]
    assert detail["dump_format"] == "orc"
    assert detail["filesize"]["target_bytes"] == KB64
    wh = str(tmp_path / "wh")
    st = Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[D.TABLE_EXISTS_ACTION("REPLACE")],
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)
    assert st.job_state == "COMPLETED"
    n_src = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert (
        ParquetConnector(wh).read_table(spark, "main", "lineitem").count()
        == n_src
    )


def test_filesize_orc_corrective_rewrite(spark, tmp_path):
    """The observed-bytes corrective rewrite must run on ORC too: wide
    near-random rows overshoot the schema estimate, the enforcement pass
    rewrites IN FORMAT (still .orc) and logs TABLE_FILESIZE_ENFORCED."""
    stage = str(tmp_path / "stage")
    df = (
        spark.range(200)
        .withColumn("body", F.md5(F.col("id").cast("string")))
    )
    for _ in range(7):
        df = df.withColumn(
            "body", F.concat("body", F.md5("body"), F.col("body"))
        )
    df.coalesce(1).write.parquet(os.path.join(stage, "wide.parquet"))
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("wide"),
            D.DUMP_FORMAT("ORC"), D.FILESIZE("64KB"),
        ],
    ).run(wait=True, connection=ParquetConnector(stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    evs = [
        e for e in ds.read_events() if e["event"] == "TABLE_FILESIZE_ENFORCED"
    ]
    assert len(evs) == 1 and evs[0]["target_bytes"] == KB64
    files = _data_files(ds.table_dir("main", "wide"))
    assert len(files) >= 2 and all(p.endswith(".orc") for p in files)
    assert max(os.path.getsize(p) for p in files) <= KB64 * 1.25
    assert spark.read.orc(ds.table_dir("main", "wide")).count() == 200


def test_compact_refuses_orc_dump(spark, sf_dir, tmp_path):
    """compact() is parquet-wired (codec sniff, footer accounting) and
    must refuse an ORC dump LOUDLY before touching any table — never
    silently transcode a maintenance pass."""
    from oracledb_datapump_spark.exceptions import Unsupported

    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("lineitem"),
            D.DUMP_FORMAT("ORC"), D.FILESIZE("64KB"),
        ],
    ).run(wait=True, connection=ParquetConnector(sf_dir), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    ds = DumpSet(dump)
    n_before = len(_data_files(ds.table_dir("main", "lineitem")))
    assert n_before >= 2
    with pytest.raises(Unsupported, match="parquet dumps only"):
        ds.compact(spark, target_file_bytes=1 << 30)
    # loud refusal means untouched: same files, still ORC
    files = _data_files(ds.table_dir("main", "lineitem"))
    assert len(files) == n_before and all(p.endswith(".orc") for p in files)
