"""CHECKSUM / CHECKSUM_ALGORITHM / VERIFY_CHECKSUM (Oracle DP 21c
public parameters; beyond-reference surface). The full lifecycle is
gated via datapump_roundtrip_checksum; these pin the contract edges."""

import os
import shutil
import tempfile

import pytest

from oracledb_datapump_spark.base import JobMode, Operation
from oracledb_datapump_spark.catalog import ParquetConnector
from oracledb_datapump_spark.directives import DirectiveBase as D
from oracledb_datapump_spark.dumpset import DumpSet
from oracledb_datapump_spark.job import Job


@pytest.fixture()
def dirs():
    stage = tempfile.mkdtemp(prefix="dp_cks_stage_")
    wh = tempfile.mkdtemp(prefix="dp_cks_wh_")
    dump = tempfile.mkdtemp(prefix="dp_cks_dump_")
    yield stage, wh, dump
    for d in (stage, wh, dump):
        shutil.rmtree(d, ignore_errors=True)


def _seed(spark, stage, parts=3):
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    df.repartition(parts).write.parquet(os.path.join(stage, "nation.parquet"))
    return df


def _export(spark, stage, dump, directives):
    return Job(
        Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("nation")]
        + directives,
    ).run(wait=True, connection=ParquetConnector(stage), spark=spark)


def _import(spark, wh, dump, directives):
    return Job(
        Operation.IMPORT, JobMode.TABLE, dumpfiles=dump,
        directives=[D.TABLE_EXISTS_ACTION("REPLACE")] + directives,
    ).run(wait=True, connection=ParquetConnector(wh), spark=spark)


@pytest.mark.parametrize("alg,dlen", [("SHA256", 64), ("SHA512", 128),
                                      ("SHA384", 96), ("CRC32", 8)])
def test_algorithms_record_and_verify(spark, dirs, alg, dlen):
    stage, wh, dump = dirs
    _seed(spark, stage)
    st = _export(spark, stage, dump, [D.CHECKSUM_ALGORITHM(alg)])
    assert st.job_state == "COMPLETED", st.error
    meta = DumpSet(dump).read_manifest().tables["main.nation"]["checksums"]
    assert meta["algorithm"] == alg
    assert len(meta["files"]) == 3
    assert all(len(d) == dlen for d in meta["files"].values())
    st = _import(spark, wh, dump, [D.VERIFY_CHECKSUM(True)])
    assert st.job_state == "COMPLETED", st.error
    ev = [e["event"] for e in DumpSet(dump).read_events()]
    assert "TABLE_CHECKSUM_RECORDED" in ev and "TABLE_CHECKSUM_VERIFIED" in ev


def test_tamper_detected_and_file_named(spark, dirs):
    stage, wh, dump = dirs
    _seed(spark, stage)
    st = _export(spark, stage, dump, [D.CHECKSUM(True)])
    assert st.job_state == "COMPLETED", st.error
    tdir = os.path.join(dump, "main", "nation")
    part = sorted(p for p in os.listdir(tdir) if p.startswith("part-"))[1]
    p = os.path.join(tdir, part)
    b = bytearray(open(p, "rb").read())
    b[len(b) // 2] ^= 0x01  # single-bit flip mid-file
    open(p, "wb").write(bytes(b))
    st = _import(spark, wh, dump, [D.VERIFY_CHECKSUM(True)])
    assert st.job_state != "COMPLETED"
    assert "verification" in str(st.error) and part in str(st.error)
    # without VERIFY_CHECKSUM the (parquet-valid or not) import is the
    # caller's problem — the refusal is opt-in, matching Oracle


def test_verify_without_recorded_checksums_refuses(spark, dirs):
    stage, wh, dump = dirs
    _seed(spark, stage)
    st = _export(spark, stage, dump, [])
    assert st.job_state == "COMPLETED", st.error
    st = _import(spark, wh, dump, [D.VERIFY_CHECKSUM(True)])
    assert st.job_state != "COMPLETED"
    assert "no recorded checksums" in str(st.error)


def test_incremental_append_refreshes_digest_map(spark, dirs):
    stage, wh, dump = dirs
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df.filter("o_orderkey <= 750").repartition(2).write.parquet(
        os.path.join(stage, "orders.parquet")
    )
    dirs_ = [
        D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("orders"),
        D.CHECKSUM(True), D.INCREMENTAL_COLUMN("o_orderkey"),
    ]
    st = Job(Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
             directives=dirs_).run(
        wait=True, connection=ParquetConnector(stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    n1 = len(DumpSet(dump).read_manifest().tables["main.orders"]["checksums"]["files"])
    shutil.rmtree(os.path.join(stage, "orders.parquet"))
    df.repartition(2).write.parquet(os.path.join(stage, "orders.parquet"))
    st = Job(Operation.EXPORT, JobMode.TABLE, dumpfiles=dump,
             directives=dirs_).run(
        wait=True, connection=ParquetConnector(stage), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    n2 = len(DumpSet(dump).read_manifest().tables["main.orders"]["checksums"]["files"])
    assert n2 > n1  # the append's new files entered the integrity map
    st = _import(spark, wh, dump, [D.VERIFY_CHECKSUM(True)])
    assert st.job_state == "COMPLETED", st.error


def test_encryption_checksum_composition(spark, dirs):
    """CHECKSUM over an encrypted dump digests the ciphertext files;
    the verified import decrypts after integrity passes."""
    stage, wh, dump = dirs
    src = _seed(spark, stage)
    st = _export(spark, stage, dump,
                 [D.CHECKSUM(True), D.ENCRYPTION("DATA_ONLY"),
                  D.ENCRYPTION_PASSWORD("pw")])
    assert st.job_state == "COMPLETED", st.error
    meta = DumpSet(dump).read_manifest().tables["main.nation"]
    assert meta["checksums"]["files"] and meta["encryption"]
    st = _import(spark, wh, dump,
                 [D.VERIFY_CHECKSUM(True), D.ENCRYPTION_PASSWORD("pw")])
    assert st.job_state == "COMPLETED", st.error
    out = ParquetConnector(wh).read_table(spark, "main", "nation")
    assert sorted(r.n_name for r in out.collect()) == sorted(
        r.n_name for r in src.collect()
    )


def test_compaction_refreshes_checksums(spark, dirs):
    """compact() replaces every part file — the digest map must follow
    or VERIFY_CHECKSUM refuses a healthy dump (the snapshot-history
    rewrite failure class)."""
    stage, wh, dump = dirs
    _seed(spark, stage, parts=6)
    st = _export(spark, stage, dump, [D.CHECKSUM(True)])
    assert st.job_state == "COMPLETED", st.error
    before = DumpSet(dump).read_manifest().tables["main.nation"]["checksums"]
    report = DumpSet(dump).compact(spark, target_file_bytes=1 << 40)
    assert report["main.nation"]["files_after"] < report["main.nation"]["files_before"]
    after = DumpSet(dump).read_manifest().tables["main.nation"]["checksums"]
    assert after["files"] != before["files"]
    assert after["algorithm"] == before["algorithm"]
    ev = [e["event"] for e in DumpSet(dump).read_events()]
    assert "TABLE_CHECKSUM_REFRESHED" in ev
    st = _import(spark, wh, dump, [D.VERIFY_CHECKSUM(True)])
    assert st.job_state == "COMPLETED", st.error


def test_verify_only_audits_without_loading(spark, dirs):
    """VERIFY_ONLY: digest audit completes, zero rows land, the target
    stays absent; a tampered dump fails the audit; a checksum-less dump
    is refused."""
    stage, wh, dump = dirs
    _seed(spark, stage)
    st = _export(spark, stage, dump, [D.CHECKSUM(True)])
    assert st.job_state == "COMPLETED", st.error
    st = _import(spark, wh, dump, [D.VERIFY_ONLY(True)])
    assert st.job_state == "COMPLETED", st.error
    assert not ParquetConnector(wh).table_exists("main", "nation")
    ev = [e["event"] for e in DumpSet(dump).read_events()]
    assert "TABLE_IMPORT_VERIFY_ONLY" in ev and "TABLE_CHECKSUM_VERIFIED" in ev
    # tamper → the audit itself fails
    tdir = os.path.join(dump, "main", "nation")
    part = sorted(p for p in os.listdir(tdir) if p.startswith("part-"))[0]
    p = os.path.join(tdir, part)
    b = bytearray(open(p, "rb").read())
    b[-5] ^= 0xFF
    open(p, "wb").write(bytes(b))
    st = _import(spark, wh, dump, [D.VERIFY_ONLY(True)])
    assert st.job_state != "COMPLETED"
    assert "verification" in str(st.error)


def test_verify_only_requires_recorded_checksums(spark, dirs):
    stage, wh, dump = dirs
    _seed(spark, stage)
    st = _export(spark, stage, dump, [])
    assert st.job_state == "COMPLETED", st.error
    st = _import(spark, wh, dump, [D.VERIFY_ONLY(True)])
    assert st.job_state != "COMPLETED"
    assert "no recorded checksums" in str(st.error)
