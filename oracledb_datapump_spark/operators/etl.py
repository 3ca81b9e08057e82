"""ETL round-trip exposed as correctness-gated queries.

These run the actual datapump engine (export → Parquet dump set → import
into a DB stand-in → read back) and return the round-tripped table, so the
driver's DuckDB oracle (`SELECT * FROM <table>`) verifies the entire job
lifecycle — the Spark re-expression of the reference's own test oracle
(reference tests/test_import.py:34-61: export TEST1, import TEST2 with
remap, assert fidelity).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..base import JobMode, Operation
from ..catalog import DuckDbConnector, ParquetConnector
from ..directives import DirectiveBase as D
from ..job import Job


def datapump_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export ``nation`` from the parquet 'database', import it into a
    DuckDB stand-in under a remapped schema, read it back."""
    return _roundtrip(spark, sf_dir, "nation").orderBy("n_nationkey")


def datapump_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same round-trip over ``supplier`` (exercises multi-type columns)."""
    return _roundtrip(spark, sf_dir, "supplier").orderBy("s_suppkey")


def _roundtrip(
    spark: SparkSession, sf_dir: str, table: str, dump_format: str = "PARQUET"
) -> DataFrame:
    src = ParquetConnector(sf_dir)
    dump = tempfile.mkdtemp(prefix=f"dp_rt_{table}_")
    try:
        st = Job(
            Operation.EXPORT,
            JobMode.TABLE,
            dumpfiles=dump,
            directives=[
                D.INCLUDE_SCHEMA("main"),
                D.INCLUDE_TABLE(table),
                D.PARALLEL(2),
                D.COMPRESSION("ALL"),
                D.DUMP_FORMAT(dump_format),
            ],
        ).run(wait=True, connection=src, spark=spark)
        if st.job_state != "COMPLETED":
            raise RuntimeError(f"export failed: {st.job_state}: {st.error}")
        target = DuckDbConnector(":memory:")
        st = Job(
            Operation.IMPORT,
            JobMode.TABLE,
            dumpfiles=dump,
            directives=[
                D.REMAP_SCHEMA("main", "imported"),
                D.TABLE_EXISTS_ACTION("REPLACE"),
            ],
        ).run(wait=True, connection=target, spark=spark)
        if st.job_state != "COMPLETED":
            raise RuntimeError(f"import failed: {st.job_state}: {st.error}")
        return target.read_table(spark, "imported", table)
    finally:
        shutil.rmtree(dump, ignore_errors=True)


def datapump_roundtrip_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE lifecycle against a LAZY parquet target: base import of
    ``nation`` into a parquet warehouse, then TABLE_EXISTS_ACTION(MERGE)
    + MERGE_KEY of the n_nationkey<10 slice on top of it. The oracle is
    plain ``nation`` — hash equality proves the merge neither lost
    unmatched rows (the lazy-overwrite regression: the merged plan reads
    the very files the overwrite replaces, engine.py materializes before
    writing) nor duplicated matched ones. Reference precedent:
    TABLE_EXISTS_ACTION, reference src/oracledb_datapump/directives.py:372-376."""
    src = ParquetConnector(sf_dir)
    dump_full = tempfile.mkdtemp(prefix="dp_mrg_full_")
    dump_slice = tempfile.mkdtemp(prefix="dp_mrg_slice_")
    wh = tempfile.mkdtemp(prefix="dp_mrg_wh_")
    try:
        for dump, directives in (
            (dump_full, [D.INCLUDE_SCHEMA("main"), D.INCLUDE_TABLE("nation")]),
            (
                dump_slice,
                [
                    D.INCLUDE_SCHEMA("main"),
                    D.INCLUDE_TABLE("nation"),
                    D.QUERY("n_nationkey < 10", object_path="nation"),
                ],
            ),
        ):
            st = Job(
                Operation.EXPORT,
                JobMode.TABLE,
                dumpfiles=dump,
                directives=directives,
            ).run(wait=True, connection=src, spark=spark)
            if st.job_state != "COMPLETED":
                raise RuntimeError(f"export failed: {st.job_state}: {st.error}")
        target = ParquetConnector(wh)
        st = Job(
            Operation.IMPORT,
            JobMode.TABLE,
            dumpfiles=dump_full,
            directives=[D.REMAP_SCHEMA("main", "tgt")],
        ).run(wait=True, connection=target, spark=spark)
        if st.job_state != "COMPLETED":
            raise RuntimeError(f"base import failed: {st.job_state}: {st.error}")
        st = Job(
            Operation.IMPORT,
            JobMode.TABLE,
            dumpfiles=dump_slice,
            directives=[
                D.REMAP_SCHEMA("main", "tgt"),
                D.TABLE_EXISTS_ACTION("MERGE"),
                D.MERGE_KEY("n_nationkey"),
            ],
        ).run(wait=True, connection=target, spark=spark)
        if st.job_state != "COMPLETED":
            raise RuntimeError(f"merge import failed: {st.job_state}: {st.error}")
        out = target.read_table(spark, "tgt", "nation").orderBy("n_nationkey")
        # the warehouse dir is deleted below — pin the rows first
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(dump_full, ignore_errors=True)
        shutil.rmtree(dump_slice, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)


ROUNDTRIP_NATION_SQL = "SELECT * FROM nation ORDER BY n_nationkey"
ROUNDTRIP_SUPPLIER_SQL = "SELECT * FROM supplier ORDER BY s_suppkey"


def datapump_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip of ``supplier`` through an ORC dump set
    (DUMP_FORMAT extension): export → ORC part files → import into
    DuckDB → read back. Hash equality against the plain supplier table
    proves the alternate physical format preserves every value and type
    end to end under the driver gate, not just in pytest."""
    return _roundtrip(spark, sf_dir, "supplier", dump_format="ORC").orderBy(
        "s_suppkey"
    )


ROUNDTRIP_ORC_SQL = "SELECT * FROM supplier ORDER BY s_suppkey"
ROUNDTRIP_MERGE_SQL = "SELECT * FROM nation ORDER BY n_nationkey"
