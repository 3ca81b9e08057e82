import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from oracledb_datapump_spark.session import get_spark

    # r17: local[4] -> local[8] (the host has 32 cores; the suite was
    # wall-bounded by the shared session's width now that the two
    # full-surface sweeps overlap comparisons from thread pools).
    # shuffle_partitions stays 4 — file-count expectations in the
    # lifecycle tests key off it.
    s = get_spark(app_name="datapump-tests", master="local[8]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def duck(tmp_path):
    """A DuckDB connector preloaded with the sf0.001 star schema under
    schema 'test1' — the analog of the reference's HR-in-TEST1 fixture
    (reference tests/conftest.py:20-25)."""
    from oracledb_datapump_spark.catalog import DuckDbConnector

    con = DuckDbConnector(str(tmp_path / "source.duckdb"))
    con.load_parquet_dir("test1", SF_DIR)
    return con
