"""Replicates the driver's t2 correctness gate locally at BOTH fixture
scales: every queries() entry with an oracle must row/schema/value-match
DuckDB at sf0.001 (the suite default, exercising small-data edge cases:
empty LSH buckets, single-row aggregates) AND sf0.01 (the driver's
actual gating scale)."""

import os

import pytest

from oracledb_datapump_spark.oracle_check import check_all

# same override conftest.SF_DIR honors (tests/ is not a package, so the
# constant is re-derived here rather than imported)
_SCALES = list(
    dict.fromkeys(
        [
            os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
            "/root/testdata/sf0.01",
        ]
    )
)


@pytest.mark.parametrize("scale_dir", _SCALES)
def test_all_queries_match_oracle(spark, scale_dir):
    results = check_all(spark, scale_dir)
    failures = [
        r
        for r in results
        if r.get("values_match") is False or "error" in r
    ]
    assert not failures, failures
    # rows-only ops must at least run and return rows
    rows_only = [r for r in results if r.get("values_match") is None]
    for r in rows_only:
        assert r["rows_spark"] >= 0, r
