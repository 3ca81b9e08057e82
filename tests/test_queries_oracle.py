"""Replicates the driver's t2 correctness gate locally at sf0.001:
every queries() entry with an oracle must row/schema/value-match DuckDB."""

from oracledb_datapump_spark.oracle_check import check_all


def test_all_queries_match_oracle(spark, sf_dir):
    results = check_all(spark, sf_dir)
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
