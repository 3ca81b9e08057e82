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


# r17 (verdict item 3 — the suite must fit the driver's time budget):
# the two full-surface sweeps dominated the whole pytest run (683 s +
# 712 s of a 2948 s suite); overlap independent comparisons from a
# small thread pool (guide §2.6). Measured on the sf0.001 sweep with
# identical coverage: 4 workers 279 s, 6 → 214 s, 8 → 166 s (4.1×),
# 12 → 192 s (oversubscribed). Set SPARK_GRAFT_ORACLE_WORKERS=1 to
# restore the sequential sweep (also re-enables the per-query timing
# canary, which is meaningless under deliberate co-running).
_WORKERS = int(os.environ.get("SPARK_GRAFT_ORACLE_WORKERS", "8"))


@pytest.mark.parametrize("scale_dir", _SCALES)
def test_all_queries_match_oracle(spark, scale_dir):
    results = check_all(spark, scale_dir, workers=_WORKERS)
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
    if _WORKERS <= 1:
        _timing_guard(results, scale_dir)


def _timing_guard(results, scale_dir):
    """Soft contamination canary (round-7 verdict ask): compare each
    query's wall time against the committed trailing capture
    (ORACLE_TIMINGS.json, sf0.01 only). >3x trailing = a warning naming
    the drag, so environment contamination shows up in the test log
    instead of surfacing rounds later as a phantom bench regression.
    Warnings not failures by default — pytest itself co-runs queries and
    honest contention would otherwise flake the correctness gate; set
    SPARK_GRAFT_STRICT_TIMING=1 to enforce. Fresh timings are dumped to
    /tmp/oracle_timings.json; commit via tools/record_oracle_timings.py.

    ORDER SENSITIVITY (round-9 root cause of the r8 canary hits): several
    query families share memoized driver model state (k-means centroids,
    PQ codebooks, the verified-pair cache) keyed per (applicationId,
    sf_dir) — the FIRST consumer in queries() order pays the build cost.
    Rebuilding GATED_PREFIX reorders queries(), shifts which consumer
    pays, and makes old per-query timings incomparable. After any prefix
    rotation, re-record ORACLE_TIMINGS.json from a quiet full-suite run
    before trusting the canary."""
    import json
    import warnings

    timings = {r["name"]: r.get("secs") for r in results if "secs" in r}
    if not scale_dir.endswith("sf0.01"):
        return
    with open("/tmp/oracle_timings.json", "w") as f:
        json.dump(timings, f, indent=1, sort_keys=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    committed = os.path.join(repo, "ORACLE_TIMINGS.json")
    if not os.path.exists(committed):
        return
    trailing = json.load(open(committed))
    slow = {
        q: (t, trailing[q])
        for q, t in timings.items()
        if q in trailing and trailing[q] >= 0.2 and t > 3 * trailing[q]
    }
    if slow:
        msg = f"oracle-suite timing drag (>3x trailing committed): {slow}"
        if os.environ.get("SPARK_GRAFT_STRICT_TIMING"):
            raise AssertionError(msg)
        warnings.warn(msg)
