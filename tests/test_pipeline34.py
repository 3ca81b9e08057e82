"""Property tests for pipeline34."""

from collections import defaultdict

import pyarrow.parquet as pq

from oracledb_datapump_spark.operators.pipeline34 import (
    FD_CANDIDATES,
    NORM_BANDS,
    fd_discovery_scan,
    source_percentile_bands,
)


def test_fd_discrimination(spark, sf_dir):
    """The planted true keys must hold and the planted near-misses must
    violate — a scan that says yes (or no) to everything cannot pass."""
    rows = {(r.table_name, r.lhs, r.rhs): r for r in fd_discovery_scan(spark, sf_dir).collect()}
    assert len(rows) == len(FD_CANDIDATES)
    assert rows[("nation", "n_nationkey", "n_name")].holds
    assert rows[("orders", "o_orderkey", "o_orderstatus")].holds
    assert rows[("supplier", "s_suppkey", "s_nationkey")].holds
    assert not rows[("nation", "n_regionkey", "n_name")].holds
    assert not rows[("lineitem", "l_orderkey", "l_suppkey")].holds
    for r in rows.values():
        assert r.holds == (r.n_violating_lhs == 0)
        assert 0 <= r.n_violating_lhs <= r.n_lhs_values


def test_fd_python_reference(spark, sf_dir):
    got = {(r.table_name, r.lhs, r.rhs): r for r in fd_discovery_scan(spark, sf_dir).collect()}
    for table, lhs, rhs in FD_CANDIDATES:
        t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[lhs, rhs]).to_pydict()
        m = defaultdict(set)
        for a, b in zip(t[lhs], t[rhs]):
            m[a].add(b)
        r = got[(table, lhs, rhs)]
        assert r.n_lhs_values == len(m)
        assert r.n_violating_lhs == sum(1 for v in m.values() if len(v) > 1)


def test_percentile_bands_structure(spark, sf_dir):
    rows = source_percentile_bands(spark, sf_dir).collect()
    per_source = defaultdict(list)
    for r in rows:
        per_source[r.source].append(r)
    for src, lst in per_source.items():
        lst.sort(key=lambda r: r.band)
        assert [r.band for r in lst] == list(range(1, NORM_BANDS + 1))
        # NTILE: band sizes differ by at most one; ranges non-decreasing
        sizes = [r.n_docs for r in lst]
        assert max(sizes) - min(sizes) <= 1
        for a, b in zip(lst, lst[1:]):
            assert a.max_chars <= b.min_chars or a.max_chars <= b.max_chars
        assert sum(sizes) == sum(r.n_docs for r in lst)
