"""Property tests for pipeline29 — independent references formulated
differently from both the operator and its gated oracle."""

import hashlib
from collections import defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline29 import (
    BLOCK_CHAR_BAND,
    KCORE_K,
    KCORE_ROUNDS,
    TOPK_K,
    blocking_quality_report,
    dedup_minhash_incremental,
    kcore_peel_curve,
    mv_topk_delta,
)


def test_incremental_is_new_old_slice_of_full_verified(spark, sf_dir):
    """Every incremental pair must be a (new, old) pair; and the pair
    set must equal the full verified pair set restricted to new×old
    (LSH candidates are deterministic, so the restriction commutes)."""
    from oracledb_datapump_spark.operators.dedup import dedup_minhash_verified

    inc = {
        (r.new_doc, r.old_doc)
        for r in dedup_minhash_incremental(spark, sf_dir).collect()
    }
    for new, old in inc:
        assert new % 10 == 0 and old % 10 != 0
    full = dedup_minhash_verified(spark, sf_dir).collect()
    want = set()
    for r in full:
        a, b = r.doc_a, r.doc_b
        if a % 10 == 0 and b % 10 != 0:
            want.add((a, b))
        elif b % 10 == 0 and a % 10 != 0:
            want.add((b, a))
    assert inc == want


def test_mv_topk_matches_bruteforce_python(spark, sf_dir):
    """Final top-k recomputed in pure Python from the raw parquet."""
    import pyarrow.parquet as pq
    import math

    t = pq.read_table(f"{sf_dir}/orders.parquet").to_pydict()
    rev: dict = defaultdict(int)
    cnt: dict = defaultdict(int)
    for k, c, p in zip(t["o_orderkey"], t["o_custkey"], t["o_totalprice"]):
        if k % 5 != 4 and k % 7 == 0:
            continue  # base row retracted by the delta
        rev[c] += int(math.floor(p * 100))
        cnt[c] += 1
    expect = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK_K]
    got = mv_topk_delta(spark, sf_dir).collect()
    assert [(r.o_custkey, r.revenue_cents) for r in got] == expect
    assert [r.rnk for r in got] == list(range(1, len(expect) + 1))
    assert all(r.n_orders == cnt[r.o_custkey] for r in got)


def test_kcore_curve_shape_and_fixpoint(spark, sf_dir):
    rows = kcore_peel_curve(spark, sf_dir).collect()
    assert [r.round for r in rows] == list(range(KCORE_ROUNDS + 1))
    ns = [r.n_survivors for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:])), "peeling must be monotone"
    assert ns[-1] == ns[-2], (
        f"not converged within {KCORE_ROUNDS} rounds: {ns} — the fixed-"
        "round contract (and the oracle) require a stable tail"
    )
    assert ns[0] > ns[-1] or ns[0] == ns[-1]  # sanity: counts defined


def test_kcore_members_have_core_degree(spark, sf_dir):
    """Python reference peel on the edge list; final survivor COUNT must
    match the operator's last round."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).to_pydict()
    edges = {(p * 2, s * 2 + 1) for p, s in zip(t["l_partkey"], t["l_suppkey"])}
    adj: dict = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    for _ in range(KCORE_ROUNDS):
        nxt = {
            n
            for n in alive
            if sum(1 for m in adj[n] if m in alive) >= KCORE_K
        }
        if nxt == alive:
            break
        alive = nxt
    last = kcore_peel_curve(spark, sf_dir).collect()[-1]
    assert last.n_survivors == len(alive)


def test_blocking_report_identities(spark, sf_dir):
    r = blocking_quality_report(spark, sf_dir).collect()[0]
    total = r.n_docs * (r.n_docs - 1) // 2
    assert 0 < r.candidate_pairs < total
    assert 0 < r.true_pairs
    assert 0 <= r.covered_true_pairs <= r.true_pairs
    assert r.reduction_ratio_ppm == (total - r.candidate_pairs) * 10**6 // total
    assert (
        r.pairs_completeness_ppm
        == r.covered_true_pairs * 10**6 // r.true_pairs
    )


def test_blocking_coverage_matches_python_recompute(spark, sf_dir):
    """covered_true_pairs recomputed in Python from the verified pair
    list (driver-gated) and the raw parquet block keys."""
    import pyarrow.parquet as pq

    from oracledb_datapump_spark.operators.dedup import verified_pairs_cached

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    ).to_pydict()
    block = {
        d: (s, c // BLOCK_CHAR_BAND)
        for d, s, c in zip(t["doc_id"], t["source"], t["n_chars"])
    }
    pairs = [(r.doc_a, r.doc_b) for r in verified_pairs_cached(spark, sf_dir).collect()]
    covered = sum(1 for a, b in pairs if block[a] == block[b])
    r = blocking_quality_report(spark, sf_dir).collect()[0]
    assert r.true_pairs == len(pairs)
    assert r.covered_true_pairs == covered
