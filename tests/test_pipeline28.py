"""Property tests for pipeline28 — independent references formulated
differently from both the operator and its gated oracle."""

import hashlib
from collections import defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline28 import (
    KFOLD_K,
    RRF_K,
    RRF_TOP_K,
    U_FIRST_PPM,
    U_LAST_PPM,
    U_MIDDLE_POOL_PPM,
    attribution_u_shaped,
    dedup_bcubed_eval,
    rrf_fusion_topk,
    stratified_kfold_plan,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "events", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_rrf_python_reference(spark, sf_dir):
    """RRF scores and ranks recomputed in Python from the two ranker
    outputs (which are themselves driver-gated)."""
    from oracledb_datapump_spark.operators.sparse_text import (
        bm25_search_topk,
        tfidf_search_topk,
    )

    scores: dict = defaultdict(int)
    for df in (tfidf_search_topk(spark, sf_dir), bm25_search_topk(spark, sf_dir)):
        for r in df.collect():
            scores[(r.query_doc, r.match_doc)] += 1_000_000 // (RRF_K + r.rank)
    by_q: dict = defaultdict(list)
    for (q, m), s in scores.items():
        by_q[q].append((-s, m))
    expect = {}
    for q, lst in by_q.items():
        for rank, (neg_s, m) in enumerate(sorted(lst)[:RRF_TOP_K], 1):
            expect[(q, m)] = (rank, -neg_s)
    got = {
        (r.query_doc, r.match_doc): (r.rank, r.rrf_score)
        for r in rrf_fusion_topk(spark, sf_dir).collect()
    }
    assert got == expect
    # fusion is non-trivial: at least one query's top-1 differs between
    # the input systems or the fused list interleaves both systems
    assert expect, "empty fusion result — vacuous"


def test_bcubed_python_reference(spark, sf_dir, duck_raw):
    from oracledb_datapump_spark.operators.dedup import dedup_groups

    pred = {
        r.doc_id: r.group_id for r in dedup_groups(spark, sf_dir).collect()
    }
    docs = duck_raw.sql("SELECT doc_id, md5(text) FROM documents").fetchall()
    thash: dict = defaultdict(list)
    for d, h in docs:
        thash[h].append(d)
    truth = {d: min(ds) for ds in thash.values() for d in ds}
    np_: dict = defaultdict(int)
    nt: dict = defaultdict(int)
    npt: dict = defaultdict(int)
    for d in pred:
        np_[pred[d]] += 1
        nt[truth[d]] += 1
        npt[(pred[d], truth[d])] += 1
    n = len(pred)
    p_sum = sum(
        npt[(pred[d], truth[d])] * 1_000_000 // np_[pred[d]] for d in pred
    )
    r_sum = sum(
        npt[(pred[d], truth[d])] * 1_000_000 // nt[truth[d]] for d in pred
    )
    P, R = p_sum // n, r_sum // n
    row = dedup_bcubed_eval(spark, sf_dir).collect()[0]
    assert row.n_docs == n
    assert row.bcubed_precision_ppm == P
    assert row.bcubed_recall_ppm == R
    assert row.bcubed_f1_ppm == 2 * P * R // max(P + R, 1)
    # metric is discriminative on the fixture (not all-1e6, not zero)
    assert 0 < row.bcubed_f1_ppm <= 1_000_000


def test_u_shaped_python_reference(spark, sf_dir, duck_raw):
    rows = duck_raw.sql(
        "SELECT user_id, event_id, event_type, epoch_us(ts) FROM events"
        " ORDER BY user_id, epoch_us(ts), event_id"
    ).fetchall()
    by_user: dict = defaultdict(list)
    for u, eid, et, ts in rows:
        by_user[u].append((ts, eid, et))
    totals: dict = defaultdict(lambda: [0, 0])
    n_credited_journeys = 0
    for u, evs in by_user.items():
        journey: list = []
        for ts, eid, et in evs:
            if et == "purchase":
                n = len(journey)
                if n:
                    n_credited_journeys += 1
                for i, (tet,) in enumerate(journey, 1):
                    if n == 1:
                        c = 1_000_000
                    elif n == 2:
                        c = 500_000
                    elif i == 1:
                        c = U_FIRST_PPM
                    elif i == n:
                        m = U_MIDDLE_POOL_PPM // (n - 2)
                        c = U_LAST_PPM + (U_MIDDLE_POOL_PPM - m * (n - 2))
                    else:
                        c = U_MIDDLE_POOL_PPM // (n - 2)
                    totals[tet][0] += 1
                    totals[tet][1] += c
                journey = []
            else:
                journey.append((et,))
    got = {r.event_type: r for r in attribution_u_shaped(spark, sf_dir).collect()}
    assert set(got) == set(totals)
    for et, (ntouch, credit) in totals.items():
        assert (got[et].n_touches, got[et].credit_total_ppm) == (ntouch, credit)
    # conservation: every credited journey distributes exactly 1e6 ppm
    assert (
        sum(r.credit_total_ppm for r in got.values())
        == 1_000_000 * n_credited_journeys
    )
    assert n_credited_journeys > 0, "fixture has no credited journeys"


def test_kfold_python_reference(spark, sf_dir, duck_raw):
    rows = duck_raw.sql(
        "SELECT o_orderkey, o_orderpriority FROM orders"
    ).fetchall()
    cells: dict = defaultdict(int)
    strata: dict = defaultdict(int)
    for k, p in rows:
        fold = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % KFOLD_K
        cells[(fold, p)] += 1
        strata[p] += 1
    got = {
        (r.fold, r.priority): r
        for r in stratified_kfold_plan(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for (f, p), n in cells.items():
        assert got[(f, p)].n_rows == n
        assert got[(f, p)].share_of_stratum_ppm == n * 1_000_000 // strata[p]
    # folds partition the table
    assert sum(r.n_rows for r in got.values()) == len(rows)
    # every fold is populated (hash-mod balance at fixture sizes)
    assert {f for f, _ in got} == set(range(KFOLD_K))
