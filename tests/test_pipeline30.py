"""Property tests for pipeline30 — independent references formulated
differently from both the operator and its gated oracle."""

from collections import defaultdict

import pyarrow.parquet as pq

from oracledb_datapump_spark.operators.pipeline30 import (
    CF_MIN_CO,
    CF_TOP_K,
    golden_record_fusion,
    item_cf_topk,
    scd2_build_intervals,
)


def test_scd2_intervals_python_reference(spark, sf_dir):
    """Intervals rebuilt in pure Python from the raw event log."""
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    per_user = defaultdict(list)
    for u, ts, et, eid in zip(
        t["user_id"], t["ts"], t["event_type"], t["event_id"]
    ):
        us = int(ts.timestamp() * 1_000_000) if hasattr(ts, "timestamp") else ts
        per_user[u].append((us, eid, et))
    expect = []
    for u, rows in per_user.items():
        rows.sort()
        runs = [
            (us, et)
            for i, (us, eid, et) in enumerate(rows)
            if i == 0 or et != rows[i - 1][2]
        ]
        for i, (us, et) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            expect.append((u, et, us, nxt, nxt is None))
    got = [
        (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in scd2_build_intervals(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_scd2_intervals_tile_and_nest(spark, sf_dir):
    """Structural invariants: per user, intervals tile [first, last]
    without gaps or overlaps, and exactly one is current."""
    rows = scd2_build_intervals(spark, sf_dir).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    for u, ivs in per_user.items():
        ivs.sort(key=lambda r: r.valid_from_us)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].valid_to_us is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to_us == b.valid_from_us, (u, a, b)
            assert a.event_type != b.event_type, "no-change row leaked"


def test_golden_record_python_reference(spark, sf_dir):
    from oracledb_datapump_spark.operators.dedup import dedup_groups

    groups = defaultdict(list)
    for r in dedup_groups(spark, sf_dir).collect():
        if r.group_size > 1:
            groups[r.group_id].append(r.doc_id)
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    ).to_pydict()
    attr = {
        d: (s, c) for d, s, c in zip(t["doc_id"], t["source"], t["n_chars"])
    }
    got = {r.group_id: r for r in golden_record_fusion(spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for gid, members in groups.items():
        r = got[gid]
        assert r.n_members == len(members)
        assert r.n_sources == len({attr[m][0] for m in members})
        assert r.total_chars == sum(attr[m][1] for m in members)
        best = sorted(members, key=lambda m: (-attr[m][1], m))[0]
        assert r.exemplar_doc == best


def test_item_cf_symmetric_scores_and_k(spark, sf_dir):
    rows = item_cf_topk(spark, sf_dir).collect()
    per_item = defaultdict(list)
    score = {}
    for r in rows:
        per_item[r.item].append(r)
        score[(r.item, r.neighbor)] = r.score_ppm
        assert r.co_cnt >= CF_MIN_CO
        assert 0 < r.score_ppm <= 1_000_000
    for item, lst in per_item.items():
        lst.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= CF_TOP_K
        keys = [(-r.score_ppm, -r.co_cnt, r.neighbor) for r in lst]
        assert keys == sorted(keys), "rank order broken"
    # cosine is symmetric: wherever BOTH directions rank, scores agree
    for (i, j), s in score.items():
        if (j, i) in score:
            assert score[(j, i)] == s


def test_item_cf_one_pair_bruteforce(spark, sf_dir):
    """Recompute one ranked pair's score from raw parquet."""
    import math

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    baskets = defaultdict(set)
    for o, p in zip(t["l_orderkey"], t["l_partkey"]):
        baskets[o].add(p)
    cnt = defaultdict(int)
    co = defaultdict(int)
    for items in baskets.values():
        for p in items:
            cnt[p] += 1
        items = sorted(items)
        for i in range(len(items)):
            for j in range(len(items)):
                if i != j:
                    co[(items[i], items[j])] += 1
    r = item_cf_topk(spark, sf_dir).collect()[0]
    c = co[(r.item, r.neighbor)]
    assert r.co_cnt == c
    assert r.score_ppm == c * 1_000_000 // int(
        math.floor(math.sqrt(cnt[r.item] * cnt[r.neighbor]))
    )
