"""Property tests for pipeline27 — independent references formulated
differently from both the operator and its gated oracle."""

import hashlib
import os
from collections import defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline27 as PL27
from oracledb_datapump_spark.operators.pipeline27 import (
    MV_RETRACT_MOD,
    NEYMAN_BAND,
    NEYMAN_TOTAL_N,
    PURGE_MOD,
    WINNOW_CAP,
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    mv_distinct_delta,
    neyman_allocation_plan,
    purge_impact_report,
    winnowing_fingerprint_pairs,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "customer", "lineitem", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_fps(text: str) -> set:
    t = text.lower()
    grams = [
        _h64(t[p : p + WINNOW_K]) for p in range(len(t) - WINNOW_K + 1)
    ]
    return {
        min(grams[i : i + WINNOW_W]) for i in range(len(grams))
    }


def test_winnowing_python_reference(spark, sf_dir, duck_raw):
    """Pair shared-fingerprint counts recomputed in pure Python (md5 +
    sliding-window min + frequency cap) over the whole fixture."""
    docs = duck_raw.sql("SELECT doc_id, text FROM documents").fetchall()
    fps = {d: _winnow_fps(t) for d, t in docs}
    freq: dict = defaultdict(int)
    for s in fps.values():
        for f in s:
            freq[f] += 1
    kept = {f for f, n in freq.items() if n <= WINNOW_CAP}
    ids = sorted(fps)
    expect = {}
    for i, a in enumerate(ids):
        fa = fps[a] & kept
        for b in ids[i + 1 :]:
            shared = len(fa & fps[b])
            if shared >= WINNOW_MIN_SHARED:
                expect[(a, b)] = shared
    got = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in winnowing_fingerprint_pairs(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "fixture yields no winnowing pairs — test is vacuous"


def test_winnowing_guarantee_on_planted_match(spark, tmp_path):
    """The winnowing guarantee: two docs sharing a substring of length
    >= K+W-1 chars must share at least one fingerprint (Schleimer et
    al. theorem 1), verified on planted documents."""
    common = "the-quick-brown-fox-jumps-over-the-lazy-dog"  # 43 >= K+W-1
    rows = [
        (1, "aaaa" + common + "bbbbbbbbbbbbbbbbbbbb", "en", "s", 1),
        (2, "cccccccccccccccccccc" + common + "dddd", "en", "s", 1),
        (3, "entirely unrelated content with zero overlap at all!!", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fps = {d: _winnow_fps(t) for d, t, *_ in rows}
    assert fps[1] & fps[2], "planted guarantee violated in the reference"
    pairs = (
        winnowing_fingerprint_pairs(spark, str(tmp_path))
        .filter("shared_fps >= 1")
        .collect()
    )
    # operator thresholds at MIN_SHARED; recheck guarantee via reference
    got = {
        (r.doc_a, r.doc_b)
        for r in pairs
    }
    if len(fps[1] & fps[2]) >= WINNOW_MIN_SHARED:
        assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_mv_distinct_delta_python_reference(spark, sf_dir, duck_raw):
    rows = duck_raw.sql(
        "SELECT o_orderkey, o_orderpriority, o_custkey FROM orders"
    ).fetchall()
    ref: dict = defaultdict(lambda: defaultdict(int))
    for k, p, c in rows:
        if k % 2 == 0:
            ref[p][c] += 1
        else:
            ref[p][c] += 1
        if k % 2 == 0 and k % MV_RETRACT_MOD == 0:
            ref[p][c] -= 1
    got = {r.priority: r for r in mv_distinct_delta(spark, sf_dir).collect()}
    for p, counts in ref.items():
        live = {c: n for c, n in counts.items() if n > 0}
        assert got[p].n_distinct_custkeys == len(live)
        assert got[p].n_pair_refs == sum(live.values())
        assert got[p].matches_recompute is True


def test_neyman_python_reference(spark, sf_dir, duck_raw):
    import math

    rows = duck_raw.sql(
        "SELECT o_orderpriority, CAST(floor(o_totalprice / {b}) AS BIGINT)"
        " FROM orders".format(b=NEYMAN_BAND)
    ).fetchall()
    mom: dict = defaultdict(lambda: [0, 0, 0])
    for p, y in rows:
        m = mom[p]
        m[0] += 1
        m[1] += y
        m[2] += y * y
    s_scaled = {
        p: int(math.floor(math.sqrt(float(n * q - s * s))))
        for p, (n, s, q) in mom.items()
    }
    tw = sum(mom[p][0] * s_scaled[p] for p in mom)
    got = {r.priority: r for r in neyman_allocation_plan(spark, sf_dir).collect()}
    assert set(got) == set(mom)
    total_alloc = 0
    for p, (n, s, q) in mom.items():
        assert got[p].n_rows == n
        assert got[p].s_scaled == s_scaled[p]
        assert got[p].alloc_n == NEYMAN_TOTAL_N * n * s_scaled[p] // max(tw, 1)
        total_alloc += got[p].alloc_n
    # truncating division: total allocation is within |strata| of target
    assert NEYMAN_TOTAL_N - len(mom) <= total_alloc <= NEYMAN_TOTAL_N


def test_purge_impact_python_reference(spark, sf_dir, duck_raw):
    custs = [
        k for (k,) in duck_raw.sql("SELECT c_custkey FROM customer").fetchall()
    ]
    purged = {k for k in custs if k % PURGE_MOD == 0}
    orders = duck_raw.sql(
        "SELECT o_orderkey, o_custkey FROM orders"
    ).fetchall()
    o_imp = {ok for ok, ck in orders if ck in purged}
    li = [
        ok
        for (ok,) in duck_raw.sql("SELECT l_orderkey FROM lineitem").fetchall()
    ]
    l_imp = sum(1 for ok in li if ok in o_imp)
    got = {r.table_name: r for r in purge_impact_report(spark, sf_dir).collect()}
    assert got["customer"].n_impacted == len(purged)
    assert got["orders"].n_impacted == len(o_imp)
    assert got["lineitem"].n_impacted == l_imp
    for name, n_all in (
        ("customer", len(custs)),
        ("orders", len(orders)),
        ("lineitem", len(li)),
    ):
        r = got[name]
        assert r.n_rows == n_all
        assert r.impacted_ppm == r.n_impacted * 1_000_000 // max(n_all, 1)
    assert len(purged) > 0, "fixture has no purged customers — vacuous"
