"""Property tests for the pipeline18 operators — independent references
formulated differently from both the operator and its gated oracle."""

import re
from collections import Counter

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline18 as PL18
from oracledb_datapump_spark.operators.pipeline18 import (
    k_anon_generalization_ladder,
    process_conformance_report,
    session_window_builtin,
    vocab_growth_curve,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["customer", "events", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_ladder_monotone_and_counter_reference(spark, sf_dir, duck_raw):
    """Coarsening can only merge groups: min size is non-decreasing and
    group count non-increasing up the ladder; level stats match Python
    Counters built from the raw QI tuples."""
    rows = duck_raw.sql(
        "SELECT c_nationkey, c_mktsegment,"
        " (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 10000"
        " FROM customer"
    ).fetchall()
    levels = {
        0: Counter((n, s, b) for n, s, b in rows),
        1: Counter((n, s) for n, s, _ in rows),
        2: Counter(n for n, _, _ in rows),
        3: Counter("all" for _ in rows),
    }
    got = sorted(
        k_anon_generalization_ladder(spark, sf_dir).collect(),
        key=lambda r: r.level,
    )
    assert [r.level for r in got] == [0, 1, 2, 3]
    for r in got:
        c = levels[r.level]
        assert r.n_groups == len(c)
        assert r.min_group_size == min(c.values())
        assert r.satisfies_k == (min(c.values()) >= PL18.K_ANON_TARGET)
    for a, b in zip(got, got[1:]):
        assert b.min_group_size >= a.min_group_size
        assert b.n_groups <= a.n_groups


def test_session_window_matches_manual_sessionizer(spark, sf_dir):
    """The native operator must agree with events_sessionize's manual
    lag/cumsum islands on per-user session counts and sizes."""
    from oracledb_datapump_spark.operators.analytics import events_sessionize

    manual = events_sessionize(spark, sf_dir).collect()
    by_user: dict = {}
    for r in manual:
        s = by_user.setdefault(r.user_id, [])
        s.append((r.n_events, r.session_end_us - r.session_start_us))
    got = {r.user_id: r for r in session_window_builtin(spark, sf_dir).collect()}
    assert set(got) == set(by_user)
    for u, sessions in by_user.items():
        r = got[u]
        assert r.n_sessions == len(sessions)
        assert r.n_events == sum(n for n, _ in sessions)
        assert r.max_events == max(n for n, _ in sessions)
        assert r.longest_us == max(sp for _, sp in sessions)


def test_conformance_python_replay(spark, sf_dir, duck_raw):
    """Replay the three rules sequentially in Python over the raw log."""
    ev = duck_raw.sql(
        "SELECT user_id, event_id, epoch_us(ts), event_type FROM events"
        " ORDER BY user_id, epoch_us(ts), event_id"
    ).fetchall()
    per_user: dict = {}
    for u, eid, ts, et in ev:
        per_user.setdefault(u, []).append((int(ts), int(eid), et))
    r1c = r1v = r2c = r2v = r3c = r3v = 0
    for u, rows in per_user.items():
        purchases = [t for t, _, e in rows if e == "purchase"]
        signups = [t for t, _, e in rows if e == "signup"]
        if purchases:
            r1c += 1
            if not signups or min(purchases) < min(signups):
                r1v += 1
        # sessionize: gap > 30min
        sessions, cur = [], []
        for t, eid, e in rows:
            if cur and t - cur[-1][0] > 1_800_000_000:
                sessions.append(cur)
                cur = []
            cur.append((t, eid, e))
        sessions.append(cur)
        for s in sessions:
            views = 0
            for i, (t, eid, e) in enumerate(s):
                if e == "view":
                    views += 1
                if e == "click":
                    r2c += 1
                    if views == 0:
                        r2v += 1
                if i + 1 < len(s):
                    r3c += 1
                    if e == "error" and s[i + 1][2] == "purchase":
                        r3v += 1
    got = {r.rule: r for r in process_conformance_report(spark, sf_dir).collect()}
    assert (got["purchase_requires_signup"].n_checked,
            got["purchase_requires_signup"].n_violations) == (r1c, r1v)
    assert (got["click_requires_view"].n_checked,
            got["click_requires_view"].n_violations) == (r2c, r2v)
    assert (got["no_error_then_purchase"].n_checked,
            got["no_error_then_purchase"].n_violations) == (r3c, r3v)
    for r in got.values():
        assert r.violation_ppm == r.n_violations * 1_000_000 // max(
            r.n_checked, 1
        )


def test_vocab_growth_python_reference(spark, sf_dir, duck_raw):
    """Sequential Python scan over docs in id order reproduces the
    doubling-prefix curve; the final vocab_size is the corpus' total
    distinct token count."""
    docs = duck_raw.sql(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    seen: set = set()
    new_at_rank = []
    for _id, text in docs:
        toks = {t for t in re.split(r"[^a-z0-9]+", text.lower()) if t}
        fresh = toks - seen
        seen |= fresh
        new_at_rank.append(len(fresh))
    by_step: Counter = Counter()
    for rk0, n_new in enumerate(new_at_rank):
        by_step[len(bin(rk0 + 1)) - 2] += n_new
    rows = vocab_growth_curve(spark, sf_dir).collect()
    got = {r.step: r.n_new_tokens for r in rows}
    assert got == {s: n for s, n in by_step.items() if n > 0}
    assert rows[-1].vocab_size == len(seen)
    cum = 0
    for r in rows:
        cum += r.n_new_tokens
        assert r.vocab_size == cum
        assert r.docs_cum == min(2 ** r.step - 1, len(docs))
