"""Property tests for the pipeline17 operators — independent references
formulated differently from both the operator and its gated oracle."""

from collections import Counter

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline17 as PL17
from oracledb_datapump_spark.operators.pipeline17 import (
    DAY_US,
    hist_est_error_report,
    join_skew_report,
    trimmed_price_stats,
    user_state_transitions,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "lineitem", "part", "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_join_skew_counter_reference(spark, sf_dir, duck_raw):
    """Python Counter over the raw key columns reproduces every stat."""
    got = {r.join_key: r for r in join_skew_report(spark, sf_dir).collect()}
    for name, sql in [
        ("events.user_id", "SELECT user_id FROM events"),
        ("lineitem.l_suppkey", "SELECT l_suppkey FROM lineitem"),
    ]:
        c = Counter(k for (k,) in duck_raw.sql(sql).fetchall())
        r = got[name]
        total, mx = sum(c.values()), max(c.values())
        assert r.n_keys == len(c)
        assert r.total_rows == total
        assert r.max_key_rows == mx
        assert r.skew_x1000 == mx * 1000 * len(c) // total
        assert r.selfjoin_rows == sum(v * v for v in c.values())
        assert r.salt_factor == max(
            (mx * PL17.SKEW_TARGET_PARTITIONS + total - 1) // total, 1
        )


def test_hist_est_reference_and_exactness(spark, sf_dir, duck_raw):
    """Exact counts match a direct pass; the histogram estimate is
    recomputed independently in Python and the boundary-bucket estimate
    never misses by more than one bucket's population."""
    prices = sorted(
        int(round(p * 100))
        for (p,) in duck_raw.sql("SELECT o_totalprice FROM orders").fetchall()
    )
    lo, hi = prices[0], prices[-1]
    width = (hi - lo) // PL17.HIST_N_BUCKETS + 1
    buckets = Counter((p - lo) // width for p in prices)
    for r in hist_est_error_report(spark, sf_dir).collect():
        t = lo + (hi - lo) * r.k // 8
        assert r.threshold_cents == t
        exact = sum(1 for p in prices if p >= t)
        assert r.exact_rows == exact
        tb = (t - lo) // width
        est = sum(c for b, c in buckets.items() if b > tb) + buckets.get(
            tb, 0
        ) * (lo + (tb + 1) * width - t) // width
        assert r.est_rows == est
        assert abs(est - exact) <= buckets.get(tb, 0)
        assert r.abs_err_ppm == abs(est - exact) * 1_000_000 // max(exact, 1)


def test_trimmed_mean_python_reference(spark, sf_dir, duck_raw):
    """Sorted-list slicing in Python reproduces the per-brand trim."""
    rows = duck_raw.sql(
        "SELECT p.p_brand, CAST(round(l.l_extendedprice * 100) AS BIGINT)"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    by_brand: dict = {}
    for b, pc in rows:
        by_brand.setdefault(b, []).append(int(pc))
    got = {r.brand: r for r in trimmed_price_stats(spark, sf_dir).collect()}
    assert set(got) == set(by_brand)
    for b, pcs in by_brand.items():
        pcs.sort()
        n = len(pcs)
        k = n // PL17.TRIM_PCT
        trimmed = pcs[k : n - k]
        r = got[b]
        assert r.n_items == n
        assert r.n_trimmed == len(trimmed)
        assert r.trimmed_sum_cents == sum(trimmed)
        assert r.mean_milli_cents == sum(pcs) * 10 // n
        assert r.trimmed_mean_milli_cents == sum(trimmed) * 10 // len(trimmed)


def test_state_transitions_identity_and_reference(spark, sf_dir, duck_raw):
    """Growth accounting identity: active_w = new + retained +
    resurrected for every reported week; each state matches a Python
    set-based replay."""
    rows = duck_raw.sql(
        f"SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} // 7 FROM events"
    ).fetchall()
    weeks: dict = {}
    for u, w in rows:
        weeks.setdefault(int(w), set()).add(u)
    first = {}
    for w in sorted(weeks):
        for u in weeks[w]:
            first.setdefault(u, w)
    got = {r.week: r for r in user_state_transitions(spark, sf_dir).collect()}
    ws = sorted(weeks)
    assert set(got) == set(ws[1:])
    for w in ws[1:]:
        cur, prev = weeks[w], weeks.get(w - 1, set())
        new = {u for u in cur if first[u] == w}
        retained = cur & prev
        resurrected = cur - prev - new
        churned = prev - cur
        r = got[w]
        assert (r.n_new, r.n_retained, r.n_resurrected, r.n_churned) == (
            len(new), len(retained), len(resurrected), len(churned)
        )
        assert len(cur) == r.n_new + r.n_retained + r.n_resurrected
