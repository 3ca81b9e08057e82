"""Property tests for the pipeline21 operators — independent references
formulated differently from both the operator and its gated oracle."""

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline21 as PL21
from oracledb_datapump_spark.operators.pipeline21 import (
    DAY_US,
    event_type_venn,
    fk_candidate_scan,
    median_stability_check,
    orders_autocorrelation,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "lineitem", "customer", "nation", "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_autocorrelation_python_reference(spark, sf_dir, duck_raw):
    """Dense Python series + exact-fraction Pearson reproduces r_ppm;
    the dense axis length equals the calendar span."""
    rows = duck_raw.sql(
        f"SELECT epoch_us(o_orderdate) // {DAY_US}, COUNT(*)"
        " FROM orders GROUP BY 1"
    ).fetchall()
    counts = {int(d): int(c) for d, c in rows}
    lo, hi = min(counts), max(counts)
    xs = [counts.get(d, 0) for d in range(lo, hi + 1)]
    got = {r.lag_days: r for r in orders_autocorrelation(spark, sf_dir).collect()}
    assert set(got) == set(PL21.AC_LAGS)
    for k in PL21.AC_LAGS:
        pairs = [(xs[i], xs[i - k]) for i in range(k, len(xs))]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        num = n * sxy - sx * sy
        den = math.isqrt(n * sxx - sx * sx) * math.isqrt(n * syy - sy * sy)
        sign = -1 if num < 0 else 1
        r = got[k]
        assert r.n_pairs == n == len(xs) - k
        assert r.r_ppm == sign * (abs(num) * 1_000_000 // max(den, 1))
        assert -1_000_000 <= r.r_ppm <= 1_000_000


def test_fk_scan_set_reference(spark, sf_dir, duck_raw):
    """Python set containment reproduces every arm; the three real FKs
    flag true and the planted near-miss does not claim full
    containment unless the data genuinely contains it."""
    got = {r.candidate: r for r in fk_candidate_scan(spark, sf_dir).collect()}
    specs = {
        "lineitem.l_orderkey -> orders.o_orderkey":
            ("SELECT DISTINCT l_orderkey FROM lineitem",
             "SELECT DISTINCT o_orderkey FROM orders", True),
        "orders.o_custkey -> customer.c_custkey":
            ("SELECT DISTINCT o_custkey FROM orders",
             "SELECT DISTINCT c_custkey FROM customer", True),
        "customer.c_nationkey -> nation.n_nationkey":
            ("SELECT DISTINCT c_nationkey FROM customer",
             "SELECT DISTINCT n_nationkey FROM nation", True),
        "events.user_id -> customer.c_custkey":
            ("SELECT DISTINCT user_id FROM events",
             "SELECT DISTINCT c_custkey FROM customer", None),
    }
    assert set(got) == set(specs)
    for cand, (csql, psql, expect_fk) in specs.items():
        child = {k for (k,) in duck_raw.sql(csql).fetchall()}
        parent = {k for (k,) in duck_raw.sql(psql).fetchall()}
        contained = len(child & parent)
        r = got[cand]
        assert r.n_child_keys == len(child)
        assert r.n_contained == contained
        assert r.containment_ppm == contained * 1_000_000 // len(child)
        assert r.is_fk == (contained == len(child))
        if expect_fk is not None:
            assert r.is_fk is expect_fk


def test_median_stability_python_reference(spark, sf_dir, duck_raw):
    """Sorted-list lower medians of the full/odd/even arms match."""
    rows = duck_raw.sql(
        "SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    arms = {
        "full": [int(p) for _, p in rows],
        "odd": [int(p) for k, p in rows if k % 2 == 1],
        "even": [int(p) for k, p in rows if k % 2 == 0],
    }
    got = {r.arm: r for r in median_stability_check(spark, sf_dir).collect()}
    assert set(got) == set(arms)
    for arm, vals in arms.items():
        vals.sort()
        r = got[arm]
        assert r.n_rows == len(vals)
        assert r.median_cents == vals[(len(vals) + 1) // 2 - 1]


def test_venn_partition_and_reference(spark, sf_dir, duck_raw):
    """Cells partition the user population exactly once; counts match a
    Python set replay and shares sum to ~1e6 (floor loss < cells)."""
    rows = duck_raw.sql("SELECT user_id, event_type FROM events").fetchall()
    per: dict = defaultdict(set)
    for u, t in rows:
        per[u].add(t)
    masks = Counter(
        (1 if "click" in s else 0)
        + (2 if "purchase" in s else 0)
        + (4 if "signup" in s else 0)
        for s in per.values()
    )
    out = event_type_venn(spark, sf_dir).collect()
    assert {r.mask: r.n_users for r in out} == dict(masks)
    assert sum(r.n_users for r in out) == len(per)
    s = sum(r.share_ppm for r in out)
    assert 1_000_000 - len(out) <= s <= 1_000_000
    for r in out:
        parts = [] if r.mask == 0 else r.subset.split("+")
        assert ("click" in parts) == bool(r.mask & 1)
        assert ("purchase" in parts) == bool(r.mask & 2)
        assert ("signup" in parts) == bool(r.mask & 4)
