"""Property tests for the pipeline24 operators — independent references
formulated differently from both the operator and its gated oracle."""

import math
from collections import defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline24 as PL24
from oracledb_datapump_spark.operators.pipeline24 import (
    DAY_US,
    heavyhitter_turnover,
    otif_by_month,
    qty_price_correlation_by_brand,
    slo_burn_report,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "lineitem", "part"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def lines(duck_raw):
    return duck_raw.sql(
        f"""SELECT o.o_orderkey,
               year(o.o_orderdate) * 100 + month(o.o_orderdate),
               CASE WHEN epoch_us(l.l_shipdate) // {DAY_US}
                         - epoch_us(o.o_orderdate) // {DAY_US}
                         > {PL24.SLA_DAYS} THEN 1 ELSE 0 END
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()


def test_slo_burn_python_replay(spark, sf_dir, lines):
    """Sequential budget replay matches, and the balance telescopes:
    balance[m] - balance[m-1] == allowed[m] - late[m]."""
    monthly: dict = defaultdict(lambda: [0, 0])
    for _k, ym, late in lines:
        monthly[ym][0] += 1
        monthly[ym][1] += late
    got = sorted(slo_burn_report(spark, sf_dir).collect(), key=lambda r: r.ym)
    assert [r.ym for r in got] == sorted(monthly)
    bal = 0
    for r in got:
        n, late = monthly[r.ym]
        assert (r.n_lines, r.n_late) == (n, late)
        assert r.burn_ppm == late * 1_000_000 // n
        bal += n * PL24.SLO_ALLOW_PPM // 1_000_000 - late
        assert r.budget_balance == bal


def test_otif_python_replay_and_all_semantics(spark, sf_dir, lines):
    """Per-order ALL replay matches; an order with ANY late line never
    counts (universal quantification, checked per order below), and an
    order counted OTIF has zero late lines."""
    orders: dict = {}
    for k, ym, late in lines:
        n, any_late, _ = orders.get(k, (0, 0, ym))
        orders[k] = (n + 1, max(any_late, late), ym)
    per_month: dict = defaultdict(lambda: [0, 0])
    for n, any_late, ym in orders.values():
        per_month[ym][0] += 1
        per_month[ym][1] += 1 - any_late
    got = {r.ym: r for r in otif_by_month(spark, sf_dir).collect()}
    assert set(got) == set(per_month)
    for ym, (n_ord, n_otif) in per_month.items():
        r = got[ym]
        assert (r.n_orders, r.n_otif) == (n_ord, n_otif)
        assert r.otif_ppm == n_otif * 1_000_000 // n_ord


def test_turnover_python_reference(spark, sf_dir, duck_raw):
    """Sorted-list leaderboards replayed in Python match; identities:
    stayed + exited == K == stayed + entered."""
    rows = duck_raw.sql(
        f"""SELECT l_partkey, epoch_us(l_shipdate) // {DAY_US},
               CAST(round(l_extendedprice * 100) AS BIGINT)
        FROM lineitem"""
    ).fetchall()
    lo = min(int(d) for _p, d, _r in rows)
    hi = max(int(d) for _p, d, _r in rows)
    mid = (lo + hi + 1) // 2
    rev: dict = defaultdict(lambda: [0, 0])
    for p, d, rc in rows:
        rev[p][0 if d < mid else 1] += int(rc)

    def board(idx):
        ranked = sorted(
            ((r[idx], p) for p, r in rev.items() if r[idx] > 0),
            key=lambda t: (-t[0], t[1]),
        )[: PL24.TURNOVER_K]
        return {p: i + 1 for i, (_v, p) in enumerate(ranked)}

    a, b = board(0), board(1)
    stayed = set(a) & set(b)
    r = heavyhitter_turnover(spark, sf_dir).collect()[0]
    assert r.n_stayed == len(stayed)
    assert r.n_entered == len(set(b) - set(a))
    assert r.n_exited == len(set(a) - set(b))
    assert r.rank_displacement == sum(abs(a[p] - b[p]) for p in stayed)
    assert r.n_stayed + r.n_exited == PL24.TURNOVER_K
    assert r.n_stayed + r.n_entered == PL24.TURNOVER_K
    assert r.stay_ppm == len(stayed) * 1_000_000 // PL24.TURNOVER_K


def test_qty_price_corr_python_reference(spark, sf_dir, duck_raw):
    """Exact-fraction Pearson per brand matches; r bounded."""
    rows = duck_raw.sql(
        "SELECT p.p_brand, CAST(l.l_quantity AS BIGINT),"
        " CAST(round(l.l_extendedprice * 100) AS BIGINT)"
        " // CAST(l.l_quantity AS BIGINT)"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    per: dict = defaultdict(list)
    for b, q, up in rows:
        per[b].append((int(q), int(up)))
    got = {r.brand: r for r in qty_price_correlation_by_brand(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for b, pairs in per.items():
        n = len(pairs)
        sx = sum(q for q, _ in pairs)
        sy = sum(u for _, u in pairs)
        sxy = sum(q * u for q, u in pairs)
        sxx = sum(q * q for q, _ in pairs)
        syy = sum(u * u for _, u in pairs)
        num = n * sxy - sx * sy
        den = math.isqrt(n * sxx - sx * sx) * math.isqrt(n * syy - sy * sy)
        sign = -1 if num < 0 else 1
        r = got[b]
        assert r.n_lines == n
        assert r.r_ppm == sign * (abs(num) * 1_000_000 // max(den, 1))
        assert -1_000_000 <= r.r_ppm <= 1_000_000
