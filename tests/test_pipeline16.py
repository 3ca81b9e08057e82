"""Property tests for the pipeline16 operators — independent references
formulated differently from both the operator and its gated oracle."""

import re
from collections import Counter

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline16 as PL16
from oracledb_datapump_spark.operators.pipeline16 import (
    DAY_US,
    card_est_error_report,
    fifo_lot_attribution,
    interval_coverage_report,
    source_unigram_l1_matrix,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "lineitem", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _intervals(duck_raw):
    return duck_raw.sql(
        f"""
        SELECT n.n_name,
               LEAST(epoch_us(o.o_orderdate) // {DAY_US}, ls.d) AS lo,
               GREATEST(epoch_us(o.o_orderdate) // {DAY_US}, ls.d) AS hi
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN (SELECT l_orderkey, MAX(epoch_us(l_shipdate) // {DAY_US}) AS d
              FROM lineitem GROUP BY l_orderkey) ls
          ON ls.l_orderkey = o.o_orderkey
        """
    ).fetchall()


def test_interval_coverage_python_sweep(spark, sf_dir, duck_raw):
    """Brute-force per-day reference: materialize every open day of
    every interval in Python sets/Counters and compare all four stats —
    the formulation the sweep-line exists to avoid."""
    by_nation: dict = {}
    for nation, lo, hi in _intervals(duck_raw):
        days, conc, _ = by_nation.setdefault(nation, (set(), Counter(), []))
        by_nation[nation][2].append(hi - lo + 1)
        for d in range(int(lo), int(hi) + 1):
            days.add(d)
            conc[d] += 1
    got = {r.nation: r for r in interval_coverage_report(spark, sf_dir).collect()}
    assert set(got) == set(by_nation)
    for nation, (days, conc, lengths) in by_nation.items():
        r = got[nation]
        assert r.n_orders == len(lengths)
        assert r.covered_days == len(days)
        assert r.max_concurrent == max(conc.values())
        assert r.total_order_days == sum(lengths)


def _lots(duck_raw, day_expr):
    return duck_raw.sql(
        f"""
        SELECT n.n_name, {day_expr} AS d, SUM(CAST(l.l_quantity AS BIGINT))
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()


def test_fifo_two_pointer_reference(spark, sf_dir, duck_raw):
    """The interval-intersection transport plan must equal the naive
    sequential two-pointer FIFO merge run in Python over the lots."""
    ins: dict = {}
    outs: dict = {}
    for n, d, q in _lots(duck_raw, f"epoch_us(o.o_orderdate) // {DAY_US}"):
        ins.setdefault(n, []).append([int(d), int(q)])
    for n, d, q in _lots(duck_raw, f"epoch_us(l.l_shipdate) // {DAY_US}"):
        outs.setdefault(n, []).append([int(d), int(q)])
    expect = {}
    for n in ins:
        a, b = [r[:] for r in ins[n]], [r[:] for r in outs[n]]
        i = j = pairs = units = lag = 0
        while i < len(a) and j < len(b):
            m = min(a[i][1], b[j][1])
            pairs += 1
            units += m
            lag += m * (b[j][0] - a[i][0])
            a[i][1] -= m
            b[j][1] -= m
            if a[i][1] == 0:
                i += 1
            if b[j][1] == 0:
                j += 1
        expect[n] = (len(ins[n]), len(outs[n]), pairs, units, lag)
    got = {
        r.nation: (r.n_in_lots, r.n_out_lots, r.n_pairs, r.total_units,
                   r.lag_unit_days)
        for r in fifo_lot_attribution(spark, sf_dir).collect()
    }
    assert got == expect


def test_fifo_block_size_invariance(spark, sf_dir, monkeypatch):
    """The coordinate block width is an execution knob, not a semantic
    one: a very different FIFO_BLK must produce identical output."""
    base = {tuple(r) for r in fifo_lot_attribution(spark, sf_dir).collect()}
    monkeypatch.setattr(PL16, "FIFO_BLK", 257)
    alt = {tuple(r) for r in fifo_lot_attribution(spark, sf_dir).collect()}
    assert base == alt


def test_l1_matrix_python_counter_reference(spark, sf_dir, duck_raw):
    """Independent tokenizer (Python re.split) + Counter arithmetic must
    reproduce the matrix row-for-row, and L1 stays in [0, 2e6]."""
    docs = duck_raw.sql("SELECT source, text FROM documents").fetchall()
    per_src: dict = {}
    glob: Counter = Counter()
    for src, text in docs:
        c = per_src.setdefault(src, Counter())
        for tok in re.split(r"[^a-z0-9]+", text.lower()):
            if tok:
                c[tok] += 1
                glob[tok] += 1
    topv = [t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[
        : PL16.L1_TOP_V]]
    shares = {}
    for src, c in per_src.items():
        tot = max(sum(c[t] for t in topv), 1)
        shares[src] = {t: c[t] * 1_000_000 // tot for t in topv}
    rows = source_unigram_l1_matrix(spark, sf_dir).collect()
    assert len(rows) == len(per_src) * (len(per_src) - 1) // 2
    for r in rows:
        sa, sb = shares[r.source_a], shares[r.source_b]
        l1 = sum(abs(sa[t] - sb[t]) for t in topv)
        ov = sum(
            1
            for t in topv
            if per_src[r.source_a][t] > 0 and per_src[r.source_b][t] > 0
        )
        assert (r.l1_ppm, r.overlap_tokens) == (l1, ov)
        assert 0 <= r.l1_ppm <= 2_000_000


def test_card_est_arithmetic(spark, sf_dir, duck_raw):
    """est_rows is always a multiple of the sampling rate and the exact
    counts match a direct Python pass over the four predicate columns."""
    rows = {r.predicate: r for r in card_est_error_report(spark, sf_dir).collect()}
    raw = duck_raw.sql(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,"
        " o_totalprice FROM orders"
    ).fetchall()
    preds = {
        "bulk_order": lambda k, ck, st, pr, tp: tp >= 250000.0,
        "cust_mod10": lambda k, ck, st, pr, tp: ck % 10 == 0,
        "hi_priority": lambda k, ck, st, pr, tp: pr[0] in "12",
        "status_f": lambda k, ck, st, pr, tp: st == "F",
    }
    assert set(rows) == set(preds)
    for name, f in preds.items():
        exact = sum(1 for t in raw if f(*t))
        est = PL16.CARD_SAMPLE_MOD * sum(
            1 for t in raw if f(*t) and t[0] % PL16.CARD_SAMPLE_MOD == 0
        )
        r = rows[name]
        assert (r.exact_rows, r.est_rows) == (exact, est)
        assert r.est_rows % PL16.CARD_SAMPLE_MOD == 0
        assert r.abs_err_ppm == abs(est - exact) * 1_000_000 // max(exact, 1)
