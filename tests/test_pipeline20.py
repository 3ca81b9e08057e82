"""Property tests for the pipeline20 operators — independent references
formulated differently from both the operator and its gated oracle."""

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline20 as PL20
from oracledb_datapump_spark.operators.pipeline20 import (
    DAY_US,
    WEEK_US,
    cohort_ltv_curve,
    daily_volume_mad_outliers,
    weighted_lag_median_by_priority,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "lineitem", "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_mad_python_reference_and_robustness(spark, sf_dir, duck_raw):
    """Sorted-list medians reproduce every stat, and the median/MAD
    threshold is provably unmoved by inflating the single largest day
    (the robustness property a mean/sigma detector lacks)."""
    rows = duck_raw.sql(
        f"SELECT event_type, epoch_us(ts) // {DAY_US}, COUNT(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    per: dict = defaultdict(list)
    for et, _d, c in rows:
        per[et].append(int(c))
    got = {r.event_type: r for r in daily_volume_mad_outliers(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for et, cnts in per.items():
        med = _lower_median(cnts)
        mad = _lower_median([abs(c - med) for c in cnts])
        out = sum(1 for c in cnts if abs(c - med) > PL20.MAD_K * mad)
        r = got[et]
        assert (r.n_days, r.median_cnt, r.mad, r.n_outlier_days) == (
            len(cnts), med, mad, out
        )
        # robustness: blow up the max day 100x — median and MAD of the
        # perturbed series stay within one rank step (n large enough)
        if len(cnts) >= 5:
            boosted = sorted(cnts)
            boosted[-1] *= 100
            assert _lower_median(boosted) == _lower_median(sorted(cnts))


def test_weighted_median_python_reference(spark, sf_dir, duck_raw):
    """Sequential cumulative walk over sorted (lag, weight) pairs
    reproduces both medians; weighted median >= plain when value skews
    to late lags is NOT asserted (data-dependent), only exactness."""
    rows = duck_raw.sql(
        f"""SELECT o.o_orderpriority,
               epoch_us(l.l_shipdate) // {DAY_US}
                 - epoch_us(o.o_orderdate) // {DAY_US},
               CAST(round(l.l_extendedprice * 100) AS BIGINT)
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    per: dict = defaultdict(list)
    for pr, lag, w in rows:
        per[pr].append((int(lag), int(w)))
    got = {r.priority: r for r in weighted_lag_median_by_priority(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for pr, pairs in per.items():
        pairs.sort()
        totw = sum(w for _, w in pairs)
        totn = len(pairs)
        cumw = cumn = 0
        wmed = pmed = None
        for lag, w in pairs:
            cumw += w
            cumn += 1
            if wmed is None and 2 * cumw >= totw:
                wmed = lag
            if pmed is None and 2 * cumn >= totn:
                pmed = lag
        r = got[pr]
        assert r.total_cents == totw
        assert r.weighted_median_lag == wmed
        assert r.plain_median_lag == pmed


def test_ltv_python_reference_and_monotone(spark, sf_dir, duck_raw):
    """Python dict replay reproduces the curve; cumulative value is
    non-decreasing in age within each cohort and the final cumulative
    equals the cohort's total purchase value."""
    rows = duck_raw.sql(
        f"SELECT user_id, epoch_us(ts) // {WEEK_US}, event_type,"
        f" CAST(floor(value * {PL20.LTV_VALUE_SCALE}) AS BIGINT)"
        " FROM events"
    ).fetchall()
    first = {}
    for u, w, _t, _v in rows:
        first[u] = min(first.get(u, w), w)
    sizes = Counter(first.values())
    curve: dict = defaultdict(int)
    total: dict = defaultdict(int)
    for u, w, t, v in rows:
        if t == "purchase":
            cw = first[u]
            curve[(cw, w - cw)] += int(v)
            total[cw] += int(v)
    out = cohort_ltv_curve(spark, sf_dir).collect()
    assert {(r.cohort_week, r.age_weeks) for r in out} == set(curve)
    last_cum: dict = {}
    for r in sorted(out, key=lambda r: (r.cohort_week, r.age_weeks)):
        assert r.period_value_micro == curve[(r.cohort_week, r.age_weeks)]
        assert r.n_users == sizes[r.cohort_week]
        prev = last_cum.get(r.cohort_week, 0)
        assert r.cum_value_micro == prev + r.period_value_micro
        last_cum[r.cohort_week] = r.cum_value_micro
    for cw, cum in last_cum.items():
        assert cum == total[cw]
