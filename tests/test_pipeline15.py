"""Property tests for the pipeline15 operators — independent references
formulated differently from both the operator and its gated oracle."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline15 import (
    DAY_US,
    category_drift_report,
    clamped_backlog_stats,
    dedup_prefix_filter_pairs,
    orderkey_gap_audit,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "lineitem", "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_prefix_filter_equals_full_shingle_join(spark, sf_dir):
    """The exactness claim: prefix filtering must find the IDENTICAL
    pair set as the full shingle self-join at the same threshold
    (dedup_ngram_jaccard) — no probabilistic recall loss."""
    from oracledb_datapump_spark.operators.dedup import dedup_ngram_jaccard

    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_prefix_filter_pairs(spark, sf_dir).collect()
    }
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert got == full


def test_drift_ppm_sums_and_flag(spark, sf_dir):
    """Each era's ppm column must sum to ~1e6 (floor rounding loses at
    most |types| ppm) and the flag must equal the recomputed verdict."""
    from oracledb_datapump_spark.operators.pipeline15 import (
        DRIFT_L1_THRESHOLD_PPM,
    )

    rows = category_drift_report(spark, sf_dir).collect()
    n = len(rows)
    for col in ("ref_ppm", "cur_ppm"):
        s = sum(getattr(r, col) for r in rows)
        assert 1_000_000 - n <= s <= 1_000_000
    l1 = sum(r.abs_delta_ppm for r in rows)
    for r in rows:
        assert r.drift_flag == (l1 > DRIFT_L1_THRESHOLD_PPM)


def test_clamped_backlog_sequential_reference(spark, sf_dir, duck_raw):
    """The closed-form B_k = S_k − min(0, min S_j) must equal the naive
    sequential clamp loop run in Python over the daily nets."""
    rows = duck_raw.sql(
        f"""
        WITH ok AS (
          SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, n.n_name
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
        ),
        flows AS (
          SELECT n_name AS nation, epoch_us(o_orderdate) // {DAY_US} AS d,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS flow
          FROM ok
          UNION ALL
          SELECT ok.n_name, epoch_us(l.l_shipdate) // {DAY_US},
                 -CAST(round(l.l_extendedprice * 100) AS BIGINT)
          FROM lineitem l JOIN ok ON ok.o_orderkey = l.l_orderkey
        )
        SELECT nation, d, SUM(flow) FROM flows GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict = {}
    for nation, d, net in rows:
        series.setdefault(nation, []).append(int(net))
    expect = {}
    for nation, nets in series.items():
        b, mx = 0, 0
        for net in nets:
            b = max(0, b + net)
            mx = max(mx, b)
        expect[nation] = (len(nets), b, mx)
    got = {
        r.nation: (r.n_days, r.final_backlog_cents, r.max_backlog_cents)
        for r in clamped_backlog_stats(spark, sf_dir).collect()
    }
    assert got == expect


def test_orderkey_gap_invariants(spark, sf_dir, duck_raw):
    """Conservation: populated + missing spans the range exactly;
    islands and max_gap match a direct sorted scan."""
    r = orderkey_gap_audit(spark, sf_dir).collect()[0]
    assert r.max_key - r.min_key + 1 == r.n_keys + r.n_missing
    keys = [
        int(k[0])
        for k in duck_raw.sql(
            "SELECT o_orderkey FROM orders ORDER BY 1"
        ).fetchall()
    ]
    gaps = [b - a - 1 for a, b in zip(keys, keys[1:]) if b - a > 1]
    assert r.n_islands == len(gaps) + 1
    assert r.max_gap == (max(gaps) if gaps else 0)
    assert r.n_missing == sum(gaps)
