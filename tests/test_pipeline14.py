"""Property tests for the pipeline14 analytic families — each checked
against an independent Python/DuckDB reference formulated differently
from both the operator and its gated SQL oracle (brute force where the
operator is clever, closed-form where the operator is windowed)."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline14 import (
    DAY_US,
    EDIT_BAND_WIDTH,
    cusum_changepoint,
    dedup_edit_distance,
    event_path_trigrams,
    part_price_skyline,
    revenue_trend_ols,
    user_activity_streaks,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["part", "orders", "customer", "nation", "events"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_skyline_matches_bruteforce(spark, sf_dir, duck_raw):
    """The distributed prefix-max formulation must equal the O(n²)
    pairwise dominance definition applied in plain Python."""
    parts = duck_raw.sql(
        "SELECT p_partkey, p_retailprice, p_size FROM part"
    ).fetchall()
    sky = set()
    for pk, price, size in parts:
        dominated = any(
            qprice <= price
            and qsize >= size
            and (qprice < price or qsize > size)
            for _, qprice, qsize in parts
        )
        if not dominated:
            sky.add(pk)
    got = {
        r.p_partkey for r in part_price_skyline(spark, sf_dir).collect()
    }
    assert got == sky


def test_ols_slope_integer_formula(spark, sf_dir, duck_raw):
    """Per-nation slope must equal the moment formula evaluated in
    arbitrary-precision Python ints over the monthly series."""
    rows = duck_raw.sql(
        """
        SELECT n.n_name, year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
               SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict = {}
    for nation, _, y in rows:
        series.setdefault(nation, []).append(int(y))
    expect = {}
    for nation, ys in series.items():
        n = len(ys)
        if n < 2:
            continue
        xs = range(n)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den <= 0:
            continue
        sign = -1 if num < 0 else 1
        expect[nation] = (n, sy, sign * (abs(num) * 1_000_000 // den))
    got = {
        r.nation: (r.n_months, r.rev_total_cents, r.slope_cents_ppm)
        for r in revenue_trend_ols(spark, sf_dir).collect()
    }
    assert got == expect


def test_streak_histogram_matches_python(spark, sf_dir, duck_raw):
    """Longest consecutive-day run per user recomputed by scanning the
    sorted day list directly (no window algebra)."""
    rows = duck_raw.sql(
        f"SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} FROM events"
        " ORDER BY 1, 2"
    ).fetchall()
    days: dict = {}
    for uid, d in rows:
        days.setdefault(uid, []).append(int(d))
    hist: dict = {}
    for uid, ds in days.items():
        best = run = 1
        for prev, cur in zip(ds, ds[1:]):
            run = run + 1 if cur == prev + 1 else 1
            best = max(best, run)
        hist[best] = hist.get(best, 0) + 1
    got = {
        r.streak_days: r.n_users
        for r in user_activity_streaks(spark, sf_dir).collect()
    }
    assert got == hist


def test_cusum_argmax_and_tiebreak(spark, sf_dir, duck_raw):
    """The reported day must maximize |S_k·n − k·S_n| and be the
    EARLIEST maximizer, per nation."""
    rows = duck_raw.sql(
        f"""
        SELECT n.n_name, epoch_us(o.o_orderdate) // {DAY_US} AS d,
               SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict = {}
    for nation, d, y in rows:
        series.setdefault(nation, []).append((int(d), int(y)))
    expect = {}
    for nation, pts in series.items():
        n = len(pts)
        s_n = sum(y for _, y in pts)
        s_k, best = 0, None
        for k, (d, y) in enumerate(pts, start=1):
            s_k += y
            dev = abs(s_k * n - k * s_n)
            if best is None or dev > best[1]:
                best = (d, dev)
        expect[nation] = (best[0], n, best[1])
    got = {
        r.nation: (r.cp_day_idx, r.n_days, r.max_dev)
        for r in cusum_changepoint(spark, sf_dir).collect()
    }
    assert got == expect


def test_edit_distance_bands_wellformed(spark, sf_dir):
    """Bands are consistent (min/max inside the band, min ≤ max) and
    the pair total equals the LSH candidate-pair count."""
    from oracledb_datapump_spark.operators.dedup import dedup_minhash_pairs

    rows = dedup_edit_distance(spark, sf_dir).collect()
    assert rows, "candidate set should not be empty on the fixtures"
    for r in rows:
        assert r.min_dist <= r.max_dist
        assert r.min_dist // EDIT_BAND_WIDTH == r.dist_band
        assert r.max_dist // EDIT_BAND_WIDTH == r.dist_band
    n_pairs = dedup_minhash_pairs(spark, sf_dir).count()
    assert sum(r.n_pairs for r in rows) == n_pairs


def test_trigram_total_is_sum_of_session_lengths(spark, sf_dir, duck_raw):
    """Σ n_paths must equal Σ over sessions of max(len − 2, 0) — every
    session of L events contributes exactly L−2 trigrams."""
    from oracledb_datapump_spark.operators.pipeline7 import SESSION_GAP_US

    lens = duck_raw.sql(
        f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                           > {SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id,
                 SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS seq
          FROM flagged
        )
        SELECT COUNT(*) FROM sess GROUP BY user_id, seq
        """
    ).fetchall()
    expect = sum(max(int(n[0]) - 2, 0) for n in lens)
    got = sum(
        r.n_paths for r in event_path_trigrams(spark, sf_dir).collect()
    )
    assert got == expect
