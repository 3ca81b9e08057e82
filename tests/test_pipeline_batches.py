"""Semantic properties of the round-6 pipeline3/pipeline4 dashboards —
the hash-parity harness (test_queries_oracle) proves cross-engine
equality; these prove the numbers MEAN what the docstrings claim."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_backlog_never_negative_and_conserves_orders(spark):
    """Cumulative placed ≥ cumulative done at every month (an order's
    completion month can't precede its placement month), and the final
    placed total equals the orders row count."""
    from oracledb_datapump_spark.operators.pipeline3 import orders_backlog_timeline

    rows = orders_backlog_timeline(spark, SF).collect()
    assert all(r.backlog >= 0 for r in rows), [r for r in rows if r.backlog < 0]
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_placed for r in rows) == n_orders


def test_rfm_bands_cover_every_customer_with_orders(spark):
    from oracledb_datapump_spark.operators.pipeline3 import mktsegment_yoy  # noqa: F401
    from oracledb_datapump_spark.operators.pipeline4 import customer_rfm_bands

    rows = customer_rfm_bands(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(r.r_band >= 1 and r.f_band >= 1 and r.m_band >= 1 for r in rows)


def test_gini_bounds_and_monolingual_zero(spark):
    """gini_ppm ∈ [0, 1e6); a source whose docs are all one language
    must score exactly 0."""
    from oracledb_datapump_spark.operators.pipeline4 import source_lang_gini

    rows = source_lang_gini(spark, SF).collect()
    assert all(0 <= r.gini_ppm < 1_000_000 for r in rows)
    mono = [r for r in rows if r.n_langs == 1]
    assert all(r.gini_ppm == 0 for r in mono)


def test_moments_reconstruct_nonnegative_variance(spark):
    """The emitted integer moment sums must satisfy the Cauchy-Schwarz
    bound n·Σx² ≥ (Σx)² per source — otherwise the sums are not moments
    of any real sample."""
    from oracledb_datapump_spark.operators.pipeline3 import quality_length_moments

    for r in quality_length_moments(spark, SF).collect():
        assert r.n_docs * r.sum_ll >= r.sum_len**2, r
        assert r.n_docs * r.sum_qq >= r.sum_q**2, r
        assert r.corr_sign in (-1, 0, 1)


def test_transition_gaps_conserve_event_pairs(spark):
    """Σ n_transitions = Σ_users max(0, |events_u| − 1): every user
    contributes exactly one fewer transition than events."""
    from oracledb_datapump_spark.operators.pipeline3 import event_transition_gaps
    from oracledb_datapump_spark.events_source import load_events

    total = (
        event_transition_gaps(spark, SF)
        .agg(F.sum("n_transitions"))
        .collect()[0][0]
    )
    per_user = (
        load_events(spark, SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") - 1))
        .collect()[0][0]
    )
    assert total == per_user


def test_hourly_dups_bounded_by_events(spark):
    from oracledb_datapump_spark.operators.pipeline3 import hourly_event_dups

    rows = hourly_event_dups(spark, SF).collect()
    assert all(0 <= r.n_dup_events < r.n_events for r in rows)


def test_value_anomaly_days_flags_minority(spark):
    """A >2σ test on per-day value sums can only flag a minority of the
    days for a type (Chebyshev: at most 1/4 — allow ceil for tiny day
    counts)."""
    from oracledb_datapump_spark.operators.pipeline4 import value_anomaly_days

    rows = value_anomaly_days(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.is_anomaly)
    for t, flags in by_type.items():
        assert sum(flags) <= max(1, len(flags) // 4 + 1), (t, sum(flags), len(flags))


def test_prefix_histogram_conserves_docs(spark):
    from oracledb_datapump_spark.operators.pipeline3 import (
        prefix_collision_histogram,
    )

    rows = prefix_collision_histogram(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(r.n_docs == r.group_size * r.n_prefixes for r in rows)


def test_peak_concurrency_bounds(spark):
    """Each hour's active-session count is ≥ the number of sessions
    STARTING in it and Σ over hours ≥ total sessions (every session
    covers ≥1 hour)."""
    from oracledb_datapump_spark.operators.analytics import events_sessionize
    from oracledb_datapump_spark.operators.pipeline5 import (
        peak_concurrent_sessions,
    )

    rows = {r.hour_epoch: r.n_active_sessions for r in peak_concurrent_sessions(spark, SF).collect()}
    sess = events_sessionize(spark, SF).collect()
    assert sum(rows.values()) >= len(sess)
    starts: dict[int, int] = {}
    for s in sess:
        h = (s.session_start_us // 3_600_000_000) * 3600
        starts[h] = starts.get(h, 0) + 1
    for h, c in starts.items():
        assert rows.get(h, 0) >= c, (h, c, rows.get(h))


def test_degree_histogram_conserves_pair_endpoints(spark):
    """Σ degree·n_docs = 2·|verified pairs| (every pair contributes two
    endpoint slots)."""
    from oracledb_datapump_spark.operators.dedup import verified_pairs_cached
    from oracledb_datapump_spark.operators.pipeline5 import dup_degree_histogram

    rows = dup_degree_histogram(spark, SF).collect()
    n_pairs = verified_pairs_cached(spark, SF).count()
    assert sum(r.degree * r.n_docs for r in rows) == 2 * n_pairs


def test_hhi_bounds_and_monopoly_floor(spark):
    """hhi_ppm ∈ [1e6/n (rounded down), 1e6]; a single-participant
    group scores ~1e6 (ppm truncation loses at most n ppm)."""
    from oracledb_datapump_spark.operators.pipeline6 import (
        nation_revenue_hhi,
        user_activity_hhi,
    )

    for df, n_col in (
        (nation_revenue_hhi(spark, SF), "n_suppliers"),
        (user_activity_hhi(spark, SF), "n_users"),
    ):
        for r in df.collect():
            n = getattr(r, n_col)
            assert r.hhi_ppm <= 1_000_000, r
            assert r.hhi_ppm >= 1_000_000 // n - n, r
            if n == 1:
                assert r.hhi_ppm >= 1_000_000 - 2, r


def test_quartiles_monotone(spark):
    from oracledb_datapump_spark.operators.pipeline6 import (
        value_quartiles_by_type,
    )

    for r in value_quartiles_by_type(spark, SF).collect():
        assert r.p25_cents <= r.p50_cents <= r.p75_cents, r


def test_verified_pairs_memo_cap_falls_back_to_distributed(spark, monkeypatch):
    """Past VERIFIED_PAIRS_MEMO_MAX no row list may be pinned on the
    driver — the cache holds only the over-cap VERDICT (None), so repeat
    consumers skip the redundant count without a driver collect — while
    returning the same rows as the memoized path."""
    from oracledb_datapump_spark.operators import dedup as D

    key = (spark.sparkContext.applicationId, SF)
    D._VERIFIED_PAIRS_CACHE.pop(key, None)
    monkeypatch.setattr(D, "VERIFIED_PAIRS_MEMO_MAX", 0)
    big = sorted(tuple(r) for r in D.verified_pairs_cached(spark, SF).collect())
    # over-cap: the verdict is memoized, the rows are NOT
    assert D._VERIFIED_PAIRS_CACHE.get(key, "missing") is None
    # ...and a repeat call honors the verdict (still no driver rows)
    again = sorted(tuple(r) for r in D.verified_pairs_cached(spark, SF).collect())
    assert D._VERIFIED_PAIRS_CACHE.get(key, "missing") is None
    monkeypatch.setattr(D, "VERIFIED_PAIRS_MEMO_MAX", 2_000_000)
    D._VERIFIED_PAIRS_CACHE.pop(key, None)  # fresh decision under new cap
    small = sorted(tuple(r) for r in D.verified_pairs_cached(spark, SF).collect())
    assert D._VERIFIED_PAIRS_CACHE.get(key) is not None  # Arrow memo pinned
    assert big == again == small and len(small) > 0


def test_new_returning_conserves_weekly_actives(spark):
    from oracledb_datapump_spark.operators.pipeline7 import dau_wau_stickiness
    from oracledb_datapump_spark.operators.pipeline9 import (
        weekly_new_vs_returning,
    )

    growth = {r.week_idx: (r.n_new, r.n_returning) for r in weekly_new_vs_returning(spark, SF).collect()}
    wau = {r.week_idx: r.wau for r in dau_wau_stickiness(spark, SF).collect()}
    assert set(growth) == set(wau)
    for wk, (new, ret) in growth.items():
        assert new + ret == wau[wk], (wk, new, ret, wau[wk])
    # the first week is all-new by definition
    first = min(growth)
    assert growth[first][1] == 0


def test_retention_and_pareto_shares_bounded(spark):
    from oracledb_datapump_spark.operators.pipeline8 import rolling_retention_7d
    from oracledb_datapump_spark.operators.pipeline9 import revenue_pareto_bands

    for r in rolling_retention_7d(spark, SF).collect():
        assert 0 <= r.n_retained <= r.n_active and 0 <= r.retained_ppm <= 1_000_000
    bands = revenue_pareto_bands(spark, SF).collect()
    total_share = sum(r.share_ppm for r in bands)
    # ppm truncation loses < 1 ppm per band
    assert 1_000_000 - len(bands) <= total_share <= 1_000_000


def test_interarrival_moments_consistent(spark):
    """n_gaps per type = n_events(type) − 1, and Cauchy-Schwarz holds
    for the second moment (gap2s is per-term-truncated, so allow the
    truncation slack of 1 per gap on the right side)."""
    from oracledb_datapump_spark.events_source import load_events
    from oracledb_datapump_spark.operators.pipeline9 import (
        events_interarrival_moments,
    )
    from pyspark.sql import functions as FF

    counts = {
        r.event_type: r.c
        for r in load_events(spark, SF)
        .groupBy("event_type")
        .agg(FF.count(FF.lit(1)).alias("c"))
        .collect()
    }
    for r in events_interarrival_moments(spark, SF).collect():
        assert r.n_gaps == counts[r.event_type] - 1
        assert r.max_gap_ms * r.n_gaps >= r.sum_gap_ms
