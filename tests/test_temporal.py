"""as-of join: generic-helper semantics + the attribution query, checked
against a row-by-row naive computation (cross-engine parity is covered
by test_queries_oracle)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from oracledb_datapump_spark.operators import clustering as CL
from oracledb_datapump_spark.operators import dedup as D
from oracledb_datapump_spark.operators.temporal import asof_attribution, asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [Row(k="a", t=10, lid=1), Row(k="a", t=20, lid=2), Row(k="b", t=5, lid=3)]
    )
    right = spark.createDataFrame(
        [Row(k="a", rt=10, val="x"), Row(k="a", rt=15, val="y"), Row(k="b", rt=9, val="z")]
    )
    out = {
        r.lid: r.val
        for r in asof_join(left, right, by="k", ts_left="t", ts_right="rt", carry=["val"]).collect()
    }
    # t=10 matches rt=10 (inclusive), t=20 matches rt=15, t=5 has no prior
    assert out == {1: "x", 2: "y", 3: None}


def test_asof_attribution_matches_naive(spark, sf_dir):
    from oracledb_datapump_spark.events_source import load_events

    rows = asof_attribution(spark, sf_dir).collect()
    ev = load_events(spark, sf_dir).collect()
    clicks = sorted(
        ((r.user_id, r.ts_us, r.event_id) for r in ev if r.event_type == "click")
    )
    by_user: dict = {}
    for uid, ts, eid in clicks:
        by_user.setdefault(uid, []).append((ts, eid))
    import bisect

    for r in rows[:50]:
        lst = by_user.get(r.user_id, [])
        i = bisect.bisect_right(lst, (r.purchase_ts_us, float("inf"))) - 1
        if i < 0:
            assert r.click_id is None
        else:
            assert r.click_id == lst[i][1]
            assert r.gap_us == r.purchase_ts_us - lst[i][0]


def test_dedup_semantic_subset_of_bruteforce(spark, sf_dir):
    sem = {(r.vec_a, r.vec_b) for r in CL.dedup_semantic(spark, sf_dir).collect()}
    brute = {
        (r.vec_a, r.vec_b) for r in D.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    assert sem  # finds real pairs
    assert sem <= brute  # cluster scoping never invents pairs


def test_range_join_is_equi_join(spark, sf_dir):
    """The bin-bucketed range join must plan as a hash equi-join on the
    bin key — never a broadcast-nested-loop over the range predicate."""
    from oracledb_datapump_spark.operators.temporal import range_join_nearby

    df = range_join_nearby(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_rolling_window_trailing_hour(spark, sf_dir):
    """Hand-check one user: n_prev_hour counts exactly the user's events
    in (ts - 1h, ts]."""
    from pyspark.sql import functions as F
    from oracledb_datapump_spark.operators.analytics import _events
    from oracledb_datapump_spark.operators.temporal import (
        ROLL_W_US,
        rolling_window_activity,
    )

    out = rolling_window_activity(spark, sf_dir)
    uid = out.select("user_id").first().user_id
    evs = sorted(
        r.ts_us
        for r in _events(spark, sf_dir).filter(F.col("user_id") == uid).collect()
    )
    expect = {
        ts: sum(1 for t in evs if ts - ROLL_W_US <= t <= ts) for ts in evs
    }
    got = {
        r.ts_us: r.n_prev_hour
        for r in out.filter(F.col("user_id") == uid).collect()
    }
    assert got == expect


def test_asof_carries_latest_row_atomically_with_nulls(spark):
    """ASOF semantics attach the latest prior right ROW as a unit: a
    NULL field in that row stays NULL (not back-filled from an older
    row), fields never mix across rows, and a NULL right timestamp is
    no match at all (regression: per-column last(ignorenulls) did all
    three wrong)."""
    from oracledb_datapump_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 25), (2, 5)], "k int, t long"
    )
    right = spark.createDataFrame(
        [(1, 10, 5, 10), (1, 20, None, 20), (2, None, 99, 99)],
        "k int, rt long, a long, b long",
    )
    out = {
        r.k: (r.a, r.b)
        for r in asof_join(
            left, right, by="k", ts_left="t", ts_right="rt", carry=["a", "b"]
        ).collect()
    }
    # k=1: latest prior row is (rt=20, a=NULL, b=20) — a must stay NULL
    assert out[1] == (None, 20)
    # k=2: the only right row has a NULL timestamp — no match
    assert out[2] == (None, None)
