"""Batch 48: NDCG, CUPED, power planning — literal-table sanity,
hand-computable planted fixtures, and DuckDB oracle matches."""

import datetime
import hashlib

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline48 as P48


def h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_ndcg_literals_are_the_standard_discounts():
    assert P48.DISC_PPM[1] == 1_000_000
    assert P48.DISC_PPM[3] == 500_000  # 1/log2(4)
    vals = [P48.DISC_PPM[r] for r in range(1, P48.NDCG_K + 1)]
    assert vals == sorted(vals, reverse=True)
    assert P48.IDCG_PPM[1] == 1_000_000
    assert P48.IDCG_PPM[P48.NDCG_K] == sum(P48.DISC_PPM.values())


def test_ndcg_bounds_and_perfect_prefix(spark):
    """On the real sf0.001 fixture: every score in [0, 1e6]; a query
    whose entire top-k is relevant scores exactly 1e6; zero relevant
    scores exactly 0; and the result hash-matches the oracle."""
    sf = "/root/testdata/sf0.001"
    rows = P48.retrieval_eval_ndcg(spark, sf).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ndcg_ppm <= 1_000_000
        if r.n_rel_topk == P48.NDCG_K:
            assert r.ndcg_ppm == 1_000_000
        if r.n_rel_topk == 0:
            assert r.ndcg_ppm == 0 and r.dcg_ppm == 0
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    want = sorted(map(tuple, con.sql(P48.RETRIEVAL_EVAL_NDCG_SQL).fetchall()))
    assert sorted(map(tuple, rows)) == want


def _pick_user(arm: int, start: int) -> int:
    u = start
    while h64(str(u)) % 2 != arm:
        u += 1
    return u


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_cuped_perfect_covariate_equalizes_arms(spark, tmp_path):
    """y = 2x per user with arm-imbalanced x: θ = 2·10⁶ exactly and the
    adjusted means collapse to the same value in both arms."""
    a0 = [_pick_user(0, 0), _pick_user(0, 1000)]
    a1 = [_pick_user(1, 0), _pick_user(1, 1000)]
    t_early = datetime.datetime(2024, 1, 1)
    t_late = datetime.datetime(2024, 12, 31)
    rows, eid = [], 0
    for users, x_cents in ((a0, 100), (a1, 200)):
        for u in users:
            rows.append((eid, t_early, u, "spend", x_cents / 100.0, "{}")); eid += 1
            rows.append((eid, t_late, u, "spend", 2 * x_cents / 100.0, "{}")); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r.arm: r for r in P48.cuped_adjusted_ab(spark, sf).collect()}
    assert out[0].theta_ppm == 2_000_000 and out[1].theta_ppm == 2_000_000
    assert out[0].mean_y_milli != out[1].mean_y_milli  # raw means differ
    assert out[0].adj_mean_milli == out[1].adj_mean_milli == 300_000
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    duck = {r[0]: tuple(r) for r in con.sql(P48.CUPED_ADJUSTED_AB_SQL).fetchall()}
    assert duck == {a: tuple(r) for a, r in out.items()}


def test_power_plan_hand_computed(spark, tmp_path):
    """Two users at 10 and 20 cents: var_num = 2·500−900 = 100,
    mean = 15 → required@10% = 16·100·10⁴ // (4·225·100) = 177; the
    1% cell needs 100× more than the 10% cell (δ² scaling)."""
    t = datetime.datetime(2024, 6, 1)
    rows = [
        (1, t, 1, "buy", 0.10, "{}"),
        (2, t, 2, "buy", 0.20, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        (r.event_type, r.mde_pct): (r.n_users, r.mean_cents, r.required_n_per_arm)
        for r in P48.ab_power_plan(spark, sf).collect()
    }
    assert out[("buy", 10)] == (2, 15, 177)
    assert out[("buy", 1)] == (2, 15, 17_777)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    duck = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.sql(P48.AB_POWER_PLAN_SQL).fetchall()
    }
    assert duck == out
