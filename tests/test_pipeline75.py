"""Batch 75: SPRT monitor, Kaplan–Meier survival, streaming CUSUM."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline75 import (
    KAPLAN_MEIER_SQL,
    SPRT_BOUND_MILLI,
    SPRT_L0_MILLI,
    SPRT_L1_MILLI,
    SPRT_MONITOR_SQL,
    kaplan_meier_survival,
    sprt_conversion_monitor,
)
from oracledb_datapump_spark.streaming.cusum import (
    STREAMING_CUSUM_SQL,
    streaming_cusum_chart,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (sprt_conversion_monitor, SPRT_MONITOR_SQL),
        (kaplan_meier_survival, KAPLAN_MEIER_SQL),
        (streaming_cusum_chart, STREAMING_CUSUM_SQL),
    ],
    ids=["sprt", "kaplan_meier", "streaming_cusum"],
)
def test_cross_engine_hash_sf0001(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, sql)
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)


def test_sprt_literals():
    """Wald design constants: ln(1.1), ln(0.9), ln(19) in milli-nats."""
    assert SPRT_L1_MILLI == 95
    assert SPRT_L0_MILLI == -105
    assert SPRT_BOUND_MILLI == 2_944


def test_sprt_decision_consistent(spark, sf_dir):
    r = sprt_conversion_monitor(spark, sf_dir).collect()[0]
    assert r["n_days"] > 0 and r["n_users"] > 0
    if r["decision"] == "continue":
        assert r["first_upper_day"] == -1 and r["first_lower_day"] == -1
        assert abs(r["llr_final_milli"]) <= 10 * SPRT_BOUND_MILLI
    elif r["decision"] == "h1":
        assert r["first_upper_day"] >= 0
    else:
        assert r["first_lower_day"] >= 0


def test_kaplan_meier_curve_properties(spark, sf_dir):
    """S is monotone nonincreasing from ≤1e6; n_at_risk is monotone
    nonincreasing in the bucket; events+censored sum to the at-risk
    total of the first bucket."""
    rows = sorted(
        kaplan_meier_survival(spark, sf_dir).collect(),
        key=lambda r: r["week_bucket"],
    )
    assert rows
    assert rows[0]["n_at_risk"] == sum(
        r["n_events"] + r["n_censored"] for r in rows
    )
    prev_s, prev_risk = 1_000_000, None
    for r in rows:
        assert 0 <= r["s_ppm"] <= prev_s
        prev_s = r["s_ppm"]
        if prev_risk is not None:
            assert r["n_at_risk"] <= prev_risk
        prev_risk = r["n_at_risk"]
        assert r["n_events"] + r["n_censored"] >= 1


def test_kaplan_meier_hand_computed(spark, tmp_path):
    """Three customers: A orders day 0 and day 7 (one 1-week gap
    event), B orders day 0 only, C orders day 14 only (dataset max).
    Buckets: gap event at bucket 1; censored tails at buckets 1 (A:
    7d), 2 (B: 14d), 0 (C: 0d). Risk(0)=4, S(0)=1e6; risk(1)=3,d=1 →
    S = 666666; risk(2)=1, d=0 → unchanged."""
    import datetime

    rows = [
        (1, 10, "O", 1.0, datetime.datetime(1992, 1, 1), "1-URGENT"),
        (2, 10, "O", 1.0, datetime.datetime(1992, 1, 8), "1-URGENT"),
        (3, 20, "O", 1.0, datetime.datetime(1992, 1, 1), "1-URGENT"),
        (4, 30, "O", 1.0, datetime.datetime(1992, 1, 15), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["week_bucket"]: r
        for r in kaplan_meier_survival(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0]["n_at_risk"] == 4 and got[0]["s_ppm"] == 1_000_000
    assert got[1]["n_events"] == 1 and got[1]["n_censored"] == 1
    assert got[1]["n_at_risk"] == 3 and got[1]["s_ppm"] == 666_666
    assert got[2]["n_censored"] == 1 and got[2]["s_ppm"] == 666_666


def test_streaming_cusum_replay_idempotent(spark, sf_dir, tmp_path):
    """The CUSUM fold inherits drift.py's at-least-once contract:
    a replayed committed batch is skipped, never duplicated."""
    import glob
    import json
    import os
    import shutil

    from oracledb_datapump_spark.streaming.cusum import (
        _STATE_FILE,
        run_cusum_cycle,
    )

    def _stage_flat(df, dest):
        tmp = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(part, dest)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _stage_flat(orders.limit(500), os.path.join(src, "o1.parquet"))
    run_cusum_cycle(spark, src, out)
    chart = os.path.join(out, "chart")
    n1 = spark.read.parquet(chart).count()
    state1 = json.load(open(os.path.join(out, _STATE_FILE)))
    assert state1["batch_id"] is not None and state1["mu_q"] is not None

    shutil.rmtree(os.path.join(out, "_cusum_ckpt"))
    run_cusum_cycle(spark, src, out)
    assert spark.read.parquet(chart).count() == n1
    assert json.load(open(os.path.join(out, _STATE_FILE))) == state1
