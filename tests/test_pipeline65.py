"""Batch 65: DiD, cumulative gains/AUC, consistent-hash movement."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline65 import (
    CH_SHARDS_A,
    CH_SHARDS_B,
    CONSISTENT_HASH_SQL,
    DID_SQL,
    GAINS_AUC_SQL,
    consistent_hash_movement,
    cumulative_gains_auc,
    did_estimate,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (did_estimate, DID_SQL),
        (cumulative_gains_auc, GAINS_AUC_SQL),
        (consistent_hash_movement, CONSISTENT_HASH_SQL),
    ],
    ids=["did", "gains", "chash"],
)
def test_cross_engine_hash_sf0001(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, sql)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)


def test_did_antisymmetric_and_consistent(spark, sf_dir):
    rows = {r["arm"]: r for r in did_estimate(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    a, b = rows[0], rows[1]
    # both rows carry the same signed verdict (B minus A)
    assert a["did_q"] == b["did_q"] == b["delta_q"] - a["delta_q"]
    assert a["placebo_q"] == b["placebo_q"]
    for r in rows.values():
        assert r["delta_q"] == r["post_mean_q"] - r["pre_mean_q"]
        assert r["pre_mean_q"] > 0 and r["post_mean_q"] > 0


def test_gains_curve_shape(spark, sf_dir):
    rows = cumulative_gains_auc(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    aucs = {r["auc_ppm"] for r in rows}
    assert len(aucs) == 1
    auc = aucs.pop()
    # AUC is a proper fraction (the signal itself is asserted at the
    # driver's sf0.01 gate; 15 users at sf0.001 is noise)
    assert 0 < auc <= 1_000_000
    prev = 0
    total_pos = sum(r["n_pos"] for r in rows)
    cum = 0
    for r in rows:
        assert r["cum_gain_ppm"] >= prev  # cumulative
        prev = r["cum_gain_ppm"]
        assert r["n_users"] > 0
        cum += r["n_pos"]
        # cum_gain is exactly the integer share of positives captured
        assert r["cum_gain_ppm"] == cum * 1_000_000 // total_pos
    assert rows[-1]["cum_gain_ppm"] == 1_000_000  # all positives captured
    # top-30% outcome: positives are a strict minority
    assert 0 < total_pos < sum(r["n_users"] for r in rows) // 2


def test_consistent_hash_beats_mod_n(spark, sf_dir):
    row = consistent_hash_movement(spark, sf_dir).collect()[0]
    assert row["n_keys"] > 0
    # the whole point: ring movement is FAR below mod-N movement
    assert row["ch_moved_ppm"] * 3 < row["mod_moved_ppm"]
    # mod-N resize moves roughly (N-1)/N of keys
    assert row["mod_moved_ppm"] > 700_000
    # vnode balance: no shard holds more than 4x the fair share
    assert row["max_load_a_ppm"] < 4_000_000 // CH_SHARDS_A
    assert row["max_load_b_ppm"] < 4_000_000 // CH_SHARDS_B
