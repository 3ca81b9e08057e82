"""Batch 74: blocked/ordered nonparametrics, FDR governance, and the
dHash banded near-dup pass."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.multimodal6 import (
    DHASH_BUCKET_CAP,
    DHASH_HAMMING_T,
    IMAGE_DHASH_NEAR_SQL,
    _dhash_frame,
    image_dhash_near_pairs,
)
from oracledb_datapump_spark.operators.pipeline74 import (
    BH_CRIT_MILLI,
    BH_FAMILY_M,
    BH_FDR_NATION_SQL,
    COCHRAN_ARMITAGE_SQL,
    COCHRAN_Q_SQL,
    CRAMER_VON_MISES_SQL,
    DURBIN_WATSON_SQL,
    FRIEDMAN_SQL,
    MOOD_MEDIAN_SQL,
    PAGE_TREND_SQL,
    _norm_ppf,
    bh_fdr_nation_trend,
    cochran_armitage_priority,
    cochran_q_detectors,
    cramer_von_mises_drift,
    durbin_watson_trend,
    friedman_event_type_ranks,
    mood_median_priority,
    page_trend_hour_bins,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "customer", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (friedman_event_type_ranks, FRIEDMAN_SQL),
        (page_trend_hour_bins, PAGE_TREND_SQL),
        (cochran_armitage_priority, COCHRAN_ARMITAGE_SQL),
        (mood_median_priority, MOOD_MEDIAN_SQL),
        (durbin_watson_trend, DURBIN_WATSON_SQL),
        (cramer_von_mises_drift, CRAMER_VON_MISES_SQL),
        (bh_fdr_nation_trend, BH_FDR_NATION_SQL),
        (cochran_q_detectors, COCHRAN_Q_SQL),
        (image_dhash_near_pairs, IMAGE_DHASH_NEAR_SQL),
    ],
    ids=[
        "friedman",
        "page_trend",
        "cochran_armitage",
        "mood_median",
        "durbin_watson",
        "cramer_von_mises",
        "bh_fdr",
        "cochran_q",
        "dhash_near",
    ],
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


def test_bh_crit_literals():
    """The Acklam-baked BH boundary: rank-25 crit is the plain 5%
    two-sided z (1960 milli), rank-1 is the 0.1%-per-test boundary,
    and the ladder is strictly decreasing (step-up consistency)."""
    assert len(BH_CRIT_MILLI) == BH_FAMILY_M == 25
    assert BH_CRIT_MILLI[-1] == 1_960
    assert BH_CRIT_MILLI[0] == 3_090
    assert all(
        a > b for a, b in zip(BH_CRIT_MILLI, BH_CRIT_MILLI[1:])
    )
    # Acklam sanity against textbook quantiles
    assert abs(_norm_ppf(0.975) - 1.959964) < 1e-4
    assert abs(_norm_ppf(0.995) - 2.575829) < 1e-4


def test_bh_rejections_are_prefix_closed(spark, sf_dir):
    """BH step-up rejects exactly ranks 1..k: the reject set must be a
    prefix of the |z|-descending order, and all 25 nations appear."""
    rows = sorted(
        bh_fdr_nation_trend(spark, sf_dir).collect(),
        key=lambda r: r["bh_rank"],
    )
    assert [r["bh_rank"] for r in rows] == list(range(1, 26))
    assert len({r["n_nationkey"] for r in rows}) == 25
    flags = [bool(r["reject_flag"]) for r in rows]
    assert flags == sorted(flags, reverse=True)  # prefix-closed
    for r in rows:
        if r["reject_flag"] and r["bh_rank"] == max(
            rr["bh_rank"] for rr in rows if rr["reject_flag"]
        ):
            assert abs(r["z_milli"]) >= r["crit_milli"]


def test_cochran_armitage_sign_tracks_trend(spark, tmp_path):
    """A hand-built panel where fulfillment rises with the priority
    score must yield a positive a_stat and z; reversing it flips the
    sign exactly (the statistic is antisymmetric in the outcome)."""
    import datetime

    def write(frac_f_by_l, path):
        rows = []
        k = 0
        for l, frac in frac_f_by_l.items():
            for i in range(20):
                st = "F" if i < frac else "O"
                rows.append(
                    (
                        k,
                        1,
                        st,
                        100.0,
                        datetime.datetime(1992, 1, 1 + (k % 28)),
                        f"{l}-X",
                    )
                )
                k += 1
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        ).write.parquet(str(path / "orders.parquet"))

    up = tmp_path / "up"
    up.mkdir()
    write({1: 2, 2: 6, 3: 10, 4: 14, 5: 18}, up)
    r_up = cochran_armitage_priority(spark, str(up)).collect()[0]
    assert r_up["a_stat"] > 0 and r_up["z_milli"] > 0
    assert bool(r_up["trend_flag"]) is True

    down = tmp_path / "down"
    down.mkdir()
    write({1: 18, 2: 14, 3: 10, 4: 6, 5: 2}, down)
    r_dn = cochran_armitage_priority(spark, str(down)).collect()[0]
    assert r_dn["a_stat"] == -r_up["a_stat"]
    assert r_dn["z_milli"] == -r_up["z_milli"]


def test_mood_median_counts_consistent(spark, sf_dir):
    rows = mood_median_priority(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["above_g"] <= r["n_g"]
        assert r["chi2_milli"] >= 0
    n = sum(r["n_g"] for r in rows)
    above = sum(r["above_g"] for r in rows)
    # strictly-above the lower median: never more than half
    assert above <= n // 2


def test_cvm_identical_samples_near_zero(spark, tmp_path):
    """Duplicating one calendar half into the other gives two identical
    daily distributions — T must sit at its minimum neighborhood
    (≤ 0), far from the 0.461 critical point."""
    import datetime

    rows = []
    for half in range(2):
        for i in range(30):
            rows.append(
                (
                    half * 30 + i,
                    1,
                    "O",
                    float(100 + (i % 7) * 13),
                    datetime.datetime(1992, 1 + half * 2, 1 + (i % 28)),
                    "1-URGENT",
                )
            )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = cramer_von_mises_drift(spark, str(tmp_path)).collect()[0]
    assert r["n_first"] == r["n_second"]
    assert r["t_ppm"] <= 0
    assert bool(r["drift_flag"]) is False


def test_durbin_watson_in_range(spark, sf_dir):
    r = durbin_watson_trend(spark, sf_dir).collect()[0]
    assert r["n_days"] > 0
    assert 0 <= r["dw_milli"] <= 4_000


def test_friedman_and_page_block_counts(spark, sf_dir):
    f = friedman_event_type_ranks(spark, sf_dir).collect()[0]
    p = page_trend_hour_bins(spark, sf_dir).collect()[0]
    assert f["k_treatments"] == 5 and p["k_bins"] == 4
    assert f["n_blocks"] > 0 and p["n_blocks"] > 0
    assert f["chi2f_milli"] >= 0
    # L2 sits inside its algebraic bounds: R2_j sums to n·k(k+1) total
    n, k = p["n_blocks"], p["k_bins"]
    assert 0 < p["l2_stat"] < (k + 1) * n * k * (k + 1)


def test_quadratic_guard_covers_cochran_q(spark, sf_dir, monkeypatch):
    from oracledb_datapump_spark.exceptions import UsageError
    from oracledb_datapump_spark.operators import dedup as D

    monkeypatch.setattr(D, "QUADRATIC_GUARD_MAX_ROWS", 10)
    with pytest.raises(UsageError, match="cochran_q_detectors"):
        cochran_q_detectors(spark, sf_dir)
    assert cochran_q_detectors(spark, sf_dir, verification=True).count() == 1


def test_dhash_near_pairs_banding_is_complete(spark, sf_dir):
    """Pigeonhole completeness: every pair within Hamming ≤ T whose
    docs share at least one NON-hot band bucket must be produced;
    everything produced must verify ≤ T. Checked against a Python
    brute force over the decoded hashes."""
    hashes = {
        int(r["doc_id"]): int(r["dhash_q"])
        for r in _dhash_frame(spark, sf_dir).collect()
    }
    from collections import Counter

    bucket_sizes = Counter()
    for h in hashes.values():
        for k in range(3):
            bucket_sizes[(k, (h >> (10 * k)) & 1023)] += 1

    def eligible(h1, h2):
        for k in range(3):
            b1 = (h1 >> (10 * k)) & 1023
            if b1 != (h2 >> (10 * k)) & 1023:
                continue
            if 1 < bucket_sizes[(k, b1)] <= DHASH_BUCKET_CAP:
                return True
        return False

    ids = sorted(hashes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= DHASH_HAMMING_T and eligible(hashes[a], hashes[b]):
                want.add((a, b, ham))
    got = {
        (int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
        for r in image_dhash_near_pairs(spark, sf_dir).collect()
    }
    assert got == want
    assert all(h <= DHASH_HAMMING_T for _, _, h in got)
