"""Batch 46: Theil–Sen + Mann–Kendall, Good–Turing missing mass, HITS,
and the JSON dump-format lifecycle. Hand-computable planted fixtures
plus DuckDB oracle matches."""

import datetime

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline46 as P46


def _write_sales(spark, tmp_path, orders_rows):
    """Minimal orders/customer/nation trio: one customer in one nation."""
    spark.createDataFrame(
        orders_rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 0)], "c_custkey long, c_nationkey long"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(0, "ALPHA")], "n_nationkey long, n_name string"
    ).write.parquet(str(tmp_path / "nation.parquet"))
    return str(tmp_path)


def test_theil_sen_monotone_series(spark, tmp_path):
    """12 months of exactly +10-cent monthly growth: every pairwise
    slope is 10 cents → ts_slope_ppm = 10_000_000; S = 66 (all pairs
    ascending); var_num = 12·11·29 = 3828 with no ties; the MK verdict
    is significant."""
    rows = [
        (m, 1, datetime.date(2024, m + 1, 15), 1.00 + 0.10 * m)
        for m in range(12)
    ]
    sf = _write_sales(spark, tmp_path, rows)
    [r] = P46.theil_sen_trend(spark, sf).collect()
    assert (r.nation, r.n_months, r.n_pairs) == ("ALPHA", 12, 66)
    assert r.mk_s == 66 and r.var_s_num == 12 * 11 * 29
    assert r.ts_slope_ppm == 10_000_000
    assert r.mk_significant


def test_theil_sen_flat_series_not_significant(spark, tmp_path):
    """Constant revenue: S = 0, every y tied → var_num = 0, slope 0,
    never significant."""
    rows = [(m, 1, datetime.date(2024, m + 1, 1), 5.00) for m in range(6)]
    sf = _write_sales(spark, tmp_path, rows)
    [r] = P46.theil_sen_trend(spark, sf).collect()
    assert r.mk_s == 0 and r.var_s_num == 0 and r.ts_slope_ppm == 0
    assert not r.mk_significant


def test_theil_sen_outlier_robustness(spark, tmp_path):
    """One wild month in an otherwise +10-cent series: the MEDIAN
    pairwise slope stays near 10 cents while an OLS fit would bend —
    the point of the estimator."""
    rows = [
        (m, 1, datetime.date(2024, m + 1, 15),
         (1.00 + 0.10 * m) if m != 6 else 99.0)
        for m in range(12)
    ]
    sf = _write_sales(spark, tmp_path, rows)
    [r] = P46.theil_sen_trend(spark, sf).collect()
    assert 9_000_000 <= r.ts_slope_ppm <= 11_000_000


def test_theil_sen_matches_oracle(spark, tmp_path):
    rows = [
        (m, 1, datetime.date(2024, m + 1, 3), float(3 + (m * 7) % 5))
        for m in range(10)
    ]
    sf = _write_sales(spark, tmp_path, rows)
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    got = sorted(map(tuple, P46.theil_sen_trend(spark, sf).collect()))
    want = sorted(map(tuple, con.sql(P46.THEIL_SEN_TREND_SQL).fetchall()))
    assert got == want


def test_good_turing_hand_computed(spark, tmp_path):
    """'a a b' → N=3, V=2, f1=1 (b), f2=1 (a), unseen = 1e6//3."""
    spark.createDataFrame(
        [(1, "a a b", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    [r] = P46.good_turing_unseen_mass(spark, str(tmp_path)).collect()
    assert (r.n_tokens, r.n_types, r.f1, r.f2, r.unseen_mass_ppm) == (
        3, 2, 1, 1, 333_333,
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    assert con.sql(P46.GOOD_TURING_UNSEEN_MASS_SQL).fetchall() == [
        ("s", 3, 2, 1, 1, 333_333)
    ]


def test_hits_two_iterations_hand_computed(spark, tmp_path):
    """c1→{p1,p2}, c2→{p1}: a1n = p1:1e6, p2:5e5; h1 = c1:1.5e6,
    c2:1e6 → h1n = c1:1e6, c2:666666; a2 = p1:1666666, p2:1e6."""
    spark.createDataFrame(
        [(10, 1), (11, 2)], "o_orderkey long, o_custkey long"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 100), (10, 200), (11, 100)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r.p_partkey: (r.auth_score, r.rank)
        for r in P46.hits_topk(spark, str(tmp_path)).collect()
    }
    assert out == {100: (1_666_666, 1), 200: (1_000_000, 2)}
