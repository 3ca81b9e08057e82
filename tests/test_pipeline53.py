"""Batch 53: winnowing parameter planner — analytic columns exact,
empirical columns consistent with the production W=8 pass."""

import duckdb

from oracledb_datapump_spark.operators import pipeline27 as P27
from oracledb_datapump_spark.operators import pipeline53 as P53


def write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_planner_analytic_columns_and_monotonicity(spark, tmp_path):
    """Two docs sharing a long passage: guarantee/density columns are
    the closed forms; a larger W keeps fewer fingerprints."""
    shared = "the quick brown fox jumps over the lazy dog " * 6
    sf = write_docs(
        spark,
        tmp_path,
        [
            (1, shared + "alpha tail one", "en", "a", 1),
            (2, "beta head two " + shared, "en", "b", 1),
        ],
    )
    rows = {r.w: r for r in P53.winnow_param_planner(spark, sf).collect()}
    assert set(rows) == {4, 8, 16}
    for w, r in rows.items():
        assert r.guarantee_len == P27.WINNOW_K + w - 1
        assert r.density_ppm == 2_000_000 // (w + 1)
    assert rows[4].n_fps > rows[8].n_fps > rows[16].n_fps
    # the shared passage is far longer than every guarantee length, so
    # the planted pair must survive at every W
    assert all(r.n_pairs >= 1 for r in rows.values())


def test_planner_w8_row_equals_production_pass(spark, tmp_path):
    """The W=8 sweep arm must reproduce the production
    winnowing_fingerprint_pairs count exactly."""
    shared = " ".join(f"tok{i % 9} common body" for i in range(40))
    sf = write_docs(
        spark,
        tmp_path,
        [
            (1, shared + " one", "en", "a", 1),
            (2, shared + " two", "en", "b", 1),
            (3, " ".join(f"uniq{i}" for i in range(60)), "en", "c", 1),
        ],
    )
    [w8] = [r for r in P53.winnow_param_planner(spark, sf).collect() if r.w == 8]
    prod = P27.winnowing_fingerprint_pairs(spark, sf).count()
    assert w8.n_pairs == prod


def test_planner_matches_oracle(spark, tmp_path):
    sf = write_docs(
        spark,
        tmp_path,
        [(i, f"document body number {i} with shared trailing words", "en", "s", 1)
         for i in range(6)],
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    got = sorted(map(tuple, P53.winnow_param_planner(spark, sf).collect()))
    want = sorted(map(tuple, con.sql(P53.WINNOW_PARAM_PLANNER_SQL).fetchall()))
    assert got == want
