"""Batch 52: Chao1/Simpson richness + Kish design effect — hand-derived
fixtures and DuckDB oracle matches."""

import duckdb

from oracledb_datapump_spark.operators import pipeline52 as P52


def write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def oracle(sf, sql):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    return con.sql(sql).fetchall()


def test_chao1_and_simpson_hand_computed(spark, tmp_path):
    """'a a b c': N=4, V=3, f1=2 (b,c), f2=1 (a) →
    chao1 = 3 + 4//2 = 5; simpson = 2·1e6 // 12 = 166666."""
    sf = write_docs(spark, tmp_path, [(1, "a a b c", "en", "s", 7)])
    [r] = P52.vocab_richness_report(spark, sf).collect()
    assert (r.n_tokens, r.n_types, r.chao1_types, r.simpson_ppm) == (
        4, 3, 5, 166_666,
    )
    assert oracle(sf, P52.VOCAB_RICHNESS_REPORT_SQL) == [("s", 4, 3, 5, 166_666)]


def test_chao1_bias_corrected_when_no_doubletons(spark, tmp_path):
    """All singletons: f2=0 → chao1 = V + f1(f1−1)//2."""
    sf = write_docs(spark, tmp_path, [(1, "p q r", "en", "s", 5)])
    [r] = P52.vocab_richness_report(spark, sf).collect()
    assert r.chao1_types == 3 + 3 * 2 // 2  # V=f1=3


def test_kish_equal_weights_is_self_weighting(spark, tmp_path):
    """Equal weights: DEFF = 1e6 exactly, n_eff = n."""
    sf = write_docs(
        spark, tmp_path, [(i, "x", "en", "eq", 50) for i in range(8)]
    )
    [r] = P52.kish_design_effect(spark, sf).collect()
    assert (r.n_docs, r.deff_ppm, r.n_eff) == (8, 1_000_000, 8)


def test_kish_skewed_weights_lose_power(spark, tmp_path):
    """One giant doc among nine small: DEFF well above 1, n_eff ≪ n;
    and both engines agree."""
    rows = [(0, "x", "en", "sk", 10_000)] + [
        (i, "x", "en", "sk", 10) for i in range(1, 10)
    ]
    sf = write_docs(spark, tmp_path, rows)
    [r] = P52.kish_design_effect(spark, sf).collect()
    assert r.deff_ppm > 5_000_000  # lost >80% of effective n
    assert r.n_eff <= 2
    assert oracle(sf, P52.KISH_DESIGN_EFFECT_SQL) == [tuple(r)]
