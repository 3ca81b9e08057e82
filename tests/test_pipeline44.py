"""Batch 44: repeated-span (substring-level) dedup — the Lee et al. 2022
modality (exact substring dedup beats doc-level) in its bounded Spark
form: identical word k-grams grouped corpus-wide, duplicated positions
stitched into maximal spans per doc via gaps-and-islands."""

import pytest

from oracledb_datapump_spark.operators import pipeline44 as PL44


@pytest.fixture()
def planted(spark, tmp_path):
    """Two docs from different sources sharing one EXACT 15-token
    passage, plus an unrelated doc — nothing else repeats."""
    passage = " ".join(f"p{i}" for i in range(15))
    rows = [
        ("d1", "aaa1 aaa2 aaa3 " + passage + " zzz1 zzz2", "en", "srcA", 0),
        ("d2", "bbb1 bbb2 " + passage + " yyy1", "en", "srcB", 0),
        ("d3", " ".join(f"c{i}" for i in range(30)), "en", "srcC", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_planted_duplicate_passage(spark, planted):
    out = PL44.duplicated_spans_report(spark, planted).collect()
    # exactly one span per doc, each exactly the planted 15 tokens long
    hist = {r.k1: r.cnt for r in out if r.section == "span_hist"}
    assert hist == {"15": 2}
    # the offending pair shares exactly 15-8+1 = 8 distinct grams
    pairs = [(r.k1, r.k2, r.cnt) for r in out if r.section == "source_pair"]
    assert pairs == [("srcA", "srcB", 8)]


def test_planted_matches_duckdb_oracle(spark, planted):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted}/documents.parquet/*.parquet')"
    )
    want = con.sql(PL44.DUPLICATED_SPANS_SQL).fetchall()
    got = [
        (r.section, r.k1, r.k2, r.cnt)
        for r in PL44.duplicated_spans_report(spark, planted).collect()
    ]
    assert sorted(got) == sorted((s, a, b, c) for s, a, b, c in want)


def test_boundary_grams_stay_unique(spark, tmp_path):
    """Grams straddling the passage boundary mix in per-doc context and
    must NOT extend the span: a 20-token shared passage yields spans of
    exactly 20, never 20+context."""
    passage = " ".join(f"q{i}" for i in range(20))
    rows = [
        ("a", "left1 left2 " + passage + " right1 right2", "en", "s1", 0),
        ("b", "other1 " + passage + " other2", "en", "s2", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = PL44.duplicated_spans_report(spark, str(tmp_path)).collect()
    hist = {r.k1: r.cnt for r in out if r.section == "span_hist"}
    assert hist == {"20": 2}


def test_short_docs_skipped(spark, tmp_path):
    rows = [
        ("a", "one two three", "en", "s1", 0),  # < K tokens: no grams
        ("b", "one two three", "en", "s2", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    assert PL44.duplicated_spans_report(spark, str(tmp_path)).count() == 0


def test_semantic_dedup_report_consistency(spark, sf_dir):
    from oracledb_datapump_spark.operators import clustering as C

    out = PL44.semantic_dedup_report(spark, sf_dir).collect()
    sections = {r.section for r in out}
    assert sections == {"agreement", "source_yield"}
    # yields cover every doc exactly once
    docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n1 for r in out if r.section == "source_yield") == docs_total
    # pruned docs = distinct greater side of the semantic pair set
    sem = C.dedup_semantic(spark, sf_dir)
    want_pruned = sem.select("vec_b").distinct().count()
    assert sum(r.n2 for r in out if r.section == "source_yield") == want_pruned
    # agreement total = union of both pair sets
    agree = {r.k: r.n1 for r in out if r.section == "agreement"}
    n_sem = sem.count()
    both = agree.get("both", 0)
    assert both + agree.get("semantic_only", 0) == n_sem
    assert all(v >= 0 for v in agree.values())


def test_semantic_dedup_report_oracle_sf0001(spark):
    from oracledb_datapump_spark.oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    r = compare(
        PL44.semantic_dedup_report(spark, sf),
        duckdb_con(sf),
        PL44.SEMANTIC_DEDUP_REPORT_SQL,
        "semantic_dedup_report",
    )
    assert r["values_match"], r
