"""Batch 55: duplicated-span masking plan — overlap-exact coverage."""

import duckdb

from oracledb_datapump_spark.operators import pipeline44 as P44
from oracledb_datapump_spark.operators import pipeline55 as P55


def write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_mask_plan_counts_exact_coverage(spark, tmp_path):
    """Two docs share a 15-token passage (K=8): each doc's maskable
    token count is exactly 15 — overlapping gram windows must not
    double-count. A doc shorter than one gram counts in totals but can
    never be affected."""
    passage = " ".join(f"p{i}" for i in range(15))
    rows = [
        (1, "ctx1 ctx2 " + passage + " tail1", "en", "srcA", 1),
        (2, passage + " other1 other2", "en", "srcB", 1),
        (3, "tiny doc", "en", "srcC", 1),
    ]
    sf = write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in
           P55.duplicated_span_mask_plan(spark, sf).collect()}
    assert out["srcA"].tokens_maskable == 15
    assert out["srcB"].tokens_maskable == 15
    assert out["srcA"].n_docs_affected == 1
    assert out["srcC"].tokens_total == 2
    assert out["srcC"].tokens_maskable == 0 and out["srcC"].maskable_ppm == 0
    # ppm check: srcB doc has 17 tokens, 15 maskable
    assert out["srcB"].maskable_ppm == 15 * 1_000_000 // 17


def test_mask_plan_two_overlapping_passages(spark, tmp_path):
    """Two duplicated passages whose token ranges overlap inside one
    doc: union coverage, not the sum of span lengths."""
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    # doc 1 holds a then b ADJACENT (their K-gram windows overlap at
    # the seam); docs 2/3 duplicate a and b separately
    rows = [
        (1, a + " " + b, "en", "s1", 1),
        (2, a + " xxx1 xxx2 xxx3", "en", "s2", 1),
        (3, "yyy1 yyy2 yyy3 " + b, "en", "s3", 1),
    ]
    sf = write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in
           P55.duplicated_span_mask_plan(spark, sf).collect()}
    # doc 1 has 20 tokens; only grams fully inside a or b repeat
    # elsewhere, but every one of the 20 tokens sits inside such a gram
    # or not — coverage is bounded by the doc length and must never
    # exceed it (the double-count guard)
    assert out["s1"].tokens_maskable <= out["s1"].tokens_total == 20


def test_mask_plan_matches_oracle(spark, tmp_path):
    passage = " ".join(f"q{i}" for i in range(20))
    rows = [
        (1, "lead " + passage, "en", "a", 1),
        (2, passage + " trail", "en", "b", 1),
        (3, " ".join(f"n{i}" for i in range(25)), "en", "c", 1),
    ]
    sf = write_docs(spark, tmp_path, rows)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    got = sorted(map(tuple, P55.duplicated_span_mask_plan(spark, sf).collect()))
    want = sorted(map(tuple, con.sql(P55.DUPLICATED_SPAN_MASK_PLAN_SQL).fetchall()))
    assert got == want
