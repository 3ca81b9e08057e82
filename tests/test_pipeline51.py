"""Batch 51: multi-method dedup governance — recall/precision table and
Fleiss' kappa across the fingerprint raters."""

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline51 as P51


@pytest.fixture()
def docs(spark, tmp_path):
    """Three exact-duplicate pairs plus noise docs: every method should
    find the planted dups (recall high), and the raters should agree."""
    dup1 = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    dup2 = " ".join(f"delta{i} epsi{i} zeta{i}" for i in range(12))
    dup3 = " ".join(f"eta{i} theta{i} iota{i}" for i in range(12))
    rows = [
        (1, dup1, "en", "a", 1), (2, dup1, "en", "b", 1),
        (3, dup2, "en", "a", 1), (4, dup2, "en", "b", 1),
        (5, dup3, "en", "a", 1), (6, dup3, "en", "b", 1),
        (7, " ".join(f"solo{i}" for i in range(30)), "en", "c", 1),
        (8, " ".join(f"uniq{i}" for i in range(30)), "en", "c", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_recall_report_exact_methods_are_perfect(spark, docs):
    out = {r.method: r for r in
           P51.dedup_method_recall_report(spark, docs).collect()}
    assert set(out) == {
        "containment", "minhash_verified", "prefix_filter", "simhash",
        "winnowing",
    }
    # truth = the 3 planted identical pairs; the exact-at-threshold
    # methods must find all of them with nothing spurious
    for m in ("minhash_verified", "prefix_filter"):
        assert out[m].n_truth_hits == 3
        assert out[m].recall_ppm == 1_000_000
    # identical docs have hamming 0 and shared fingerprints everywhere
    assert out["simhash"].n_truth_hits == 3
    assert out["winnowing"].n_truth_hits == 3


def test_recall_report_matches_oracle(spark, docs):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs}/documents.parquet/*.parquet')"
    )
    got = sorted(map(tuple, P51.dedup_method_recall_report(spark, docs).collect()))
    want = sorted(map(tuple, con.sql(P51.DEDUP_METHOD_RECALL_SQL).fetchall()))
    assert got == want


def test_kappa_unanimous_is_one(spark, docs):
    """If the union universe is exactly the 3 planted pairs and all
    three raters vote dup on each, kappa = 1e6 (the unanimity branch).
    With band-level noise the score drops below 1e6 but the vote and
    agreement sums stay consistent: sa <= 6*n and t <= 3*n."""
    [r] = P51.dedup_rater_kappa(spark, docs).collect()
    assert r.n_pairs >= 3
    assert r.dup_votes <= 3 * r.n_pairs
    assert r.sum_agree <= 6 * r.n_pairs
    assert -1_000_000 <= r.kappa_ppm <= 1_000_000
    if r.n_pairs == 3 and r.dup_votes == 9:
        assert r.kappa_ppm == 1_000_000
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs}/documents.parquet/*.parquet')"
    )
    assert con.sql(P51.DEDUP_RATER_KAPPA_SQL).fetchall() == [tuple(r)]
