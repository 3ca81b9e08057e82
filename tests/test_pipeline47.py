"""Batch 47: TextRank keywords, Flesch–Kincaid readability, Church–Gale
burstiness — hand-computable planted fixtures + DuckDB oracle matches."""

import duckdb

from oracledb_datapump_spark.operators import pipeline47 as P47


def write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def oracle(sf_dir, sql):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con.sql(sql).fetchall()


def test_textrank_symmetric_two_node_graph(spark, tmp_path):
    """'alpha beta alpha': the 2-node symmetric graph converges to the
    fixed point pr = 150000 + 85% of a full handoff = 1_000_000 for
    both nodes; ranks break alphabetically."""
    sf = write_docs(spark, tmp_path, [(1, "alpha beta alpha", "en", "s", 1)])
    out = [(r.tok, r.pr_score, r.rank) for r in
           P47.textrank_keywords(spark, sf).collect()]
    assert out == [("alpha", 1_000_000, 1), ("beta", 1_000_000, 2)]
    assert [tuple(r) for r in oracle(sf, P47.TEXTRANK_KEYWORDS_SQL)] == out


def test_textrank_hub_outranks_leaf(spark, tmp_path):
    """A hub co-occurring with three leaves accumulates more rank than
    any single leaf."""
    sf = write_docs(
        spark,
        tmp_path,
        [(1, "hub leafone hub leaftwo hub leafthree", "en", "s", 1)],
    )
    scores = {r.tok: r.pr_score for r in
              P47.textrank_keywords(spark, sf).collect()}
    assert scores["hub"] > max(
        scores["leafone"], scores["leaftwo"], scores["leafthree"]
    )
    got = sorted(map(tuple, P47.textrank_keywords(spark, sf).collect()))
    want = sorted(map(tuple, oracle(sf, P47.TEXTRANK_KEYWORDS_SQL)))
    assert got == want


def test_textrank_short_tokens_excluded(spark, tmp_path):
    """Tokens under 3 chars never enter the graph."""
    sf = write_docs(spark, tmp_path, [(1, "to be alpha beta to", "en", "s", 1)])
    toks = {r.tok for r in P47.textrank_keywords(spark, sf).collect()}
    assert toks == {"alpha", "beta"}


def test_readability_hand_computed(spark, tmp_path):
    """'the cat sat. the mat!': 5 words, 2 sentences, 5 vowel groups →
    raw milligrade is negative → clamped to 0."""
    sf = write_docs(spark, tmp_path, [(1, "the cat sat. the mat!", "en", "s", 1)])
    [r] = P47.readability_report(spark, sf).collect()
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 5)
    assert r.fkgl_milli == 0
    assert [tuple(x) for x in oracle(sf, P47.READABILITY_REPORT_SQL)] == [
        ("s", 1, 5, 2, 5, 0)
    ]


def test_readability_long_sentences_raise_grade(spark, tmp_path):
    """One 30-word sentence reads at a much higher grade than the same
    words split into 10 sentences."""
    words = " ".join(f"wa{i}" for i in range(30))
    long_s = words + "."
    short_s = ". ".join(" ".join(f"wb{i+j}" for j in range(3)) for i in range(0, 30, 3)) + "."
    sf = write_docs(
        spark,
        tmp_path,
        [(1, long_s, "en", "long", 1), (2, short_s, "en", "short", 1)],
    )
    out = {r.source: r.fkgl_milli for r in
           P47.readability_report(spark, sf).collect()}
    assert out["long"] > out["short"]


def test_burstiness_bursty_vs_uniform(spark, tmp_path):
    """'zzz' appears 9× in one doc of three (bursty); 'uni' once in
    every doc (uniform). VMR: zzz = (3·81−81)·1e6 // (3·9) = 6e6;
    uni = (3·3−9)·1e6 // 9 = 0."""
    rows = [
        (1, "uni " + " ".join(["zzz"] * 9), "en", "s", 1),
        (2, "uni filler", "en", "s", 1),
        (3, "uni other", "en", "s", 1),
    ]
    sf = write_docs(spark, tmp_path, rows)
    out = {r.tok: (r.total, r.n_docs_with, r.vmr_ppm) for r in
           P47.burstiness_report(spark, sf).collect()}
    assert out["zzz"] == (9, 1, 6_000_000)
    assert out["uni"] == (3, 3, 0)
    duck = {t: (a, b, c) for t, a, b, c in oracle(sf, P47.BURSTINESS_REPORT_SQL)}
    assert duck == out
