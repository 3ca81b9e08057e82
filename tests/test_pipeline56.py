"""Batch 56: unigram-LM (SentencePiece-style) EM step.

Planted-corpus property tests: a corpus built from known morphemes must
surface those morphemes as top pieces, keep every single character, and
prune monotonically (every kept multi-char piece scores >= every pruned
one). Plus the cross-engine hash check at sf0.001 (the sf0.01 check is
the driver gate's job).
"""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline56 import (
    UNI_PRUNE,
    UNI_VTOP,
    UNIGRAM_LM_EM_STEP_SQL,
    unigram_lm_em_step,
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """Corpus over two morpheme families: stems (play/help/work) ×
    suffixes (ing/ful/er), heavily repeated, plus a few rare fillers
    destined for the prune."""
    root = str(tmp_path_factory.mktemp("planted"))
    rows = []
    i = 0
    for stem in ("play", "help", "work"):
        for suf in ("ing", "ful", "er"):
            for _ in range(40):
                rows.append((i, f"{stem}{suf} {stem} the {stem}{suf}"))
                i += 1
    for filler in ("zyx", "qwv", "jkx", "xzq"):
        rows.append((i, filler))
        i += 1
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{root}/documents.parquet"
    )
    return root


def test_planted_morphemes_dominate(spark, planted_dir):
    rows = {r["piece"]: r for r in unigram_lm_em_step(spark, planted_dir).collect()}
    for m in ("play", "help", "work", "ing", "ful", "er"):
        assert m in rows and rows[m]["kept"], m
        assert rows[m]["em_count"] > 0, m
    # the stems are Viterbi-used at least as often as they appear alone
    assert rows["play"]["em_count"] >= 120  # 3 suffixes x 40 x (>=1 use)


def test_single_chars_always_kept(spark, planted_dir):
    df = unigram_lm_em_step(spark, planted_dir)
    assert df.filter("plen = 1 AND NOT kept").count() == 0
    # alphabet coverage: every char of every corpus word is a piece
    assert df.filter("plen = 1").count() >= 10


def test_prune_is_monotone_in_em_count(spark, planted_dir):
    """The bottom-p prune must be a threshold in (em_count, piece):
    min(kept multi) >= max(pruned), with the piece tie-break making the
    boundary total."""
    rows = unigram_lm_em_step(spark, planted_dir).collect()
    multi = [r for r in rows if r["plen"] > 1]
    pruned = sorted(
        (r["em_count"], r["piece"]) for r in multi if not r["kept"]
    )
    kept = sorted((r["em_count"], r["piece"]) for r in multi if r["kept"])
    if pruned and kept:
        assert kept[0] >= pruned[-1]
    assert len(pruned) == min(UNI_PRUNE, len(multi))
    assert len(multi) <= UNI_VTOP


def test_segmentation_conserves_characters(spark, planted_dir):
    """Viterbi structural invariant surfaced through the report: piece
    usage weighted by piece length reconstructs the total character
    mass of the segmented words (every char is covered exactly once)."""
    from pyspark.sql import functions as F

    df = unigram_lm_em_step(spark, planted_dir)
    piece_chars = df.agg(
        F.sum(F.col("em_count") * F.col("plen")).alias("c")
    ).collect()[0]["c"]
    d = spark.read.parquet(f"{planted_dir}/documents.parquet")
    words = F.filter(
        F.split(F.lower("text"), "[^a-z]+"),
        lambda w: (F.length(w) >= 2) & (F.length(w) <= 12),
    )
    word_chars = (
        d.select(F.explode(words).alias("w"))
        .agg(F.sum(F.length("w")).alias("c"))
        .collect()[0]["c"]
    )
    assert piece_chars == word_chars


def test_cross_engine_hash_sf0001(spark, sf_dir):
    sdf = unigram_lm_em_step(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ddf = con.sql(UNIGRAM_LM_EM_STEP_SQL).df()
    con.close()
    key = ["em_count", "piece"]
    s = sdf.sort_values(key, ascending=[False, True]).reset_index(drop=True)
    d = (
        ddf.sort_values(key, ascending=[False, True])
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)
