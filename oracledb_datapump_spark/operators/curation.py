"""Corpus curation: the end-to-end training-data pipeline stage, composed
from the text/dedup operators — the flagship "what this engine is for at
100 TB" query.

    documents
      → quality gate   (length/diversity heuristics, textstats)
      → language gate  (stopword-argmax lang-id)
      → near-dup drop  (MinHash-LSH candidates → exact Jaccard ≥ τ;
                        greedy survivor = lowest doc_id in each pair)
      → curated corpus

Everything stays declarative; the dedup arm reuses the LSH-bounded exact
verification (dedup.dedup_minhash_verified), so the expensive check never
runs on more than the candidate pairs. Oracle twin composes the same CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DEDUP_MINHASH_VERIFIED_SQL, dedup_minhash_verified
from .textstats import LANG_ID_SQL, QUALITY_SQL, lang_id, quality_score

MIN_QUALITY = 0.5
KEEP_LANG = "en"


def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, quality_score, lang_pred): documents that pass
    the quality gate, are predicted {KEEP_LANG}, and are not the dropped
    side of a verified near-duplicate pair."""
    q = quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lng = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    dup_losers = (
        dedup_minhash_verified(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        q.join(lng, "doc_id")
        .filter(
            (F.col("quality_score") >= MIN_QUALITY)
            & (F.col("lang_pred") == KEEP_LANG)
        )
        .join(dup_losers, "doc_id", "left_anti")
        .orderBy("doc_id")
    )


# Compose the oracle from the building-block oracles (DuckDB accepts a
# full WITH-query nested inside a CTE body).
CURATED_SQL = f"""
WITH q AS ({QUALITY_SQL}),
lng AS ({LANG_ID_SQL}),
dup AS ({DEDUP_MINHASH_VERIFIED_SQL})
SELECT q.doc_id, q.n_tokens, q.quality_score, lng.lang_pred
FROM q
JOIN lng ON q.doc_id = lng.doc_id
WHERE q.quality_score >= {MIN_QUALITY}
  AND lng.lang_pred = '{KEEP_LANG}'
  AND q.doc_id NOT IN (SELECT DISTINCT doc_b FROM dup)
ORDER BY q.doc_id
"""
