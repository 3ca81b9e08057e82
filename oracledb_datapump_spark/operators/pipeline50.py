"""Batch 50: retrieval-stack regression auditing.

- ``ranker_agreement_report`` — the index-regression audit between the
  engine's two sparse rankers: for every query, how many of the BM25
  top-k and TF-IDF top-k coincide (overlap@k) and how far the shared
  docs' ranks drift (L1 rank displacement). The standard pre-swap check
  before replacing one ranker with another: a sudden overlap drop on a
  new index build is a regression even when both rankers' own eval
  numbers look fine. Pure int64; rides both existing inverted indexes.

Scale posture: both ranker outputs are |queries|·k rows; the agreement
join is keyed on (query, doc) over those tiny frames. Nothing here
scales beyond the underlying searches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ranker_agreement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_doc, n_common, rank_l1): per-query agreement between the
    BM25 and TF-IDF top-k lists — n_common = |intersection| of the two
    k-doc sets, rank_l1 = Σ|rank_bm25 − rank_tfidf| over the shared
    docs (0 when the lists agree exactly on order). The query universe
    is the BM25 result's query set — identical to TF-IDF's by
    construction (both rankers query doc_id < TFIDF_N_QUERIES) — so a
    query with zero overlap still reports (0, 0).

    Plan: inner join of the two |queries|·k result frames on
    (query, doc), then a per-query aggregate; the right side
    broadcasts. Cost is bounded by the searches themselves."""
    from .sparse_text import bm25_search_topk, tfidf_search_topk

    b = bm25_search_topk(spark, sf_dir).select(
        "query_doc", "match_doc", F.col("rank").alias("rb")
    )
    t = tfidf_search_topk(spark, sf_dir).select(
        "query_doc", "match_doc", F.col("rank").alias("rt")
    )
    common = b.join(F.broadcast(t), ["query_doc", "match_doc"]).select(
        "query_doc", F.abs(F.col("rb") - F.col("rt")).alias("d")
    )
    queries = b.select("query_doc").distinct()
    agg = common.groupBy("query_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("d").cast("long").alias("rank_l1"),
    )
    return (
        queries.join(F.broadcast(agg), "query_doc", "left")
        .select(
            "query_doc",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            F.coalesce(F.col("rank_l1"), F.lit(0)).cast("long").alias("rank_l1"),
        )
        .orderBy("query_doc")
    )


def _agreement_sql() -> str:
    from .sparse_text import BM25_SEARCH_SQL, TFIDF_SEARCH_SQL

    b = BM25_SEARCH_SQL.replace("ORDER BY query_doc, rank", "")
    t = TFIDF_SEARCH_SQL.replace("ORDER BY query_doc, rank", "")
    return f"""
WITH b AS ({b}),
t AS ({t}),
common AS (
  SELECT b.query_doc, abs(b.rank - t.rank) AS d
  FROM b JOIN t ON b.query_doc = t.query_doc AND b.match_doc = t.match_doc
),
agg AS (
  SELECT query_doc, CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(d) AS BIGINT) AS rank_l1
  FROM common GROUP BY query_doc
),
queries AS (SELECT DISTINCT query_doc FROM b)
SELECT q.query_doc,
       CAST(COALESCE(a.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(a.rank_l1, 0) AS BIGINT) AS rank_l1
FROM queries q LEFT JOIN agg a USING (query_doc)
ORDER BY q.query_doc
"""


RANKER_AGREEMENT_REPORT_SQL = _agreement_sql()
