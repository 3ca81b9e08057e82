"""Pipeline-evaluation operators: score the engine's own classifiers
and filters against the ground truth the fixtures carry.

A production training-data pipeline doesn't just run lang-ID, k-means,
and dedup — it continuously evaluates them (drift dashboards, per-source
yield reports). These operators close that loop over the same tables:

- ``lang_id_confusion``: predicted vs actual language confusion matrix
  (``documents.lang`` is the generator's ground truth).
- ``cluster_label_purity``: k-means cluster purity against
  ``embeddings.label`` — the standard external clustering metric.
- ``dedup_rate_by_source``: per-source near-duplicate loser rates — the
  per-provider yield report that decides which sources get re-crawled.

All integer/exact arithmetic (purity and rates in ppm via integer DIV)
so the cross-engine hash gate applies. Each is one or two small
aggregations over operators audited elsewhere; nothing here adds a
shuffle heavier than |clusters| or |sources| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .clustering import KMEANS_SQL, kmeans_assign
from .dedup import DEDUP_MINHASH_VERIFIED_SQL, verified_pairs_cached
from .textstats import LANG_ID_SQL, lang_id


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang_actual, lang_pred, n_docs): confusion matrix of the
    stopword-argmax language classifier against the fixture's ground
    truth. One broadcast-sized groupBy — |langs|² rows out of the
    shuffle regardless of corpus size."""
    from .curation import _shared_docs

    base = _shared_docs(spark, sf_dir)
    d = base.select("doc_id", F.col("lang").alias("lang_actual"))
    pred = lang_id(spark, sf_dir, docs=base).select("doc_id", "lang_pred")
    return (
        d.join(pred, "doc_id")
        .groupBy("lang_actual", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_actual", "lang_pred")
    )


LANG_ID_CONFUSION_SQL = (
    "WITH pred AS ("
    + LANG_ID_SQL.replace("ORDER BY doc_id", "")
    + """)
SELECT d.lang AS lang_actual, p.lang_pred, COUNT(*) AS n_docs
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""
)


def cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster, n_members, majority_label, n_majority, purity_ppm):
    external-validity check of the k-means assignment against the
    fixture's ``label`` column. purity_ppm = (n_majority * 1e6) DIV
    n_members — integer, hash-stable. Ties on the majority label break
    to the smaller label id (deterministic).

    Plan: one groupBy(cluster,label) (≤ K·|labels| rows shuffle), one
    window max per cluster — model-evaluation cost is independent of
    corpus size."""
    a = kmeans_assign(spark, sf_dir).select("vec_id", "cluster")
    from .emb_source import load_embeddings

    e = load_embeddings(spark, sf_dir).select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    by_label = (
        a.join(e, "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("cluster").orderBy(F.desc("n"), "label")
    return (
        by_label.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.sum("n").over(W.partitionBy("cluster")))
        .filter(F.col("rk") == 1)
        .select(
            "cluster",
            "n_members",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
            F.expr("(n * 1000000) DIV n_members").alias("purity_ppm"),
        )
        .orderBy("cluster")
    )


CLUSTER_LABEL_PURITY_SQL = (
    "WITH assign AS ("
    + KMEANS_SQL.replace("ORDER BY vec_id", "")
    + """),
by_label AS (
  SELECT a.cluster, CAST(e.label AS BIGINT) AS label, COUNT(*) AS n
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT cluster, label, n,
         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rk,
         SUM(n) OVER (PARTITION BY cluster) AS n_members
  FROM by_label
)
SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
       label AS majority_label, n AS n_majority,
       CAST((n * 1000000) // n_members AS BIGINT) AS purity_ppm
FROM ranked WHERE rk = 1
ORDER BY cluster
"""
)


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_dup_losers, dup_ppm): per-source share of
    documents dropped as the losing side of an LSH-verified near-dup
    pair — the per-provider yield report. The loser set is
    candidate-bounded (LSH) and the per-source rollup shuffles
    |sources| rows."""
    from .curation import _shared_docs

    base = _shared_docs(spark, sf_dir)
    d = base.select("doc_id", "source")
    losers = (
        # base is the FULL corpus (persisted, not filtered), so the
        # driver-memoized default-docs pair list is semantically
        # identical — riding it removes the whole LSH+verify arm from
        # this plan (r6: ~1-2s/query at sf0.1, one fewer corpus pass)
        verified_pairs_cached(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_loser", F.lit(1))
    )
    return (
        d.join(losers, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_loser", F.lit(0))).alias("n_dup_losers"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_losers",
            F.expr("(n_dup_losers * 1000000) DIV n_docs").alias("dup_ppm"),
        )
        .orderBy("source")
    )


DEDUP_RATE_BY_SOURCE_SQL = (
    "WITH dup AS ("
    + DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    + """),
losers AS (SELECT DISTINCT doc_b AS doc_id FROM dup)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_losers,
       CAST((SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS dup_ppm
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
GROUP BY d.source
ORDER BY d.source
"""
)


def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_hits, recall_ppm): recall@{TOP_K} of the multi-probe
    LSH top-k (the 100 TB scale path) against the exact brute-force
    baseline, per query — THE metric that justifies shipping an
    approximate index. recall_ppm = (|lsh ∩ brute| * 1e6) DIV TOP_K,
    integer arithmetic under the hash gate.

    Plan: both sides bound their own cost (brute is the N_QUERIES-row
    broadcast baseline, LSH is bucket-joined); the recall join itself is
    on (query_id, neighbor_id) — N_QUERIES·TOP_K rows, driver-trivial at
    any corpus size."""
    from .similarity import TOP_K, ann_bruteforce_topk, ann_lsh_topk

    brute = ann_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = ann_lsh_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"(n_hits * 1000000) DIV {TOP_K}").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


def _ann_lsh_recall_sql() -> str:
    from .similarity import ANN_BRUTEFORCE_SQL, ANN_LSH_SQL, TOP_K

    brute = ANN_BRUTEFORCE_SQL.replace("ORDER BY query_id, rank", "")
    lsh = ANN_LSH_SQL.replace("ORDER BY query_id, rank", "")
    return f"""
WITH brute_full AS ({brute}),
lsh_full AS ({lsh})
SELECT b.query_id,
       CAST(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST((SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // {TOP_K} AS BIGINT) AS recall_ppm
FROM brute_full b
LEFT JOIN lsh_full l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id
"""


ANN_LSH_RECALL_SQL = _ann_lsh_recall_sql()


N_SHARDS = 16


def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bpe_ish_tokens, shard): balanced write-shard assignment
    for a training-data export — docs ranked by token count descending
    are dealt round-robin across {N_SHARDS} shards (LPT-style: the
    greedy longest-processing-time heuristic's distributed cousin; with
    round-robin over a sorted stream, shard totals differ by at most
    one max-document). This is how a 100 TB corpus export plans its
    output files so no trainer data-loader shard straggles.

    Plan: token counting is row-local; the global rank is computed
    DISTRIBUTED by functions.global_order.with_global_order_stat (range
    partition on the sort tuple + per-partition prefix offsets — the
    shared helper pack_plan and curriculum_order also use), bit-identical
    to the single-partition window Spark warns about. The sort cost
    class matches any EXPORT_SORT_BY layout pass."""
    from .textstats import token_count
    from ..functions.global_order import with_global_order_stat

    t = token_count(spark, sf_dir).select("doc_id", "bpe_ish_tokens")
    ranked, _ = with_global_order_stat(
        t, [F.desc("bpe_ish_tokens"), F.asc("doc_id")], out="rk"
    )
    return (
        ranked.select(
            "doc_id",
            "bpe_ish_tokens",
            ((F.col("rk") - 1) % N_SHARDS).cast("long").alias("shard"),
        )
        .orderBy("doc_id")
    )


def _corpus_shard_plan_sql() -> str:
    from .textstats import BPE_ISH_RE

    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{BPE_ISH_RE}'))
           AS bpe_ish_tokens
  FROM documents
)
SELECT doc_id, bpe_ish_tokens,
       CAST((ROW_NUMBER() OVER (ORDER BY bpe_ish_tokens DESC, doc_id) - 1)
            % {N_SHARDS} AS BIGINT) AS shard
FROM t
ORDER BY doc_id
"""


CORPUS_SHARD_PLAN_SQL = _corpus_shard_plan_sql()


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, n_tokens_chunk, chunk_md5):
    fixed-window document chunking — {CHUNK_TOKENS}-token windows at
    stride {CHUNK_STRIDE} (overlapping context the way an embedding /
    pretraining packer slices long documents). The chunk text travels
    as an md5 so the hash gate pins content, not just counts; zero-token
    documents emit no chunks.

    Plan: entirely row-local (token split, window starts via sequence,
    per-chunk slice+md5, one explode) — an embarrassingly parallel map
    over the corpus scan with no shuffle at all; output order is the
    deterministic (doc_id, chunk_idx). Single-arm op, so it reads a
    plain pruned scan (doc_id+text reach the parquet reader) rather
    than the multi-arm shared cache."""
    from .docs_source import load_docs
    from ..functions.text import tokens

    d = load_docs(spark, sf_dir)
    wt = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    starts = F.sequence(
        F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE)
    )
    chunk = F.slice(F.col("toks"), F.col("s") + 1, CHUNK_TOKENS)
    return (
        wt.select("doc_id", "toks", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.expr(f"s DIV {CHUNK_STRIDE}").alias("chunk_idx"),
            F.col("s").cast("long").alias("chunk_start"),
            F.least(
                F.lit(CHUNK_TOKENS), F.size("toks") - F.col("s")
            ).cast("long").alias("n_tokens_chunk"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def _doc_chunks_sql() -> str:
    from ..functions.text import TOKEN_SPLIT_RE

    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                     x -> x != '') AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS s
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(least({CHUNK_TOKENS}, len(toks) - s) AS BIGINT) AS n_tokens_chunk,
       md5(array_to_string(list_slice(toks, s + 1, s + {CHUNK_TOKENS}), ' '))
         AS chunk_md5
FROM starts
ORDER BY doc_id, chunk_idx
"""


DOC_CHUNKS_SQL = _doc_chunks_sql()


def source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, total_bpe_tokens, share_ppm): the per-provider
    token-budget table a pretraining mix is planned from (how many
    tokens each source contributes and its integer-ppm share of the
    corpus). One row-local token count + one |sources|-row aggregate +
    a broadcast one-row total."""
    from .docs_source import load_docs
    from .textstats import BPE_ISH_RE

    d = load_docs(spark, sf_dir).select(
        "source",
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{BPE_ISH_RE}', 0)")
        ).alias("toks"),
    )
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("total_bpe_tokens"),
    )
    total = per_source.agg(F.sum("total_bpe_tokens").alias("grand"))
    return (
        per_source.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "total_bpe_tokens",
            F.expr("(total_bpe_tokens * 1000000) DIV grand").alias("share_ppm"),
        )
        .orderBy("source")
    )


def _source_token_budget_sql() -> str:
    from .textstats import BPE_ISH_RE

    return f"""
WITH t AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '{BPE_ISH_RE}')) AS toks
  FROM documents
),
per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(toks) AS BIGINT) AS total_bpe_tokens
  FROM t GROUP BY source
),
tot AS (SELECT CAST(SUM(total_bpe_tokens) AS BIGINT) AS grand FROM per_source)
SELECT source, n_docs, total_bpe_tokens,
       CAST((total_bpe_tokens * 1000000) // grand AS BIGINT) AS share_ppm
FROM per_source, tot
ORDER BY source
"""


SOURCE_TOKEN_BUDGET_SQL = _source_token_budget_sql()


def dedup_group_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_size, n_groups, n_docs): distribution of near-duplicate
    cluster sizes from the connected-component labeling — the audit
    curve that says how much of the corpus is singleton vs heavily
    duplicated (the shape SemDeDup/MinHash papers report). Tiny
    aggregate over dedup_groups' output."""
    from .dedup import dedup_groups

    g = dedup_groups(spark, sf_dir).select("group_id", "group_size").distinct()
    return (
        g.groupBy("group_size")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            "group_size",
            "n_groups",
            (F.col("group_size") * F.col("n_groups")).alias("n_docs"),
        )
        .orderBy("group_size")
    )


def _dedup_group_hist_sql() -> str:
    from .dedup import DEDUP_GROUPS_SQL

    base = DEDUP_GROUPS_SQL.replace("ORDER BY c.doc_id", "")
    return f"""
WITH labeled AS ({base}),
groups AS (SELECT DISTINCT group_id, group_size FROM labeled)
SELECT group_size, COUNT(*) AS n_groups,
       CAST(group_size * COUNT(*) AS BIGINT) AS n_docs
FROM groups
GROUP BY group_size
ORDER BY group_size
"""


DEDUP_GROUP_HIST_SQL = _dedup_group_hist_sql()


SKEW_TOPK = 20


def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_suppkey, n_rows, share_ppm, cum_share_ppm): the top-{SKEW_TOPK}
    heaviest lineitem join keys with their integer-ppm corpus share and
    cumulative share — the diagnostic that decides whether a join needs
    salting or AQE skew handling (SCALE.md's skew lever, quantified).
    One partial-aggregated groupBy (|keys| rows shuffle) + a top-k sort
    over the aggregate."""
    counts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = counts.agg(F.sum("n_rows").alias("grand"))
    w = W.orderBy(F.desc("n_rows"), "l_suppkey")
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share_ppm", F.expr("(n_rows * 1000000) DIV grand"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SKEW_TOPK)
        .withColumn(
            "cum_share_ppm",
            F.sum("share_ppm").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .select("l_suppkey", "n_rows", "share_ppm", "cum_share_ppm")
        .orderBy("l_suppkey")
    )


JOIN_KEY_SKEW_SQL = f"""
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_suppkey
),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS grand FROM counts),
ranked AS (
  SELECT l_suppkey, n_rows,
         CAST((n_rows * 1000000) // grand AS BIGINT) AS share_ppm,
         ROW_NUMBER() OVER (ORDER BY n_rows DESC, l_suppkey) AS rk
  FROM counts, tot
)
SELECT l_suppkey, n_rows, share_ppm,
       CAST(SUM(share_ppm) OVER (ORDER BY rk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_share_ppm
FROM ranked WHERE rk <= {SKEW_TOPK}
ORDER BY l_suppkey
"""


# ---------------------------------------------------------------------------
# sequence packing: fixed-token-budget training packs
# ---------------------------------------------------------------------------

PACK_BUDGET = 2048


def pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bpe_ish_tokens, pack_id, pack_offset): the standard
    pretraining sequence packer — documents are concatenated in stable
    doc_id order and split into fixed {PACK_BUDGET}-token packs, docs
    spanning pack boundaries (GPT-style packing, no padding waste).
    pack_id is the pack the document STARTS in; pack_offset its token
    offset within that pack. A trainer data loader uses exactly this
    plan to build fixed-length examples from a 100 TB corpus.

    Plan: token counting is row-local. The global running token sum is
    computed DISTRIBUTED by functions.global_order.with_global_order_stat
    (range partition on doc_id + per-partition token-total prefix
    offsets — prefix sums of SUMS rather than counts), bit-identical to
    the single-partition SUM() OVER (ORDER BY doc_id) window. All
    arithmetic is integral → cross-engine hash-exact.
    """
    from .textstats import token_count
    from ..functions.global_order import with_global_order_stat

    t = token_count(spark, sf_dir).select("doc_id", "bpe_ish_tokens")
    cum, _ = with_global_order_stat(
        t, [F.asc("doc_id")], cumsum_col="bpe_ish_tokens", out="cum"
    )
    return (
        cum.withColumn("start", F.col("cum") - F.col("bpe_ish_tokens"))
        .select(
            "doc_id",
            F.col("bpe_ish_tokens").cast("long").alias("bpe_ish_tokens"),
            F.expr(f"start DIV {PACK_BUDGET}").cast("long").alias("pack_id"),
            (F.col("start") % PACK_BUDGET).cast("long").alias("pack_offset"),
        )
        .orderBy("doc_id")
    )


def _pack_plan_sql() -> str:
    from .textstats import BPE_ISH_RE

    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{BPE_ISH_RE}'))
           AS bpe_ish_tokens
  FROM documents
), c AS (
  SELECT doc_id, bpe_ish_tokens,
         SUM(bpe_ish_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - bpe_ish_tokens AS start
  FROM t
)
SELECT doc_id, CAST(bpe_ish_tokens AS BIGINT) AS bpe_ish_tokens,
       CAST(start // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(start % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM c
ORDER BY doc_id
"""


PACK_PLAN_SQL = _pack_plan_sql()


# ---------------------------------------------------------------------------
# curriculum ordering: difficulty-banded training order
# ---------------------------------------------------------------------------

CURRICULUM_BANDS = 4


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bpe_ish_tokens, band, curriculum_pos): a deterministic
    curriculum-learning training order — documents sorted easy→hard
    (token count ascending as the difficulty proxy, doc_id tiebreak),
    split into {CURRICULUM_BANDS} NTILE bands a scheduler feeds in
    sequence, with the exact global position each document occupies.

    Plan: the global rank comes from the shared distributed-order helper
    (range partition + prefix offsets); the NTILE band is then pure
    arithmetic because the helper also returns the driver-known total
    row count — functions.global_order.exact_ntile reproduces the ANSI
    NTILE remainder rule bit-for-bit, so the DuckDB NTILE oracle
    hash-matches without any single-partition window on either side."""
    from .textstats import token_count
    from ..functions.global_order import exact_ntile, with_global_order_stat

    t = token_count(spark, sf_dir).select("doc_id", "bpe_ish_tokens")
    ranked, n_rows = with_global_order_stat(
        t, [F.asc("bpe_ish_tokens"), F.asc("doc_id")], out="curriculum_pos"
    )
    return (
        ranked.select(
            "doc_id",
            F.col("bpe_ish_tokens").cast("long").alias("bpe_ish_tokens"),
            exact_ntile(F.col("curriculum_pos"), n_rows, CURRICULUM_BANDS).alias(
                "band"
            ),
            "curriculum_pos",
        )
        .orderBy("doc_id")
    )


def _curriculum_order_sql() -> str:
    from .textstats import BPE_ISH_RE

    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{BPE_ISH_RE}'))
           AS bpe_ish_tokens
  FROM documents
)
SELECT doc_id, CAST(bpe_ish_tokens AS BIGINT) AS bpe_ish_tokens,
       CAST(NTILE({CURRICULUM_BANDS}) OVER (ORDER BY bpe_ish_tokens, doc_id)
            AS BIGINT) AS band,
       CAST(ROW_NUMBER() OVER (ORDER BY bpe_ish_tokens, doc_id) AS BIGINT)
         AS curriculum_pos
FROM t
ORDER BY doc_id
"""


CURRICULUM_ORDER_SQL = _curriculum_order_sql()


# ---------------------------------------------------------------------------
# retrieval evaluation: MRR / hits@k of the BM25 search path
# ---------------------------------------------------------------------------


def retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_doc, n_rel_topk, first_rel_rank, rr_ppm): reciprocal-rank
    evaluation of the sparse retrieval path — for each BM25 query, how
    many of its top-k matches share the query's ground-truth label
    (``embeddings.label``, aligned with doc_id by the fixture
    generator), the rank of the first such hit (0 = none), and the
    reciprocal rank in ppm (1e6 div rank — exact integer MRR). This is
    the offline retrieval dashboard (MRR@k / hit-rate) every RAG or
    retrieval-augmented training pipeline runs against its index builds.

    Plan: the BM25 result is |queries|·k rows; both label joins
    broadcast the tiny (vec_id, label) projection. Nothing here scales
    beyond the underlying search."""
    from .sparse_text import bm25_search_topk

    r = bm25_search_topk(spark, sf_dir)
    from .emb_source import load_embeddings

    labels = load_embeddings(spark, sf_dir).select(
        F.col("vec_id"), F.col("label").cast("long").alias("label")
    )
    ql = labels.select(
        F.col("vec_id").alias("query_doc"), F.col("label").alias("q_label")
    )
    ml = labels.select(
        F.col("vec_id").alias("match_doc"), F.col("label").alias("m_label")
    )
    rel = (
        r.join(F.broadcast(ql), "query_doc")
        .join(F.broadcast(ml), "match_doc")
        .select(
            "query_doc",
            "rank",
            (F.col("q_label") == F.col("m_label")).cast("long").alias("rel"),
        )
    )
    return (
        rel.groupBy("query_doc")
        .agg(
            F.sum("rel").alias("n_rel_topk"),
            F.coalesce(
                F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0)
            )
            .cast("long")
            .alias("first_rel_rank"),
        )
        .select(
            "query_doc",
            "n_rel_topk",
            "first_rel_rank",
            F.when(
                F.col("first_rel_rank") > 0,
                F.expr("1000000 div first_rel_rank"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_ppm"),
        )
        .orderBy("query_doc")
    )


def _retrieval_eval_mrr_sql() -> str:
    from .sparse_text import BM25_SEARCH_SQL

    base = BM25_SEARCH_SQL.replace("ORDER BY query_doc, rank", "")
    return f"""
WITH bm25 AS ({base}),
rel AS (
  SELECT b.query_doc, b.rank,
         CASE WHEN ql.label = ml.label THEN 1 ELSE 0 END AS rel
  FROM bm25 b
  JOIN embeddings ql ON ql.vec_id = b.query_doc
  JOIN embeddings ml ON ml.vec_id = b.match_doc
),
agg AS (
  SELECT query_doc,
         CAST(SUM(rel) AS BIGINT) AS n_rel_topk,
         CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN rank END), 0) AS BIGINT)
           AS first_rel_rank
  FROM rel GROUP BY query_doc
)
SELECT query_doc, n_rel_topk, first_rel_rank,
       CASE WHEN first_rel_rank > 0
            THEN CAST(1000000 // first_rel_rank AS BIGINT)
            ELSE 0 END AS rr_ppm
FROM agg
ORDER BY query_doc
"""


RETRIEVAL_EVAL_MRR_SQL = _retrieval_eval_mrr_sql()


# ---------------------------------------------------------------------------
# per-source quality dashboard (provider yield report)
# ---------------------------------------------------------------------------


def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, gopher_pass, pass_ppm, total_tokens,
    mean_tokens_q): per-provider yield — how many of each source's
    documents clear the Gopher quality rules, plus its token volume and
    mean document length (ppm / milli-token integer quantization). This
    is the dashboard that decides which provider gets re-crawled,
    re-filtered, or dropped; composes the gated quality_gopher and
    token_count operators per their per-doc outputs.

    Plan: two gated per-doc frames joined on doc_id (both one-pass),
    then a |sources|-row groupBy — nothing heavier than the underlying
    operators."""
    from .textprep import quality_gopher
    from .textstats import token_count
    from .docs_source import load_docs

    src = load_docs(spark, sf_dir).select("doc_id", "source")
    g = quality_gopher(spark, sf_dir).select(
        "doc_id", F.col("passes").cast("long").alias("p")
    )
    t = token_count(spark, sf_dir).select(
        "doc_id", F.col("ws_tokens").alias("n_tokens")
    )
    return (
        src.join(g, "doc_id")
        .join(t, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p").alias("gopher_pass"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "gopher_pass",
            F.expr("(gopher_pass * 1000000) div n_docs").alias("pass_ppm"),
            "total_tokens",
            F.expr("(total_tokens * 1000) div n_docs").alias("mean_tokens_q"),
        )
        .orderBy("source")
    )


def _source_quality_report_sql() -> str:
    from .textprep import QUALITY_GOPHER_SQL
    from .textstats import TOKEN_COUNT_SQL

    g = QUALITY_GOPHER_SQL.replace("ORDER BY doc_id", "")
    t = TOKEN_COUNT_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH gq AS ({g}),
tc AS ({t})
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN gq.passes THEN 1 ELSE 0 END) AS BIGINT) AS gopher_pass,
       CAST((SUM(CASE WHEN gq.passes THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
            AS BIGINT) AS pass_ppm,
       CAST(SUM(tc.ws_tokens) AS BIGINT) AS total_tokens,
       CAST((SUM(tc.ws_tokens) * 1000) // COUNT(*) AS BIGINT) AS mean_tokens_q
FROM documents d
JOIN gq ON gq.doc_id = d.doc_id
JOIN tc ON tc.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


SOURCE_QUALITY_REPORT_SQL = _source_quality_report_sql()


# ---------------------------------------------------------------------------
# water-filling token-budget allocation across sources
# ---------------------------------------------------------------------------

BUDGET_NUM = 1  # global budget = total_tokens * BUDGET_NUM / BUDGET_DEN
BUDGET_DEN = 2
WATERFILL_ITERS = 3  # unrolled redistribution rounds


def budget_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, alloc_tokens, alloc_ppm): allocate a global
    token budget (here {BUDGET_NUM}/{BUDGET_DEN} of the corpus) across
    sources by water-filling — every source gets min(its tokens, fair
    share), and budget freed by small sources redistributes to large
    ones over {WATERFILL_ITERS} rounds: fair_0 = B div S; sources with
    n_tokens <= fair_i are satisfied; fair_(i+1) = remaining budget div
    remaining sources. This is how a pretraining mix caps dominant
    providers without starving small ones (the proportional-with-cap
    allocation mixture tooling implements); a fixed unrolled round count
    keeps the iterative solve inside the cross-engine hash gate
    (exactly optimal once no source crosses the waterline between
    rounds — 3 rounds saturate on Zipf-ish source distributions).

    Plan: one tokenize pass → |sources|-row table; every round is an
    aggregate over those |sources| rows crossed back as a broadcast
    one-row frame. Driver/executor cost is independent of corpus size
    beyond the first scan."""
    from .docs_source import load_docs
    from .textstats import BPE_ISH_RE

    d = load_docs(spark, sf_dir).select(
        "source",
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{BPE_ISH_RE}', 0)")
        ).alias("toks"),
    )
    # checkpoint the |sources|-row table: every unrolled round re-plans
    # its lineage otherwise, and the lineage contains the corpus
    # tokenize scan (audited: 12 scans of documents before, 1 after)
    tok = (
        d.groupBy("source")
        .agg(F.sum("toks").alias("n_tokens"))
        .localCheckpoint(eager=True)
    )
    g = tok.agg(
        F.sum("n_tokens").alias("grand"), F.count(F.lit(1)).alias("s")
    ).select(
        F.expr(f"(grand * {BUDGET_NUM}) div {BUDGET_DEN}").alias("b"), "s"
    )
    cur = tok.crossJoin(F.broadcast(g)).select(
        "source", "n_tokens", F.expr("b div s").alias("fair")
    )
    for _ in range(WATERFILL_ITERS - 1):
        # budget left after fully satisfying under-waterline sources,
        # spread over the sources still above it
        nxt = cur.agg(
            F.sum(
                F.when(F.col("n_tokens") <= F.col("fair"), F.col("n_tokens"))
            ).alias("taken"),
            F.sum(
                F.when(F.col("n_tokens") > F.col("fair"), 1).otherwise(0)
            ).alias("rem_s"),
            F.max("fair").alias("prev_fair"),
        )
        g2 = (
            nxt.crossJoin(F.broadcast(g))
            .select(
                F.when(
                    F.col("rem_s") > 0,
                    F.expr("(b - coalesce(taken, 0)) div rem_s"),
                )
                .otherwise(F.col("prev_fair"))
                .alias("fair2")
            )
        )
        cur = cur.drop("fair").crossJoin(F.broadcast(g2)).select(
            "source", "n_tokens", F.col("fair2").alias("fair")
        )
    out = cur.crossJoin(F.broadcast(g)).select(
        "source",
        "n_tokens",
        F.least(F.col("n_tokens"), F.col("fair")).alias("alloc_tokens"),
        F.expr(
            "(least(n_tokens, fair) * 1000000) div b"
        ).alias("alloc_ppm"),
    )
    return out.orderBy("source")


def _budget_mix_plan_sql() -> str:
    from .textstats import BPE_ISH_RE

    iters = []
    prev = "w0"
    joined = None  # set below; pre-join to keep backslashes out of the f-string
    iters.append(f"""w0 AS (
  SELECT t.source, t.n_tokens, g.b // g.s AS fair
  FROM tok t CROSS JOIN g
)""")
    for i in range(1, WATERFILL_ITERS):
        iters.append(f"""a{i} AS (
  SELECT SUM(CASE WHEN n_tokens <= fair THEN n_tokens END) AS taken,
         SUM(CASE WHEN n_tokens > fair THEN 1 ELSE 0 END) AS rem_s,
         MAX(fair) AS prev_fair
  FROM {prev}
)""")
        iters.append(f"""w{i} AS (
  SELECT w.source, w.n_tokens,
         CASE WHEN a.rem_s > 0
              THEN (g.b - COALESCE(a.taken, 0)) // a.rem_s
              ELSE a.prev_fair END AS fair
  FROM {prev} w CROSS JOIN a{i} a CROSS JOIN g
)""")
        prev = f"w{i}"
    joined = ",\n".join(iters)
    return f"""
WITH tok AS (
  SELECT source,
         SUM(len(regexp_extract_all(lower(text), '{BPE_ISH_RE}'))) AS n_tokens
  FROM documents GROUP BY source
), g AS (
  SELECT (SUM(n_tokens) * {BUDGET_NUM}) // {BUDGET_DEN} AS b,
         COUNT(*) AS s
  FROM tok
),
{joined}
SELECT w.source,
       CAST(w.n_tokens AS BIGINT) AS n_tokens,
       CAST(LEAST(w.n_tokens, w.fair) AS BIGINT) AS alloc_tokens,
       CAST((LEAST(w.n_tokens, w.fair) * 1000000) // g.b AS BIGINT) AS alloc_ppm
FROM {prev} w CROSS JOIN g
ORDER BY w.source
"""


BUDGET_MIX_PLAN_SQL = _budget_mix_plan_sql()


# ---------------------------------------------------------------------------
# pack-utilization report over the sequence-packing plan
# ---------------------------------------------------------------------------


def pack_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pack_id, n_docs_start, n_crossing, tokens_start): per-pack
    utilization of the {PACK_BUDGET}-token sequence packer — how many
    documents start in each pack, how many of those run past its end
    (attention-mask boundary resets / cross-doc contamination risk the
    trainer must handle), and the token mass starting there. The
    dashboard that says whether the pack budget fits the document
    length distribution before a 100 TB tokenization run.

    Plan: one |docs|-row aggregate over pack_plan's audited output;
    crossing is row-local arithmetic (offset + len > budget)."""
    p = pack_plan(spark, sf_dir)
    return (
        p.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs_start"),
            F.sum(
                (
                    F.col("pack_offset") + F.col("bpe_ish_tokens")
                    > PACK_BUDGET
                ).cast("long")
            ).alias("n_crossing"),
            F.sum("bpe_ish_tokens").alias("tokens_start"),
        )
        .orderBy("pack_id")
    )


def _pack_fill_report_sql() -> str:
    base = PACK_PLAN_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH pp AS ({base})
SELECT pack_id,
       COUNT(*) AS n_docs_start,
       CAST(SUM(CASE WHEN pack_offset + bpe_ish_tokens > {PACK_BUDGET}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
       CAST(SUM(bpe_ish_tokens) AS BIGINT) AS tokens_start
FROM pp
GROUP BY pack_id
ORDER BY pack_id
"""


PACK_FILL_REPORT_SQL = _pack_fill_report_sql()


# ---------------------------------------------------------------------------
# quality-score calibration against the Gopher rules
# ---------------------------------------------------------------------------

CALIB_TILES = 10


def quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_docs, n_pass, pass_ppm, min_score_q, max_score_q):
    reliability curve of the cheap heuristic quality score against the
    (independent) Gopher rule verdict — docs ranked by score into
    {CALIB_TILES} global deciles, each reporting its Gopher pass rate.
    A monotone curve validates using the cheap score as a pre-filter at
    100 TB (run the heuristic everywhere, the full rules only near the
    threshold); a flat curve says the score carries no signal.

    Integer contract: the ranking key is score_q =
    (length_ok·n_distinct·1e6) div n_tokens with length_ok ∈ {{2, 1}} —
    an integer strictly monotone with quality_score's float (0.5/1.0
    length factor × type-token ratio), so the global order is
    hash-exact; deciles come from the SQL-exact NTILE arithmetic
    (functions.global_order.exact_ntile, pinned against DuckDB NTILE).

    Plan: the rank is a distributed range partition + per-partition
    row_number with driver prefix offsets (no single-partition window);
    everything after is a {CALIB_TILES}-row aggregate."""
    from .textprep import quality_gopher
    from .docs_source import load_docs
    from ..functions.global_order import exact_ntile, with_global_order_stat
    from ..functions.text import TOKEN_SPLIT_RE

    d = load_docs(spark, sf_dir).select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), TOKEN_SPLIT_RE), lambda t: t != ""
        ).alias("toks"),
    )
    scored = d.select(
        "doc_id",
        F.expr(
            "(CASE WHEN size(toks) BETWEEN 20 AND 80 THEN 2 ELSE 1 END"
            " * size(array_distinct(toks)) * 1000000) div size(toks)"
        ).alias("score_q"),
    )
    g = quality_gopher(spark, sf_dir).select(
        "doc_id", F.col("passes").cast("long").alias("p")
    )
    j = scored.join(g, "doc_id")
    ranked, n_rows = with_global_order_stat(
        j, [F.asc("score_q"), F.asc("doc_id")], out="rnk"
    )
    tiled = ranked.withColumn(
        "decile", exact_ntile(F.col("rnk"), n_rows, CALIB_TILES)
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p").alias("n_pass"),
            F.min("score_q").alias("min_score_q"),
            F.max("score_q").alias("max_score_q"),
        )
        .select(
            "decile",
            "n_docs",
            "n_pass",
            F.expr("(n_pass * 1000000) div n_docs").alias("pass_ppm"),
            "min_score_q",
            "max_score_q",
        )
        .orderBy("decile")
    )


def _quality_calibration_sql() -> str:
    from .textprep import QUALITY_GOPHER_SQL
    from ..functions.text import TOKEN_SPLIT_RE

    g = QUALITY_GOPHER_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH gq AS ({g}),
scored AS (
  SELECT doc_id,
         (CASE WHEN len(l) BETWEEN 20 AND 80 THEN 2 ELSE 1 END
          * len(list_distinct(l)) * 1000000) // len(l) AS score_q
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                           t -> t != '') AS l
        FROM documents)
),
tiled AS (
  SELECT s.doc_id, s.score_q,
         CASE WHEN gq.passes THEN 1 ELSE 0 END AS p,
         NTILE({CALIB_TILES}) OVER (ORDER BY s.score_q, s.doc_id) AS decile
  FROM scored s JOIN gq ON gq.doc_id = s.doc_id
)
SELECT CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_docs,
       CAST(SUM(p) AS BIGINT) AS n_pass,
       CAST((SUM(p) * 1000000) // COUNT(*) AS BIGINT) AS pass_ppm,
       CAST(MIN(score_q) AS BIGINT) AS min_score_q,
       CAST(MAX(score_q) AS BIGINT) AS max_score_q
FROM tiled
GROUP BY decile
ORDER BY decile
"""


QUALITY_CALIBRATION_SQL = _quality_calibration_sql()
