"""Pipeline dashboards, batch 11: dedup scoring refinements and
LM-driven curation — containment-scored near-dups (the superset catcher
Jaccard misses), BM25 hard-negative mining for contrastive training,
the perplexity-filter report, and the OOV-rate-vs-vocab-size curve.

No reference counterpart (the reference moves data, it does not curate
it); these extend the LLM-pipeline families with the scoring variants a
training-data team reaches for next:

- Jaccard under-scores containment: a 100-word doc fully embedded in a
  10,000-word doc has J ≈ 0.01 but containment 1.0 — the-stack/BigCode
  style dedup therefore scores ``max(|A∩B|/|A|, |A∩B|/|B|)`` on the
  SAME LSH candidates. `dedup_containment_pairs` reports both scores
  and flags the pairs only containment catches.
- `hard_negative_mining` upgrades contrastive_pairs' pseudo-random
  negatives to the standard production miner: the top-BM25 matches that
  are NOT verified near-duplicates (hard negatives = lexically close,
  semantically distinct).
- `lm_filter_report` is the CCNet-style perplexity filter as an audit:
  score every doc with the train-split bigram LM, band by bits/bigram,
  report kept/dropped mass per band.
- `oov_rate_curve` answers "how big must the vocab be": OOV token mass
  at each candidate vocab size, entirely from the token-frequency table
  (no second corpus pass per size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE, tokens
from .dedup import (
    DEDUP_MINHASH_VERIFIED_SQL,
    SQL_MINHASH_CTE,
    _shingles,
    _sql_band_selects,
    dedup_minhash_pairs,
    verified_pairs_cached,
)
from .lmscore import _split_col
from .sparse_text import BM25_SEARCH_SQL, bm25_search_topk
from .textprep import load_docs

# ---------------------------------------------------------------------------
# containment-scored near-dup pairs
# ---------------------------------------------------------------------------

CONTAIN_T_PPM = 800_000  # containment >= 0.8 keeps the pair
JACCARD_T_PPM = 600_000  # dedup.JACCARD_THRESHOLD as ppm


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, containment_ppm, jaccard_ppm, superset_only):
    LSH candidate pairs scored by shingle CONTAINMENT —
    ``max(|A∩B|/|A|, |A∩B|/|B|) = |A∩B|/min(|A|,|B|)`` — kept at
    ≥ {CONTAIN_T_PPM} ppm, with the Jaccard score alongside and
    ``superset_only`` marking pairs Jaccard (≥ {JACCARD_T_PPM} ppm)
    would have MISSED. Containment is the score that catches a short
    document embedded verbatim in a long one; on real corpora these
    are license headers, quoted replies, and scraped mirrors.

    Plan: identical scale shape to dedup_minhash_verified — the exact
    intersection join runs on LSH-bounded candidates only, per-doc size
    tables are candidate-restricted BEFORE broadcast, and scores are
    integer ppm (bigint div — bit-identical to DuckDB ``//`` on the
    all-positive operands)."""
    cand = dedup_minhash_pairs(spark, sf_dir).localCheckpoint(eager=True)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # r16 (guide §1.2): shingle only the candidate docs, once, pinned —
    # the semi-join commutes with row-local shingling; the old order
    # tokenized the whole corpus in three subtrees (sizes + both probes)
    cand_src = spark.read.parquet(f"{sf_dir}/documents.parquet").join(
        F.broadcast(cand_docs), "doc_id", "semi"
    )
    sh = _shingles(spark, sf_dir, cand_src).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("_doc_b2"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(sa, "doc_a")
        .join(
            sb,
            (F.col("doc_b") == F.col("_doc_b2")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("(inter * 1000000) div least(na, nb)").alias(
                "containment_ppm"
            ),
            F.expr("(inter * 1000000) div (na + nb - inter)").alias(
                "jaccard_ppm"
            ),
        )
        .filter(F.col("containment_ppm") >= CONTAIN_T_PPM)
        .withColumn(
            "superset_only", F.col("jaccard_ppm") < F.lit(JACCARD_T_PPM)
        )
        .orderBy("doc_a", "doc_b")
    )


DEDUP_CONTAINMENT_PAIRS_SQL = (
    "WITH "
    + SQL_MINHASH_CTE
    + f""",
bands AS (
  {_sql_band_selects()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       CAST((inter * 1000000) // LEAST(na.n, nb.n) AS BIGINT)
         AS containment_ppm,
       CAST((inter * 1000000) // (na.n + nb.n - inter) AS BIGINT)
         AS jaccard_ppm,
       (inter * 1000000) // (na.n + nb.n - inter) < {JACCARD_T_PPM}
         AS superset_only
FROM inter
JOIN sizes na ON doc_a = na.doc_id
JOIN sizes nb ON doc_b = nb.doc_id
WHERE (inter * 1000000) // LEAST(na.n, nb.n) >= {CONTAIN_T_PPM}
ORDER BY doc_a, doc_b
"""
)


# ---------------------------------------------------------------------------
# BM25 hard-negative mining
# ---------------------------------------------------------------------------


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_doc, negative_doc, neg_rank, score_q): for each query
    document, its top-BM25 corpus matches that are NOT LSH-verified
    near-duplicates, re-ranked after the exclusion — hard negatives for
    contrastive embedding training (lexically close by the retrieval
    scorer, but known-distinct by the dedup verifier). Upgrades
    dedup.contrastive_pairs' pseudo-random negatives to the standard
    production miner.

    Plan: the BM25 top-k table is |queries|·k rows; the verified-pair
    table rides the driver memo (dedup.verified_pairs_cached) and is
    broadcast into two anti-joins (both pair orientations); the re-rank
    window partitions by query over ≤ k rows. Nothing here scales
    beyond the retrieval output."""
    bm = bm25_search_topk(spark, sf_dir)
    vp = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    fwd = vp.select(
        F.col("doc_a").alias("query_doc"), F.col("doc_b").alias("match_doc")
    )
    rev = vp.select(
        F.col("doc_b").alias("query_doc"), F.col("doc_a").alias("match_doc")
    )
    survivors = bm.join(
        F.broadcast(fwd), ["query_doc", "match_doc"], "anti"
    ).join(F.broadcast(rev), ["query_doc", "match_doc"], "anti")
    w = Window.partitionBy("query_doc").orderBy(F.asc("rank"))
    return (
        survivors.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .select(
            "query_doc",
            F.col("match_doc").alias("negative_doc"),
            "neg_rank",
            "score_q",
        )
        .orderBy("query_doc", "neg_rank")
    )


HARD_NEGATIVE_MINING_SQL = f"""
SELECT query_doc, negative_doc, neg_rank, score_q FROM (
  SELECT b.query_doc, b.match_doc AS negative_doc, b.score_q,
         CAST(ROW_NUMBER() OVER (PARTITION BY b.query_doc
                                 ORDER BY b.rank ASC) AS BIGINT) AS neg_rank
  FROM ( {BM25_SEARCH_SQL} ) b
  WHERE NOT EXISTS (
    SELECT 1 FROM ( {DEDUP_MINHASH_VERIFIED_SQL} ) v
    WHERE (v.doc_a = b.query_doc AND v.doc_b = b.match_doc)
       OR (v.doc_a = b.match_doc AND v.doc_b = b.query_doc))
)
ORDER BY query_doc, neg_rank
"""


# ---------------------------------------------------------------------------
# perplexity-filter report (CCNet-style)
# ---------------------------------------------------------------------------

LM_KEEP_MAX_Q = 9_000  # keep docs at <= 9.000 bits/bigram under the train LM
LM_BAND_CAP = 12


def lm_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, n_docs, n_kept, n_bigrams): the CCNet-style perplexity
    filter as an audit table. Every document is scored by the add-one
    bigram LM trained on the TRAIN hash-split only (same integer
    surprisal contract as lmscore.ngram_lm_crossentropy:
    bitlen((c_pre + V) div (c_big + 1)) per bigram, per-doc score =
    total_bits·1000 div n_bigrams), banded by whole bits/bigram
    (capped at {LM_BAND_CAP}), and kept iff score ≤ {LM_KEEP_MAX_Q}.
    The band histogram shows where the filter threshold sits in the
    corpus mass before anyone deletes data.

    Plan: one tokenize+bigram pass; the train-split model (bigram
    counts, prefix counts, vocab) is vocab²-bounded and broadcast;
    per-doc aggregation then a ≤ {LM_BAND_CAP}+1-row groupBy."""
    d = load_docs(spark, sf_dir)
    wt = d.select(
        "doc_id",
        _split_col(F.col("doc_id")).alias("split"),
        tokens("text").alias("toks"),
    ).filter(F.size("toks") >= 2)
    big = wt.select(
        "doc_id",
        "split",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 2)),
            )
        ).alias("bigram"),
    ).withColumn("t1", F.split(F.col("bigram"), " ", 2).getItem(0))
    train = big.filter(F.col("split") == "train")
    bcnt = train.groupBy("t1", "bigram").agg(F.count(F.lit(1)).alias("c_big"))
    pcnt = bcnt.groupBy("t1").agg(F.sum("c_big").alias("c_pre"))
    vocab = (
        wt.filter(F.col("split") == "train")
        .select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    per_doc = (
        big.join(F.broadcast(bcnt.select("bigram", "c_big")), "bigram", "left")
        .join(F.broadcast(pcnt), "t1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(
                "CAST(length(bin((COALESCE(c_pre, 0) + v)"
                " div (COALESCE(c_big, 0) + 1))) AS BIGINT)"
            ).alias("bits"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").alias("total_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("(total_bits * 1000) div n_bigrams").alias("doc_bits_q"),
        )
    )
    return (
        per_doc.select(
            F.least(
                F.expr("doc_bits_q div 1000"), F.lit(LM_BAND_CAP)
            ).alias("band"),
            (F.col("doc_bits_q") <= LM_KEEP_MAX_Q).alias("kept"),
            "n_bigrams",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
        )
        .orderBy("band")
    )


from ..functions.text import sql_hash64  # noqa: E402  (shared split hash)
from ..functions.local_table import values_df

LM_FILTER_REPORT_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN {sql_hash64("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
              WHEN {sql_hash64("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '') AS l
  FROM documents
), big AS (
  SELECT doc_id, split, l[i+1] AS t1, l[i+1] || ' ' || l[i+2] AS bigram
  FROM toks, unnest(range(len(l) - 1)) AS t(i)
  WHERE len(l) >= 2
), bcnt AS (
  SELECT bigram, t1, COUNT(*) AS c_big FROM big WHERE split = 'train'
  GROUP BY 1, 2
), pcnt AS (
  SELECT t1, SUM(c_big) AS c_pre FROM bcnt GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT tok) AS v FROM (
    SELECT unnest(l) AS tok FROM toks WHERE split = 'train' AND len(l) >= 2)
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         (SUM(CAST(length(bin((COALESCE(p.c_pre, 0) + vocab.v)
                              // (COALESCE(b.c_big, 0) + 1))) AS BIGINT))
          * 1000) // COUNT(*) AS doc_bits_q
  FROM big g
  LEFT JOIN bcnt b USING (bigram)
  LEFT JOIN pcnt p ON g.t1 = p.t1
  CROSS JOIN vocab
  GROUP BY doc_id
)
SELECT CAST(LEAST(doc_bits_q // 1000, {LM_BAND_CAP}) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_bits_q <= {LM_KEEP_MAX_Q} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams
FROM per_doc
GROUP BY 1
ORDER BY band
"""


# ---------------------------------------------------------------------------
# OOV-rate-vs-vocab-size curve
# ---------------------------------------------------------------------------

OOV_VOCAB_SIZES = (4, 8, 16, 24)


def oov_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vocab_size, n_oov_tokens, oov_ppm): for each candidate
    vocabulary size V in {OOV_VOCAB_SIZES}, the corpus token mass that
    falls outside the top-V tokens by frequency (ties broken by token
    text) — the sizing curve a tokenizer team reads before fixing V.

    Plan: ONE corpus tokenize into the (tok, freq) table; everything
    after is arithmetic over that vocab-sized table (rank window over
    |vocab| rows, broadcast cross join with the {len(OOV_VOCAB_SIZES)}
    candidate sizes) — no second corpus pass per size. At 100 TB the
    freq table is the Zipf-bounded vocabulary, not the corpus."""
    d = load_docs(spark, sf_dir)
    freq = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = freq.withColumn("rnk", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    sizes = values_df(spark,
        [(v,) for v in OOV_VOCAB_SIZES], "vocab_size long"
    )
    return (
        ranked.crossJoin(F.broadcast(sizes))
        .groupBy("vocab_size")
        .agg(
            F.sum(F.when(F.col("rnk") > F.col("vocab_size"), F.col("freq")))
            .cast("long")
            .alias("n_oov_tokens"),
            F.sum("freq").cast("long").alias("n_total"),
        )
        .select(
            "vocab_size",
            F.coalesce("n_oov_tokens", F.lit(0)).alias("n_oov_tokens"),
            F.expr(
                "(COALESCE(n_oov_tokens, 0) * 1000000) div n_total"
            ).alias("oov_ppm"),
        )
        .orderBy("vocab_size")
    )


OOV_RATE_CURVE_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                            t -> t != '')) AS tok
  FROM documents
), freq AS (
  SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
), ranked AS (
  SELECT tok, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC) AS rnk
  FROM freq
), sizes AS (
  SELECT unnest([{", ".join(str(v) for v in OOV_VOCAB_SIZES)}]) AS vocab_size
)
SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
       CAST(COALESCE(SUM(CASE WHEN rnk > vocab_size THEN freq END), 0)
            AS BIGINT) AS n_oov_tokens,
       CAST((COALESCE(SUM(CASE WHEN rnk > vocab_size THEN freq END), 0)
             * 1000000) // SUM(freq) AS BIGINT) AS oov_ppm
FROM ranked CROSS JOIN sizes
GROUP BY vocab_size
ORDER BY vocab_size
"""
