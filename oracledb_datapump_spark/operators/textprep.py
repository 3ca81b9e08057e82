"""Corpus-preparation operators for LLM training-data pipelines:
normalization, Gopher-style quality rules, benchmark-contamination
n-gram overlap, deterministic train/val/test splitting, and n-gram
vocabulary statistics.

All use the shared tokenization contract from ``functions.text`` (lower,
split on ``[^a-z0-9]+``) so the DuckDB oracles are provably equivalent.
Scale notes per operator; only aggregating operators shuffle, and every
groupBy is partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .docs_source import load_docs
from ..functions.text import TOKEN_SPLIT_RE, hash64, sql_hash64, tokens


def _docs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    return load_docs(spark, sf_dir, docs)


# ---------------------------------------------------------------------------
# text normalization
# ---------------------------------------------------------------------------


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, norm_text, n_tokens_norm, changed): lowercase, strip
    non-alphanumerics to spaces, collapse runs of whitespace, trim.
    Row-local regex chain — shuffle-free, whole-stage codegen."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9\\s]", " "), "\\s+", " "
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.filter(F.split(norm, " "), lambda t: t != "")).cast("long").alias(
            "n_tokens_norm"
        ),
        (norm != F.col("text")).alias("changed"),
    ).orderBy("doc_id")


TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text,
       CAST(len(list_filter(string_split(norm_text, ' '), t -> t != '')) AS BIGINT)
         AS n_tokens_norm,
       norm_text != text AS changed
FROM n
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 50_000
GOPHER_MEAN_LEN_LO = 2.0
GOPHER_MEAN_LEN_HI = 12.0
GOPHER_TOP_FRAC_MAX = 0.2
GOPHER_DISTINCT_FRAC_MIN = 0.3


def quality_gopher(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, top_word_frac, distinct_frac,
    ok_*, passes): repetition/length heuristics in the style of the
    published Gopher quality rules.

    Scale plan: token explode → partial-aggregated groupBy (doc_id, tok)
    → groupBy doc_id (co-partitioned with the first, so AQE coalesces to
    one real exchange). The per-token count stream also carries
    length(tok)*cnt so mean word length needs no second pass over text.
    Top-word frequency genuinely needs the per-(doc,tok) counts — the
    shuffle-free array formulation would be O(|doc|·|vocab|) row-local,
    which dies on long documents; this one is linear."""
    d = _docs(spark, sf_dir, docs)
    per_tok = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.length("tok").cast("long") * F.col("cnt")).alias("total_chars"),
    )
    mean_len = F.col("total_chars").cast("double") / F.col("n_words")
    top_frac = F.col("top_cnt").cast("double") / F.col("n_words")
    distinct_frac = F.col("n_distinct").cast("double") / F.col("n_words")
    ok_len = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_mean = (mean_len >= GOPHER_MEAN_LEN_LO) & (mean_len <= GOPHER_MEAN_LEN_HI)
    ok_rep = top_frac <= GOPHER_TOP_FRAC_MAX
    ok_div = distinct_frac >= GOPHER_DISTINCT_FRAC_MIN
    return per_doc.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        top_frac.alias("top_word_frac"),
        distinct_frac.alias("distinct_frac"),
        ok_len.alias("ok_length"),
        ok_mean.alias("ok_mean_len"),
        ok_rep.alias("ok_repetition"),
        ok_div.alias("ok_diversity"),
        (ok_len & ok_mean & ok_rep & ok_div).alias("passes"),
    ).orderBy("doc_id")


QUALITY_GOPHER_SQL = f"""
WITH per_tok AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (
    SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '')) AS tok
    FROM documents)
  GROUP BY doc_id, tok
), per_doc AS (
  SELECT doc_id,
         SUM(cnt) AS n_words,
         COUNT(*) AS n_distinct,
         MAX(cnt) AS top_cnt,
         SUM(CAST(length(tok) AS BIGINT) * cnt) AS total_chars
  FROM per_tok GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(total_chars AS DOUBLE) / n_words AS mean_word_len,
       CAST(top_cnt AS DOUBLE) / n_words AS top_word_frac,
       CAST(n_distinct AS DOUBLE) / n_words AS distinct_frac,
       n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS ok_length,
       (CAST(total_chars AS DOUBLE) / n_words >= {GOPHER_MEAN_LEN_LO}
        AND CAST(total_chars AS DOUBLE) / n_words <= {GOPHER_MEAN_LEN_HI}) AS ok_mean_len,
       CAST(top_cnt AS DOUBLE) / n_words <= {GOPHER_TOP_FRAC_MAX} AS ok_repetition,
       CAST(n_distinct AS DOUBLE) / n_words >= {GOPHER_DISTINCT_FRAC_MIN} AS ok_diversity,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
         AND (CAST(total_chars AS DOUBLE) / n_words >= {GOPHER_MEAN_LEN_LO})
         AND (CAST(total_chars AS DOUBLE) / n_words <= {GOPHER_MEAN_LEN_HI})
         AND (CAST(top_cnt AS DOUBLE) / n_words <= {GOPHER_TOP_FRAC_MAX})
         AND (CAST(n_distinct AS DOUBLE) / n_words >= {GOPHER_DISTINCT_FRAC_MIN}) AS passes
FROM per_doc
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# benchmark-contamination check (word 8-gram overlap)
# ---------------------------------------------------------------------------

CONTAM_N = 8


def contamination_ngram(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(train_doc_id, n_eval_docs, n_shared_grams): training docs that
    share any word-{CONTAM_N}-gram with the held-out eval slice
    (doc_id % 10 == 0 stands in for the benchmark set).

    Scale plan: distinct grams per doc are built row-locally
    (transform over sequence — no explode of raw positions), hashed to
    64-bit before the explode so the shuffle carries 8-byte keys instead
    of strings. The gram join is hash-partitioned on the gram key; at
    100 TB the eval side (a benchmark suite, ~10^6 grams) broadcasts.
    One groupBy per train doc at the end."""
    d = _docs(spark, sf_dir, docs)
    # materialize the token array once per row — referencing tokens("text")
    # inside the gram lambda would re-split the text per slice
    wt = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= CONTAM_N
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - CONTAM_N),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, CONTAM_N)),
        )
    )
    g = wt.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", hash64(F.col("gram")).alias("gh")
    )
    ev = g.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "gh"
    )
    tr = g.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("train_doc_id"), "gh"
    )
    return (
        tr.join(F.broadcast(ev), "gh")
        .groupBy("train_doc_id")
        .agg(
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
            F.count(F.lit(1)).alias("n_shared_grams"),
        )
        .orderBy("train_doc_id")
    )


CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, {sql_hash64("gram")} AS gh FROM (
    SELECT DISTINCT doc_id, array_to_string(l[i+1:i+{CONTAM_N}], ' ') AS gram
    FROM toks, unnest(range(len(l) - {CONTAM_N - 1})) AS t(i)
    WHERE len(l) >= {CONTAM_N})
), ev AS (SELECT doc_id AS eval_doc_id, gh FROM grams WHERE doc_id % 10 = 0),
   tr AS (SELECT doc_id AS train_doc_id, gh FROM grams WHERE doc_id % 10 != 0)
SELECT train_doc_id,
       COUNT(DISTINCT eval_doc_id) AS n_eval_docs,
       COUNT(*) AS n_shared_grams
FROM tr JOIN ev USING (gh)
GROUP BY train_doc_id
ORDER BY train_doc_id
"""


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket, split): content-independent deterministic
    80/10/10 assignment from a stable hash of the doc id — the standard
    reproducible-split device (same doc lands in the same split on any
    cluster, any partitioning, any run). Row-local; shuffle-free."""
    d = _docs(spark, sf_dir)
    bucket = hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


CORPUS_SPLIT_SQL = f"""
SELECT doc_id,
       {sql_hash64("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
       CASE WHEN {sql_hash64("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
            WHEN {sql_hash64("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# n-gram vocabulary statistics (tokenizer-training feedstock)
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 50


def vocab_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gram, n_docs, n_occurrences): the {VOCAB_TOP_K} most frequent
    word bigrams with document frequency — the corpus statistics a BPE /
    vocabulary-induction pass consumes.

    Scale plan: bigrams built row-locally, one partial-aggregated
    groupBy(gram); n_docs is a distinct-count inside the same
    aggregation. Deterministic order: count desc, gram asc."""
    d = _docs(spark, sf_dir)
    wt = d.select("doc_id", tokens("text").alias("toks")).filter(F.size("toks") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 2)),
    )
    return (
        wt.select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("n_occurrences"), "gram")
        .limit(VOCAB_TOP_K)
    )


VOCAB_NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, l[i+1] || ' ' || l[i+2] AS gram
  FROM toks, unnest(range(len(l) - 1)) AS t(i)
  WHERE len(l) >= 2
)
SELECT gram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM grams
GROUP BY gram
ORDER BY n_occurrences DESC, gram
LIMIT {VOCAB_TOP_K}
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights (hashed n-gram importance resampling)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed bigram feature space (B)
DSIR_TARGET_LANG = "en"  # target distribution = the English slice


def dsir_importance(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_feats, logratio_q): per-document importance weight for
    Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
    score raw documents by how target-like their hashed-bigram feature
    distribution is, then sample proportionally. Target here is the
    ``lang = '{DSIR_TARGET_LANG}'`` slice of the corpus; raw is the whole
    corpus (in production the target is a small trusted corpus, e.g.
    Wikipedia — same plan, different source for the target counts).

    Integer contract: each bigram instance hashing to feature f
    contributes bits(num/den) − bits(den/num), where
    num = (occ_target(f)+1)·(T_raw+B), den = (occ_raw(f)+1)·(T_target+B)
    (add-one smoothing over B = {DSIR_BUCKETS} buckets) and bits(x) =
    bitlen of the integer quotient — floor(log2(ratio))+1 when the ratio
    is ≥ 1, else 0, the same bitlen-of-integer-division quantization
    unigram_surprise uses. The products run in DECIMAL(38,0)/HUGEINT so
    the contract survives corpus token counts past 2^63.

    Plan: bigram features are row-local (sequence+transform then hash64
    mod B); the two count tables are one groupBy(feat) each over the
    SAME single tokenize pass (target counts via conditional agg — no
    second scan), and the result is a {DSIR_BUCKETS}-row table — model
    state, broadcast back onto the feature stream; one final
    groupBy(doc_id). Nothing scales with corpus size except the
    embarrassingly-parallel scan — the exact structure DSIR needs at
    100 TB."""
    d = _docs(spark, sf_dir, docs)
    wt = d.select("doc_id", "lang", tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 2)),
    )
    # r16: pinned — the count table and the final per-doc groupBy are
    # two subtrees that each re-ran the tokenize→bigram-hash explode
    # over the corpus (guide §1.2); the pinned stream is three narrow
    # columns, not the text
    feats = wt.select(
        "doc_id",
        "lang",
        F.explode(grams).alias("gram"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(hash64(F.col("gram")), F.lit(DSIR_BUCKETS)).alias("feat"),
    ).localCheckpoint(eager=True)
    counts = feats.groupBy("feat").agg(
        F.count(F.lit(1)).alias("occ_r"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("occ_t"),
    )
    tots = counts.agg(
        F.sum("occ_r").alias("t_r"), F.sum("occ_t").alias("t_t")
    )
    # bits(x) with bits(0) = 0: length(bin(x)) is 1 for x = 0, so gate on
    # the quotient being nonzero instead of subtracting 1 (bin(0) = '0').
    ratio = counts.crossJoin(F.broadcast(tots)).select(
        "feat",
        F.expr(
            f"""
            CAST(length(bin(CAST((occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS DECIMAL(38,0)) AS DECIMAL(38,0))
                             div ((occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS DECIMAL(38,0))))) AS LONG)
            * CAST(((occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS DECIMAL(38,0)))
                   >= ((occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS DECIMAL(38,0))) AS INT)
            - CAST(length(bin(CAST((occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS DECIMAL(38,0)) AS DECIMAL(38,0))
                               div ((occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS DECIMAL(38,0))))) AS LONG)
            * CAST(((occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS DECIMAL(38,0)))
                   >= ((occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS DECIMAL(38,0))) AS INT)
            """
        ).alias("fbits"),
    )
    return (
        feats.join(F.broadcast(ratio), "feat")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("fbits").cast("long").alias("logratio_q"),
        )
        .orderBy("doc_id")
    )


DSIR_IMPORTANCE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '') AS l
  FROM documents
), feats AS (
  SELECT doc_id, lang,
         {sql_hash64("array_to_string(l[i+1:i+2], ' ')")} % {DSIR_BUCKETS} AS feat
  FROM toks, unnest(range(len(l) - 1)) AS t(i)
  WHERE len(l) >= 2
), counts AS (
  SELECT feat, COUNT(*) AS occ_r,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS occ_t
  FROM feats GROUP BY feat
), tots AS (
  SELECT SUM(occ_r) AS t_r, SUM(occ_t) AS t_t FROM counts
), ratio AS (
  SELECT feat,
         CASE WHEN (occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS HUGEINT)
                   >= (occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS HUGEINT)
              THEN CAST(length(bin(((occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS HUGEINT))
                                   // ((occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS HUGEINT)))) AS BIGINT)
              ELSE 0 END
         - CASE WHEN (occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS HUGEINT)
                     >= (occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS HUGEINT)
                THEN CAST(length(bin(((occ_r + 1) * CAST(t_t + {DSIR_BUCKETS} AS HUGEINT))
                                     // ((occ_t + 1) * CAST(t_r + {DSIR_BUCKETS} AS HUGEINT)))) AS BIGINT)
                ELSE 0 END AS fbits
  FROM counts CROSS JOIN tots
)
SELECT f.doc_id,
       COUNT(*) AS n_feats,
       CAST(SUM(r.fbits) AS BIGINT) AS logratio_q
FROM feats f JOIN ratio r USING (feat)
GROUP BY f.doc_id
ORDER BY f.doc_id
"""
