"""Text-analysis operators over ``documents``: language ID, quality
scoring, token counting, document fingerprinting.

All pure built-in column expressions (whole-stage codegen; no UDFs), each
with a DuckDB oracle twin. Per-document operators are embarrassingly
parallel — no shuffle except where noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE, hash64, sql_hash64, sql_tokens_cte

# ---------------------------------------------------------------------------
# language ID: stopword-hit heuristic
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, hits): argmax of stopword hits per language
    (ties → lexicographically first language; docs with zero hits →
    'unknown'). The stopword table is a broadcast dimension — the scan
    stays one pass over the corpus."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), TOKEN_SPLIT_RE), lambda t: t != "")
        ).alias("tok"),
    )
    sw = spark.createDataFrame(
        [(lang, w) for lang, words in STOPWORDS.items() for w in words],
        "lang string, tok string",
    )
    scores = (
        toks.join(F.broadcast(sw), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lang"))
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("lang_pred"), "hits")
    )
    return (
        d.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("lang_pred"), F.lit("unknown")).alias("lang_pred"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
        )
        .orderBy("doc_id")
    )


def _sql_stopword_values() -> str:
    rows = ", ".join(
        f"('{lang}', '{w}')" for lang, words in STOPWORDS.items() for w in words
    )
    return f"(VALUES {rows}) AS sw(lang, tok)"


LANG_ID_SQL = (
    "WITH "
    + sql_tokens_cte()
    + f""",
scores AS (
  SELECT doc_id, lang, COUNT(*) AS hits
  FROM tokens JOIN {_sql_stopword_values()} USING (tok)
  GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang AS lang_pred, hits
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) rn
        FROM scores)
  WHERE rn = 1
)
SELECT d.doc_id,
       COALESCE(b.lang_pred, 'unknown') AS lang_pred,
       COALESCE(b.hits, 0) AS hits
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
ORDER BY d.doc_id
"""
)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len, ttr,
    quality_score). length/diversity heuristics; single pass, no shuffle
    (per-row array ops)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower("text"), TOKEN_SPLIT_RE), lambda t: t != "")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    avg_len = total_len.cast("double") / n_tokens
    ttr = n_distinct.cast("double") / n_tokens  # type-token ratio
    # quality: prefer 20-80 token docs with diverse vocabulary
    length_ok = F.when((n_tokens >= 20) & (n_tokens <= 80), 1.0).otherwise(0.5)
    score = length_ok * ttr
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        avg_len.alias("avg_token_len"),
        ttr.alias("ttr"),
        score.alias("quality_score"),
    ).orderBy("doc_id")


QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / len(toks) AS avg_token_len,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
       (CASE WHEN len(toks) BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END)
         * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS quality_score
FROM t
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

BPE_ISH_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens, n_chars_check): whitespace
    tokens + a BPE-ish regex count (letter runs | single digits | other
    glyphs) — the cheap proxy for tokenizer budgeting."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.size(F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != ""))
    bpe = F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_ISH_RE}', 0)"))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        F.length("text").alias("n_chars_check"),
    ).orderBy("doc_id")


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_ISH_RE}')) AS bpe_ish_tokens,
       length(text) AS n_chars_check
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# document fingerprinting (rolling-hash winnowing)
# ---------------------------------------------------------------------------

WINNOW_K = 4


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, norm_md5, winnow_fp): md5 of whitespace-normalized text +
    a winnowing fingerprint = md5 over the {WINNOW_K} smallest rolling
    3-gram hashes (robust to local edits). Shuffle: one per-doc groupBy."""
    from ..operators.dedup import _shingles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.md5(F.regexp_replace(F.lower("text"), "\\s+", " ")).alias("norm_md5")
    sh = _shingles(spark, sf_dir).select(
        "doc_id", hash64(F.col("shingle")).alias("h")
    )
    winnow = (
        sh.groupBy("doc_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.slice(F.array_sort(F.collect_list("h")), 1, WINNOW_K),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("winnow_fp")
        )
    )
    return (
        d.select("doc_id", norm)
        .join(winnow, "doc_id", "left")
        .orderBy("doc_id")
    )


FINGERPRINT_SQL = (
    "WITH "
    # reuse the shingle CTE from dedup (kept textually in sync there)
    + __import__(
        "oracledb_datapump_spark.operators.dedup", fromlist=["SQL_SHINGLES_CTE"]
    ).SQL_SHINGLES_CTE
    + f""",
winnow AS (
  SELECT doc_id,
         md5(array_to_string(list_transform(
               list_slice(list_sort(list({sql_hash64("shingle")})), 1, {WINNOW_K}),
               x -> x::VARCHAR), ',')) AS winnow_fp
  FROM shingles
  GROUP BY doc_id
)
SELECT d.doc_id,
       md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) AS norm_md5,
       w.winnow_fp
FROM documents d LEFT JOIN winnow w ON d.doc_id = w.doc_id
ORDER BY d.doc_id
"""
)
