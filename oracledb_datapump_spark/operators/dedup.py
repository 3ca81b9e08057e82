"""Deduplication operators over the ``documents`` table.

Large-scale training-data-pipeline dedup, Spark-first:

- exact:      hash-groupBy on a content digest (one shuffle, map-side combine)
- minhash:    shingle → k minhashes → banded LSH → bucket self-join.
              All built-ins (split/window/groupBy/join) — no Python in the
              hot path; the band join is a shuffle on (band, signature),
              which is tiny compared to the corpus.
- simhash:    60-bit majority fingerprint; near-dups collide exactly →
              dedup is again a hash-groupBy.
- ngram_jaccard: exact Jaccard over 3-word shingle sets for pairs sharing
              ≥1 shingle (the verification-grade exact method; at 100 TB
              run it only on LSH candidates — composed in minhash_verified).
- embedding_cosine: near-dup pairs by exact cosine over the embeddings
              table (brute-force pair join; the ANN operators in
              similarity.py are the scale path).

Every operator has a DuckDB oracle twin built from the same primitives
(functions.text), so cross-engine equality is checkable end to end.

Scale notes: shingling multiplies rows ~Nx but stays pipelined (no
shuffle until the minhash groupBy); the LSH band join's fan-out is
bounded by bucket sizes — salting or raising bands×rows handles skewed
buckets; everything is whole-stage-codegen-able except nothing (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE, hash64, sql_hash64, sql_tokens_cte

NUM_HASHES = 16
BAND_ROWS = 4  # 4 bands × 4 rows
SHINGLE_N = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by md5(text): the survivor (min doc_id) and
    the duplicate count per distinct content."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .orderBy("keep_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
"""


# ---------------------------------------------------------------------------
# shingles (shared by minhash + jaccard)
# ---------------------------------------------------------------------------


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct 3-word shingles. Built with posexplode +
    lead() windows — stays in codegen, no Python."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), TOKEN_SPLIT_RE), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    sh = toks.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("tok"),
            F.lead("tok", 1).over(w),
            F.lead("tok", 2).over(w),
        ).alias("shingle"),
        F.lead("tok", SHINGLE_N - 1).over(w).alias("_last"),
    ).filter(F.col("_last").isNotNull())
    return sh.select("doc_id", "shingle").distinct()


SQL_SHINGLES_CTE = (
    sql_tokens_cte()
    + """,
shingles AS (
  SELECT DISTINCT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tokens
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY LEAD(tok, 2) OVER w IS NOT NULL
)"""
)


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, minhash): k=16 permutations approximated by salted
    md5 hashes (seed prepended). One groupBy per (doc, seed)."""
    sh = _shingles(spark, sf_dir)
    seeds = spark.range(NUM_HASHES).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            hash64(F.concat_ws(":", F.col("seed"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


SQL_MINHASH_CTE = (
    SQL_SHINGLES_CTE
    + f""",
minhashes AS (
  SELECT doc_id, seed, MIN({sql_hash64("seed || ':' || shingle")}) AS minhash
  FROM shingles, (SELECT unnest(range({NUM_HASHES}))::INT AS seed)
  GROUP BY doc_id, seed
)"""
)


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band signature
    (bands of {BAND_ROWS} rows over {NUM_HASHES} minhashes)."""
    mh = minhash_signatures(spark, sf_dir)
    bands = (
        mh.withColumn("band", (F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seed", "minhash"))
                        ),
                        lambda s: s.minhash.cast("string"),
                    ),
                    ",",
                )
            ).alias("sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


DEDUP_MINHASH_SQL = (
    "WITH "
    + SQL_MINHASH_CTE
    + f""",
bands AS (
  SELECT doc_id, seed // {BAND_ROWS} AS band,
         md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)) AS sig
  FROM minhashes
  GROUP BY doc_id, seed // {BAND_ROWS}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""
)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over distinct-token hashes.
    Explodes 60 bit positions per token — pure codegen arithmetic; the only
    shuffle is the final per-doc groupBy."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), TOKEN_SPLIT_RE), lambda t: t != "")
            )
        ).alias("tok"),
    ).select("doc_id", hash64(F.col("tok")).alias("h"))
    bits = spark.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("b"))
    votes = (
        toks.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "b",
            F.when(F.expr("(h >> b) & 1") == 1, 1).otherwise(-1).alias("v"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("v").alias("vote"))
    )
    return (
        votes.select(
            "doc_id",
            F.when(F.col("vote") > 0, F.expr("shiftleft(1L, b)"))
            .otherwise(F.lit(0))
            .alias("bitval"),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
        .orderBy("doc_id")
    )


SIMHASH_SQL = (
    "WITH "
    + sql_tokens_cte()
    + f""",
tok_hashes AS (
  SELECT DISTINCT doc_id, {sql_hash64("tok")} AS h FROM tokens
),
votes AS (
  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM tok_hashes, (SELECT unnest(range({SIMHASH_BITS}))::INT AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM votes
GROUP BY doc_id
ORDER BY doc_id
"""
)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification of near-dup candidates)
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.6


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ {JACCARD_THRESHOLD} for pairs sharing ≥1
    shingle. Pair generation by shingle join — at 100 TB restrict to LSH
    candidates first (dedup_minhash_pairs) to bound the fan-out."""
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


DEDUP_JACCARD_SQL = (
    "WITH "
    + SQL_SHINGLES_CTE
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""
)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.4


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vector pairs with cosine ≥ {COSINE_DUP_THRESHOLD}.
    Exact brute-force pair join (O(n²) — verification grade; the LSH/IVF
    operators in similarity.py are the 100 TB path). Cosine is computed
    with a sequential double fold (F.aggregate) so the result is
    bit-identical to DuckDB's sequential list functions."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (dot / (norm(F.col("emb_a")) * norm(F.col("emb_b")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


DEDUP_COSINE_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                 p -> p[1]::DOUBLE * p[2]::DOUBLE))
         / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
          * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs
WHERE cosine >= {COSINE_DUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""
