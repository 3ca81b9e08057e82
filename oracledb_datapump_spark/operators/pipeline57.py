"""Batch 57: retrieval reranking + keyword extraction.

- ``mmr_rerank_topk`` — Maximal Marginal Relevance (Carbonell &
  Goldstein 1998): greedy diversified rerank of a per-query candidate
  pool, the standard redundancy-removal pass between ANN retrieval and
  an LLM context window. λ=1/2, so the selection objective doubles to
  the all-integer ``rel − max_sim`` (quantized dot products).
- ``rake_keywords`` — RAKE (Rose et al. 2010): stopword-delimited
  phrase extraction with degree/frequency word scoring — the classic
  unsupervised keyword extractor, complementing the graph-ranked
  ``textrank_keywords``.
- ``ctfidf_source_terms`` — class-based TF-IDF (the BERTopic variant):
  per-source distinctive terms, tf_{t,s} · log(1 + A/f_t) with the
  repo's bitlen integer log surrogate.

All integer-exact under the cross-engine hash: embedding coordinates
quantize to ⌊x·1000⌋ BIGINTs before any dot product (float32→double is
exact, so both engines floor the same value), and every score is
integer arithmetic from there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.local_table import values_df

MMR_QUERIES = 4  # first vec_ids act as queries
MMR_POOL = 16  # ANN-style candidate pool per query
MMR_K = 5  # reranked picks per query

RAKE_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
RAKE_MAX_PHRASE = 3  # tokens per phrase (RAKE's usual cap)
RAKE_TOP = 25

CTFIDF_TOP = 8  # distinctive terms per source


def _qvec(col):
    """⌊x·1000⌋ per coordinate — the exact integer quantization both
    engines agree on (float32 widens to the same double)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * 1000).cast("long"))


def _idot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )


def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rank, neighbor_id, rel, mmr2): greedy MMR over a
    top-{MMR_POOL} relevance pool for the first {MMR_QUERIES} query
    vectors. Step 1 picks argmax relevance; step t picks
    argmax (rel − max_{s∈selected} sim(d,s)) — λ=1/2 doubled into
    integer space (``mmr2``; step 1 reports rel itself). Ties break by
    neighbor_id, so the greedy trajectory is total.

    Scale shape: the corpus is touched ONCE by the pool stage (broadcast
    queries × corpus scan + per-query top-{MMR_POOL} window — the same
    plan as ann_bruteforce_topk, or IVF/LSH at 100 TB); the rerank then
    runs on K·POOL bounded model state (≤{MMR_QUERIES}·{MMR_POOL} rows +
    a pool×pool similarity table), collected once — the greedy loop is
    inherently sequential and pool-sized, never corpus-sized."""
    from .emb_source import load_embeddings

    # widen=True (guide §2.2): the pool stage is the same broadcast
    # queries × corpus cosine fan-out as ann_bruteforce_topk (row-heavy
    # first stage); r16 benched 0.80× with the widen, kept per-consumer
    # in r17 when the absorber-level widen was split out.
    e = load_embeddings(spark, sf_dir, widen=True).select(
        "vec_id", _qvec(F.col("embedding")).alias("qv")
    )
    q = e.filter(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _idot(F.col("q_qv"), F.col("qv")).alias("rel"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("neighbor_id"))
    pool = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .drop("rn")
    )
    pool_v = pool.join(
        e.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    ).select("query_id", "neighbor_id", "rel", "qv")
    rows = pool_v.collect()  # bounded: ≤ MMR_QUERIES·MMR_POOL rows
    by_q: dict[int, list] = {}
    vecs: dict[tuple[int, int], list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["rel"]))
        vecs[(r["query_id"], r["neighbor_id"])] = r["qv"]
    out = []
    for qid, cands in by_q.items():
        cands = sorted(cands, key=lambda t: (-t[1], t[0]))
        selected: list[int] = []
        rel_of = dict(cands)
        for rank in range(1, MMR_K + 1):
            best = None
            for nid, rel in cands:
                if nid in selected:
                    continue
                if selected:
                    maxsim = max(
                        sum(
                            x * y
                            for x, y in zip(vecs[(qid, nid)], vecs[(qid, s)])
                        )
                        for s in selected
                    )
                    score = rel - maxsim
                else:
                    score = rel
                key = (-score, nid)
                if best is None or key < best[0]:
                    best = (key, nid, score)
            if best is None:  # pool smaller than K — selection exhausted
                break
            selected.append(best[1])
            out.append((qid, rank, best[1], rel_of[best[1]], best[2]))
    return values_df(spark,
        out, "query_id long, rank long, neighbor_id long, rel long, mmr2 long"
    ).orderBy("query_id", "rank")


def _mmr_sql() -> str:
    """Unrolled greedy selection: sel1..sel{MMR_K} CTEs, each picking the
    per-query ROW_NUMBER()=1 of rel − max(selected-pair dot)."""
    qv = "list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT))"
    steps = []
    for t in range(2, MMR_K + 1):
        selu = " UNION ALL ".join(
            f"SELECT query_id, neighbor_id FROM sel{j}" for j in range(1, t)
        )
        steps.append(
            f"""sel{t} AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel, mmr2, {t} AS rank FROM (
    SELECT c.query_id, c.neighbor_id, c.rel,
           c.rel - MAX(pr.dot) AS mmr2,
           ROW_NUMBER() OVER (PARTITION BY c.query_id
                              ORDER BY c.rel - MAX(pr.dot) DESC,
                                       c.neighbor_id) AS rn
    FROM pool c
    JOIN ({selu}) s ON s.query_id = c.query_id
    JOIN pairs pr ON pr.query_id = c.query_id
     AND pr.a = c.neighbor_id AND pr.b = s.neighbor_id
    WHERE c.neighbor_id NOT IN (
      SELECT neighbor_id FROM ({selu}) x WHERE x.query_id = c.query_id)
    GROUP BY c.query_id, c.neighbor_id, c.rel
  ) WHERE rn = 1
)"""
        )
    chain = ",\n".join(steps)
    union = " UNION ALL ".join(
        f"SELECT query_id, rank, neighbor_id, rel, mmr2 FROM sel{t}"
        for t in range(1, MMR_K + 1)
    )
    return f"""
WITH ev AS MATERIALIZED (
  SELECT vec_id, {qv} AS qv FROM embeddings
),
q AS (SELECT vec_id AS query_id, qv AS q_qv FROM ev WHERE vec_id < {MMR_QUERIES}),
scored AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(list_zip(q.q_qv, c.qv),
                                      p -> p[1] * p[2])) AS BIGINT) AS rel
  FROM ev c, q WHERE c.vec_id != q.query_id
),
pool AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {MMR_POOL}
),
pairs AS MATERIALIZED (
  SELECT p1.query_id, p1.neighbor_id AS a, p2.neighbor_id AS b,
         CAST(list_sum(list_transform(list_zip(e1.qv, e2.qv),
                                      p -> p[1] * p[2])) AS BIGINT) AS dot
  FROM pool p1
  JOIN pool p2 ON p1.query_id = p2.query_id AND p1.neighbor_id != p2.neighbor_id
  JOIN ev e1 ON e1.vec_id = p1.neighbor_id
  JOIN ev e2 ON e2.vec_id = p2.neighbor_id
),
sel1 AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel, rel AS mmr2, 1 AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, neighbor_id) AS rn
    FROM pool
  ) WHERE rn = 1
),
{chain}
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, rel, mmr2
FROM ({union})
ORDER BY query_id, rank
"""


MMR_RERANK_SQL = _mmr_sql()


# ---------------------------------------------------------------------------
# RAKE keywords
# ---------------------------------------------------------------------------


def _rake_phrases_expr():
    """Phrase column: tokens double-space-joined (the BPE boundary trick
    — every token owns its surrounding spaces, so the single-space
    stopword patterns below can never overlap), stopwords replaced by a
    '|' delimiter, then split into phrases."""
    norm = F.concat(
        F.lit(" "),
        F.array_join(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"), lambda t: t != ""
            ),
            "  ",
        ),
        F.lit(" "),
    )
    for sw in RAKE_STOPWORDS:
        norm = F.replace(norm, F.lit(f" {sw} "), F.lit(" | "))
    return F.filter(
        F.transform(
            F.split(norm, "\\|"),
            lambda s: F.array_join(
                F.filter(F.split(s, " +"), lambda t: t != ""), " "
            ),
        ),
        lambda p: (p != "")
        & (F.size(F.split(p, " ")) <= RAKE_MAX_PHRASE),
    )


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, phrase, score_ppm, freq): top-{RAKE_TOP} RAKE keyphrases.
    Candidate phrases are maximal stopword-free token runs (capped at
    {RAKE_MAX_PHRASE} tokens); word score = degree/freq in ppm (degree =
    Σ over phrase occurrences of the phrase length — co-occurrence
    counted RAKE-style); phrase score = Σ member word scores; rank by
    (score desc, phrase asc).

    Scale shape: phrase extraction is row-local (replace chain + split);
    two partial-aggregated groupBys (word stats, phrase totals) and a
    {RAKE_TOP}-row final window — the tfidf_search_topk cost class."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    phrases = d.select(F.explode(_rake_phrases_expr()).alias("phrase"))
    pw = phrases.select(
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split("phrase", " ")).alias("word"),
    )
    wstats = pw.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"),
    ).select(
        "word", F.expr("degree * 1000000 div freq").alias("wscore_ppm")
    )
    pscore = (
        pw.join(wstats, "word")
        .groupBy("phrase")
        .agg(F.sum("wscore_ppm").alias("tot"))
    )
    pfreq = phrases.groupBy("phrase").agg(F.count(F.lit(1)).alias("freq"))
    # a phrase's score counts each member word once: tot summed over
    # occurrences = score * freq, so divide exactly
    scored = pscore.join(pfreq, "phrase").select(
        "phrase",
        F.expr("tot div freq").cast("long").alias("score_ppm"),
        F.col("freq").cast("long").alias("freq"),
    )
    w = W.orderBy(F.desc("score_ppm"), F.asc("phrase"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= RAKE_TOP)
        .select("rnk", "phrase", "score_ppm", "freq")
        .orderBy("rnk")
    )


def _rake_sql() -> str:
    repl = "' ' || array_to_string(list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t != ''), '  ') || ' '"
    for sw in RAKE_STOPWORDS:
        repl = f"replace({repl}, ' {sw} ', ' | ')"
    return f"""
WITH phrases AS MATERIALIZED (
  SELECT phrase FROM (
    SELECT array_to_string(list_filter(string_split_regex(seg, ' +'),
                                       t -> t != ''), ' ') AS phrase
    FROM (SELECT unnest(string_split({repl}, '|')) AS seg FROM documents)
  ) WHERE phrase != '' AND len(string_split(phrase, ' ')) <= {RAKE_MAX_PHRASE}
),
pw AS MATERIALIZED (
  SELECT phrase, len(string_split(phrase, ' ')) AS plen,
         unnest(string_split(phrase, ' ')) AS word
  FROM phrases
),
wstats AS (
  SELECT word, CAST(SUM(plen) * 1000000 // COUNT(*) AS BIGINT) AS wscore_ppm
  FROM pw GROUP BY word
),
pscore AS (
  SELECT pw.phrase, SUM(w.wscore_ppm) AS tot
  FROM pw JOIN wstats w USING (word) GROUP BY pw.phrase
),
pfreq AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS freq FROM phrases GROUP BY phrase),
scored AS (
  SELECT p.phrase, CAST(p.tot // f.freq AS BIGINT) AS score_ppm, f.freq
  FROM pscore p JOIN pfreq f USING (phrase)
)
SELECT CAST(rnk AS BIGINT) AS rnk, phrase, score_ppm, freq FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_ppm DESC, phrase) AS rnk
  FROM scored
) WHERE rnk <= {RAKE_TOP}
ORDER BY rnk
"""


RAKE_KEYWORDS_SQL = _rake_sql()


# ---------------------------------------------------------------------------
# class-based TF-IDF (per-source distinctive terms)
# ---------------------------------------------------------------------------


def ctfidf_source_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, rnk, term, tf, idf_q, score): top-{CTFIDF_TOP}
    distinctive terms per source under class-based TF-IDF — treat each
    SOURCE as one concatenated class document (the BERTopic c-TF-IDF
    form): score = tf_{t,s} · bitlen((A + f_t) div f_t), where f_t is
    the corpus frequency and A the average class token mass — the
    ⌊log₂(1 + A/f_t)⌋+1 integer surrogate of the smoothed idf.

    Scale shape: one tokenize+explode, one (source, term) groupBy, one
    term groupBy joined back broadcast, a per-source top-{CTFIDF_TOP}
    window — nothing touches the corpus twice."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    ft = tf.groupBy("term").agg(F.sum("tf").alias("ft"))
    totals = tf.groupBy("source").agg(F.sum("tf").alias("mass"))
    avg_row = totals.agg(
        F.expr("sum(mass) div count(1)").alias("a")
    ).collect()[0]
    a = int(avg_row["a"])
    scored = (
        tf.join(F.broadcast(ft), "term")
        .select(
            "source",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.expr(f"CAST(length(bin(({a} + ft) div ft)) AS BIGINT)").alias(
                "idf_q"
            ),
        )
        .withColumn("score", (F.col("tf") * F.col("idf_q")).cast("long"))
    )
    w = W.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= CTFIDF_TOP)
        .select("source", "rnk", "term", "tf", "idf_q", "score")
        .orderBy("source", "rnk")
    )


CTFIDF_SOURCE_TERMS_SQL = f"""
WITH toks AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z]+'), t -> t != '')) AS term
  FROM documents
),
tf AS MATERIALIZED (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY source, term
),
ft AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ft FROM tf GROUP BY term),
a AS (SELECT CAST(SUM(tf) // COUNT(DISTINCT source) AS BIGINT) AS a FROM tf),
scored AS (
  SELECT tf.source, tf.term, tf.tf,
         CAST(length(bin((a.a + ft.ft) // ft.ft)) AS BIGINT) AS idf_q,
         CAST(tf.tf * length(bin((a.a + ft.ft) // ft.ft)) AS BIGINT) AS score
  FROM tf JOIN ft USING (term) CROSS JOIN a
)
SELECT source, CAST(rnk AS BIGINT) AS rnk, term, tf, idf_q, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY score DESC, term) AS rnk
  FROM scored
) WHERE rnk <= {CTFIDF_TOP}
ORDER BY source, rnk
"""
