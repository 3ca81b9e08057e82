"""Text-analysis operators over ``documents``: language ID, quality
scoring, token counting, document fingerprinting.

All pure built-in column expressions (whole-stage codegen; no UDFs), each
with a DuckDB oracle twin. Per-document operators are embarrassingly
parallel — no shuffle except where noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .docs_source import load_docs
from ..functions.text import TOKEN_SPLIT_RE, hash64, sql_hash64, sql_tokens_cte, tokens

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


_LANGS = sorted(STOPWORDS)  # alphabetical — doubles as the tie-break order


def lang_id(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, lang_pred, hits): argmax of stopword occurrences per
    language (ties → lexicographically first language; zero hits →
    'unknown').

    Shuffle-free: per-language hit counts are row-local array filters
    (size(filter(tokens, t IN words))) and the argmax is a CASE chain in
    alphabetical order — one codegen'd pass over the corpus, no
    explode/join/window. The earlier formulation (explode + broadcast-join
    + window) cost 10 exchanges; this costs zero."""
    d = load_docs(spark, sf_dir, docs)
    toks = F.filter(F.split(F.lower("text"), TOKEN_SPLIT_RE), lambda t: t != "")
    with_toks = d.select("doc_id", toks.alias("toks"))
    hit_cols = {
        lang: F.expr(
            "size(filter(toks, t -> t IN ({})))".format(
                ", ".join(f"'{w}'" for w in words)
            )
        )
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*hit_cols.values())
    pred = F.when(best == 0, F.lit("unknown"))
    for lang in _LANGS:  # alphabetical first-match = lex tie-break
        cond = None
        for other in _LANGS:
            if other == lang:
                continue
            c = hit_cols[lang] >= hit_cols[other]
            cond = c if cond is None else (cond & c)
        pred = pred.when(cond, F.lit(lang))
    return with_toks.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("long").alias("hits"),
    ).orderBy("doc_id")


def _sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(toks, t -> t IN ({words})))"


def _sql_pred() -> str:
    clauses = []
    for lang in _LANGS:
        conds = " AND ".join(
            f"{_sql_hits(lang)} >= {_sql_hits(other)}"
            for other in _LANGS
            if other != lang
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "\n            ".join(clauses)


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest({", ".join(_sql_hits(lg) for lg in _LANGS)}) = 0 THEN 'unknown'
            {_sql_pred()}
       END AS lang_pred,
       CAST(greatest({", ".join(_sql_hits(lg) for lg in _LANGS)}) AS BIGINT) AS hits
FROM t
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_score(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len, ttr,
    quality_score). length/diversity heuristics; single pass, no shuffle
    (per-row array ops)."""
    d = load_docs(spark, sf_dir, docs)
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


def token_count(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens, n_chars_check): whitespace
    tokens + a BPE-ish regex count (letter runs | single digits | other
    glyphs) — the cheap proxy for tokenizer budgeting."""
    d = load_docs(spark, sf_dir, docs)
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


def doc_fingerprint(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, norm_md5, winnow_fp): md5 of whitespace-normalized text +
    a winnowing fingerprint = md5 over the {WINNOW_K} smallest rolling
    3-gram hashes (robust to local edits). Shuffle: one per-doc groupBy."""
    from ..operators.dedup import _shingles

    d = load_docs(spark, sf_dir, docs)
    norm = F.md5(F.regexp_replace(F.lower("text"), "\\s+", " ")).alias("norm_md5")
    sh = _shingles(spark, sf_dir, docs).select(
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


# ---------------------------------------------------------------------------
# unigram surprise (perplexity-proxy quality signal)
# ---------------------------------------------------------------------------


def unigram_surprise(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_toks, surprise, surprise_per_tok_q): an integer
    perplexity proxy — each token instance contributes
    bitlen(T // occ(tok)), i.e. floor(log2(corpus rarity)) + 1, where T
    is total corpus token instances and occ the token's instance count.
    High values = improbable text under the corpus unigram model; the
    quality-filtering signal a real pipeline gets from an LM, made
    bit-exact (true log-probabilities are float and engine-divergent;
    bitlen-of-integer-division is the same trick the HLL sketch uses).

    Plan: one groupBy(tok) for the unigram table (|vocab| rows out of
    the shuffle), broadcast back onto the token stream, one
    groupBy(doc). At 100 TB the unigram table still fits in a broadcast
    (vocab grows sub-linearly); nothing else shuffles more than one row
    per document."""
    d = load_docs(spark, sf_dir, docs)
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    occ = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("occ"))
    tot = occ.agg(F.sum("occ").alias("t"))
    per_tok = (
        toks.join(F.broadcast(occ), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.length(F.bin(F.expr("t div occ"))).cast("long").alias("bits"),
        )
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("bits").alias("surprise"),
        )
        .select(
            "doc_id",
            "n_toks",
            "surprise",
            F.expr("(surprise * 1000000) div n_toks").alias("surprise_per_tok_q"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_SURPRISE_SQL = f"""
WITH {sql_tokens_cte()},
occ AS (SELECT tok, COUNT(*) AS occ FROM tokens GROUP BY tok),
tot AS (SELECT CAST(SUM(occ) AS BIGINT) AS t FROM occ),
per_tok AS (
  SELECT tk.doc_id,
         CAST(length(bin(tot.t // occ.occ)) AS BIGINT) AS bits
  FROM tokens tk JOIN occ USING (tok) CROSS JOIN tot
)
SELECT doc_id,
       COUNT(*) AS n_toks,
       CAST(SUM(bits) AS BIGINT) AS surprise,
       CAST((SUM(bits) * 1000000) // COUNT(*) AS BIGINT) AS surprise_per_tok_q
FROM per_tok
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# n-gram repetition fractions (the Gopher repetition rules quality_gopher's
# word-level stats do not cover)
# ---------------------------------------------------------------------------

REP_MIN_TOKENS = 3  # docs shorter than the largest n-gram are excluded


def repetition_ngram_fracs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_2grams, top2_ppm, n_3grams, top3_ppm): per-document
    top-2-gram and top-3-gram repetition fractions (parts-per-million) —
    the published Gopher repetition filters ("fraction of characters in
    the most common n-gram") at the token level; a high top-n-gram share
    marks boilerplate/templated text that word-level stats miss.

    Plan: n-grams are built row-locally (sequence+transform, the span
    machinery) and travel as 60-bit hashes; the 2- and 3-gram streams
    union into ONE partial-aggregated groupBy(doc, n, gram) →
    groupBy(doc, n) max/sum → a conditional-aggregation pivot back to
    one row per doc. Hot boilerplate grams collapse map-side, same
    skew-free shape as span_dup_score; everything integral → the DuckDB
    twin hashes identically."""
    d = load_docs(spark, sf_dir, docs)
    wt = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= REP_MIN_TOKENS
    )

    def gram_stream(n: int):
        grams = F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, n)),
        )
        return wt.select(
            "doc_id", F.lit(n).alias("n"), F.explode(grams).alias("gram")
        ).select("doc_id", "n", hash64(F.col("gram")).alias("gid"))

    per_gram = (
        gram_stream(2)
        .unionAll(gram_stream(3))
        .groupBy("doc_id", "n", "gid")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_n = per_gram.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"), F.max("c").alias("top")
    )
    ppm = F.floor(F.lit(1000000) * F.col("top") / F.col("total")).cast("long")
    stat = per_n.select("doc_id", "n", F.col("total").cast("long").alias("total"), ppm.alias("ppm"))
    return (
        stat.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("n") == 2, F.col("total"))).alias("n_2grams"),
            F.sum(F.when(F.col("n") == 2, F.col("ppm"))).alias("top2_ppm"),
            F.sum(F.when(F.col("n") == 3, F.col("total"))).alias("n_3grams"),
            F.sum(F.when(F.col("n") == 3, F.col("ppm"))).alias("top3_ppm"),
        )
        .orderBy("doc_id")
    )


REPETITION_NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, 2 AS n,
         {sql_hash64("array_to_string(l[i+1:i+2], ' ')")} AS gid
  FROM toks, unnest(range(len(l) - 1)) AS t(i)
  WHERE len(l) >= {REP_MIN_TOKENS}
  UNION ALL
  SELECT doc_id, 3 AS n,
         {sql_hash64("array_to_string(l[i+1:i+3], ' ')")} AS gid
  FROM toks, unnest(range(len(l) - 2)) AS t(i)
  WHERE len(l) >= {REP_MIN_TOKENS}
), per_gram AS (
  SELECT doc_id, n, gid, COUNT(*) AS c FROM grams GROUP BY doc_id, n, gid
), per_n AS (
  SELECT doc_id, n, SUM(c) AS total, MAX(c) AS top FROM per_gram GROUP BY doc_id, n
)
SELECT doc_id,
       CAST(SUM(CASE WHEN n = 2 THEN total END) AS BIGINT) AS n_2grams,
       CAST(SUM(CASE WHEN n = 2 THEN FLOOR(1000000 * top / total) END) AS BIGINT) AS top2_ppm,
       CAST(SUM(CASE WHEN n = 3 THEN total END) AS BIGINT) AS n_3grams,
       CAST(SUM(CASE WHEN n = 3 THEN FLOOR(1000000 * top / total) END) AS BIGINT) AS top3_ppm
FROM per_n
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bigram conditional surprise (second-order LM quality signal)
# ---------------------------------------------------------------------------


def bigram_surprise(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_bigrams, surprise2, surprise2_per_tok_q): second-order
    corpus LM surprise — each bigram instance (t1, t2) contributes
    bitlen((occ(t1·) + V) div (occ(t1 t2) + 1)), the add-one-smoothed
    conditional rarity of t2 given t1 (V = distinct-unigram count).
    Where ``unigram_surprise`` scores marginal token rarity, this scores
    sequence plausibility — the pair of numbers a CCNet-style quality
    filter reads off its LM. Same bitlen-of-integer-division
    quantization, so it sits inside the cross-engine hash gate.

    Plan: one tokenize pass feeds both count tables (prefix-unigram
    occurrences among bigram heads = occ(t1·) is just unigram occ over
    positions 0..n-2, i.e. the bigram table aggregated by t1 — ONE
    groupBy); the bigram table broadcasts back onto the stream (vocab²
    is bounded by real-text Zipf — at 100 TB cap it with a min-count
    filter, the standard LM pruning). One final groupBy(doc_id)."""
    d = load_docs(spark, sf_dir, docs)
    wt = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    # r16: pinned — the bigram count table and the final per-doc join
    # are two subtrees that each re-ran the tokenize→bigram explode
    # over the corpus (guide §1.2)
    big = wt.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 2)),
            )
        ).alias("gram"),
    ).select(
        "doc_id",
        F.split(F.col("gram"), " ", 2).getItem(0).alias("t1"),
        F.col("gram").alias("bigram"),
    ).localCheckpoint(eager=True)
    bcnt = big.groupBy("t1", "bigram").agg(F.count(F.lit(1)).alias("c_big"))
    pcnt = bcnt.groupBy("t1").agg(F.sum("c_big").alias("c_pre"))
    vocab = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    rates = (
        bcnt.join(F.broadcast(pcnt), "t1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.length(F.bin(F.expr("(c_pre + v) div (c_big + 1)")))
            .cast("long")
            .alias("bits"),
        )
    )
    return (
        big.join(F.broadcast(rates), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").alias("surprise2"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "surprise2",
            F.expr("(surprise2 * 1000000) div n_bigrams").alias(
                "surprise2_per_tok_q"
            ),
        )
        .orderBy("doc_id")
    )


BIGRAM_SURPRISE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '') AS l
  FROM documents
), big AS (
  SELECT doc_id, l[i+1] AS t1, l[i+1] || ' ' || l[i+2] AS bigram
  FROM toks, unnest(range(len(l) - 1)) AS t(i)
  WHERE len(l) >= 2
), bcnt AS (
  SELECT t1, bigram, COUNT(*) AS c_big FROM big GROUP BY t1, bigram
), pcnt AS (
  SELECT t1, SUM(c_big) AS c_pre FROM bcnt GROUP BY t1
), vocab AS (
  SELECT COUNT(DISTINCT tok) AS v FROM (
    SELECT unnest(l) AS tok FROM toks)
), rates AS (
  SELECT b.bigram,
         CAST(length(bin((p.c_pre + vocab.v) // (b.c_big + 1))) AS BIGINT) AS bits
  FROM bcnt b JOIN pcnt p USING (t1) CROSS JOIN vocab
)
SELECT g.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(r.bits) AS BIGINT) AS surprise2,
       CAST((SUM(r.bits) * 1000000) // COUNT(*) AS BIGINT) AS surprise2_per_tok_q
FROM big g JOIN rates r USING (bigram)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# per-language tokenizer fertility
# ---------------------------------------------------------------------------


def tokenizer_fertility(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(lang, n_docs, total_words, total_subtokens, fertility_q):
    subtokens-per-word by language — THE tokenizer-equity metric
    (languages a BPE vocabulary serves badly pay more subtokens per
    word, inflating their effective sequence length and training cost).
    fertility_q = total_subtokens·1000 div total_words (milli-subtokens
    per word). Uses the whitespace word count and the BPE-ish subtoken
    count from ``token_count``'s contract.

    Plan: both counts are row-local regex sizes; one |langs|-row
    groupBy. Corpus-sized cost is the scan."""
    d = load_docs(spark, sf_dir, docs)
    per = d.select(
        "lang",
        F.size(
            F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != "")
        ).alias("ws"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{BPE_ISH_RE}', 0)")
        ).alias("bpe"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("total_words"),
            F.sum("bpe").alias("total_subtokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_words",
            "total_subtokens",
            F.expr("(total_subtokens * 1000) div total_words").alias(
                "fertility_q"
            ),
        )
        .orderBy("lang")
    )


TOKENIZER_FERTILITY_SQL = f"""
WITH per AS (
  SELECT lang,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t != '')) AS ws,
         len(regexp_extract_all(lower(text), '{BPE_ISH_RE}')) AS bpe
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS total_words,
       CAST(SUM(bpe) AS BIGINT) AS total_subtokens,
       CAST((SUM(bpe) * 1000) // SUM(ws) AS BIGINT) AS fertility_q
FROM per
GROUP BY lang
ORDER BY lang
"""
