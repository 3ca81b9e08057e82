"""Batch 56: unigram-LM (SentencePiece-style) tokenizer — one EM step.

Completes the tokenizer-training story pipeline31 opens: BPE covers the
merge-based family (``bpe_merge_candidates`` → ``bpe_encode_curve`` →
fertility); this batch adds the OTHER public tokenizer family, the
unigram language model of Kudo 2018 (SentencePiece): seed a substring
vocabulary, E-step = Viterbi-segment every word under current piece
scores, M-step = re-estimate piece scores from the Viterbi counts and
prune the bottom of the vocabulary.

Everything is integer-exact under the cross-engine hash. True unigram-LM
scores are float log-probabilities — engine-divergent — so the piece
cost uses the repo's canonical integer log surrogate
(``unigram_surprise`` / ``source_token_entropy``):

    cost(piece) = bitlen((T*T) div (f*f))  ≈  2·log2(T/f)

where f is the piece's seed frequency and T the vocabulary total —
``length(bin(x))`` in both engines, exact BIGINT arithmetic throughout
(the squaring doubles the resolution of plain bitlen; T < 3·10⁹ keeps
T² inside BIGINT, comfortable for a vocabulary-table statistic). The
Viterbi objective is the composite integer

    comp = Σ cost·16 + n_pieces        (n_pieces ≤ MAXLEN=12 < 16)

minimized with a total, engine-identical tie-break: (comp asc, segment
string asc) — binary string comparison in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline31 import TOKEN_SPLIT_RE_31

UNI_MAXLEN = 12  # words longer than this are out of model scope
UNI_PLEN = 4  # max piece length in the seed vocabulary
UNI_VTOP = 256  # multi-char seed pieces kept (freq desc, piece asc)
UNI_PRUNE = 64  # bottom-p prune: multi-char pieces dropped after EM


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-word frequency table (the Zipf-bounded loop state)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words_col = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_RE_31),
        lambda w: (F.length(w) >= 2) & (F.length(w) <= UNI_MAXLEN),
    )
    return (
        d.select(F.explode(words_col).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # loop state: re-read MAXLEN+2 times
    )


def _seed_vcost(wc: DataFrame) -> DataFrame:
    """Seed vocabulary (all chars + top-VTOP multi-char substrings) with
    integer costs bitlen(T^2 div f^2)."""
    subs = wc.select(
        "cnt",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), i -> "
                f"transform(sequence(1, least({UNI_PLEN}, length(w) - i + 1)), "
                f"L -> substring(w, i, L))))"
            )
        ).alias("piece"),
    ).groupBy("piece").agg(F.sum("cnt").alias("f"))
    from pyspark.sql import Window

    multi_rnk = Window.orderBy(F.desc("f"), F.asc("piece"))
    vocab = (
        subs.filter(F.length("piece") == 1)
        .select("piece", "f")
        .unionByName(
            subs.filter(F.length("piece") > 1)
            .withColumn("rnk", F.row_number().over(multi_rnk))
            .filter(F.col("rnk") <= UNI_VTOP)
            .select("piece", "f")
        )
    )
    tot = vocab.agg(F.sum("f").alias("t"))
    return (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            "piece",
            F.col("f").cast("long").alias("f"),
            F.expr("CAST(length(bin((t * t) div (f * f))) AS BIGINT)").alias(
                "cost"
            ),
        )
        .localCheckpoint(eager=True)  # joined MAXLEN times
    )


def _viterbi_final(wc: DataFrame, vcost: DataFrame) -> DataFrame:
    """Viterbi-segment every word of ``wc`` under ``vcost``; returns
    (w, cnt, seg) — the per-word best segmentation."""
    dp = {
        0: wc.select(
            "w",
            "cnt",
            F.lit(0).alias("pos"),
            F.lit(0).cast("long").alias("comp"),
            F.lit("").alias("seg"),
        ).localCheckpoint(eager=True)
    }
    for i in range(1, UNI_MAXLEN + 1):
        prev = None
        for j in range(max(0, i - UNI_PLEN), i):
            if j in dp:
                prev = dp[j] if prev is None else prev.unionByName(dp[j])
        cand = (
            prev.filter(F.length("w") >= i)
            .withColumn(
                "piece", F.expr(f"substring(w, pos + 1, {i} - pos)")
            )
            .join(F.broadcast(vcost.select("piece", "cost")), "piece")
            .select(
                "w",
                (F.col("comp") + F.col("cost") * 16 + 1).alias("comp"),
                F.when(F.col("seg") == "", F.col("piece"))
                .otherwise(F.concat("seg", F.lit(" "), F.col("piece")))
                .alias("seg"),
                "cnt",
            )
        )
        # deterministic argmin: min over struct compares (comp, seg)
        # lexicographically — partial-aggregated, no window shuffle
        best = (
            cand.groupBy("w")
            .agg(F.min(F.struct("comp", "seg", "cnt")).alias("b"))
            .select(
                "w",
                F.col("b.cnt").alias("cnt"),
                F.lit(i).alias("pos"),
                F.col("b.comp").alias("comp"),
                F.col("b.seg").alias("seg"),
            )
        )
        dp[i] = best.localCheckpoint(eager=True)

    final = None
    for i in range(2, UNI_MAXLEN + 1):
        fi = dp[i].filter(F.length("w") == i)
        final = fi if final is None else final.unionByName(fi)
    return final


def unigram_lm_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(piece, plen, seed_freq, cost_q, em_count, kept): one full EM
    iteration of a unigram-LM tokenizer over the corpus word-frequency
    table.

    Seed: every substring of length 1..{UNI_PLEN} of every distinct
    word (2 ≤ len ≤ {UNI_MAXLEN}), frequency-weighted by corpus word
    count; the vocabulary is ALL single characters (coverage guarantee
    — every word stays segmentable) plus the top-{UNI_VTOP} multi-char
    substrings by (freq desc, piece asc).

    E-step: per-word Viterbi over piece costs (integer surrogate, see
    module docstring) — dp[i] = best segmentation of the first i chars,
    candidates dp[j] + piece(word[j+1..i]) for i-j ≤ {UNI_PLEN};
    deterministic argmin by (composite cost asc, segmentation asc).
    M-step: piece em_count = Σ word_freq over Viterbi uses; the bottom
    {UNI_PRUNE} multi-char pieces by (em_count asc, piece asc) are
    pruned (kept=false) — single characters are never pruned, exactly
    as SentencePiece protects its character alphabet.

    Scale shape: the model state is the DISTINCT-word table — the
    Zipf-bounded reduction of a 100 TB corpus (one tokenize+groupBy
    shuffle ever touches raw text). The Viterbi loop is
    {UNI_MAXLEN} rounds over that table, each a broadcast join against
    the ≤{UNI_VTOP}+alphabet piece table plus one partial-aggregated
    min-struct groupBy per round — the same iterative-model cost class
    as bpe_encode_curve's merge rounds (train on word frequencies, not
    the stream; Kudo's own trainer does the same). No window over the
    corpus, no cartesian pair stage anywhere.

    Reference scope note: the reference engine ships no tokenizer — this
    is a beyond-parity training-data operator (SURVEY §6 family)."""
    from pyspark.sql import Window

    wc = _word_counts(spark, sf_dir)
    vcost = _seed_vcost(wc)
    final = _viterbi_final(wc, vcost)
    em = (
        final.select("cnt", F.explode(F.split("seg", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("em_count"))
    )
    scored = (
        vcost.join(em, "piece", "left")
        .select(
            "piece",
            F.length("piece").cast("long").alias("plen"),
            F.col("f").alias("seed_freq"),
            F.col("cost").alias("cost_q"),
            F.coalesce("em_count", F.lit(0)).cast("long").alias("em_count"),
        )
    )
    prune_rnk = Window.orderBy(F.asc("em_count"), F.asc("piece"))
    multi = scored.filter(F.col("plen") > 1).withColumn(
        "prn", F.row_number().over(prune_rnk)
    )
    return (
        scored.filter(F.col("plen") == 1)
        .withColumn("kept", F.lit(True))
        .unionByName(
            multi.select(
                "piece",
                "plen",
                "seed_freq",
                "cost_q",
                "em_count",
                (F.col("prn") > UNI_PRUNE).alias("kept"),
            )
        )
        .orderBy(F.desc("em_count"), F.asc("piece"))
    )


# Shared oracle text: the seed-vocabulary CTE prefix (words -> vcost),
# used by the em-step oracle below and pipeline60's encode-fertility twin
SEED_SQL_CTES = f"""WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(text), '{TOKEN_SPLIT_RE_31}'),
             x -> len(x) >= 2 AND len(x) <= {UNI_MAXLEN})) AS w
    FROM documents
  ) GROUP BY w
),
subs AS MATERIALIZED (
  SELECT piece, SUM(cnt) AS f FROM (
    SELECT cnt, unnest(flatten(list_transform(range(len(w)), i ->
             list_transform(range(least({UNI_PLEN}, len(w) - i)),
                            L -> substr(w, i + 1, L + 1))))) AS piece
    FROM words
  ) GROUP BY piece
),
vocab AS MATERIALIZED (
  SELECT piece, f FROM subs WHERE len(piece) = 1
  UNION ALL
  SELECT piece, f FROM (
    SELECT piece, f, ROW_NUMBER() OVER (ORDER BY f DESC, piece) AS rnk
    FROM subs WHERE len(piece) > 1
  ) WHERE rnk <= {UNI_VTOP}
),
tot AS (SELECT CAST(SUM(f) AS BIGINT) AS t FROM vocab),
vcost AS MATERIALIZED (
  SELECT piece, CAST(f AS BIGINT) AS f,
         CAST(length(bin((t * t) // (f * f))) AS BIGINT) AS cost
  FROM vocab CROSS JOIN tot
),"""


def viterbi_sql_chain(tag: str = "") -> str:
    """CTE chain dp{tag}0..dp{tag}N + final{tag}: the {UNI_MAXLEN}-step
    Viterbi recurrence under piece-cost table ``vcost{tag}``, each step
    joining the previous ≤{UNI_PLEN} dp layers and taking the per-word
    ROW_NUMBER()=1 over (comp asc, seg asc). Reused (with distinct
    tags) by every oracle that needs a segmentation pass — the em-step
    oracle below and pipeline60's encode-fertility twin."""
    steps = [
        f"""dp{tag}0 AS MATERIALIZED (
  SELECT w, cnt, 0 AS pos, CAST(0 AS BIGINT) AS comp, '' AS seg FROM words
)"""
    ]
    for i in range(1, UNI_MAXLEN + 1):
        prev = " UNION ALL ".join(
            f"SELECT * FROM dp{tag}{j}"
            for j in range(max(0, i - UNI_PLEN), i)
        )
        steps.append(
            f"""dp{tag}{i} AS MATERIALIZED (
  SELECT w, cnt, pos, comp, seg FROM (
    SELECT w, cnt, {i} AS pos, comp, seg,
           ROW_NUMBER() OVER (PARTITION BY w ORDER BY comp, seg) AS rn
    FROM (
      SELECT c.w, c.cnt,
             c.comp + v.cost * 16 + 1 AS comp,
             CASE WHEN c.seg = '' THEN v.piece
                  ELSE c.seg || ' ' || v.piece END AS seg
      FROM ({prev}) c
      JOIN vcost{tag} v ON v.piece = substr(c.w, c.pos + 1, {i} - c.pos)
      WHERE len(c.w) >= {i}
    )
  ) WHERE rn = 1
)"""
        )
    dp_final = " UNION ALL ".join(
        f"SELECT w, cnt, seg FROM dp{tag}{i} WHERE len(w) = {i}"
        for i in range(2, UNI_MAXLEN + 1)
    )
    steps.append(f"final{tag} AS MATERIALIZED ({dp_final})")
    return ",\n".join(steps)


def _unigram_lm_em_step_sql() -> str:
    """Unrolled-CTE oracle (the bpe_encode_curve / kcore_peel_curve
    pattern), riding viterbi_sql_chain."""
    dp_chain = viterbi_sql_chain("")
    return f"""
{SEED_SQL_CTES}
{dp_chain},
em AS (
  SELECT piece, SUM(cnt) AS em_count FROM (
    SELECT cnt, unnest(string_split(seg, ' ')) AS piece FROM final
  ) GROUP BY piece
),
scored AS (
  SELECT v.piece, CAST(len(v.piece) AS BIGINT) AS plen,
         v.f AS seed_freq, v.cost AS cost_q,
         CAST(COALESCE(em.em_count, 0) AS BIGINT) AS em_count
  FROM vcost v LEFT JOIN em ON em.piece = v.piece
)
SELECT piece, plen, seed_freq, cost_q, em_count, TRUE AS kept
FROM scored WHERE plen = 1
UNION ALL
SELECT piece, plen, seed_freq, cost_q, em_count, prn > {UNI_PRUNE} AS kept
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY em_count, piece) AS prn
  FROM scored WHERE plen > 1
)
ORDER BY em_count DESC, piece
"""


UNIGRAM_LM_EM_STEP_SQL = _unigram_lm_em_step_sql()
