"""Held-out language-model scoring and Markov sequence analytics.

- ``ngram_lm_crossentropy``: train an add-one-smoothed bigram LM on the
  *train* split of the documents corpus and score every split with it —
  the held-out cross-entropy report (train vs val vs test bits/bigram)
  that detects both overfitting headroom and split leakage. Uses the
  same content-independent hash split as ``textprep.corpus_split`` and
  the same bitlen-of-integer-division surprisal quantization as
  ``textstats.bigram_surprise`` so it sits under the cross-engine hash.
- ``markov_transition_matrix``: the user-behavior Markov chain over
  event types — 1-step transition probabilities (ppm) AND the 2-step
  probabilities computed by squaring the matrix *relationally* (a
  self-join on the intermediate state): matrix algebra as a join-agg,
  the pattern that scales to state spaces far beyond driver memory.

No reference counterpart (the reference moves data, it does not model
it); these extend the LLM-pipeline text/behavior analytics families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import load_events
from ..functions.text import TOKEN_SPLIT_RE, hash64, sql_hash64, tokens
from .textprep import load_docs

# ---------------------------------------------------------------------------
# held-out bigram-LM cross-entropy by split
# ---------------------------------------------------------------------------


def _split_col(doc_id) -> F.Column:
    """Same 80/10/10 hash split as textprep.corpus_split."""
    bucket = hash64(F.concat(F.lit("split:"), doc_id.cast("string"))) % 100
    return (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )


def ngram_lm_crossentropy(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(split, n_docs, n_bigrams, total_bits, bits_per_bigram_q): train
    an add-one bigram LM on the train split only, score each split's
    bigrams with bitlen((c_pre + V) div (c_big + 1)) — counts and vocab
    V all from TRAIN — and report per-split totals. bits_per_bigram_q =
    total_bits·1000 div n_bigrams. A train row much cheaper than
    val/test = memorization headroom; a val row cheaper than test =
    split leakage.

    Plan: ONE tokenize+bigram pass over the corpus with the split tag
    computed row-locally; the model (train bigram counts + prefix
    counts + V) is broadcast back onto the stream (vocab² bounded by
    Zipf — cap with a min-count prune at 100 TB, standard LM pruning);
    unseen heads/bigrams fall out of the left join as COALESCE(0). One
    final 3-row groupBy."""
    d = load_docs(spark, sf_dir, docs)
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
    scored = (
        big.join(
            F.broadcast(bcnt.select("bigram", "c_big")), "bigram", "left"
        )
        .join(F.broadcast(pcnt), "t1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "split",
            F.expr(
                "CAST(length(bin((COALESCE(c_pre, 0) + v)"
                " div (COALESCE(c_big, 0) + 1))) AS BIGINT)"
            ).alias("bits"),
        )
    )
    return (
        scored.groupBy("split")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").cast("long").alias("total_bits"),
        )
        .select(
            "split",
            "n_docs",
            "n_bigrams",
            "total_bits",
            F.expr("(total_bits * 1000) div n_bigrams").alias(
                "bits_per_bigram_q"
            ),
        )
        .orderBy("split")
    )


NGRAM_LM_CROSSENTROPY_SQL = f"""
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
), scored AS (
  SELECT g.doc_id, g.split,
         CAST(length(bin((COALESCE(p.c_pre, 0) + vocab.v)
                         // (COALESCE(b.c_big, 0) + 1))) AS BIGINT) AS bits
  FROM big g
  LEFT JOIN bcnt b USING (bigram)
  LEFT JOIN pcnt p ON g.t1 = p.t1
  CROSS JOIN vocab
)
SELECT split,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       CAST((SUM(bits) * 1000) // COUNT(*) AS BIGINT) AS bits_per_bigram_q
FROM scored
GROUP BY split
ORDER BY split
"""


# ---------------------------------------------------------------------------
# Markov transition matrix with relational matrix squaring
# ---------------------------------------------------------------------------


def markov_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type, n_transitions, p_ppm, p2_ppm): the event-
    type Markov chain — observed 1-step transition probability (ppm,
    row-normalized) and the 2-step probability from squaring the matrix
    relationally: p2(a,c) = Σ_b p(a,b)·p(b,c), computed as a self-join
    on the intermediate state with ppm·ppm div 1e6 integer arithmetic.

    Plan: ONE user-keyed shuffle for the lag window (shared profile
    with the sessionizer), a ≤|types|²-row transition agg, then the
    matmul as a broadcast self-join over that tiny matrix. The same
    join-agg IS the scale path when the state space outgrows driver
    memory (product SKUs, URLs): relational matrix algebra needs no
    dense representation anywhere."""
    from pyspark.sql.window import Window as W

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    rows = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("row_tot")
    )
    m = pairs.join(F.broadcast(rows), "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.expr(
            "CAST((CAST(n_transitions AS DECIMAL(38,0)) * 1000000)"
            " div row_tot AS LONG)"
        ).alias("p_ppm"),
    )
    # M² relationally: join on the intermediate state, integer ppm algebra
    left = m.select(
        F.col("prev_type").alias("a"),
        F.col("next_type").alias("b"),
        F.col("p_ppm").alias("p_ab"),
    )
    right = m.select(
        F.col("prev_type").alias("b"),
        F.col("next_type").alias("c"),
        F.col("p_ppm").alias("p_bc"),
    )
    m2 = (
        left.join(F.broadcast(right), "b")
        .groupBy("a", "c")
        .agg(
            F.sum(
                F.expr("(CAST(p_ab AS DECIMAL(38,0)) * p_bc) div 1000000")
            )
            .cast("long")
            .alias("p2_ppm")
        )
    )
    return (
        m.join(
            m2,
            (m.prev_type == m2.a) & (m.next_type == m2.c),
            "left",
        )
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            "p_ppm",
            F.coalesce("p2_ppm", F.lit(0)).cast("long").alias("p2_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


MARKOV_TRANSITION_MATRIX_SQL = """
WITH g AS (
  SELECT event_type AS next_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM g WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT prev_type, next_type, n_transitions,
         CAST(n_transitions * 1000000 // SUM(n_transitions)
              OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppm
  FROM pairs
),
m2 AS (
  SELECT l.prev_type AS a, r.next_type AS c,
         CAST(SUM(l.p_ppm * r.p_ppm // 1000000) AS BIGINT) AS p2_ppm
  FROM m l JOIN m r ON l.next_type = r.prev_type
  GROUP BY 1, 2
)
SELECT m.prev_type, m.next_type, m.n_transitions, m.p_ppm,
       CAST(COALESCE(m2.p2_ppm, 0) AS BIGINT) AS p2_ppm
FROM m LEFT JOIN m2 ON m.prev_type = m2.a AND m.next_type = m2.c
ORDER BY m.prev_type, m.next_type
"""
