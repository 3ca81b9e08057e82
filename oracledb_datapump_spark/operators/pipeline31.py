"""Batch 31: ordered funnel matching, label-centroid similarity, BPE
merge candidates.

Sequential-pattern, embedding-geometry and tokenizer-bootstrap
operators; all integer-deterministic under the cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.local_table import values_df

# ---------------------------------------------------------------------------
# Ordered funnel with per-step gap constraint (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_STEP_GAP_US = 3 * 86_400 * 1_000_000  # 3 days per step


def funnel_ordered_within_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row ordered-funnel report: users whose event log contains
    view → click → purchase IN ORDER (each later step strictly after
    the earliest qualifying prior step), plus the completion count
    under a per-step gap bound ({FUNNEL_STEP_GAP_US}µs = 3 days). The
    earliest-qualifying semantics (t1 = first view, t2 = first click
    after t1, t3 = first purchase after t2) is the MATCH_RECOGNIZE
    `A B C` pattern with AFTER MATCH SKIP — expressed as two keyed
    join+agg rounds, which is how a funnel engine actually runs it on
    a sharded event store (each round shuffles on user_id only).

    Unlike session_funnel_rates (per-session step PRESENCE), this pins
    cross-session ORDER and inter-step latency."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
    ).localCheckpoint(eager=True)  # three passes over the same slice
    t1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(t1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("us").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(t2, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("us").alias("t3"))
    )
    n_users = ev.select("user_id").distinct().count()
    c1 = t1.count()
    c2 = t2.count()
    done = t3.localCheckpoint(eager=True)
    c3 = done.count()
    within = done.filter(
        (F.col("t2") - F.col("t1") <= FUNNEL_STEP_GAP_US)
        & (F.col("t3") - F.col("t2") <= FUNNEL_STEP_GAP_US)
    ).count()
    return values_df(spark,
        [(n_users, c1, c2, c3, within)],
        "n_users long, reached_view long, reached_click long, "
        "reached_purchase long, completed_within_gap long",
    )


FUNNEL_ORDERED_WITHIN_GAP_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
), s1 AS (
  SELECT user_id, MIN(us) AS t1 FROM ev
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
), s2 AS (
  SELECT ev.user_id, s1.t1, MIN(us) AS t2
  FROM ev JOIN s1 ON ev.user_id = s1.user_id
  WHERE event_type = '{FUNNEL_STEPS[1]}' AND us > s1.t1
  GROUP BY ev.user_id, s1.t1
), s3 AS (
  SELECT ev.user_id, s2.t1, s2.t2, MIN(us) AS t3
  FROM ev JOIN s2 ON ev.user_id = s2.user_id
  WHERE event_type = '{FUNNEL_STEPS[2]}' AND us > s2.t2
  GROUP BY ev.user_id, s2.t1, s2.t2
)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev) AS n_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS reached_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS reached_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS reached_purchase,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3
         WHERE t2 - t1 <= {FUNNEL_STEP_GAP_US}
           AND t3 - t2 <= {FUNNEL_STEP_GAP_US}) AS completed_within_gap
"""


# ---------------------------------------------------------------------------
# Label-centroid cosine similarity matrix
# ---------------------------------------------------------------------------

CENTROID_Q = 1_000_000  # component quantization for exact integer centroids


def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label_a, label_b, cos_ppm): pairwise cosine similarity between
    per-label embedding centroids (a < b), all in exact integer
    arithmetic: components quantize to floor(x·1e6), centroids are
    integer means (sum div count, truncating — identical both engines),
    dot/norms are int64 sums, cosine = dot·1e6 div (⌊√‖a‖²⌋·⌊√‖b‖²⌋
    via the correctly-rounded IEEE sqrt of an int64). The confusion-
    geometry readout for a labeled embedding space: which classes sit
    close enough to blur a cosine classifier.

    Scale shape: one explode + (label, dim) groupBy builds centroids
    (partial-aggregated); the pair join is K² rows for K labels —
    model-scale, nothing corpus-sized shuffles twice."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * CENTROID_Q).cast("long").alias("q"),
    )
    cent = comp.groupBy("label", "dim").agg(
        # signed integer mean: sign·abs keeps truncating DIV (Spark)
        # and flooring // (DuckDB) identical on negative sums
        F.expr(
            "CAST(CASE WHEN sum(q) < 0 "
            "THEN -((-sum(q)) DIV count(1)) "
            "ELSE sum(q) DIV count(1) END AS BIGINT)"
        ).alias("c")
    )
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    norms = cent.groupBy("label").agg(
        F.expr("CAST(FLOOR(SQRT(CAST(sum(c * c) AS DOUBLE))) AS BIGINT)").alias(
            "nrm"
        )
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            F.col("label_a").cast("int").alias("label_a"),
            F.col("label_b").cast("int").alias("label_b"),
            # sign·abs keeps truncating DIV (Spark) and flooring //
            # (DuckDB) in agreement on negative dots
            F.expr(
                "CAST(CASE WHEN dot < 0 "
                "THEN -((-dot) * 1000000 DIV (na * nb)) "
                "ELSE dot * 1000000 DIV (na * nb) END AS BIGINT)"
            ).alias("cos_ppm"),
        )
        .orderBy("label_a", "label_b")
    )


LABEL_CENTROID_SIMILARITY_SQL = f"""
WITH comp AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {CENTROID_Q})
              AS BIGINT) AS q
  FROM embeddings
), cent AS (
  SELECT label, dim,
         CAST(CASE WHEN SUM(q) < 0 THEN -((-SUM(q)) // COUNT(*))
              ELSE SUM(q) // COUNT(*) END AS BIGINT) AS c
  FROM comp GROUP BY label, dim
), dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
), norms AS (
  SELECT label, CAST(FLOOR(SQRT(CAST(SUM(c * c) AS DOUBLE))) AS BIGINT) AS nrm
  FROM cent GROUP BY label
)
SELECT label_a, label_b,
       CAST(CASE WHEN dot < 0
            THEN -((-dot) * 1000000 // (na.nrm * nb.nrm))
            ELSE dot * 1000000 // (na.nrm * nb.nrm) END AS BIGINT) AS cos_ppm
FROM dots
JOIN norms na ON na.label = label_a
JOIN norms nb ON nb.label = label_b
ORDER BY label_a, label_b
"""


# ---------------------------------------------------------------------------
# BPE merge candidates (one merge round)
# ---------------------------------------------------------------------------

BPE_TOP = 20
TOKEN_SPLIT_RE_31 = "[^a-z]+"


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, pair, freq): the top-{BPE_TOP} adjacent character pairs
    across the corpus word stream — the FIRST merge round of BPE
    vocabulary training (each round merges the most frequent adjacent
    pair; this op surfaces the candidate table that round ranks).
    Words = lowercased alpha runs; pair frequency counts every
    occurrence (multiset, like BPE does), ranked by freq desc then
    pair asc.

    Scale shape: tokenize + pair-explode are row-local (transform over
    an index sequence — no window, no shuffle before the single
    partial-aggregated count); the rank is a {BPE_TOP}-row window. The
    full BPE loop re-runs this with a merged symbol table — each round
    is this exact plan."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_RE_31), lambda w: F.length(w) >= 2
    )
    pairs = (
        d.select(F.explode(words).alias("w"))
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("freq"), F.asc("pair"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= BPE_TOP)
        .select("rnk", "pair", F.col("freq").cast("long").alias("freq"))
        .orderBy("rnk")
    )


BPE_MERGE_CANDIDATES_SQL = f"""
WITH words AS (
  SELECT unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_SPLIT_RE_31}'),
           w -> len(w) >= 2)) AS w
  FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(len(w) - 1),
                               i -> substr(w, i + 1, 2))) AS pair
  FROM words
), counted AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS freq FROM pairs GROUP BY pair
)
SELECT CAST(rnk AS BIGINT) AS rnk, pair, freq
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY freq DESC, pair) AS rnk
      FROM counted)
WHERE rnk <= {BPE_TOP}
ORDER BY rnk
"""


# ---------------------------------------------------------------------------
# BPE train-and-encode loop: k merges + corpus re-encode (r11 verdict ask #6)
# ---------------------------------------------------------------------------

BPE_CURVE_K = 6


def _bpe_seq_tokens(col):
    """Tokens of a double-space-delimited sequence string."""
    return F.split(F.trim(col), "  ")


def bpe_encode_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, merged_pair, total_tokens, fertility_ppm): the actual BPE
    TRAINING LOOP for {BPE_CURVE_K} merges, with the corpus re-encoded
    after every merge — closes the tokenizer story bpe_merge_candidates
    opens (that op ranks round-1 candidates; this one runs the rounds).

    Sennrich-style: train on the WORD-FREQUENCY table (unique word +
    corpus count), not the raw stream — the state a 100 TB corpus
    reduces to one Zipf-bounded vocabulary table, so the k-round loop
    iterates over thousands of rows while the counts carry full corpus
    weight. Each round: adjacent-pair frequencies weighted by word
    count (one partial-aggregated groupBy), argmax with freq-desc /
    pair-asc tie-break (a one-row collect — the training loop is
    inherently iterative, like kmeans centroids), then greedy
    left-to-right NON-OVERLAPPING merge application.

    Merge application is a LITERAL string replace under a double-space
    token-boundary representation: a sequence is ' t1  t2  ...  tn '
    (two spaces between tokens, one at each end), the pair (a,b)
    becomes the pattern ' a  b ' → ' ab '. Adjacent occurrences then
    overlap by ZERO characters (single-space joints would share the
    delimiter and silently skip every second merge site), so the
    engines' shared replace-all semantics — scan left to right, never
    rescan replaced output — IS greedy BPE. Spark F.replace and DuckDB
    replace() agree exactly, which is what the cross-engine hash pins.

    fertility_ppm = tokens per word × 1e6 (integer DIV; monotonically
    non-increasing in k). The k=0 row is the un-merged character
    baseline."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_RE_31), lambda w: F.length(w) >= 2
    )
    wc = (
        d.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "seq",
            F.concat(
                F.lit(" "),
                F.array_join(
                    F.expr(
                        "transform(sequence(1, length(w)), "
                        "i -> substring(w, i, 1))"
                    ),
                    "  ",
                ),
                F.lit(" "),
            ),
        )
        # the vocabulary table is the loop state: tiny (Zipf-bounded),
        # re-read k+1 times — pin it once
        .localCheckpoint(eager=True)
    )
    total_words = wc.agg(F.sum("cnt")).collect()[0][0]

    def totals(frame):
        row = frame.agg(
            F.sum(
                F.col("cnt") * F.size(_bpe_seq_tokens(F.col("seq")))
            ).alias("t")
        ).collect()[0]
        return int(row["t"])

    curve = [(0, "", totals(wc))]
    cur = wc
    for k in range(1, BPE_CURVE_K + 1):
        toks = _bpe_seq_tokens(F.col("seq"))
        pair_rows = (
            cur.select(F.col("cnt"), toks.alias("__t"))
            .filter(F.size("__t") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(__t) - 1), "
                        "i -> concat(element_at(__t, i), ' ', "
                        "element_at(__t, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not pair_rows:  # corpus fully merged before k rounds
            break
        pair = pair_rows[0]["pair"]
        pat = " " + pair.replace(" ", "  ") + " "
        rep = " " + pair.replace(" ", "") + " "
        cur = cur.withColumn(
            "seq", F.replace(F.col("seq"), F.lit(pat), F.lit(rep))
        )
        curve.append((k, pair, totals(cur)))
    out = values_df(spark,
        [
            (k, p, t, t * 1_000_000 // total_words)
            for k, p, t in curve
        ],
        "k long, merged_pair string, total_tokens long, fertility_ppm long",
    )
    return out.orderBy("k")


def _bpe_encode_curve_sql() -> str:
    """ONE emitter unrolls the k-round loop into a CTE chain (the
    kcore_peel_curve oracle pattern): step k picks its best pair with a
    scalar cross join and re-encodes with the same double-space literal
    replace the Spark side uses."""
    sql = [
        f"""
WITH wc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
         ' ' || array_to_string(
             list_transform(range(len(w)), i -> substr(w, i + 1, 1)),
             '  ') || ' ' AS seq
  FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(text), '{TOKEN_SPLIT_RE_31}'),
             x -> len(x) >= 2)) AS w
    FROM documents
  )
  GROUP BY w
), tw AS (SELECT SUM(cnt) AS total_words FROM wc),
s0 AS (SELECT cnt, seq FROM wc),
r0 AS (
  SELECT 0 AS k, '' AS merged_pair,
         CAST(SUM(cnt * len(string_split(trim(seq), '  '))) AS BIGINT)
           AS total_tokens
  FROM s0
)"""
    ]
    for k in range(1, BPE_CURVE_K + 1):
        sql.append(
            f""",
p{k} AS (
  SELECT unnest(list_transform(range(len(t) - 1),
                               i -> t[i + 1] || ' ' || t[i + 2])) AS pair,
         cnt
  FROM (SELECT string_split(trim(seq), '  ') AS t, cnt FROM s{k - 1})
  WHERE len(t) >= 2
), b{k} AS (
  SELECT pair FROM (
    SELECT pair, SUM(cnt) AS freq FROM p{k} GROUP BY pair
  ) ORDER BY freq DESC, pair ASC LIMIT 1
), s{k} AS (
  SELECT cnt,
         replace(seq, ' ' || replace(pair, ' ', '  ') || ' ',
                      ' ' || replace(pair, ' ', '') || ' ') AS seq
  FROM s{k - 1} CROSS JOIN b{k}
), r{k} AS (
  SELECT {k} AS k, (SELECT pair FROM b{k}) AS merged_pair,
         CAST(SUM(cnt * len(string_split(trim(seq), '  '))) AS BIGINT)
           AS total_tokens
  FROM s{k}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM r{k}" for k in range(0, BPE_CURVE_K + 1)
    )
    sql.append(
        f"""
SELECT CAST(k AS BIGINT) AS k, merged_pair, total_tokens,
       CAST(total_tokens * 1000000 // (SELECT total_words FROM tw)
            AS BIGINT) AS fertility_ppm
FROM ({union})
ORDER BY k
"""
    )
    return "".join(sql)


BPE_ENCODE_CURVE_SQL = _bpe_encode_curve_sql()
