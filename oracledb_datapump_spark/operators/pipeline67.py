"""Batch 67: naive-Bayes source classifier eval, diagonal-Mahalanobis
outliers, IDF-weighted Jaccard.

- ``naive_bayes_source_eval`` — a multinomial naive-Bayes text
  classifier trained ON-ENGINE (hash-split 75/25, add-one smoothing)
  predicting a document's source from its tokens, evaluated per class
  with the dominant confusion named. Log-likelihoods use the repo's
  bitlen-log₂ surrogate — coarse, but identical in both engines, so
  the ARGMAX (all that matters for classification) is bit-stable. The
  canonical "can the engine train and score a model without leaving
  SQL" demonstration; near-chance accuracy is itself the corpus
  finding (the fixture's sources differ only mildly in token mix).
- ``mahalanobis_outliers`` — per-label diagonal Mahalanobis distance
  over the embedding table: fit per-(label, dim) integer moments, score
  every vector by Σ_d (n·x − Σx)²·1e3 div (n·Σx² − (Σx)² + 1), report
  the top 3 per label. The OOD/contamination screen embedding
  pipelines run after clustering; embedding_norm_outliers sees only
  vector LENGTH — this sees shape.
- ``weighted_jaccard_pairs`` — IDF-weighted Jaccard over blocked
  candidate pairs: shingle weight = bitlen(N·1024 div df) (rare
  shingles count more, boilerplate counts less — the weighting that
  separates true near-dups from template siblings). The weighted
  complement of dedup.py's plain-count Jaccard.

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64

#: naive Bayes: hash-split modulus (bucket 0 = test, rest train).
NB_SPLIT = 4
#: log-likelihood scale inside bitlen (2^20).
NB_SCALE = 1_048_576
#: Mahalanobis quantization and top-k.
MAHA_QUANT = 1_000
MAHA_TOPK = 3
#: weighted-Jaccard blocking floor and top-k.
WJ_MIN_SHARED = 2
WJ_TOPK = 20

TOKEN_RE = "[^a-z0-9]+"


# ---------------------------------------------------------------------------
# Naive Bayes source classifier
# ---------------------------------------------------------------------------


def naive_bayes_source_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(true_source, n_test, n_correct, accuracy_ppm, top_confusion):
    train/test = md5-hash split (doc_id % {NB_SPLIT}: bucket 0 tests);
    per (source, token) add-one-smoothed weights
    w = bitlen((c+1)·{NB_SCALE} div (T_c + V)); a test doc's class
    score = Σ token-count·w plus the class-prior bitlen term; argmax
    (ties → lexicographically smaller source) is the prediction.
    top_confusion = the wrong class this source's docs most often land
    on ('-' if none). Multinomial NB exactly as Manning's IR book
    states it, with log₂-resolution weights (argmax-stable across
    engines; absolute likelihoods are NOT the deliverable).

    Scale shape: token explode → (source, token) counts (vocab-sized);
    scoring joins test-doc tokens to class weights — |test tokens| ×
    |classes| rows, partial-aggregated before the per-doc argmax
    window. No pair joins."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split(F.lower("text"), TOKEN_RE), lambda t: t != ""
            )
        ).alias("tok"),
    ).withColumn(
        "is_test",
        F.pmod(
            hash64(F.concat(F.lit("nb:"), F.col("doc_id").cast("string"))),
            F.lit(NB_SPLIT),
        )
        == 0,
    )
    train = d.filter(~F.col("is_test"))
    test = d.filter(F.col("is_test"))
    # r16 (guide §2.4): ct pinned — the vocab-size count action and the
    # weight table each re-ran the train-corpus explode + groupBy; the
    # pinned frame is (source, token)-sized, vocabulary-class at any
    # corpus scale.
    ct = (
        train.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = ct.groupBy("source").agg(F.sum("c").alias("t"))
    vocab = ct.select("tok").distinct().count()
    w = ct.join(F.broadcast(totals), "source").select(
        F.col("source").alias("cls"),
        "tok",
        F.expr(
            f"CAST(length(bin((c + 1) * {NB_SCALE} div (t + {vocab})))"
            " AS BIGINT)"
        ).alias("w"),
    )
    # unseen (class, token) pairs score the smoothing floor per class
    floor = totals.select(
        F.col("source").alias("cls"),
        F.expr(
            f"CAST(length(bin({NB_SCALE} div (t + {vocab}))) AS BIGINT)"
        ).alias("floor_w"),
    )
    tcounts = test.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        tcounts.crossJoin(F.broadcast(floor))
        .join(F.broadcast(w), ["cls", "tok"], "left")
        .groupBy("doc_id", "source", "cls")
        .agg(
            F.sum(
                F.col("n") * F.coalesce(F.col("w"), F.col("floor_w"))
            ).alias("score")
        )
    )
    pred = (
        scored.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("score"), F.asc("cls")
                )
            ),
        )
        .filter(F.col("rnk") == 1)
        .select("doc_id", F.col("source").alias("true_source"), F.col("cls").alias("pred"))
    )
    per = pred.groupBy("true_source").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            (F.col("pred") == F.col("true_source")).cast("long")
        ).alias("n_correct"),
    )
    conf = (
        pred.filter(F.col("pred") != F.col("true_source"))
        .groupBy("true_source", "pred")
        .agg(F.count(F.lit(1)).alias("cc"))
        .withColumn(
            "crnk",
            F.row_number().over(
                Window.partitionBy("true_source").orderBy(
                    F.desc("cc"), F.asc("pred")
                )
            ),
        )
        .filter(F.col("crnk") == 1)
        .select("true_source", F.col("pred").alias("top_confusion"))
    )
    return (
        per.join(conf, "true_source", "left")
        .select(
            "true_source",
            F.col("n_test").cast("long"),
            F.col("n_correct").cast("long"),
            F.expr("n_correct * 1000000 div n_test")
            .cast("long")
            .alias("accuracy_ppm"),
            F.coalesce("top_confusion", F.lit("-")).alias("top_confusion"),
        )
        .orderBy("true_source")
    )


def _nb_sql() -> str:
    h = sql_hash64("'nb:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                            t -> t != '')) AS tok,
         {h} % {NB_SPLIT} = 0 AS is_test
  FROM documents
),
ct AS (
  SELECT source, tok, COUNT(*) AS c FROM d WHERE NOT is_test
  GROUP BY source, tok
),
totals AS (SELECT source, SUM(c) AS t FROM ct GROUP BY source),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM ct),
w AS (
  SELECT ct.source AS cls, ct.tok,
         CAST(length(bin((ct.c + 1) * {NB_SCALE}
              // (t.t + (SELECT v FROM vocab)))) AS BIGINT) AS w
  FROM ct JOIN totals t ON t.source = ct.source
),
floor_w AS (
  SELECT source AS cls,
         CAST(length(bin({NB_SCALE} // (t + (SELECT v FROM vocab))))
              AS BIGINT) AS floor_w
  FROM totals
),
tcounts AS (
  SELECT doc_id, source, tok, COUNT(*) AS n FROM d WHERE is_test
  GROUP BY doc_id, source, tok
),
scored AS (
  SELECT tc.doc_id, tc.source, f.cls,
         SUM(tc.n * COALESCE(w.w, f.floor_w)) AS score
  FROM tcounts tc
  CROSS JOIN floor_w f
  LEFT JOIN w ON w.cls = f.cls AND w.tok = tc.tok
  GROUP BY tc.doc_id, tc.source, f.cls
),
pred AS (
  SELECT doc_id, source AS true_source, cls AS pred
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cls) AS rnk
    FROM scored
  ) WHERE rnk = 1
),
per AS (
  SELECT true_source, COUNT(*) AS n_test,
         SUM(CASE WHEN pred = true_source THEN 1 ELSE 0 END) AS n_correct
  FROM pred GROUP BY true_source
),
conf AS (
  SELECT true_source, pred AS top_confusion
  FROM (
    SELECT true_source, pred, COUNT(*) AS cc,
           ROW_NUMBER() OVER (PARTITION BY true_source
                              ORDER BY COUNT(*) DESC, pred) AS crnk
    FROM pred WHERE pred != true_source
    GROUP BY true_source, pred
  ) WHERE crnk = 1
)
SELECT p.true_source, CAST(p.n_test AS BIGINT) AS n_test,
       CAST(p.n_correct AS BIGINT) AS n_correct,
       CAST(p.n_correct * 1000000 // p.n_test AS BIGINT) AS accuracy_ppm,
       COALESCE(c.top_confusion, '-') AS top_confusion
FROM per p LEFT JOIN conf c ON c.true_source = p.true_source
ORDER BY p.true_source
"""


NAIVE_BAYES_SQL = _nb_sql()


# ---------------------------------------------------------------------------
# Diagonal Mahalanobis outliers
# ---------------------------------------------------------------------------


def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, vec_id, score_q, rnk): top-{MAHA_TOPK} per-label
    outliers by diagonal Mahalanobis distance — per (label, dim) the
    integer moments (n, Σx, Σx²) give score contribution
    (n·x − Σx)²·1e3 div (n·Σx² − (Σx)² + 1) (numerator and variance
    share the n² scale, so the ratio IS (x−μ)²/σ², ×1e3). Norm
    outliers catch long vectors; Mahalanobis catches vectors long in
    the WRONG directions — the OOD screen that matters after
    normalization.

    Scale shape: one posexplode, one (label, dim) moment groupBy
    (labels·dims rows, broadcast back), one per-vector reduce, a
    per-label top-k window. Int64: n ≤ ~2e6 per label at quant
    {MAHA_QUANT} before the numerator needs a rescale (documented)."""
    comp = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.posexplode(
            F.expr(
                f"transform(embedding, x -> "
                f"CAST(floor(CAST(x AS DOUBLE) * {MAHA_QUANT}) AS BIGINT))"
            )
        ).alias("dim", "x"),
    )
    mom = comp.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    scored = (
        comp.join(F.broadcast(mom), ["label", "dim"])
        .select(
            "vec_id",
            "label",
            F.expr(
                "(n * x - sx) * (n * x - sx) * 1000 div "
                "(n * sxx - sx * sx + 1)"
            ).alias("contrib"),
        )
        .groupBy("label", "vec_id")
        .agg(F.sum("contrib").alias("score_q"))
    )
    top = Window.partitionBy("label").orderBy(
        F.desc("score_q"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(top).cast("long"))
        .filter(F.col("rnk") <= MAHA_TOPK)
        .select(
            "label", F.col("vec_id").cast("long"), F.col("score_q").cast("long"), "rnk"
        )
        .orderBy("label", "rnk")
    )


MAHALANOBIS_SQL = f"""
WITH comp AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {MAHA_QUANT})
              AS BIGINT) AS x
  FROM embeddings
),
mom AS (
  SELECT label, dim, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
  FROM comp GROUP BY label, dim
),
scored AS (
  SELECT c.label, c.vec_id,
         SUM((m.n * c.x - m.sx) * (m.n * c.x - m.sx) * 1000
             // (m.n * m.sxx - m.sx * m.sx + 1)) AS score_q
  FROM comp c JOIN mom m ON m.label = c.label AND m.dim = c.dim
  GROUP BY c.label, c.vec_id
)
SELECT label, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(score_q AS BIGINT) AS score_q, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                               ORDER BY score_q DESC, vec_id) AS rnk
  FROM scored
) WHERE rnk <= {MAHA_TOPK}
ORDER BY label, rnk
"""


# ---------------------------------------------------------------------------
# IDF-weighted Jaccard
# ---------------------------------------------------------------------------


def weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, inter_w, union_w, jw_ppm, rnk): top-{WJ_TOPK}
    blocked pairs by IDF-weighted Jaccard. Shingle weight =
    bitlen(N·1024 div df) (rare → heavy, boilerplate → light);
    J_w = Σ_{{∩}}w div (Σ_A w + Σ_B w − Σ_{{∩}}w), exact-integer ppm.
    Plain-count Jaccard calls two docs sharing a common template
    near-dups; the weighted form demotes exactly those shared-but-
    common shingles — the refinement verification pipelines apply
    before acting on a dedup candidate.

    Scale shape: the pair side is the blocked shingle join (≥
    {WJ_MIN_SHARED} shared — guarded-quadratic posture at 100 TB:
    ride LSH candidates); weights come from one shingle-df aggregate
    broadcast into both the intersection and the per-doc sums."""
    from .dedup import _shingles

    sh = _shingles(spark, sf_dir).localCheckpoint(eager=True)
    n_docs = sh.select("doc_id").distinct().count()
    # r16 (guide §2.4): the per-shingle posting list IS the document
    # frequency (df = list size), so the weight computes inline and the
    # old dfw groupBy + shingle-keyed weight join + weighted self-join
    # (two more exchanges of the shingle stream + SMJ sorts) all fold
    # into ONE groupBy: pairs and their weight sums expand row-locally,
    # per-doc weight sums explode back off the same pinned lists.
    # Weights, pair sets and sums are bit-identical.
    lists = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .select(
            "ds",
            F.expr(
                f"CAST(length(bin({n_docs} * 1024 div size(ds)))"
                " AS BIGINT)"
            ).alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = (
        lists.select("w", F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("tw"))
    )
    inter = (
        lists.select(F.posexplode("ds").alias("i", "doc_a"), "ds", "w")
        .select(
            "doc_a",
            F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("doc_b"),
            "w",
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum("w").alias("inter_w"),
        )
        .filter(F.col("n_shared") >= WJ_MIN_SHARED)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("tw").alias("ta"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("tw").alias("tb"))
    scored = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("inter_w").cast("long"),
            (F.col("ta") + F.col("tb") - F.col("inter_w"))
            .cast("long")
            .alias("union_w"),
            F.expr(
                "inter_w * 1000000 div (ta + tb - inter_w)"
            )
            .cast("long")
            .alias("jw_ppm"),
        )
    )
    top = Window.orderBy(F.desc("jw_ppm"), F.asc("doc_a"), F.asc("doc_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(top).cast("long"))
        .filter(F.col("rnk") <= WJ_TOPK)
        .orderBy("rnk")
    )


def _wj_sql() -> str:
    from .dedup import SQL_SHINGLES_CTE

    return f"""
WITH {SQL_SHINGLES_CTE.strip()},
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM shingles),
dfw AS (
  SELECT shingle,
         CAST(length(bin((SELECT n FROM nd) * 1024 // COUNT(*)))
              AS BIGINT) AS w
  FROM shingles GROUP BY shingle
),
wsh AS (SELECT s.doc_id, s.shingle, d.w FROM shingles s
        JOIN dfw d ON d.shingle = s.shingle),
sizes AS (SELECT doc_id, SUM(w) AS tw FROM wsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared,
         SUM(a.w) AS inter_w
  FROM wsh a JOIN wsh b
    ON b.shingle = a.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {WJ_MIN_SHARED}
),
scored AS (
  SELECT i.doc_a, i.doc_b, CAST(i.inter_w AS BIGINT) AS inter_w,
         CAST(sa.tw + sb.tw - i.inter_w AS BIGINT) AS union_w,
         CAST(i.inter_w * 1000000 // (sa.tw + sb.tw - i.inter_w)
              AS BIGINT) AS jw_ppm
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
               JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, inter_w, union_w, jw_ppm, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY jw_ppm DESC, doc_a, doc_b) AS rnk
  FROM scored
) WHERE rnk <= {WJ_TOPK}
ORDER BY rnk
"""


WEIGHTED_JACCARD_SQL = _wj_sql()
