"""Batch 69: Burrows' Delta stylometry, lead–lag cross-correlation,
embedding hubness.

- ``burrows_delta_matrix`` — Burrows' Delta (2002), the stylometry
  standard for authorship attribution: z-score each source's relative
  frequency of the {BD_TOP_TOKENS} most common tokens against the
  cross-source distribution, Delta(a,b) = mean |z_a − z_b|; report the
  closest source pairs. The "same pipeline wrote these two corpora"
  detector — template provenance for training data.
- ``crosscorr_leadlag`` — the lead–lag cross-correlogram between the
  daily view-count and purchase-count series: exact integer Pearson
  (pipeline21's moment recipe) of (view_d, purchase_{{d+k}}) for k ∈
  [−{CC_MAX_LAG}, {CC_MAX_LAG}], best lag flagged. Positive best lag
  = views LEAD purchases — the causal-direction screen before anyone
  fits a conversion model.
- ``hubness_report`` — the k-occurrence distribution of the exact
  cosine {HUB_K}-NN graph: how often each vector appears in others'
  neighbor lists. High-dimensional spaces grow HUBS (Radovanović
  et al. 2010) that poison ANN recall; the histogram's tail is the
  diagnosis. Brute-force pair scan — verification-grade at test
  scale; at 100 TB ride the IVF/LSH candidate lists (the documented
  guarded-quadratic posture).

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"
#: Burrows' Delta vocabulary size and report size.
BD_TOP_TOKENS = 30
BD_TOPK_PAIRS = 10
#: cross-correlation lag range (days).
CC_MAX_LAG = 3
DAY_US = 86_400_000_000
#: hubness neighbor-list size and cosine quantization.
HUB_K = 5
HUB_QUANT = 10_000


# ---------------------------------------------------------------------------
# Burrows' Delta
# ---------------------------------------------------------------------------


def burrows_delta_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_a, src_b, delta_q, rnk): the {BD_TOPK_PAIRS} closest source
    pairs by Burrows' Delta over the global top-{BD_TOP_TOKENS} tokens.
    Per source, token share f = c·1e6 div T_source; per token the
    cross-source z-score z_q = (n·f − Σf)·1000 div (isqrt(n·Σf² −
    (Σf)²) + 1) (×n scale shared by numerator and isqrt — the ratio is
    (f−μ)/σ ×1000); Delta_q = Σ|z_a − z_b| div {BD_TOP_TOKENS}. Small
    Delta = statistically indistinguishable token style.

    Scale shape: one token explode → (source, token) counts, a
    top-{BD_TOP_TOKENS} global vocabulary (aggregate-sized), a
    |sources|² × {BD_TOP_TOKENS} pair frame — sources are a dimension,
    so the pair join is dimension-sized, never corpus-sized."""
    toks = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), TOKEN_RE), lambda t: t != "")
        ).alias("tok"),
    )
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = st.groupBy("source").agg(F.sum("c").alias("t"))
    top = (
        st.groupBy("tok")
        .agg(F.sum("c").alias("gc"))
        .orderBy(F.desc("gc"), F.asc("tok"))
        .limit(BD_TOP_TOKENS)
        .select("tok")
    )
    # dense (source, top-token) grid so absent tokens score f = 0
    grid = tot.crossJoin(F.broadcast(top))
    f = (
        grid.join(st, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr("coalesce(c, 0) * 1000000 div t").alias("f"),
        )
    )
    mom = f.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("f").alias("sf"),
        F.sum(F.col("f") * F.col("f")).alias("sff"),
    )
    z = f.join(F.broadcast(mom), "tok").select(
        "source",
        "tok",
        F.expr(
            "(n * f - sf) * 1000 div "
            "(CAST(FLOOR(SQRT(CAST(n * sff - sf * sf AS DOUBLE))) "
            "AS BIGINT) + 1)"
        ).alias("z_q"),
    )
    a = z.select(
        F.col("source").alias("src_a"), "tok", F.col("z_q").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), "tok", F.col("z_q").alias("zb")
    )
    delta = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.expr(f"sum(abs(za - zb)) div {BD_TOP_TOKENS}").alias("delta_q")
        )
    )
    top_w = Window.orderBy(F.asc("delta_q"), F.asc("src_a"), F.asc("src_b"))
    return (
        delta.withColumn("rnk", F.row_number().over(top_w).cast("long"))
        .filter(F.col("rnk") <= BD_TOPK_PAIRS)
        .select("src_a", "src_b", F.col("delta_q").cast("long"), "rnk")
        .orderBy("rnk")
    )


BURROWS_DELTA_SQL = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_RE}'),
                            t -> t != '')) AS tok
  FROM documents
),
st AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok),
tot AS (SELECT source, SUM(c) AS t FROM st GROUP BY source),
top AS (
  SELECT tok FROM (
    SELECT tok, SUM(c) AS gc FROM st GROUP BY tok
    ORDER BY gc DESC, tok LIMIT {BD_TOP_TOKENS}
  )
),
f AS (
  SELECT g.source, g.tok, COALESCE(st.c, 0) * 1000000 // g.t AS f
  FROM (SELECT tot.source, tot.t, top.tok FROM tot CROSS JOIN top) g
  LEFT JOIN st ON st.source = g.source AND st.tok = g.tok
),
mom AS (
  SELECT tok, COUNT(*) AS n, SUM(f) AS sf, SUM(f * f) AS sff
  FROM f GROUP BY tok
),
z AS (
  SELECT f.source, f.tok,
         (m.n * f.f - m.sf) * 1000
           // (CAST(FLOOR(SQRT(CAST(m.n * m.sff - m.sf * m.sf AS DOUBLE)))
               AS BIGINT) + 1) AS z_q
  FROM f JOIN mom m ON m.tok = f.tok
),
delta AS (
  SELECT a.source AS src_a, b.source AS src_b,
         SUM(ABS(a.z_q - b.z_q)) // {BD_TOP_TOKENS} AS delta_q
  FROM z a JOIN z b ON b.tok = a.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, CAST(delta_q AS BIGINT) AS delta_q,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY delta_q, src_a, src_b) AS rnk
  FROM delta
) WHERE rnk <= {BD_TOPK_PAIRS}
ORDER BY rnk
"""


# ---------------------------------------------------------------------------
# Lead–lag cross-correlation
# ---------------------------------------------------------------------------


def crosscorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lag_days, n_pairs, r_ppm, best_flag): exact integer Pearson of
    (view-count_d, purchase-count_{{d+k}}) for k ∈ [−{CC_MAX_LAG},
    {CC_MAX_LAG}] over the dense day axis — pipeline21's moment/isqrt
    recipe, two series instead of one. best_flag marks the argmax |r|
    (ties → smaller lag): positive means views lead purchases.

    Scale shape: one scan → (day, type) groupBy → |days|-row dense
    frame; each lag arm is a lead/lag window + a 1-row moment reduce
    over calendar-bounded rows."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        F.expr(f"ts_us div {DAY_US}").alias("day"), "event_type"
    )
    daily = e.groupBy("day").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("xv"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("yp"),
    )
    axis = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.expr("sequence(lo, hi)")).alias("day")
    )
    dense = axis.join(daily, "day", "left").select(
        "day",
        F.coalesce("xv", F.lit(0)).alias("x"),
        F.coalesce("yp", F.lit(0)).alias("y"),
    ).localCheckpoint(eager=True)
    w = Window.orderBy("day")
    out = None
    for k in range(-CC_MAX_LAG, CC_MAX_LAG + 1):
        shifted = "lead(y, %d)" % k if k >= 0 else "lag(y, %d)" % (-k)
        pairs = dense.withColumn(
            "yk", F.expr(f"{shifted} over (order by day)")
        ).filter(F.col("yk").isNotNull())
        m = pairs.agg(
            F.lit(k).cast("long").alias("lag_days"),
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("yk").alias("sy"),
            F.sum(F.col("x") * F.col("yk")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("yk") * F.col("yk")).alias("syy"),
        )
        out = m if out is None else out.unionByName(m)
    scored = out.select(
        "lag_days",
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(
            "CAST(sign(n * sxy - sx * sy) * "
            "(abs(n * sxy - sx * sy) * 1000000 div "
            "greatest(CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))) "
            "AS BIGINT) * CAST(FLOOR(SQRT(CAST(n * syy - sy * sy AS "
            "DOUBLE))) AS BIGINT), 1)) AS BIGINT)"
        ).alias("r_ppm"),
    )
    best = scored.orderBy(
        F.desc(F.abs(F.col("r_ppm"))), F.asc("lag_days")
    ).limit(1).select(F.col("lag_days").alias("best_lag"))
    return (
        scored.crossJoin(F.broadcast(best))
        .withColumn("best_flag", F.col("lag_days") == F.col("best_lag"))
        .drop("best_lag")
        .orderBy("lag_days")
    )


def _cc_sql() -> str:
    arms = []
    for k in range(-CC_MAX_LAG, CC_MAX_LAG + 1):
        shifted = (
            f"LEAD(y, {k}) OVER (ORDER BY day)"
            if k >= 0
            else f"LAG(y, {-k}) OVER (ORDER BY day)"
        )
        arms.append(
            f"""  SELECT {k} AS lag_days, COUNT(*) AS n, SUM(x) AS sx,
         SUM(yk) AS sy, SUM(x * yk) AS sxy, SUM(x * x) AS sxx,
         SUM(yk * yk) AS syy
  FROM (SELECT x, {shifted} AS yk FROM dense) WHERE yk IS NOT NULL"""
        )
    union = "\n  UNION ALL\n".join(arms)
    return f"""
WITH e AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, event_type FROM events
),
daily AS (
  SELECT day,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS xv,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS yp
  FROM e GROUP BY day
),
dense AS (
  SELECT g.day, COALESCE(d.xv, 0) AS x, COALESCE(d.yp, 0) AS y
  FROM (SELECT unnest(range((SELECT MIN(day) FROM daily),
                            (SELECT MAX(day) FROM daily) + 1)) AS day) g
  LEFT JOIN daily d ON d.day = g.day
),
moments AS (
{union}
),
scored AS (
  SELECT CAST(lag_days AS BIGINT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
         CAST(CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END
              * (ABS(n * sxy - sx * sy) * 1000000
                 // GREATEST(CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx
                                    AS DOUBLE))) AS BIGINT)
                             * CAST(FLOOR(SQRT(CAST(n * syy - sy * sy
                                    AS DOUBLE))) AS BIGINT), 1))
              AS BIGINT) AS r_ppm
  FROM moments
),
best AS (
  SELECT lag_days AS best_lag FROM scored
  ORDER BY ABS(r_ppm) DESC, lag_days LIMIT 1
)
SELECT s.lag_days, s.n_pairs, s.r_ppm,
       s.lag_days = (SELECT best_lag FROM best) AS best_flag
FROM scored s
ORDER BY s.lag_days
"""


CROSSCORR_SQL = _cc_sql()


# ---------------------------------------------------------------------------
# Hubness
# ---------------------------------------------------------------------------


def hubness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k_occurrence, n_vecs): the k-occurrence histogram of the exact
    quantized-cosine {HUB_K}-NN graph — for each vector, how many other
    vectors list it among their {HUB_K} nearest (cos_q = sign·|dot|·1e6
    div (isqrt(na·nb)+1), pipeline42's guarded integer cosine; ties →
    smaller vec_id). A uniform space concentrates around k_occurrence ≈
    {HUB_K}; a heavy right tail = hubs, the high-dimensional pathology
    that silently skews ANN recall. Vectors never cited appear in the
    k=0 bucket.

    Scale shape: verification-grade all-pairs dot via the (vec, dim)
    component join — at 100 TB restrict the pair side to IVF/LSH
    candidates (the documented guarded-quadratic posture); everything
    after the top-{HUB_K} window is histogram-sized."""
    # pair stage: broadcast crossJoin + ROW-LOCAL dot — n² rows. The
    # (vec, dim) component join alternative shuffles n²·d intermediate
    # rows (measured 33.7 s vs ~4 s at sf0.1); the oracle keeps the
    # component-join form (DuckDB's optimizer prefers it at gate scale).
    # r16 (guide §4.2 spirit, JVM edition): the dot used to be
    # aggregate(zip_with(qa, qb, *)) — every one of the n² output rows
    # allocated a fresh d-element array (plus the two carried array
    # columns), and the interpreted higher-order-function eval + GC
    # churn dominated the stage (15.5 s of GC in one bench run on the
    # r16 host). The embedding width is a fixture constant (one-row
    # probe, model-state), so the quantized components unroll into d
    # flat long columns and the dot becomes a straight-line codegen'd
    # multiply-add with zero per-row allocation. Same integer sum,
    # bit-identical cos_q.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_dims = len(emb.select("embedding").head()["embedding"])
    vecs = emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {HUB_QUANT}) AS BIGINT))"
        ).alias("q"),
    ).select(
        "vec_id",
        F.expr(
            "aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x * x)"
        ).alias("na"),
        *[F.element_at("q", i + 1).alias(f"c{i}") for i in range(n_dims)],
    ).localCheckpoint(eager=True)
    # the stream side is only |vecs| rows — widen it so the n² row-local
    # fold parallelizes (a 2k-row stream side otherwise runs the whole
    # 4M-row nested loop on one or two cores). r17: session-derived
    # width (widen_small_scan), not the former local[32] constant.
    from ..functions.partitioning import widen_small_scan

    a = widen_small_scan(vecs).select(
        F.col("vec_id").alias("va"),
        F.col("na").alias("nna"),
        *[F.col(f"c{i}").alias(f"ca{i}") for i in range(n_dims)],
    )
    b = vecs.select(
        F.col("vec_id").alias("vb"),
        F.col("na").alias("nnb"),
        *[F.col(f"c{i}").alias(f"cb{i}") for i in range(n_dims)],
    )
    dot_expr = sum(
        F.col(f"ca{i}") * F.col(f"cb{i}") for i in range(n_dims)
    )
    cos = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            dot_expr.alias("dot"),
            "nna",
            "nnb",
        )
        .select(
            "va",
            "vb",
            F.expr(
                "CAST(sign(dot) AS BIGINT) * (abs(dot) * 1000000 div "
                "(CAST(FLOOR(SQRT(CAST(nna AS DOUBLE) * nnb)) AS BIGINT)"
                " + 1))"
            ).alias("cos_q"),
        )
    )
    nn = Window.partitionBy("va").orderBy(F.desc("cos_q"), F.asc("vb"))
    cited = (
        cos.withColumn("rnk", F.row_number().over(nn))
        .filter(F.col("rnk") <= HUB_K)
        .groupBy(F.col("vb").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("k_occ"))
    )
    occ = (
        vecs.select("vec_id")
        .join(cited, "vec_id", "left")
        .select(F.coalesce("k_occ", F.lit(0)).alias("k_occurrence"))
        .groupBy("k_occurrence")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    )
    return occ.select(
        F.col("k_occurrence").cast("long"), "n_vecs"
    ).orderBy("k_occurrence")


HUBNESS_SQL = f"""
WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {HUB_QUANT})
              AS BIGINT) AS x
  FROM embeddings
),
norms AS (SELECT vec_id, SUM(x * x) AS na FROM comp GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.x * b.x) AS dot
  FROM comp a JOIN comp b
    ON b.dim = a.dim AND b.vec_id != a.vec_id
  GROUP BY a.vec_id, b.vec_id
),
cos AS (
  SELECT d.va, d.vb,
         CAST(CASE WHEN d.dot >= 0 THEN 1 ELSE -1 END
              * (ABS(d.dot) * 1000000
                 // (CAST(FLOOR(SQRT(CAST(na.na AS DOUBLE) * nb.na))
                     AS BIGINT) + 1)) AS BIGINT) AS cos_q
  FROM dots d JOIN norms na ON na.vec_id = d.va
              JOIN norms nb ON nb.vec_id = d.vb
),
cited AS (
  SELECT vb AS vec_id, COUNT(*) AS k_occ
  FROM (
    SELECT va, vb,
           ROW_NUMBER() OVER (PARTITION BY va
                              ORDER BY cos_q DESC, vb) AS rnk
    FROM cos
  ) WHERE rnk <= {HUB_K}
  GROUP BY vb
)
SELECT CAST(k_occurrence AS BIGINT) AS k_occurrence,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM (
  SELECT COALESCE(c.k_occ, 0) AS k_occurrence
  FROM norms n LEFT JOIN cited c ON c.vec_id = n.vec_id
)
GROUP BY k_occurrence
ORDER BY k_occurrence
"""
