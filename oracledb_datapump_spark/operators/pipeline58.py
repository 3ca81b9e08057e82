"""Batch 58: LM smoothing, record linkage, link prediction, local DP.

- ``kneser_ney_bigram_ppm`` — interpolated Kneser-Ney bigram
  probabilities (Kneser & Ney 1995; Chen & Goodman 1998), THE standard
  n-gram smoothing. Discount D = 3/4 stays rational, so the whole
  estimate is exact integer arithmetic in ppm.
- ``fellegi_sunter_weights`` — per-field m/u probabilities and
  agreement weights (Fellegi & Sunter 1969), the probabilistic
  record-linkage scoring layer over the engine's verified-duplicate
  pairs; u comes from the field marginals in closed form.
- ``adamic_adar_linkpred`` — co-purchase link prediction
  (Adamic & Adar 2003) over the customer–part bipartite graph, with
  the repo's bitlen surrogate for 1/log(degree) and a degree cap that
  keeps the pair stage frequency-bounded (never all-pairs).
- ``randomized_response_debias`` — Warner/generalized randomized
  response (Warner 1965): hash-derived deterministic perturbation of a
  categorical column plus the unbiased ppm estimator that recovers the
  true shares — the local-DP collection story beside the central-DP
  ``dp_release_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64
from ..functions.local_table import values_df

KN_TOP = 30  # reported bigrams (by count desc, then v, w)
# D = 3/4: classic absolute-discount value; multiply counts by 4 so the
# discounted numerator max(4c-3, 0) stays integral
AA_DEG_MIN, AA_DEG_CAP = 2, 16  # part degree band joined pairwise
AA_TOP = 20
RR_THETA_NUM, RR_THETA_DEN = 3, 4  # keep probability 3/4


def kneser_ney_bigram_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, w, c_vw, p_kn_ppm): interpolated KN probability of the
    corpus's top-{KN_TOP} bigrams. With D=3/4 (×4 integer scaling):

        p_ppm(v,w) = (max(4·c(vw)−3, 0)·1e6) div (4·c(v))
                   + (3·N1+(v·)·cont_ppm(w)) div (4·c(v))
        cont_ppm(w) = (N1+(·w)·1e6) div N1+(··)

    — the discounted ML term plus the backed-off continuation term,
    every step integer (both engines floor identically).

    Scale shape: one row-local bigram explode (adjacent pairs from the
    token ARRAY — no window over the corpus), one bigram groupBy, then
    v-side/w-side aggregates of that Zipf-bounded table joined back
    broadcast. The LM-smoothing cost IS the bigram count, exactly the
    bigram_surprise plan."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
    bi = (
        d.select(toks.alias("__t"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1), "
                    "i -> struct(element_at(__t, i) AS v, "
                    "element_at(__t, i + 1) AS w))"
                )
            ).alias("b")
        )
        .select("b.v", "b.w")
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c_vw"))
    )
    bi = bi.localCheckpoint(eager=True)  # Zipf-bounded model table
    ctx = bi.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"), F.count(F.lit(1)).alias("n1v")
    )
    cont = bi.groupBy("w").agg(F.count(F.lit(1)).alias("n1w"))
    ntot = bi.count()
    scored = (
        bi.join(F.broadcast(ctx), "v")
        .join(F.broadcast(cont), "w")
        .select(
            "v",
            "w",
            F.col("c_vw").cast("long").alias("c_vw"),
            (
                F.expr("(greatest(4 * c_vw - 3, 0) * 1000000) div (4 * c_v)")
                + F.expr(
                    f"(3 * n1v * ((n1w * 1000000) div {ntot})) div (4 * c_v)"
                )
            )
            .cast("long")
            .alias("p_kn_ppm"),
        )
    )
    w = W.orderBy(F.desc("c_vw"), F.asc("v"), F.asc("w"))
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KN_TOP)
        .drop("rnk")
        .orderBy(F.desc("c_vw"), "v", "w")
    )
    return out.select("v", "w", "c_vw", "p_kn_ppm")


# the bigram CTE is shared text so the Spark/SQL twins can't drift
_KN_BIGRAMS = """
bi AS MATERIALIZED (
  SELECT v, w, CAST(COUNT(*) AS BIGINT) AS c_vw FROM (
    SELECT t[i + 1] AS v, t[i + 2] AS w
    FROM (SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             x -> x != '') AS t FROM documents),
         UNNEST(range(len(t) - 1)) AS u(i)
  ) GROUP BY v, w
)"""

KNESER_NEY_BIGRAM_SQL = f"""
WITH {_KN_BIGRAMS},
ctx AS (SELECT v, SUM(c_vw) AS c_v, COUNT(*) AS n1v FROM bi GROUP BY v),
cont AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1w FROM bi GROUP BY w),
ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bi),
scored AS (
  SELECT bi.v, bi.w, bi.c_vw,
         CAST((greatest(4 * bi.c_vw - 3, 0) * 1000000) // (4 * ctx.c_v)
              + (3 * ctx.n1v * ((cont.n1w * 1000000) // ntot.n))
                // (4 * ctx.c_v) AS BIGINT) AS p_kn_ppm
  FROM bi JOIN ctx USING (v) JOIN cont USING (w) CROSS JOIN ntot
)
SELECT v, w, c_vw, p_kn_ppm FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY c_vw DESC, v, w) AS rnk FROM scored
) WHERE rnk <= {KN_TOP}
ORDER BY c_vw DESC, v, w
"""


# ---------------------------------------------------------------------------
# Fellegi–Sunter field weights
# ---------------------------------------------------------------------------

FS_FIELDS = ("lang", "source", "len_band", "prefix8")


def _fs_fields_df(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id",
        F.col("lang"),
        F.col("source"),
        F.expr("CAST(n_chars div 256 AS BIGINT)").cast("string").alias(
            "len_band"
        ),
        F.substring(F.lower("text"), 1, 8).alias("prefix8"),
    )


def fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(field, m_ppm, u_ppm, weight_q): probabilistic record-linkage
    scoring weights per comparison field. m = P(field agrees | matched)
    over the engine's VERIFIED duplicate pairs (the minhash-verified
    memo — real match labels, not simulation); u = P(agrees | random
    pair) in closed form from the field marginals, Σ c_v²/T². The
    agreement weight uses the repo's integer log surrogate:
    weight_q = bitlen((m_ppm·1024) div u_ppm) ≈ 10 + log2(m/u).

    Scale shape: the pair side is the model-scale verified-pair memo
    joined twice to a four-column projection of documents; the u side
    is one histogram aggregate per field. Nothing pairs the corpus."""
    from .dedup import verified_pairs_cached

    d = _fs_fields_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).localCheckpoint(eager=True)
    pairs = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f).alias(f"a_{f}") for f in FS_FIELDS],
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f).alias(f"b_{f}") for f in FS_FIELDS],
    )
    m = (
        pairs.join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    (F.col(f"a_{f}") == F.col(f"b_{f}")).cast("long")
                ).alias(f"agree_{f}")
                for f in FS_FIELDS
            ],
        )
        .collect()[0]
    )
    t = d.count()
    rows = []
    for f in FS_FIELDS:
        hist = d.groupBy(f).agg(F.count(F.lit(1)).alias("c"))
        u_num = hist.agg(
            F.sum(F.col("c") * F.col("c")).alias("s")
        ).collect()[0]["s"]
        u_ppm = int(u_num) * 1_000_000 // (t * t)
        m_ppm = int(m[f"agree_{f}"]) * 1_000_000 // int(m["n"])
        weight_q = (
            max(m_ppm * 1024 // u_ppm, 1).bit_length() if u_ppm else 0
        )
        rows.append((f, m_ppm, u_ppm, weight_q))
    return values_df(spark,
        rows, "field string, m_ppm long, u_ppm long, weight_q long"
    ).orderBy("field")


def _fs_sql() -> str:
    from .dedup import DEDUP_MINHASH_VERIFIED_SQL

    verified = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    arms = []
    for f in FS_FIELDS:
        arms.append(
            f"""SELECT '{f}' AS field,
       (SELECT CAST(SUM(CASE WHEN a.{f} = b.{f} THEN 1 ELSE 0 END)
               * 1000000 // COUNT(*) AS BIGINT)
        FROM vp JOIN fx a ON a.doc_id = vp.doc_a
                JOIN fx b ON b.doc_id = vp.doc_b) AS m_ppm,
       (SELECT CAST(SUM(c * c) * 1000000
               // (ANY_VALUE(t.t) * ANY_VALUE(t.t)) AS BIGINT)
        FROM (SELECT {f}, COUNT(*) AS c FROM fx GROUP BY {f}) CROSS JOIN t)
         AS u_ppm"""
        )
    arms_sql = " UNION ALL ".join(arms)
    return f"""
WITH vp AS MATERIALIZED ({verified}),
fx AS MATERIALIZED (
  SELECT doc_id, lang, source,
         CAST(n_chars // 256 AS VARCHAR) AS len_band,
         substr(lower(text), 1, 8) AS prefix8
  FROM documents
),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM fx),
mu AS ({arms_sql})
SELECT field, m_ppm, u_ppm,
       CASE WHEN u_ppm = 0 THEN 0
            ELSE CAST(length(bin(greatest(m_ppm * 1024 // u_ppm, 1)))
                 AS BIGINT) END AS weight_q
FROM mu ORDER BY field
"""


FELLEGI_SUNTER_SQL = _fs_sql()


# ---------------------------------------------------------------------------
# Adamic–Adar link prediction (co-purchase graph)
# ---------------------------------------------------------------------------


def adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cust_a, cust_b, n_common, aa_q): top-{AA_TOP} predicted customer
    links by Adamic–Adar over the customer–part co-purchase graph (an
    edge per DISTINCT (customer, part) purchase). AA down-weights
    popular items by 1/log(deg); the integer surrogate is
    1e6 div bitlen(deg) per shared part, summed. Only parts with degree
    in [{AA_DEG_MIN}, {AA_DEG_CAP}] enter the pair stage — the
    frequency-capped candidate path every co-occurrence join at 100 TB
    needs (a part bought by everyone predicts nothing and would
    otherwise explode quadratically; the cap bounds the self-join at
    Σ deg² ≤ cap · |edges|)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    # r16 (guide §2.4): edges pinned — it fed the degree groupBy AND the
    # pair stage, so the orders⋈lineitem + distinct lineage executed
    # once per consumer (and once more per self-join side). The pair
    # stage now expands ROW-LOCALLY from per-part posting lists (the
    # dedup.shingle_pair_intersections device): the degree cap bounds
    # each list at AA_DEG_CAP members, so collect_list is skew-safe by
    # construction and one groupBy exchange replaces the self-join's
    # two exchanges + SMJ sorts. Same pair multiset, same weights.
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("part").agg(F.count(F.lit(1)).alias("deg"))
    capped = edges.join(
        F.broadcast(
            deg.filter(
                (F.col("deg") >= AA_DEG_MIN) & (F.col("deg") <= AA_DEG_CAP)
            )
        ),
        "part",
    )
    lists = capped.groupBy("part", "deg").agg(
        F.array_sort(F.collect_list("cust")).alias("cs")
    )
    pairs = (
        lists.select("deg", F.posexplode("cs").alias("i", "cust_a"), "cs")
        .select(
            "deg",
            "cust_a",
            F.explode(F.expr("slice(cs, i + 2, size(cs))")).alias("cust_b"),
        )
        .groupBy("cust_a", "cust_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(
                F.expr("1000000 div CAST(length(bin(deg)) AS BIGINT)")
            ).alias("aa_q"),
        )
    )
    w = W.orderBy(F.desc("aa_q"), F.asc("cust_a"), F.asc("cust_b"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= AA_TOP)
        .select(
            F.col("cust_a").cast("long").alias("cust_a"),
            F.col("cust_b").cast("long").alias("cust_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.col("aa_q").cast("long").alias("aa_q"),
        )
        .orderBy(F.desc("aa_q"), "cust_a", "cust_b")
    )


ADAMIC_ADAR_SQL = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
deg AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY part
),
capped AS MATERIALIZED (
  SELECT e.cust, e.part, d.deg
  FROM edges e JOIN deg d USING (part)
  WHERE d.deg BETWEEN {AA_DEG_MIN} AND {AA_DEG_CAP}
),
pairs AS (
  SELECT a.cust AS cust_a, b.cust AS cust_b,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(1000000 // CAST(length(bin(a.deg)) AS BIGINT))
              AS BIGINT) AS aa_q
  FROM capped a JOIN capped b
    ON a.part = b.part AND a.cust < b.cust
  GROUP BY a.cust, b.cust
)
SELECT cust_a, cust_b, n_common, aa_q FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY aa_q DESC, cust_a, cust_b) AS rnk
  FROM pairs
) WHERE rnk <= {AA_TOP}
ORDER BY aa_q DESC, cust_a, cust_b
"""


# ---------------------------------------------------------------------------
# randomized response (local DP) with debiasing
# ---------------------------------------------------------------------------


def randomized_response_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, true_ppm, obs_ppm, est_ppm): generalized randomized
    response over the ``lang`` column — each respondent reports the
    truth with probability θ={RR_THETA_NUM}/{RR_THETA_DEN}, else a
    uniform category — then the Warner-style unbiased estimator
    recovers the true shares:

        est_ppm = ((θd·k·obs − (θd−θn)·N) · 1e6) div (θn·k·N)
                = ((4k·obs − N) · 1e6) div (3k·N)

    The perturbation is hash-derived (md5-based hash64 of doc_id), so
    the mechanism is deterministic and both engines replay the SAME
    noise — what a DP pipeline gets from a seeded PRNG, made
    cross-engine exact. est converges on true while obs is biased
    toward uniform: the report shows all three.

    Scale shape: one projection + two groupBys over documents; the
    category table is a broadcast-scale sorted array."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    langs = [r["lang"] for r in d.select("lang").distinct().orderBy("lang").collect()]
    k = len(langs)
    lang_arr = F.array(*[F.lit(x) for x in langs])
    keep = (
        hash64(F.concat(F.lit("rr:"), F.col("doc_id").cast("string")))
        % RR_THETA_DEN
        < RR_THETA_NUM
    )
    alt = F.element_at(
        lang_arr,
        (
            hash64(F.concat(F.lit("rr2:"), F.col("doc_id").cast("string")))
            % k
            + 1
        ).cast("int"),
    )
    pert = d.select(
        "lang", F.when(keep, F.col("lang")).otherwise(alt).alias("reported")
    )
    n = d.count()
    true_c = pert.groupBy("lang").agg(F.count(F.lit(1)).alias("true_c"))
    obs_c = (
        pert.groupBy("reported")
        .agg(F.count(F.lit(1)).alias("obs_c"))
        .withColumnRenamed("reported", "lang")
    )
    return (
        true_c.join(obs_c, "lang", "full")
        .select(
            "lang",
            F.expr(f"coalesce(true_c, 0) * 1000000 div {n}")
            .cast("long")
            .alias("true_ppm"),
            F.expr(f"coalesce(obs_c, 0) * 1000000 div {n}")
            .cast("long")
            .alias("obs_ppm"),
            F.expr(
                f"(({RR_THETA_DEN} * {k} * coalesce(obs_c, 0) - {n}) * 1000000)"
                f" div ({RR_THETA_NUM} * {k} * {n})"
            )
            .cast("long")
            .alias("est_ppm"),
        )
        .orderBy("lang")
    )


def _rr_sql() -> str:
    h_keep = sql_hash64("'rr:' || CAST(doc_id AS VARCHAR)")
    h_alt = sql_hash64("'rr2:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH langs AS (SELECT DISTINCT lang FROM documents),
karr AS (SELECT list_sort(list(lang)) AS arr, CAST(COUNT(*) AS BIGINT) AS k
         FROM langs),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
pert AS MATERIALIZED (
  SELECT d.lang,
         CASE WHEN {h_keep} % {RR_THETA_DEN} < {RR_THETA_NUM} THEN d.lang
              ELSE karr.arr[CAST({h_alt} % karr.k AS INTEGER) + 1]
         END AS reported
  FROM documents d CROSS JOIN karr
),
true_c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS true_c FROM pert GROUP BY lang),
obs_c AS (SELECT reported AS lang, CAST(COUNT(*) AS BIGINT) AS obs_c
          FROM pert GROUP BY reported)
SELECT lang,
       CAST(COALESCE(true_c, 0) * 1000000 // n.n AS BIGINT) AS true_ppm,
       CAST(COALESCE(obs_c, 0) * 1000000 // n.n AS BIGINT) AS obs_ppm,
       CAST((({RR_THETA_DEN} * karr.k * COALESCE(obs_c, 0) - n.n) * 1000000)
            // ({RR_THETA_NUM} * karr.k * n.n) AS BIGINT) AS est_ppm
FROM true_c FULL JOIN obs_c USING (lang)
CROSS JOIN n CROSS JOIN karr
ORDER BY lang
"""


RANDOMIZED_RESPONSE_SQL = _rr_sql()
