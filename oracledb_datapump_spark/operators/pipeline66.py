"""Batch 66: k-center coreset selection, quantile normalization,
graph modularity of a labeled partition.

- ``kcenter_select`` — Gonzalez's farthest-point traversal (1985), the
  2-approximate k-center coreset selector: start from the lowest
  vec_id, repeatedly take the point FARTHEST from the chosen set
  (max-min squared distance, quantized integers). Batch 61's greedy
  coverage maximizes what a subset TOUCHES; k-center minimizes what
  the subset is far FROM — the diversity-sampling primitive behind
  active learning and dataset distillation. The selection radii are
  non-increasing (the 2-approx proof's core fact) and double as the
  coverage-radius curve.
- ``quantile_normalize_report`` — the bioinformatics quantile
  normalization (Bolstad et al. 2003) at decile resolution: each
  source's length distribution maps onto the cross-source mean decile
  profile, reported as before/after means per (source, decile). What
  a corpus pipeline applies before comparing per-source quality
  scores whose scales drifted.
- ``nation_modularity`` — Newman–Girvan modularity (2004) of the
  supplier-nation partition over the co-supplier graph:
  Q = Σ_c (e_c/m − (d_c/2m)²), exact integer via
  Q·4m² = Σ(4m·e_c − d_c²). Measures whether geography is community
  structure in co-purchasing; the partition-quality score every
  community-detection pipeline optimizes, here computed for a GIVEN
  labeling (the audit form).

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_table import values_df

#: component quantization for k-center distances (|x| ≤ 0.6 fixture).
KC_QUANT = 10_000
#: centers selected by the farthest-point traversal.
KC_STEPS = 6
#: co-supplier edge support floor (graph.py's TRI_MIN_CO_ORDERS).
MOD_MIN_CO = 3


# ---------------------------------------------------------------------------
# Gonzalez k-center selection
# ---------------------------------------------------------------------------


def kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, vec_id, radius_q): {KC_STEPS} rounds of farthest-point
    traversal over the quantized embedding set. Seed = lowest vec_id
    (radius 0); each later center is the point with the largest
    min-squared-distance to the chosen set (ties → smaller vec_id),
    radius_q = that distance at selection time. radius_q is
    non-increasing from step 2 on — Gonzalez's invariant, and the
    coverage-radius curve a coreset budget is read from.

    Scale shape: the point set never pairs with itself — each round is
    ONE row-local zip_with against the newly chosen center's literal
    vector (k·O(n·d) total), a running least(), and a 1-row argmax
    collect. The chosen set is model state (k×d ints), never
    data-sized."""
    vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> "
                f"CAST(floor(CAST(x AS DOUBLE) * {KC_QUANT}) AS BIGINT))"
            ).alias("q"),
        )
        .localCheckpoint(eager=True)
    )
    seed = vecs.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(1, int(seed["vec_id"]), 0)]
    center = list(seed["q"])
    cur = vecs.withColumn("mind", F.lit(None).cast("long"))
    for step in range(2, KC_STEPS + 1):
        lit = f"array({', '.join(f'{v}L' for v in center)})"
        d2 = (
            f"aggregate(zip_with(q, {lit}, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        # r16: the O(d) distance fold evaluates ONCE per row (the old
        # least(coalesce(mind, d2), d2) form named it twice; the
        # long-MAX sentinel is exact — d2 < 2^63 by construction), and
        # the chosen center's vector rides the same 1-row argmax
        # collect instead of a separate filter+collect job per round.
        cur = cur.withColumn(
            "mind",
            F.expr(f"least(coalesce(mind, 9223372036854775807L), {d2})"),
        ).localCheckpoint(eager=True)
        far = (
            cur.filter(
                ~F.col("vec_id").isin([c[1] for c in chosen])
            )
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "mind", "q")
            .collect()[0]
        )
        chosen.append((step, int(far["vec_id"]), int(far["mind"])))
        center = list(far["q"])
    return values_df(spark,
        chosen, "step long, vec_id long, radius_q long"
    ).orderBy("step")


def _kcenter_sql() -> str:
    parts = [
        f"""WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {KC_QUANT})
              AS BIGINT) AS x
  FROM embeddings
)""",
        "c1 AS (SELECT MIN(vec_id) AS cid FROM embeddings)",
        """m1 AS (
  SELECT a.vec_id,
         SUM((a.x - c.x) * (a.x - c.x)) AS mind
  FROM comp a JOIN comp c
    ON c.dim = a.dim AND c.vec_id = (SELECT cid FROM c1)
  GROUP BY a.vec_id
)""",
    ]
    prev_sel = "(SELECT cid FROM c1)"
    sels = ["SELECT 1 AS step, (SELECT cid FROM c1) AS vec_id, 0 AS radius_q"]
    excl = ["(SELECT cid FROM c1)"]
    for k in range(2, KC_STEPS + 1):
        parts.append(
            f"""s{k} AS (
  SELECT vec_id AS cid, mind FROM m{k - 1}
  WHERE vec_id NOT IN ({', '.join(excl)})
  ORDER BY mind DESC, vec_id LIMIT 1
)"""
        )
        sels.append(
            f"SELECT {k}, (SELECT cid FROM s{k}), (SELECT mind FROM s{k})"
        )
        excl.append(f"(SELECT cid FROM s{k})")
        if k < KC_STEPS:
            parts.append(
                f"""m{k} AS (
  SELECT a.vec_id,
         LEAST(MAX(m.mind), SUM((a.x - c.x) * (a.x - c.x))) AS mind
  FROM comp a
  JOIN comp c ON c.dim = a.dim AND c.vec_id = (SELECT cid FROM s{k})
  JOIN m{k - 1} m ON m.vec_id = a.vec_id
  GROUP BY a.vec_id
)"""
            )
    union = "\nUNION ALL\n".join(sels)
    return (
        ",\n".join(parts)
        + f"""
SELECT CAST(step AS BIGINT) AS step, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(radius_q AS BIGINT) AS radius_q
FROM (\n{union}\n)
ORDER BY step"""
    )


KCENTER_SQL = _kcenter_sql()


# ---------------------------------------------------------------------------
# Quantile normalization report
# ---------------------------------------------------------------------------


def quantile_normalize_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, decile, n_docs, before_mean_q, after_mean_q): quantile
    normalization of the per-source document-length distributions at
    decile resolution — within each source, docs rank by n_chars
    (ties → doc_id) into 10 equal-count bins; before = the source's
    own decile mean (milli-chars), after = the UNWEIGHTED mean of all
    sources' decile means at that decile (the reference profile every
    source maps onto). After-columns agree across sources by
    construction — that IS quantile normalization's invariant.

    Scale shape: one scan, per-source rank windows (partitioned, not
    global), a (source, decile) groupBy, a ≤10-row reference join."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("v")
    )
    n_by = d.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    rnk = (
        d.join(F.broadcast(n_by), "source")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy("v", "doc_id")
            ),
        )
        .withColumn("decile", F.expr("(rn - 1) * 10 div ns + 1"))
    )
    dec = rnk.groupBy("source", "decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(v) * 1000 div count(1)").alias("before_mean_q"),
    )
    ref = dec.groupBy("decile").agg(
        F.expr("sum(before_mean_q) div count(1)").alias("after_mean_q")
    )
    return (
        dec.join(F.broadcast(ref), "decile")
        .select(
            "source",
            F.col("decile").cast("long"),
            F.col("n_docs").cast("long"),
            F.col("before_mean_q").cast("long"),
            F.col("after_mean_q").cast("long"),
        )
        .orderBy("source", "decile")
    )


QUANTILE_NORMALIZE_SQL = """
WITH d AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS v FROM documents
),
n_by AS (SELECT source, COUNT(*) AS ns FROM d GROUP BY source),
rnk AS (
  SELECT d.source, d.v,
         (ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.v, d.doc_id)
          - 1) * 10 // n.ns + 1 AS decile
  FROM d JOIN n_by n ON n.source = d.source
),
dec AS (
  SELECT source, decile, COUNT(*) AS n_docs,
         SUM(v) * 1000 // COUNT(*) AS before_mean_q
  FROM rnk GROUP BY source, decile
),
ref AS (
  SELECT decile, SUM(before_mean_q) // COUNT(*) AS after_mean_q
  FROM dec GROUP BY decile
)
SELECT d.source, CAST(d.decile AS BIGINT) AS decile,
       CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(d.before_mean_q AS BIGINT) AS before_mean_q,
       CAST(r.after_mean_q AS BIGINT) AS after_mean_q
FROM dec d JOIN ref r ON r.decile = d.decile
ORDER BY d.source, d.decile
"""


# ---------------------------------------------------------------------------
# Modularity of the nation partition
# ---------------------------------------------------------------------------


def nation_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_nodes, internal_edges, degree_sum, q_contrib_ppm,
    q_total_ppm): Newman–Girvan modularity of the supplier-nation
    labeling over the co-supplier graph (≥{MOD_MIN_CO} shared orders,
    graph.py's edge rule). Per community c: contribution =
    e_c/m − (d_c/2m)², carried exactly as (4m·e_c − d_c²) over 4m² and
    emitted ppm through the shared sign·(|num| div den) form (random
    labelings make contributions slightly NEGATIVE — the sign
    matters). q_total_ppm repeats on every row; near zero here means
    geography is NOT community structure in co-purchasing, itself the
    audit's finding.

    Scale shape: the edge list is the bounded basket self-join every
    graph op shares; labeling is a broadcast supplier-dim join; the
    modularity reduce is one ≤|nations| groupBy. Int64: 4m² caps m at
    ~1.5e9 edges (documented)."""
    from .graph import _co_supplier_edges

    edges = _co_supplier_edges(spark, sf_dir).localCheckpoint(eager=True)
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").cast("long").alias("sk"),
        F.col("s_nationkey").cast("long").alias("nation"),
    )
    m = edges.count()
    lab = (
        edges.join(
            F.broadcast(sup.select(F.col("sk").alias("u"), F.col("nation").alias("nu"))),
            "u",
        )
        .join(
            F.broadcast(sup.select(F.col("sk").alias("v"), F.col("nation").alias("nv"))),
            "v",
        )
    )
    internal = (
        lab.filter(F.col("nu") == F.col("nv"))
        .groupBy(F.col("nu").alias("nation"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    deg = (
        edges.select(F.col("u").alias("sk"))
        .unionAll(edges.select(F.col("v").alias("sk")))
        .join(F.broadcast(sup), "sk")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("degree_sum"),
            F.countDistinct("sk").alias("n_nodes"),
        )
    )
    per = (
        deg.join(internal, "nation", "left")
        .select(
            "nation",
            "n_nodes",
            F.coalesce("internal_edges", F.lit(0))
            .cast("long")
            .alias("internal_edges"),
            F.col("degree_sum").cast("long"),
        )
        .withColumn(
            "qnum",
            F.expr(
                f"4 * {m} * internal_edges - degree_sum * degree_sum"
            ),
        )
    )
    tot = per.agg(F.sum("qnum").alias("tq"))
    den = 4 * m * m
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("nation").cast("long"),
            F.col("n_nodes").cast("long"),
            "internal_edges",
            "degree_sum",
            F.expr(
                f"CAST(sign(qnum) AS BIGINT) * "
                f"(abs(qnum) * 1000000 div {den})"
            )
            .cast("long")
            .alias("q_contrib_ppm"),
            F.expr(
                f"CAST(sign(tq) AS BIGINT) * (abs(tq) * 1000000 div {den})"
            )
            .cast("long")
            .alias("q_total_ppm"),
        )
        .orderBy("nation")
    )


NATION_MODULARITY_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, CAST(l_suppkey AS BIGINT) AS sk FROM lineitem
),
edges AS (
  SELECT a.sk AS u, b.sk AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.sk < b.sk
  GROUP BY a.sk, b.sk
  HAVING COUNT(*) >= {MOD_MIN_CO}
),
m AS (SELECT COUNT(*) AS m FROM edges),
sup AS (
  SELECT CAST(s_suppkey AS BIGINT) AS sk,
         CAST(s_nationkey AS BIGINT) AS nation
  FROM supplier
),
internal AS (
  SELECT su.nation, COUNT(*) AS internal_edges
  FROM edges e JOIN sup su ON su.sk = e.u
               JOIN sup sv ON sv.sk = e.v
  WHERE su.nation = sv.nation
  GROUP BY su.nation
),
deg AS (
  SELECT s.nation, COUNT(*) AS degree_sum, COUNT(DISTINCT x.sk) AS n_nodes
  FROM (SELECT u AS sk FROM edges UNION ALL SELECT v AS sk FROM edges) x
  JOIN sup s ON s.sk = x.sk
  GROUP BY s.nation
),
per AS (
  SELECT d.nation, d.n_nodes,
         COALESCE(i.internal_edges, 0) AS internal_edges,
         d.degree_sum,
         4 * (SELECT m FROM m) * COALESCE(i.internal_edges, 0)
           - d.degree_sum * d.degree_sum AS qnum
  FROM deg d LEFT JOIN internal i ON i.nation = d.nation
),
tot AS (SELECT SUM(qnum) AS tq FROM per)
SELECT CAST(nation AS BIGINT) AS nation, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(internal_edges AS BIGINT) AS internal_edges,
       CAST(degree_sum AS BIGINT) AS degree_sum,
       CAST(CASE WHEN qnum >= 0 THEN 1 ELSE -1 END
            * (ABS(qnum) * 1000000
               // (4 * (SELECT m FROM m) * (SELECT m FROM m))) AS BIGINT)
         AS q_contrib_ppm,
       CAST(CASE WHEN tq >= 0 THEN 1 ELSE -1 END
            * (ABS(tq) * 1000000
               // (4 * (SELECT m FROM m) * (SELECT m FROM m))) AS BIGINT)
         AS q_total_ppm
FROM per CROSS JOIN tot
ORDER BY nation
"""
