"""Batch 29: incremental LSH dedup, incremental top-k maintenance,
k-core peeling curve, blocking-quality evaluation.

Each operator is oracle-backed (ANSI SQL on the same parquet) and
designed for the 100 TB shape first: the incremental dedup joins the
NEW batch against the stored index without an old-old rescan, the MV
top-k maintains state from deltas instead of recomputing, the k-core
peel is a fixed-round degree iteration (log-depth shuffles), and the
blocking report is two partial-aggregated groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import (
    BAND_ROWS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    SQL_MINHASH_CTE,
    _minhash_cols,
    _shingles,
    _shingles_multiset,
    _sql_band_selects,
)
from ..functions.local_table import values_df

# ---------------------------------------------------------------------------
# Incremental MinHash-LSH dedup: new batch vs stored index
# ---------------------------------------------------------------------------


def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(new_doc, old_doc, jaccard): verified near-duplicates between an
    incoming batch (doc_id % 10 == 0) and the already-indexed corpus
    (the rest) — the PRODUCTION shape of LSH dedup, where each
    ingestion merges a small batch against a stored band index instead
    of re-running the corpus self-join.

    Scale shape: the band join is new-bands ⋈ old-bands — candidate
    work is O(|new| · bucket occupancy), NOT O(|corpus|²); old-old
    pairs are never formed (they were resolved when those docs were
    ingested). At 100 TB the old band index is stored state
    (doc_id, band, sig) read back from the warehouse, and the new side
    is small enough to broadcast. Exact-Jaccard verification is
    restricted to the candidate pairs, same as dedup_minhash_verified
    (dedup.py:459)."""
    sh_all = _shingles_multiset(spark, sf_dir)
    agg = sh_all.groupBy("doc_id").agg(*_minhash_cols())
    band_sig = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{j}").cast("string")
                    for j in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
                ],
            )
        ).alias(f"sig{b}")
        for b in range(NUM_HASHES // BAND_ROWS)
    ]
    bands = agg.select(
        "doc_id", F.posexplode(F.array(*band_sig)).alias("band", "sig")
        # r16: pinned — the new/old band sides are separate subtrees and
        # each used to re-run the full shingle→16-hash minhash agg
    ).localCheckpoint(eager=True)
    new_b = bands.filter(F.col("doc_id") % 10 == 0).alias("a")
    old_b = bands.filter(F.col("doc_id") % 10 != 0).alias("b")
    cand = (
        new_b.join(
            old_b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(
            F.col("a.doc_id").alias("new_doc"),
            F.col("b.doc_id").alias("old_doc"),
        )
        .distinct()
        # referenced twice below (intersection join + size semi-filter)
        .localCheckpoint(eager=True)
    )
    cand_docs = (
        cand.select(F.col("new_doc").alias("doc_id"))
        .union(cand.select(F.col("old_doc").alias("doc_id")))
        .distinct()
    )
    # r16 (guide §1.2): shingle only the candidate docs, once, pinned —
    # the semi-join commutes with row-local shingling; the old order
    # tokenized the whole corpus in three subtrees (sizes + both probes)
    cand_src = spark.read.parquet(f"{sf_dir}/documents.parquet").join(
        F.broadcast(cand_docs), "doc_id", "semi"
    )
    sh = _shingles(spark, sf_dir, cand_src).localCheckpoint(eager=True)
    # bounded by 2·|candidates|, not |corpus| — broadcastable
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("new_doc"), F.col("shingle").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("_old2"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(sa, "new_doc")
        .join(
            sb,
            (F.col("old_doc") == F.col("_old2"))
            & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("new_doc", "old_doc")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("new_doc"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("old_doc"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(na), "new_doc")
        .join(F.broadcast(nb), "old_doc")
        .select(
            "new_doc",
            "old_doc",
            (
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("new_doc", "old_doc")
    )


DEDUP_MINHASH_INCREMENTAL_SQL = (
    "WITH "
    + SQL_MINHASH_CTE
    + f""",
bands AS (
  {_sql_band_selects()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS old_doc
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig
   AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.new_doc, c.old_doc, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.new_doc
  JOIN shingles sb ON sb.doc_id = c.old_doc AND sb.shingle = sa.shingle
  GROUP BY c.new_doc, c.old_doc
)
SELECT new_doc, old_doc,
       inter::DOUBLE / (na.n + nb.n - inter) AS jaccard
FROM inter
JOIN sizes na ON new_doc = na.doc_id
JOIN sizes nb ON old_doc = nb.doc_id
WHERE inter::DOUBLE / (na.n + nb.n - inter) >= {JACCARD_THRESHOLD}
ORDER BY new_doc, old_doc
"""
)


# ---------------------------------------------------------------------------
# Incremental top-k maintenance (DBSP z-set)
# ---------------------------------------------------------------------------

TOPK_K = 10


def mv_topk_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, o_custkey, revenue_cents, n_orders): top-{TOPK_K} customers
    by revenue, maintained INCREMENTALLY from a stored aggregate plus a
    z-set delta (DBSP/differential-dataflow style): the base MV is the
    per-customer (sum, count) over base orders (o_orderkey % 5 != 4);
    the delta batch carries inserts (the % 5 == 4 rows, weight +1) and
    retractions (base rows with o_orderkey % 7 == 0, weight -1). The
    maintenance is one keyed outer-merge of (Δsum, Δcount) into the
    state — never a rescan of the base fact rows — then the top-k over
    the merged state. The oracle recomputes from scratch; hash equality
    IS the incremental-consistency proof.

    Scale: state and delta merge on the group key (one shuffle each
    side); the top-k is a K-row ORDER BY LIMIT. Revenue is exact
    integer cents (floor(price·100)) so both engines agree bit-for-bit.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    base = orders.filter(F.col("o_orderkey") % 5 != 4)
    # stored MV state — materialized once, deltas applied on top
    state = (
        base.groupBy("o_custkey")
        .agg(
            F.sum(cents).alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .localCheckpoint(eager=True)
    )
    inserts = orders.filter(F.col("o_orderkey") % 5 == 4).select(
        "o_custkey", cents.alias("c"), F.lit(1).alias("w")
    )
    retractions = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_custkey", cents.alias("c"), F.lit(-1).alias("w")
    )
    delta = (
        inserts.unionByName(retractions)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("w") * F.col("c")).alias("drev"),
            F.sum("w").alias("dcnt"),
        )
    )
    merged = (
        state.join(delta, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (F.coalesce("rev", F.lit(0)) + F.coalesce("drev", F.lit(0))).alias(
                "revenue_cents"
            ),
            (F.coalesce("cnt", F.lit(0)) + F.coalesce("dcnt", F.lit(0))).alias(
                "n_orders"
            ),
        )
        .filter(F.col("n_orders") > 0)
    )
    w = Window.orderBy(F.desc("revenue_cents"), F.asc("o_custkey"))
    return (
        merged.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK_K)
        .select("rnk", "o_custkey", "revenue_cents", "n_orders")
        .orderBy("rnk")
    )


MV_TOPK_DELTA_SQL = f"""
WITH f AS (
  SELECT o_custkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
  WHERE NOT (o_orderkey % 5 <> 4 AND o_orderkey % 7 = 0)
), agg AS (
  SELECT o_custkey, CAST(SUM(c) AS BIGINT) AS revenue_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM f GROUP BY o_custkey
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, o_custkey) AS BIGINT) AS rnk,
       o_custkey, revenue_cents, n_orders
FROM agg
ORDER BY rnk
LIMIT {TOPK_K}
"""


# ---------------------------------------------------------------------------
# k-core peeling curve
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 8


def kcore_peel_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, n_survivors): the {KCORE_K}-core peeling trajectory of the
    bipartite part–supplier graph (distinct lineitem edges; node ids
    disambiguated as 2·partkey / 2·suppkey+1). Round r+1 keeps exactly
    the nodes with ≥ {KCORE_K} neighbors among round-r survivors —
    {KCORE_ROUNDS} fixed rounds, which this graph stabilizes well
    within (the trailing rounds pin the fixpoint: equal counts).

    Scale (r16, guide §2.4/§2.5): peeling is driven by the per-round
    degree table instead of two survivor semi-joins. One partial-
    aggregated groupBy yields degrees; its < K rows are the round's
    DEAD set — small after the first peel and shrinking geometrically
    (that shrinkage IS the convergence argument) — and the edge list
    advances by two anti-joins against that small set, which AQE
    plans as broadcasts when the dead set is small and falls back to
    a shuffle when an early round peels en masse. The old plan
    re-exchanged the full symmetric edge list TWICE per round (semi
    on each endpoint) plus the degree groupBy; now only the degree
    groupBy exchanges edge-stream bytes, and a peel-free round (dead
    count 0, the trailing fixpoint rounds) launches no edge job at
    all. Only per-round COUNTs (scalars) reach the driver."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = li.select(
        (F.col("l_partkey") * 2).alias("a"),
        (F.col("l_suppkey") * 2 + 1).alias("b"),
    ).distinct()
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)  # reused every round — pin it once
    # ee is symmetric, so every node appears as 'a': |deg| = |nodes|
    deg = (
        edges.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    counts = [(0, deg.count())]
    n_surv = None
    for r in range(1, KCORE_ROUNDS + 1):
        if n_surv is None:
            n_surv = deg.filter(F.col("deg") >= KCORE_K).count()
        counts.append((r, n_surv))
        if r == KCORE_ROUNDS:
            break
        dead = deg.filter(F.col("deg") < KCORE_K).select("a")
        if dead.count() == 0:
            continue  # fixpoint: survivors (and their degrees) are final
        edges = (
            edges.join(dead, "a", "anti")
            .join(dead.select(F.col("a").alias("b")), "b", "anti")
            # each round feeds the next; without the pin round r
            # re-executes rounds 1..r-1 (quadratic recompute)
            .localCheckpoint(eager=True)
        )
        deg = (
            edges.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        n_surv = None
    return values_df(spark,
        [(int(r), int(n)) for r, n in counts], "round int, n_survivors long"
    ).orderBy("round")


def _kcore_sql() -> str:
    ctes = [
        "e AS (SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b "
        "FROM lineitem)",
        "ee AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e)",
        "s0 AS (SELECT DISTINCT a AS node FROM ee)",
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        ctes.append(
            f"s{r} AS (SELECT ee.a AS node FROM ee "
            f"JOIN s{r - 1} xa ON ee.a = xa.node "
            f"JOIN s{r - 1} xb ON ee.b = xb.node "
            f"GROUP BY ee.a HAVING COUNT(*) >= {KCORE_K})"
        )
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, CAST(COUNT(*) AS BIGINT) AS n_survivors FROM s{r}"
        for r in range(KCORE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects + "\nORDER BY round"


KCORE_PEEL_CURVE_SQL = _kcore_sql()


# ---------------------------------------------------------------------------
# Blocking-quality evaluation (record linkage)
# ---------------------------------------------------------------------------

BLOCK_CHAR_BAND = 50


def blocking_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row blocking-scheme evaluation over ``documents``: blocks =
    (source, n_chars div {BLOCK_CHAR_BAND}); truth = the MinHash-LSH-
    verified near-duplicate pairs (the fixture plants near-dups, not
    byte-identical copies — verified by dedup_minhash_verified, itself
    driver-gated). Reports the two standard record-linkage metrics as
    exact ppm integers: reduction ratio (how many of the n·(n-1)/2
    comparisons the blocking avoids) and pairs completeness (what
    fraction of true near-dup pairs land in a shared block — lost
    pairs cross a source or a length band, both of which the fixture's
    mutated near-dups produce). This is the evaluation a cheap
    blocking key must pass before it fronts LSH at 100 TB.

    Plan: one partial-aggregated block-size groupBy, plus two keyed
    joins of the (model-scale, memoized) truth pair list against the
    doc→block table; 1-row aggregates combined by deliberate 1-row
    cross joins."""
    from .dedup import verified_pairs_cached

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # integer DIV on both engines (double-divide-then-cast would truncate
    # in Spark but round in DuckDB)
    base = d.select(
        "doc_id",
        F.col("source").alias("src"),
        F.expr(f"n_chars DIV {BLOCK_CHAR_BAND}").alias("band"),
    ).localCheckpoint(eager=True)  # feeds the block agg and two joins

    n_docs = base.agg(F.count(F.lit(1)).alias("n"))
    # c·(c−1) is even, but keep the arithmetic in integer DIV on both
    # engines rather than double /2 (Spark cast truncates, DuckDB rounds)
    blocks = (
        base.groupBy("src", "band")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.expr("c * (c - 1) DIV 2")).alias("candidate_pairs"),
        )
    )
    truth = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    ba = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("src").alias("src_a"),
        F.col("band").alias("band_a"),
    )
    bb = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("src").alias("src_b"),
        F.col("band").alias("band_b"),
    )
    cov = truth.join(ba, "doc_a").join(bb, "doc_b").agg(
        F.count(F.lit(1)).alias("true_pairs"),
        F.sum(
            (
                (F.col("src_a") == F.col("src_b"))
                & (F.col("band_a") == F.col("band_b"))
            ).cast("long")
        ).alias("covered_true_pairs"),
    )
    return (
        n_docs.crossJoin(blocks)
        .crossJoin(cov)
        .select(
            F.col("n").cast("long").alias("n_docs"),
            F.col("n_blocks").cast("long").alias("n_blocks"),
            F.col("candidate_pairs").cast("long").alias("candidate_pairs"),
            F.col("true_pairs").cast("long").alias("true_pairs"),
            F.col("covered_true_pairs").cast("long").alias("covered_true_pairs"),
            F.expr(
                "CAST((CAST(n AS BIGINT) * (n - 1) DIV 2 - candidate_pairs) "
                "* 1000000 DIV (CAST(n AS BIGINT) * (n - 1) DIV 2) AS BIGINT)"
            ).alias("reduction_ratio_ppm"),
            F.expr(
                "CAST(covered_true_pairs * 1000000 DIV true_pairs AS BIGINT)"
            ).alias("pairs_completeness_ppm"),
        )
    )


def _blocking_quality_sql() -> str:
    from .dedup import DEDUP_MINHASH_VERIFIED_SQL

    truth = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH dup AS ({truth}),
base AS (
  SELECT doc_id, source AS src, n_chars // {BLOCK_CHAR_BAND} AS band
  FROM documents
), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
blocks AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs
  FROM (SELECT COUNT(*) AS c FROM base GROUP BY src, band)
), cov AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_pairs,
         CAST(SUM(CASE WHEN a.src = b.src AND a.band = b.band
                       THEN 1 ELSE 0 END) AS BIGINT) AS covered_true_pairs
  FROM dup JOIN base a ON dup.doc_a = a.doc_id
           JOIN base b ON dup.doc_b = b.doc_id
)
SELECT n AS n_docs, n_blocks, candidate_pairs, true_pairs, covered_true_pairs,
       CAST((n * (n - 1) // 2 - candidate_pairs) * 1000000
            // (n * (n - 1) // 2) AS BIGINT) AS reduction_ratio_ppm,
       CAST(covered_true_pairs * 1000000 // true_pairs AS BIGINT)
         AS pairs_completeness_ppm
FROM nd, blocks, cov
"""


BLOCKING_QUALITY_REPORT_SQL = _blocking_quality_sql()
