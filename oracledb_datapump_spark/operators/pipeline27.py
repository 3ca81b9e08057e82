"""Batch 27 — winnowed-fingerprint dedup, incremental COUNT(DISTINCT)
maintenance, Neyman sampling allocation, purge-impact cascade.

Four operators extending the LLM-pipeline surface (SURVEY.md §6), each
with a DuckDB twin under the cross-engine value hash and the round-2+
determinism recipe (integer quantization, div truncation, floor-sqrt of
integer moments — see README "determinism recipe").

Reference scope note: the reference engine (oracledb-datapump) moves
tables; these are the data-curation analytics a 100 TB training-data
dump store runs ON those tables. No reference counterpart — cited
instead to the published algorithms each re-expresses Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# -- winnowed fingerprint near-dup pairs --------------------------------------

WINNOW_K = 8  # char k-gram length
WINNOW_W = 8  # winnowing window (guarantee: any match >= K+W-1 chars fingerprints)
WINNOW_CAP = 20  # fingerprints in more docs than this are stop-grams (skew cap)
WINNOW_MIN_SHARED = 5  # candidate-pair threshold


def winnowing_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, shared_fps): document pairs sharing >=
    {WINNOW_MIN_SHARED} winnowed k-gram fingerprints — the
    MOSS/winnowing local fingerprinting scheme (Schleimer, Wilkerson,
    Aiken, SIGMOD'03): hash every {WINNOW_K}-char gram, keep the MIN
    hash of each sliding {WINNOW_W}-window, so every substring match of
    length >= K+W-1 is guaranteed to share a fingerprint while storing
    only ~1/W of the grams. A fourth candidate path alongside
    MinHash-LSH / SimHash / prefix-filter (operators/dedup.py,
    pipeline15.py) with a different guarantee: positional locality, not
    set similarity.

    Scale: the gram explosion is |doc| rows but collapses to ~|doc|/W
    DISTINCT fingerprints per doc before the join; the pair join is
    keyed on fingerprint with a frequency cap ({WINNOW_CAP} docs) that
    drops stop-grams — the same hot-bucket control the LSH path uses,
    so no fingerprint bucket exceeds CAP² pair candidates. All
    expressions are JVM-side (md5/CONV inside a transform over
    sequence); no Python rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    # r16 note: a row-local rewrite (sliding min via
    # array_min(slice(h_arr, i+1, W)) inside the gram array, per-doc
    # dedup via array_distinct — removing the per-doc window shuffle
    # AND the fps.distinct() exchange) was A/B-measured same-JVM at
    # sf0.1 and REJECTED: 7.18 s → 17.76 s median (2.5×). The n
    # per-position slice() calls each allocate a fresh array and the
    # nested higher-order functions evaluate interpreted, which costs
    # far more than the one gram-stream exchange it saves. The window
    # formulation below stands (OPTIMIZATION_r16.md).
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN length(t) >= {WINNOW_K} THEN "
                f"transform(sequence(1, length(t) - {WINNOW_K - 1}), p -> "
                f"CAST(CONV(SUBSTRING(md5(substring(t, p, {WINNOW_K})), 1, 15),"
                " 16, 10) AS BIGINT)) "
                "ELSE CAST(array() AS array<bigint>) END"
            )
        ).alias("pos", "h"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    # r16: pin the fingerprint table once — it used to feed the
    # stop-gram count AND the pair join as separate subtrees, so the
    # gram explode + per-doc window ran twice. The pair stage is the
    # shared posting-list expansion (guide §2.4) with the {WINNOW_CAP}
    # frequency cap applied off the list size — one exchange where the
    # old capped-join formulation took three.
    from .dedup import shingle_pair_intersections

    fps = (
        grams.select("doc_id", F.min("h").over(w).alias("fp"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return (
        shingle_pair_intersections(
            fps.withColumnRenamed("fp", "shingle"), max_docs=WINNOW_CAP
        )
        .select(
            F.col("d1").alias("doc_a"),
            F.col("d2").alias("doc_b"),
            F.col("inter").cast("long").alias("shared_fps"),
        )
        .filter(F.col("shared_fps") >= WINNOW_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )


WINNOWING_FINGERPRINT_PAIRS_SQL = f"""
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
g0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(length(t) - {WINNOW_K - 1}, 0)))
           AS pos
  FROM d
),
g AS (
  SELECT doc_id, pos,
         CAST(CAST('0x' || substr(md5(substr(t, pos, {WINNOW_K})), 1, 15)
              AS UBIGINT) AS BIGINT) AS h
  FROM g0
),
w AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS fp
  FROM g
),
f AS (SELECT DISTINCT doc_id, fp FROM w),
capped AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= {WINNOW_CAP}),
ff AS (SELECT f.doc_id, f.fp FROM f JOIN capped USING (fp)),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
  FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(shared_fps AS BIGINT) AS shared_fps
FROM p WHERE shared_fps >= {WINNOW_MIN_SHARED}
ORDER BY doc_a, doc_b
"""


# -- incremental COUNT(DISTINCT) maintenance -----------------------------------

MV_RETRACT_MOD = 26  # even base keys divisible by 13 get retracted


def mv_distinct_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, n_distinct_custkeys, n_pair_refs, matches_recompute):
    COUNT(DISTINCT) is famously non-incremental as a scalar — the
    DBSP/IVM answer is a REFCOUNT state table keyed by (group, value):
    inserts +1, retractions -1, the distinct count = keys with refcount
    > 0. Here the base MV is built from even-orderkey orders, a delta
    batch inserts the odd-orderkey half AND retracts every base row
    with o_orderkey % {MV_RETRACT_MOD} = 0, and the maintained result
    is compared IN-QUERY against a from-scratch recompute over the
    surviving rows (matches_recompute must be TRUE for every group —
    the self-check rides under the driver hash). Extends the MV family
    (operators/incremental_mv.py: FAST-REFRESH algebra, retraction
    deltas, join deltas) with the distinct-agg case its docstring
    defers.

    Scale: state is |distinct (group, value)| rows — the same footprint
    any exact distinct requires; maintenance is one keyed sum per delta
    plus a group count, both map-side combinable. No driver state."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_custkey").alias("custkey"),
    )
    even = F.col("o_orderkey") % 2 == 0
    retracted = F.col("o_orderkey") % MV_RETRACT_MOD == 0
    base = orders.filter(even).select("priority", "custkey", F.lit(1).alias("mult"))
    inserts = orders.filter(~even).select(
        "priority", "custkey", F.lit(1).alias("mult")
    )
    retracts = orders.filter(even & retracted).select(
        "priority", "custkey", F.lit(-1).alias("mult")
    )
    state = (
        base.unionByName(inserts)
        .unionByName(retracts)
        .groupBy("priority", "custkey")
        .agg(F.sum("mult").alias("refcount"))
        .filter(F.col("refcount") > 0)
    )
    maintained = state.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_custkeys"),
        F.sum("refcount").cast("long").alias("n_pair_refs"),
    )
    recompute = (
        orders.filter(~(even & retracted))
        .groupBy("priority")
        .agg(F.countDistinct("custkey").cast("long").alias("rc"))
    )
    return (
        maintained.join(recompute, "priority")
        .select(
            "priority",
            "n_distinct_custkeys",
            "n_pair_refs",
            (F.col("n_distinct_custkeys") == F.col("rc")).alias(
                "matches_recompute"
            ),
        )
        .orderBy("priority")
    )


MV_DISTINCT_DELTA_SQL = f"""
WITH o AS (
  SELECT o_orderkey AS k, o_orderpriority AS priority, o_custkey AS custkey
  FROM orders
),
deltas AS (
  SELECT priority, custkey, 1 AS mult FROM o WHERE k % 2 = 0
  UNION ALL
  SELECT priority, custkey, 1 FROM o WHERE k % 2 <> 0
  UNION ALL
  SELECT priority, custkey, -1 FROM o
  WHERE k % 2 = 0 AND k % {MV_RETRACT_MOD} = 0
),
state AS (
  SELECT priority, custkey, SUM(mult) AS refcount
  FROM deltas GROUP BY priority, custkey
  HAVING SUM(mult) > 0
),
maintained AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_distinct_custkeys,
         CAST(SUM(refcount) AS BIGINT) AS n_pair_refs
  FROM state GROUP BY priority
),
recompute AS (
  SELECT priority, CAST(COUNT(DISTINCT custkey) AS BIGINT) AS rc
  FROM o WHERE NOT (k % 2 = 0 AND k % {MV_RETRACT_MOD} = 0)
  GROUP BY priority
)
SELECT m.priority, m.n_distinct_custkeys, m.n_pair_refs,
       m.n_distinct_custkeys = r.rc AS matches_recompute
FROM maintained m JOIN recompute r USING (priority)
ORDER BY priority
"""


# -- Neyman allocation for stratified sampling ---------------------------------

NEYMAN_TOTAL_N = 10_000
NEYMAN_BAND = 1_000  # price quantization (kilodollar bands)


def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, n_rows, s_scaled, alloc_n): optimal (Neyman) sample
    allocation across order-priority strata — n_h ∝ N_h·S_h, the
    textbook minimum-variance allocation for a fixed total sample
    (Neyman 1934; the design step BEFORE the stratified_sample operator
    draws rows). Dispersion uses the integer-moment identity
    N·ΣY² − (ΣY)² over kilodollar-quantized prices, its square root via
    floor(sqrt(double)) — the pipeline19/21 floor-sqrt recipe: int64 →
    double is correctly rounded in both engines, so the hash holds
    cross-engine. Allocations are truncating integer divisions of
    {NEYMAN_TOTAL_N} by the N·s weight share.

    Scale: one groupBy over the fact table computing three integer
    moments (map-side combinable), then a |strata|-row broadcastable
    weight normalization. Skew-free by construction (moments, not
    rows)."""
    y = F.floor(F.col("o_totalprice") / NEYMAN_BAND).cast("long")
    strata = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderpriority").alias("priority"), y.alias("y"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("y").cast("long").alias("s"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("q"),
        )
        .withColumn(
            "s_scaled",
            F.floor(
                F.sqrt(
                    (
                        F.col("n_rows") * F.col("q") - F.col("s") * F.col("s")
                    ).cast("double")
                )
            ).cast("long"),
        )
        .withColumn("weight", F.col("n_rows") * F.col("s_scaled"))
    )
    total = strata.agg(F.sum("weight").alias("tw"))
    return (
        strata.crossJoin(F.broadcast(total))
        .select(
            "priority",
            "n_rows",
            "s_scaled",
            F.expr(
                f"CAST({NEYMAN_TOTAL_N} * weight div greatest(tw, 1) AS BIGINT)"
            ).alias("alloc_n"),
        )
        .orderBy("priority")
    )


NEYMAN_ALLOCATION_PLAN_SQL = f"""
WITH strata AS (
  SELECT o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(y * y) AS BIGINT) AS q
  FROM (SELECT o_orderpriority,
               CAST(floor(o_totalprice / {NEYMAN_BAND}) AS BIGINT) AS y
        FROM orders)
  GROUP BY o_orderpriority
),
w AS (
  SELECT priority, n_rows,
         CAST(floor(sqrt(CAST(n_rows * q - s * s AS DOUBLE))) AS BIGINT)
           AS s_scaled
  FROM strata
),
t AS (SELECT SUM(n_rows * s_scaled) AS tw FROM w)
SELECT priority, n_rows, s_scaled,
       CAST({NEYMAN_TOTAL_N} * (n_rows * s_scaled)
            // GREATEST((SELECT tw FROM t), 1) AS BIGINT) AS alloc_n
FROM w
ORDER BY priority
"""


# -- purge-impact cascade report ------------------------------------------------

PURGE_MOD = 97  # customers with c_custkey % 97 = 0 are purged


def purge_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, n_rows, n_impacted, impacted_ppm): the
    impact-analysis pass BEFORE a cascading erasure (GDPR Art. 17 /
    retention purge): given a parent purge predicate on ``customer``
    (c_custkey % {PURGE_MOD} = 0), count the rows each downstream table
    loses — orders via o_custkey, lineitem via those orders. The
    cascade mirrors the reference's dependency-ordered import
    (constraints land after data; our constraints GC in
    tests/test_constraints_gc.py) but in the delete direction.

    Scale: two semi-join levels, each keyed on the FK (orders shuffles
    on custkey, lineitem on orderkey); the purge key set is 1/{PURGE_MOD}
    of the dimension so AQE will broadcast it when small and shuffle it
    when not — the query never collects keys to the driver."""
    purged = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") % PURGE_MOD == 0)
        .select(F.col("c_custkey").alias("k"))
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o_imp = orders.join(
        purged, orders.o_custkey == F.col("k"), "left_semi"
    )
    l_imp = lineitem.join(
        o_imp.select(F.col("o_orderkey").alias("ok")),
        lineitem.l_orderkey == F.col("ok"),
        "left_semi",
    )

    def row(name: str, full: DataFrame, imp: DataFrame) -> DataFrame:
        n = full.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        m = imp.agg(F.count(F.lit(1)).cast("long").alias("n_impacted"))
        return (
            n.crossJoin(m)
            .select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_impacted",
                F.expr(
                    "CAST(n_impacted * 1000000 div greatest(n_rows, 1)"
                    " AS BIGINT)"
                ).alias("impacted_ppm"),
            )
        )

    cust_imp = customer.join(purged, customer.c_custkey == F.col("k"), "left_semi")
    return (
        row("customer", customer, cust_imp)
        .unionByName(row("lineitem", lineitem, l_imp))
        .unionByName(row("orders", orders, o_imp))
        .orderBy("table_name")
    )


PURGE_IMPACT_REPORT_SQL = f"""
WITH purged AS (
  SELECT c_custkey AS k FROM customer WHERE c_custkey % {PURGE_MOD} = 0
),
o_imp AS (
  SELECT o.* FROM orders o WHERE EXISTS
    (SELECT 1 FROM purged p WHERE p.k = o.o_custkey)
),
rows_ AS (
  SELECT 'customer' AS table_name,
         CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
         CAST((SELECT COUNT(*) FROM purged) AS BIGINT) AS n_impacted
  UNION ALL
  SELECT 'lineitem',
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
         CAST((SELECT COUNT(*) FROM lineitem l WHERE EXISTS
               (SELECT 1 FROM o_imp o WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT)
  UNION ALL
  SELECT 'orders',
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST((SELECT COUNT(*) FROM o_imp) AS BIGINT)
)
SELECT table_name, n_rows, n_impacted,
       CAST(n_impacted * 1000000 // GREATEST(n_rows, 1) AS BIGINT)
         AS impacted_ppm
FROM rows_
ORDER BY table_name
"""
