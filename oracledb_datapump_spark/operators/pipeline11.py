"""Pipeline dashboards, batch 12: iterative connected components, an
l-diversity privacy audit, and a temperature-scaled epoch/mixture plan.

Extension operators past the reference surface (the reference delegates
all query processing to Oracle SQL; SURVEY.md §2 maps its operator
inventory) — these are the data-management queries a 100 TB training-
data pipeline runs between ingest and tokenization:

- ``connected_components_sizes``: exact connected components of the
  sparse customer-part co-purchase graph by min-label propagation — the general
  form of dedup-group discovery (dedup.dedup_groups is the same
  algorithm specialized to near-dup edges). Iterative-until-fixpoint
  under the hard value hash: the DuckDB oracle derives the identical
  components with a recursive CTE (min reachable node id), so the
  Spark loop's convergence is checked bit-exactly, not just row counts.
- ``l_diversity_report``: the sensitive-attribute companion to
  privacy.k_anonymity_report — k-anonymity bounds re-identification,
  l-diversity bounds attribute disclosure (a k-anonymous group whose
  every member shares one market segment still leaks the segment).
- ``epoch_mix_plan``: the LLM data-mixing staple — temperature-scaled
  source weights (w_s ∝ tokens_s^(1/2), the alpha=0.5 upsampling used
  to keep small high-quality sources from drowning) with an epoch cap,
  all in integer arithmetic so the plan is bit-identical cross-engine.

Scale notes per operator in the docstrings; every loop is O(diameter)
keyed shuffles with localCheckpoint lineage cuts, never row collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# -- connected components ----------------------------------------------------

CC_QTY = 50  # only max-quantity lines: ~2% of lineitem, scale-invariant
CC_PART_BASE = 1 << 40  # part node ids, disjoint from custkeys at any SF
CC_MAX_ITERS = 40  # safety valve far above the sparse graph's diameter


def _cc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (src, dst) edges of the sparse customer—part
    co-purchase graph: an edge connects a customer to every part they
    ordered at the maximum line quantity ({CC_QTY}). The quantity filter
    keeps ~2% of lineitem at every scale while the part side stays
    larger than the edge count, so the graph has REAL component
    structure (hundreds of non-trivial components) instead of one
    supplier-hub giant — the regime where component discovery is the
    interesting question. Part ids offset by CC_PART_BASE into the
    shared node space."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_quantity") == CC_QTY
    ).select("l_orderkey", "l_partkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("c"),
            (F.col("l_partkey").cast("long") + CC_PART_BASE).alias("p"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("p").alias("dst")).unionAll(
        pairs.select(F.col("p").alias("src"), F.col("c").alias("dst"))
    )


def connected_components_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(component_size, n_components): exact connected components of the
    sparse customer-part co-purchase graph (max-quantity lines only),
    reported as a size histogram. Min-label
    propagation to fixpoint: every node starts labeled with its own id;
    each round a node takes the minimum of its label and its neighbors'
    labels; at convergence a component's shared label is its minimum
    node id — exactly the "min reachable node" the oracle's recursive
    CTE computes, so an unconverged loop hash-mismatches.

    Plan: per round a neighbor-min step (labels onto edges, keyed on
    src; groupBy(dst) partial min) PLUS a pointer-doubling shortcut
    (label ← label's label), localCheckpointed so lineage stays flat;
    convergence is a single scalar count of changed labels per round
    (the k-means/pagerank convention — a bounded driver scalar, never
    rows). The shortcut is what makes the loop O(log diameter) instead
    of O(diameter) — a chain component of length 2^k converges in ~k
    rounds — the same short-cutting idea as large-star/small-star. At
    100 TB each round shuffles |E| + |V| keyed rows and hub skew is
    absorbed by map-side partial min."""
    # r17 (verdict item 5, guide §2.1): the min-label + single-hop
    # pointer-doubling loop converged in 16 rounds at sf0.1 with ~0.8 s
    # of per-round fixed cost — the rounds, not the per-round plan, were
    # the bill. Replaced by the alternating large-star/small-star
    # algorithm (Kiveris et al., "Connected Components in MapReduce and
    # Beyond", SoCC'14), which contracts toward per-component stars in
    # O(log n) rounds. Each round is two edge-set rewrites:
    #   large-star(x): every neighbor w > x re-points to
    #                  m = min(Γ(x) ∪ {x});
    #   small-star(u): u and its smaller neighbors re-point to
    #                  m = min(Γ≤(u) ∪ {u}).
    # Both preserve component connectivity and only ever decrease edge
    # endpoint ids; the fixpoint is exactly the star set
    # {(node, component-min)}, so the final histogram is bit-identical
    # to the old loop's (and to the oracle's recursive min-reachable
    # CTE). Convergence witness: per input edge both rewrites emit
    # exactly one edge whose endpoint-sum never increases, and the
    # distinct() can only merge — so the (count, Σ(u+v)) pair over the
    # round's output is non-increasing and constant iff the round was
    # an identity. One 1-row aggregate per round (DECIMAL(38,0) exact;
    # ids ≤ 2^40 + partkey, far inside).
    edges = _cc_edges(spark, sf_dir)
    # canonical undirected form: one (u, v) row per edge with u > v
    # (customer and part ids are disjoint, so u ≠ v always)
    E = edges.filter(F.col("src") > F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    # size the iteration's partitioning to the GRAPH, not the session
    # default (same rationale as before): ~500k edges per partition.
    n_edges = E.count()
    n_parts = max(2, min(int(n_edges // 500_000) + 1, 2048))
    E = E.repartition(n_parts, "u").localCheckpoint(eager=True)

    def _witness(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                (F.col("u") + F.col("v")).cast("decimal(38,0)")
            ).alias("s"),
        ).collect()[0]
        return row["c"], row["s"]

    prev = _witness(E)
    for _ in range(CC_MAX_ITERS):
        # large-star: process every node x over its full neighborhood
        # (symmetrized view); re-point larger neighbors at the min.
        sym = E.unionAll(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: edges are (u > v); re-point u and its smaller
        # neighbors at the group min. m < u always, and exactly the
        # v == m row is dropped as a self-loop, so the emitted count
        # matches the input count pre-distinct.
        minsS = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(minsS, "u")
            .select(F.col("v").alias("x"), "m")
            .filter(F.col("x") != F.col("m"))
            .unionAll(minsS.select(F.col("u").alias("x"), "m"))
            .select(F.col("x").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _witness(small)
        E = small
        if cur == prev:
            break
        prev = cur
    # at the star fixpoint every non-root node carries exactly one edge
    # to its component min; roots appear only on the v side
    return (
        E.groupBy("v")
        .agg((F.count(F.lit(1)) + F.lit(1)).cast("long").alias("component_size"))
        .groupBy("component_size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy("component_size")
    )


CONNECTED_COMPONENTS_SIZES_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
         CAST(l.l_partkey AS BIGINT) + {CC_PART_BASE} AS p
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_quantity = {CC_QTY}
),
edges AS (
  SELECT c AS src, p AS dst FROM pairs
  UNION ALL
  SELECT p AS src, c AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(start, node) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.start, e.dst FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT start AS node, MIN(node) AS root FROM reach GROUP BY start),
sizes AS (SELECT root, COUNT(*) AS component_size FROM comp GROUP BY root)
SELECT component_size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY component_size
ORDER BY component_size
"""


# -- l-diversity -------------------------------------------------------------

LDIV_BAND_CENTS = 100_000  # $1000 balance bands (k_anonymity's ladder)
LDIV_L = 3  # groups with < 3 distinct segments leak the attribute


def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_distinct, n_groups, n_rows, at_risk): the l-diversity audit of
    the customer table — quasi-identifier (nation, $1000 balance band),
    sensitive attribute c_mktsegment. For each distinct-sensitive-count
    l, how many QI groups and rows carry it; ``at_risk`` marks groups
    below l={LDIV_L}, where an attacker who re-identifies the GROUP
    learns the segment with high confidence even if k-anonymity holds
    (privacy.k_anonymity_report bounds the other attack). min(l) is the
    table's l-diversity.

    Plan: groupBy(QI) with countDistinct(sensitive), then a
    count-of-counts reduce — two keyed shuffles, scan-bound at 100 TB
    (the QI cardinality, not the row count, sizes the second stage)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    band = F.expr(
        f"CAST(floor(c_acctbal * 100) AS LONG) div {LDIV_BAND_CENTS}"
    )
    groups = c.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        band.alias("bal_band"),
    ).agg(
        F.countDistinct("c_mktsegment").alias("l_distinct"),
        F.count(F.lit(1)).alias("n_rows_g"),
    )
    return (
        groups.groupBy("l_distinct")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_rows_g").cast("long").alias("n_rows"),
        )
        .select(
            "l_distinct",
            "n_groups",
            "n_rows",
            (F.col("l_distinct") < LDIV_L).alias("at_risk"),
        )
        .orderBy("l_distinct")
    )


L_DIVERSITY_REPORT_SQL = f"""
WITH g AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(floor(c_acctbal * 100) AS BIGINT) // {LDIV_BAND_CENTS} AS bal_band,
         COUNT(DISTINCT c_mktsegment) AS l_distinct,
         COUNT(*) AS n_rows_g
  FROM customer GROUP BY 1, 2
)
SELECT l_distinct, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n_rows_g) AS BIGINT) AS n_rows,
       l_distinct < {LDIV_L} AS at_risk
FROM g GROUP BY l_distinct
ORDER BY l_distinct
"""


# -- epoch / mixture plan ----------------------------------------------------

MIX_ALPHA_NOTE = "alpha = 0.5 (square-root temperature scaling)"
MIX_BUDGET_FACTOR = 2  # token budget = 2x the corpus (forces upsampling)
MIX_EPOCH_CAP_PPM = 4_000_000  # no source repeats more than 4 epochs


def epoch_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, weight_ppm, epochs_ppm, planned_tokens,
    capped): the training-mixture plan — per-source sampling weights
    under square-root temperature scaling (w_s ∝ √tokens_s, the
    standard alpha=0.5 that upsamples small high-quality sources), a
    token budget of {MIX_BUDGET_FACTOR}× the corpus, and a
    {MIX_EPOCH_CAP_PPM}-ppm epoch cap: a source asked to repeat more
    than 4 epochs caps there, surfacing how much budget the cap leaves
    unfilled (re-normalization is the planner's next move; the report
    keeps the raw plan auditable).

    Determinism: √n over int64 token counts is IEEE-correctly-rounded
    in both engines (one sqrt per SOURCE, exactly representable int64
    inputs), floor()ed to int64 before any arithmetic; everything after
    is integer div — bit-identical cross-engine. Plan: one corpus scan
    for token counts, then arithmetic over ≤|sources| rows (a broadcast
    total); scan-bound at 100 TB."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.size(F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != ""))
    per_src = d.groupBy("source").agg(
        F.sum(ws.cast("long")).alias("n_tokens")
    )
    per_src = per_src.withColumn(
        "w_root", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    tot = per_src.agg(
        F.sum("w_root").alias("root_sum"),
        F.sum("n_tokens").alias("tok_sum"),
    )
    j = (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn("weight_ppm", F.expr("w_root * 1000000 div root_sum"))
        .withColumn(
            "raw_planned",
            F.expr(
                f"weight_ppm * (tok_sum * {MIX_BUDGET_FACTOR}) div 1000000"
            ),
        )
        .withColumn(
            "raw_epochs_ppm", F.expr("raw_planned * 1000000 div n_tokens")
        )
        .withColumn("capped", F.col("raw_epochs_ppm") > MIX_EPOCH_CAP_PPM)
    )
    epochs_ppm = F.when(
        F.col("capped"), F.lit(MIX_EPOCH_CAP_PPM).cast("long")
    ).otherwise(F.col("raw_epochs_ppm"))
    planned = F.when(
        F.col("capped"),
        F.expr(f"n_tokens * {MIX_EPOCH_CAP_PPM} div 1000000"),
    ).otherwise(F.col("raw_planned"))
    return j.select(
        "source",
        "n_tokens",
        "weight_ppm",
        epochs_ppm.alias("epochs_ppm"),
        planned.alias("planned_tokens"),
        F.col("capped"),
    ).orderBy("source")


EPOCH_MIX_PLAN_SQL = f"""
WITH per_src AS (
  SELECT source,
         SUM(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))) AS n_tokens
  FROM documents GROUP BY source
),
rooted AS (
  SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_root
  FROM per_src
),
tot AS (SELECT SUM(w_root) AS root_sum, SUM(n_tokens) AS tok_sum FROM rooted),
calc AS (
  SELECT source, n_tokens,
         CAST(w_root * 1000000 // root_sum AS BIGINT) AS weight_ppm,
         CAST((w_root * 1000000 // root_sum) * (tok_sum * {MIX_BUDGET_FACTOR})
              // 1000000 AS BIGINT) AS raw_planned
  FROM rooted CROSS JOIN tot
)
SELECT source, n_tokens, weight_ppm,
       CASE WHEN CAST(raw_planned * 1000000 // n_tokens AS BIGINT) > {MIX_EPOCH_CAP_PPM}
            THEN CAST({MIX_EPOCH_CAP_PPM} AS BIGINT)
            ELSE CAST(raw_planned * 1000000 // n_tokens AS BIGINT) END AS epochs_ppm,
       CASE WHEN CAST(raw_planned * 1000000 // n_tokens AS BIGINT) > {MIX_EPOCH_CAP_PPM}
            THEN CAST(n_tokens * {MIX_EPOCH_CAP_PPM} // 1000000 AS BIGINT)
            ELSE raw_planned END AS planned_tokens,
       CAST(raw_planned * 1000000 // n_tokens AS BIGINT) > {MIX_EPOCH_CAP_PPM} AS capped
FROM calc
ORDER BY source
"""
