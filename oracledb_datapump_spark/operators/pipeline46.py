"""Batch 46: robust trend inference, vocabulary coverage, link analysis.

Three more named public methods the engine's analytics families were
still missing:

- ``theil_sen_trend`` — the robust companion to revenue_trend_ols:
  Theil–Sen slope (median of all pairwise slopes; Sen 1968) plus the
  Mann–Kendall trend test (Mann 1945 / Kendall) with tie-corrected
  variance and continuity-corrected z² at α = 0.05. One wild month
  bends an OLS fit; the median-of-slopes barely moves — the pair of
  queries shows exactly which nations' growth stories are outlier
  artifacts. Integer-exact throughout: slopes in ppm via the repo's
  signed-ratio recipe, the significance verdict as a cross-multiplied
  int64 inequality (the mw_u_segments device) — no sqrt, no float.
- ``good_turing_unseen_mass`` — Good–Turing missing-mass estimate per
  source (Good 1953): the probability the NEXT token drawn from a
  source is a previously-unseen type is f₁/N (singleton count over
  token count). The vocabulary-coverage planning number: a source with
  high unseen mass keeps minting new types and a frozen tokenizer will
  byte-fallback on it forever.
- ``hits_topk`` — Kleinberg's HITS (1999) on the customer→part
  purchase bipartite graph: two normalized hub/authority iterations,
  integer-scaled (score · 1e6 div max per round, the pagerank_topk
  device), top-20 authority parts. The catalog's "load-bearing
  products" ranked by the breadth of strong buyers, not raw volume.

Scale posture: the Theil–Sen pair join is O(months²) per nation on a
≤|nation×month| ROLLUP (the kendall_tau_daily precedent — never on
rows); Good–Turing is two partial-aggregated groupBys; HITS is the
edges-list shuffle pagerank already pays (distinct bipartite edges,
two keyed aggregations per iteration, maxima as 1-row broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import TOKEN_SPLIT_RE, tokens

# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------

# z²·10⁴ at α=0.05 two-sided (1.96² = 3.8416); verdict is the integer
# inequality 18·10⁴·(|S|−1)² > 38416·var_num with var_num = 18·Var(S)
MK_Z2_X10K = 38_416


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_months, n_pairs, mk_s, var_s_num, mk_significant,
    ts_slope_ppm): Theil–Sen median slope of monthly revenue (cents per
    month, ppm) + the Mann–Kendall monotone-trend verdict per nation.

    - ``mk_s`` = Σ_{i<j} sign(yⱼ−yᵢ); ``var_s_num`` = 18·Var(S) =
      n(n−1)(2n+5) − Σₜ t(t−1)(2t+5) over tied revenue groups.
    - ``mk_significant``: continuity-corrected |S|−1 against 1.96
      via 18·10⁴·(|S|−1)² > {MK_Z2_X10K}·var_s_num — integers only.
    - ``ts_slope_ppm``: LOWER median (rank ⌈P/2⌉ by slope asc) of the
      P = n(n−1)/2 pairwise slopes, each the signed ratio
      sign(dy)·(|dy|·10⁶ div dx) in DECIMAL(38,0) so no month count or
      revenue magnitude can overflow.

    Plan: the monthly rollup is the same broadcast-dim aggregate
    revenue_trend_ols builds; pairs, windows and the moment reduce all
    run nation-partitioned over ≤|nation×month| rows (the
    kendall_tau_daily O(rollup²) posture — at 100 TB the rollup is
    |nations|·|months| ≈ thousands of rows regardless of row count)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    # localCheckpoint: four downstream branches (stats/median/ties/
    # n_months) would otherwise each replay the orders scan; the rollup
    # is ≤|nation×month| rows, so pinning it is free and the corpus is
    # read exactly once (the graph.py iterative-algorithm device)
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
                "ym"
            ),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "y"
            )
        )
        .localCheckpoint(eager=True)
    )
    idx = monthly.withColumn(
        "x", F.row_number().over(W.partitionBy("nation").orderBy("ym")) - 1
    )

    a, b = idx.alias("a"), idx.alias("b")
    pairs = a.join(
        b,
        (F.col("a.nation") == F.col("b.nation"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.nation").alias("nation"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
        (F.col("b.x") - F.col("a.x")).alias("dx"),
    )
    sloped = pairs.select(
        "nation",
        F.signum("dy").cast("long").alias("sgn"),
        (
            F.when(F.col("dy") < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "CAST((CAST(abs(dy) AS DECIMAL(38,0)) * 1000000)"
                " div dx AS BIGINT)"
            )
        ).alias("slope_ppm"),
    ).localCheckpoint(eager=True)  # reused by stats AND the median rank
    stats = sloped.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("sgn").alias("mk_s"),
    )
    med = (
        sloped.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("nation").orderBy("slope_ppm")
            ),
        )
        .join(stats.select("nation", "n_pairs"), "nation")
        .filter(F.col("rk") == F.expr("(n_pairs + 1) div 2"))
        .select("nation", F.col("slope_ppm").alias("ts_slope_ppm"))
    )
    nm = idx.groupBy("nation").agg(F.count(F.lit(1)).alias("n_months"))
    ties = (
        monthly.groupBy("nation", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("nation")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    out = (
        nm.join(stats, "nation")
        .join(ties, "nation")
        .join(med, "nation")
        .withColumn(
            "var_s_num",
            F.col("n_months")
            * (F.col("n_months") - 1)
            * (2 * F.col("n_months") + 5)
            - F.col("tie_term"),
        )
    )
    return (
        out.filter(F.col("n_months") >= 2)
        .select(
            "nation",
            F.col("n_months").cast("long").alias("n_months"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("mk_s").cast("long").alias("mk_s"),
            F.col("var_s_num").cast("long").alias("var_s_num"),
            (
                (F.col("var_s_num") > 0)
                & (F.abs(F.col("mk_s")) > 1)
                & (
                    F.lit(180_000)
                    * (F.abs(F.col("mk_s")) - 1)
                    * (F.abs(F.col("mk_s")) - 1)
                    > F.lit(MK_Z2_X10K) * F.col("var_s_num")
                )
            ).alias("mk_significant"),
            F.col("ts_slope_ppm").cast("long").alias("ts_slope_ppm"),
        )
        .orderBy("nation")
    )


THEIL_SEN_TREND_SQL = f"""
WITH monthly AS (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
idx AS (
  SELECT nation, y,
         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY ym) - 1 AS x
  FROM monthly
),
pairs AS (
  SELECT a.nation, b.y - a.y AS dy, b.x - a.x AS dx
  FROM idx a JOIN idx b ON a.nation = b.nation AND a.x < b.x
),
sloped AS (
  SELECT nation,
         CAST(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 ELSE 0 END
              AS BIGINT) AS sgn,
         (CASE WHEN dy < 0 THEN -1 ELSE 1 END)
           * CAST(CAST(abs(dy) AS HUGEINT) * 1000000 // dx AS BIGINT)
           AS slope_ppm
  FROM pairs
),
stats AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_pairs, SUM(sgn) AS mk_s
  FROM sloped GROUP BY nation
),
med AS (
  SELECT nation, slope_ppm AS ts_slope_ppm
  FROM (
    SELECT s.nation, s.slope_ppm,
           ROW_NUMBER() OVER (PARTITION BY s.nation ORDER BY s.slope_ppm)
             AS rk,
           st.n_pairs
    FROM sloped s JOIN stats st USING (nation)
  ) WHERE rk = (n_pairs + 1) // 2
),
nm AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_months FROM idx GROUP BY nation),
ties AS (
  SELECT nation, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT nation, y, COUNT(*) AS t FROM monthly GROUP BY nation, y)
  GROUP BY nation
)
SELECT nm.nation, nm.n_months, st.n_pairs, CAST(st.mk_s AS BIGINT) AS mk_s,
       CAST(nm.n_months * (nm.n_months - 1) * (2 * nm.n_months + 5)
            - ties.tie_term AS BIGINT) AS var_s_num,
       (nm.n_months * (nm.n_months - 1) * (2 * nm.n_months + 5)
          - ties.tie_term) > 0
         AND abs(st.mk_s) > 1
         AND 180000 * (abs(st.mk_s) - 1) * (abs(st.mk_s) - 1)
             > {MK_Z2_X10K} * (nm.n_months * (nm.n_months - 1)
                               * (2 * nm.n_months + 5) - ties.tie_term)
         AS mk_significant,
       med.ts_slope_ppm
FROM nm JOIN stats st USING (nation)
        JOIN ties USING (nation)
        JOIN med USING (nation)
WHERE nm.n_months >= 2
ORDER BY nm.nation
"""


# ---------------------------------------------------------------------------
# good_turing_unseen_mass
# ---------------------------------------------------------------------------


def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, n_types, f1, f2, unseen_mass_ppm): Good–Turing
    missing-mass estimate per source — P(next token is a NEW type) =
    f₁/N, with the singleton/doubleton counts a Gale–Sampson smoothing
    pass would consume. High unseen mass = open vocabulary (names,
    codes, typos) where a frozen tokenizer byte-falls-back forever; low
    = closed/templated vocabulary already covered. unseen_mass_ppm is
    exact integer division.

    Plan: row-local tokenize+explode, then two partial-aggregated
    groupBys ((source, tok) → source) — identical shuffle shape to
    source_token_entropy; at 100 TB the second aggregate is
    Zipf-bounded by distinct types per source."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_tok = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_src = per_tok.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    return per_src.select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("types").cast("long").alias("n_types"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.expr("f1 * 1000000 div n").cast("long").alias("unseen_mass_ppm"),
    ).orderBy("source")


GOOD_TURING_UNSEEN_MASS_SQL = f"""
WITH toks AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
           t -> t != '')) AS tok
  FROM documents
),
per_tok AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
),
per_src AS (
  SELECT source, SUM(c) AS n, COUNT(*) AS types,
         SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
         SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
  FROM per_tok GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(types AS BIGINT) AS n_types,
       CAST(f1 AS BIGINT) AS f1,
       CAST(f2 AS BIGINT) AS f2,
       CAST(f1 * 1000000 // n AS BIGINT) AS unseen_mass_ppm
FROM per_src
ORDER BY source
"""


# ---------------------------------------------------------------------------
# hits_topk
# ---------------------------------------------------------------------------

HITS_TOP_K = 20
HITS_SCALE = 1_000_000


def hits_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_partkey, auth_score, rank): Kleinberg's HITS on the
    customer→part purchase bipartite graph (distinct edges via
    orders⋈lineitem) — two hub/authority iterations from a uniform hub
    start, each round max-normalized to {HITS_SCALE} by integer
    division (the pagerank_topk scaling device, so both engines carry
    identical int64 scores with no float norm). Authority round 2 ranks
    the top-{HITS_TOP_K} parts: breadth of STRONG buyers, where a
    buyer's strength is the authority mass of everything else they buy
    — a different ordering than raw degree whenever heavy buyers
    concentrate on a core catalog.

    Plan: one orders⋈lineitem join builds the distinct edge list; each
    half-iteration is a single partial-aggregated groupBy on one side
    of the edge key plus a 1-row max broadcast. Same shuffle family as
    pagerank_topk; the final top-K is TakeOrderedAndProject."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    # localCheckpoint: the edge list is the working set of all three
    # half-iterations — without it each one replays the orders⋈lineitem
    # join (the graph.py power-iteration device)
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # iteration 1: hub = 1 ⇒ authority = in-degree
    a1 = edges.groupBy("p").agg(F.count(F.lit(1)).alias("a"))
    m1 = a1.agg(F.max("a").alias("m"))
    a1n = a1.crossJoin(F.broadcast(m1)).select(
        "p", F.expr(f"a * {HITS_SCALE} div m").alias("an")
    )
    h1 = (
        edges.join(a1n, "p")
        .groupBy("c")
        .agg(F.sum("an").alias("h"))
    )
    m2 = h1.agg(F.max("h").alias("m"))
    h1n = h1.crossJoin(F.broadcast(m2)).select(
        "c", F.expr(f"h * {HITS_SCALE} div m").alias("hn")
    )
    a2 = (
        edges.join(h1n, "c")
        .groupBy("p")
        .agg(F.sum("hn").alias("auth_score"))
    )
    ranked = a2.orderBy(F.desc("auth_score"), "p").limit(HITS_TOP_K)
    return ranked.select(
        F.col("p").cast("long").alias("p_partkey"),
        F.col("auth_score").cast("long").alias("auth_score"),
        F.row_number()
        .over(W.orderBy(F.desc("auth_score"), "p"))
        .cast("long")
        .alias("rank"),
    )


HITS_TOPK_SQL = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a1 AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY p),
a1n AS (
  SELECT p, a * {HITS_SCALE} // (SELECT MAX(a) FROM a1) AS an FROM a1
),
h1 AS (
  SELECT c, SUM(an) AS h FROM edges JOIN a1n USING (p) GROUP BY c
),
h1n AS (
  SELECT c, h * {HITS_SCALE} // (SELECT MAX(h) FROM h1) AS hn FROM h1
),
a2 AS (
  SELECT p, SUM(hn) AS auth_score
  FROM edges JOIN h1n USING (c) GROUP BY p
)
SELECT CAST(p AS BIGINT) AS p_partkey,
       CAST(auth_score AS BIGINT) AS auth_score,
       CAST(ROW_NUMBER() OVER (ORDER BY auth_score DESC, p) AS BIGINT)
         AS rank
FROM a2
ORDER BY auth_score DESC, p
LIMIT {HITS_TOP_K}
"""
