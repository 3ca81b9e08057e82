"""Pipeline dashboards, batch 16: a second set-similarity candidate
path (prefix filtering), distribution drift, clamped queue algebra, and
surrogate-key-space auditing.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``dedup_prefix_filter_pairs``: the AllPairs/PPJoin prefix-filtering
  idea — order each document's token set rarest-first and index only a
  prefix sized so any pair with Jaccard ≥ t MUST collide on at least
  one prefix token; verify candidates with exact set Jaccard. The
  third candidate-generation scheme in the dedup stack (MinHash bands,
  SimHash bands, and now prefix filtering) — EXACT at the threshold,
  where LSH is probabilistic.
- ``category_drift_report``: first-half vs second-half event-type mix
  in exact ppm with an L1 (total-variation) drift verdict — the data
  contract check that catches a logging change or a bot wave between
  two eras of the same table.
- ``clamped_backlog_stats``: a running balance that cannot go negative
  (orders in, shipments out) — computed in closed form from two
  windows (B_k = S_k − min(0, min_{j≤k} S_j)) instead of the
  sequential loop the clamp seems to force. The inventory/queue
  operator relational folklore calls "capped running sum".
- ``orderkey_gap_audit``: gaps in a surrogate key space (missing id
  ranges, islands) — the completeness audit run after any backfill or
  CDC outage, with the global key order computed by the distributed
  range-partition rank, never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

# -- prefix-filtering set-similarity join ------------------------------------

PREFIX_JACCARD_T_PCT = 60  # Jaccard threshold 0.60, integer percent


def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jacc_ppm): all document pairs with 3-shingle
    Jaccard ≥ 0.60 (dedup_ngram_jaccard's exact measure), found by
    prefix filtering (AllPairs/PPJoin): order each doc's shingle set by
    ascending corpus document-frequency (rarest first, ties by shingle)
    and index only the first |d| − ⌈t·|d|⌉ + 1 as its prefix. Two sets
    with Jaccard ≥ t must overlap in more elements than either prefix
    skips, so any qualifying pair collides on ≥ 1 prefix shingle —
    candidates verify with EXACT Jaccard, making this the third
    candidate path in the dedup stack (MinHash bands and SimHash bands
    are probabilistic; prefix filtering is EXACT at the threshold:
    its output provably equals the full shingle-join dedup_ngram_jaccard
    at the same threshold, at a fraction of the fan-out).

    Plan at 100 TB: one groupBy(shingle) for document frequencies, one
    shingle-keyed join to attach df, a PER-DOC window for prefix ranks
    (partitions are single documents), a prefix self-join whose buckets
    are rare-shingle sized (boilerplate shingles never index — the
    hot-bucket problem LSH needs a cap for solves itself here), and
    verify joins probe with the candidate list. ⌈t·n⌉ is integer
    arithmetic ((pct·n + 99) div 100) in both engines."""
    from .dedup import _shingles

    # r16: pin the shingle table once — it feeds FIVE subtrees (ranked,
    # sizes, document frequencies, and both verify probes), and without
    # the pin each one re-ran the full tokenize→shingle lineage
    # (guide §1.2: don't compute things five times).
    dt = (
        _shingles(spark, sf_dir)
        .withColumnRenamed("shingle", "tok")
        .localCheckpoint(eager=True)
    )
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    df_tok = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        dt.join(df_tok, "tok")
        .join(sizes, "doc_id")
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy("df", "tok")
            ),
        )
    )
    prefix = ranked.filter(
        F.col("rnk")
        <= F.col("n_tok")
        - F.expr(f"({PREFIX_JACCARD_T_PCT} * n_tok + 99) div 100")
        + 1
    ).select("doc_id", "tok", "n_tok")
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_tok").alias("na"),
            F.col("b.n_tok").alias("nb"),
        )
        .distinct()
    )
    ta = dt.select(F.col("doc_id").alias("doc_a"), F.col("tok").alias("tok_a"))
    tb = dt.select(F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"))
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(F.col("tok_a") == F.col("tok_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jacc_ppm",
            F.expr("inter * 1000000 div (na + nb - inter)").cast("long"),
        )
        .filter(F.col("jacc_ppm") >= PREFIX_JACCARD_T_PCT * 10_000)
        .select("doc_a", "doc_b", "jacc_ppm")
        .orderBy("doc_a", "doc_b")
    )


def _prefix_filter_sql() -> str:
    from .dedup import SQL_SHINGLES_CTE

    return f"""
WITH {SQL_SHINGLES_CTE},
dt AS (SELECT doc_id, shingle AS tok FROM shingles),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM dt GROUP BY doc_id),
df AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
ranked AS (
  SELECT dt.doc_id, dt.tok, s.n_tok,
         ROW_NUMBER() OVER (PARTITION BY dt.doc_id
                            ORDER BY df.df, dt.tok) AS rnk
  FROM dt JOIN df ON df.tok = dt.tok JOIN sizes s ON s.doc_id = dt.doc_id
),
prefix AS (
  SELECT doc_id, tok, n_tok FROM ranked
  WHERE rnk <= n_tok - (({PREFIX_JACCARD_T_PCT} * n_tok + 99) // 100) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_tok AS na, b.n_tok AS nb
  FROM prefix a JOIN prefix b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, c.na, c.nb, COUNT(*) AS inter
  FROM cand c
  JOIN dt ta ON ta.doc_id = c.doc_a
  JOIN dt tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b, c.na, c.nb
)
SELECT doc_a, doc_b,
       CAST(inter * 1000000 // (na + nb - inter) AS BIGINT) AS jacc_ppm
FROM inter
WHERE inter * 1000000 // (na + nb - inter) >= {PREFIX_JACCARD_T_PCT * 10_000}
ORDER BY doc_a, doc_b
"""


DEDUP_PREFIX_FILTER_SQL = _prefix_filter_sql()


# -- categorical drift -------------------------------------------------------

DRIFT_L1_THRESHOLD_PPM = 100_000  # total-variation 5% (L1 = 2·TV)
DAY_US = 86_400_000_000


def category_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, ref_n, cur_n, ref_ppm, cur_ppm, abs_delta_ppm,
    drift_flag): event-type mix of the timeline's first half (reference
    era) vs its second half (current era), in exact ppm of each era's
    volume, with a global L1 drift verdict (Σ|Δppm| >
    {DRIFT_L1_THRESHOLD_PPM}) repeated on every row — srm_bucket_audit's
    convention for global gates. The schema-drift sibling of a data
    contract: a logging migration, a new client version, or a bot wave
    shifts the categorical mix long before totals look wrong.

    The era split is the midpoint of the OBSERVED day range (pure
    integer arithmetic on epoch-day indexes), so the report is
    self-calibrating. Plan: one scan, a ≤|event_types|×2 groupBy, two
    one-row broadcast totals — scan-bound at any scale."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select(
        "event_type", F.expr(f"ts_us div {DAY_US}").alias("day_idx")
    )
    bounds = e.agg(
        F.expr("(min(day_idx) + max(day_idx) + 1) div 2").alias("mid")
    )
    eras = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.col("day_idx") < F.col("mid"), F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("era"),
    )
    counts = (
        eras.groupBy("event_type")
        .pivot("era", ["ref", "cur"])
        .agg(F.count(F.lit(1)))
        .select(
            "event_type",
            F.coalesce("ref", F.lit(0)).alias("ref_n"),
            F.coalesce("cur", F.lit(0)).alias("cur_n"),
        )
    )
    tot = counts.agg(
        F.sum("ref_n").alias("ref_total"), F.sum("cur_n").alias("cur_total")
    )
    ppm = counts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "ref_n",
        "cur_n",
        F.expr("ref_n * 1000000 div ref_total").alias("ref_ppm"),
        F.expr("cur_n * 1000000 div cur_total").alias("cur_ppm"),
        F.abs(
            F.expr("ref_n * 1000000 div ref_total")
            - F.expr("cur_n * 1000000 div cur_total")
        ).alias("abs_delta_ppm"),
    )
    l1 = ppm.agg(F.sum("abs_delta_ppm").alias("l1"))
    return (
        ppm.crossJoin(F.broadcast(l1))
        .select(
            "event_type",
            F.col("ref_n").cast("long"),
            F.col("cur_n").cast("long"),
            F.col("ref_ppm").cast("long"),
            F.col("cur_ppm").cast("long"),
            F.col("abs_delta_ppm").cast("long"),
            (F.col("l1") > DRIFT_L1_THRESHOLD_PPM).alias("drift_flag"),
        )
        .orderBy("event_type")
    )


CATEGORY_DRIFT_REPORT_SQL = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day_idx FROM events
),
bounds AS (
  SELECT (MIN(day_idx) + MAX(day_idx) + 1) // 2 AS mid FROM e
),
counts AS (
  SELECT event_type,
         SUM(CASE WHEN day_idx < mid THEN 1 ELSE 0 END) AS ref_n,
         SUM(CASE WHEN day_idx >= mid THEN 1 ELSE 0 END) AS cur_n
  FROM e CROSS JOIN bounds GROUP BY event_type
),
tot AS (SELECT SUM(ref_n) AS ref_total, SUM(cur_n) AS cur_total FROM counts),
ppm AS (
  SELECT event_type, ref_n, cur_n,
         ref_n * 1000000 // ref_total AS ref_ppm,
         cur_n * 1000000 // cur_total AS cur_ppm,
         ABS(ref_n * 1000000 // ref_total
             - cur_n * 1000000 // cur_total) AS abs_delta_ppm
  FROM counts CROSS JOIN tot
),
l1 AS (SELECT SUM(abs_delta_ppm) AS l1 FROM ppm)
SELECT event_type, CAST(ref_n AS BIGINT) AS ref_n,
       CAST(cur_n AS BIGINT) AS cur_n,
       CAST(ref_ppm AS BIGINT) AS ref_ppm,
       CAST(cur_ppm AS BIGINT) AS cur_ppm,
       CAST(abs_delta_ppm AS BIGINT) AS abs_delta_ppm,
       l1 > {DRIFT_L1_THRESHOLD_PPM} AS drift_flag
FROM ppm CROSS JOIN l1
ORDER BY event_type
"""


# -- clamped running balance -------------------------------------------------


def clamped_backlog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_days, final_backlog_cents, max_backlog_cents): a
    per-nation order backlog that CANNOT go negative — order totals
    flow in on the order date, shipped line revenue flows out on the
    ship date, and shipping can never drain below zero (you cannot ship
    value you never booked). The clamp looks inherently sequential
    (each day's floor depends on the last), but has the classic closed
    form B_k = S_k − min(0, min_{j≤k} S_j): one cumulative sum and one
    running minimum, both plain windows, recover the entire clamped
    trajectory exactly.

    Plan: two broadcast-dim joins, a (nation, day) groupBy that unions
    signed flows, then two ROWS-framed windows over ≤|nation×day|
    aggregated rows. DECIMAL(38,0) sums; outputs cast to cents
    BIGINT."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    ok = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    inflow = ok.select(
        F.col("n_name").alias("nation"),
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}")
        .alias("day_idx"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("flow"),
    )
    outflow = (
        l.join(
            ok.select("o_orderkey", "n_name"),
            l.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {DAY_US}")
            .alias("day_idx"),
            (-F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "flow"
            ),
        )
    )
    daily = (
        inflow.unionByName(outflow)
        .groupBy("nation", "day_idx")
        .agg(F.sum(F.col("flow").cast("decimal(38,0)")).alias("net"))
    )
    wcum = (
        W.partitionBy("nation")
        .orderBy("day_idx")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = daily.withColumn("s_k", F.sum("net").over(wcum)).withColumn(
        "m_k", F.min("s_k").over(wcum)
    )
    b = F.col("s_k") - F.least(F.col("m_k"), F.lit(0).cast("decimal(38,0)"))
    return (
        cum.withColumn("b_k", b)
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max(F.struct("day_idx", "b_k"))["b_k"]
            .cast("long")
            .alias("final_backlog_cents"),
            F.max("b_k").cast("long").alias("max_backlog_cents"),
        )
        .orderBy("nation")
    )


CLAMPED_BACKLOG_STATS_SQL = f"""
WITH ok AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, n.n_name
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
flows AS (
  SELECT n_name AS nation, epoch_us(o_orderdate) // {DAY_US} AS day_idx,
         CAST(round(o_totalprice * 100) AS BIGINT) AS flow
  FROM ok
  UNION ALL
  SELECT ok.n_name AS nation, epoch_us(l.l_shipdate) // {DAY_US} AS day_idx,
         -CAST(round(l.l_extendedprice * 100) AS BIGINT) AS flow
  FROM lineitem l JOIN ok ON ok.o_orderkey = l.l_orderkey
),
daily AS (
  SELECT nation, day_idx, SUM(flow) AS net
  FROM flows GROUP BY nation, day_idx
),
cum1 AS (
  SELECT nation, day_idx,
         SUM(net) OVER (PARTITION BY nation ORDER BY day_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s_k
  FROM daily
),
cum AS (
  SELECT nation, day_idx, s_k,
         MIN(s_k) OVER (PARTITION BY nation ORDER BY day_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS m_k
  FROM cum1
),
clamped AS (
  SELECT nation, day_idx, s_k - LEAST(m_k, 0) AS b_k FROM cum
)
SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX_BY(b_k, day_idx) AS BIGINT) AS final_backlog_cents,
       CAST(MAX(b_k) AS BIGINT) AS max_backlog_cents
FROM clamped GROUP BY nation
ORDER BY nation
"""


# -- surrogate-key gap audit -------------------------------------------------

GAP_N_RANGES = 32


def orderkey_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_keys, min_key, max_key, n_missing, n_islands, max_gap): the
    surrogate-key completeness audit — how much of the id range
    [min, max] is actually populated, in how many contiguous islands,
    and how wide the worst hole is. Run after a backfill, a CDC outage,
    or a partial restore: a single island means intact; many islands
    with a huge ``max_gap`` names the lost window.

    Plan: the global key rank comes from the distributed
    range-partition helper (`functions/global_order`) — NEVER a
    single-partition ORDER BY window; adjacent keys meet by a
    rank-keyed equi-join (rank = rank+1), gaps are row-local, and the
    report is a one-row reduce. The SQL oracle uses the LAG window
    formulation as ground truth."""
    from ..functions.global_order import with_global_order_stat

    keys = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("k"))
    )
    ranked, n_keys = with_global_order_stat(
        keys, [F.col("k")], out="rk", n_partitions=GAP_N_RANGES
    )
    nxt = ranked.select(
        (F.col("rk") - 1).alias("rk_prev"), F.col("k").alias("k_next")
    )
    gaps = ranked.join(nxt, ranked.rk == nxt.rk_prev).select(
        (F.col("k_next") - F.col("k") - 1).alias("gap")
    )
    agg = gaps.agg(
        F.sum("gap").cast("long").alias("n_missing"),
        (F.sum((F.col("gap") > 0).cast("long")) + 1)
        .cast("long")
        .alias("n_islands"),
        F.coalesce(F.max(F.when(F.col("gap") > 0, F.col("gap"))), F.lit(0))
        .cast("long")
        .alias("max_gap"),
    )
    bounds = keys.agg(
        F.min("k").alias("min_key"), F.max("k").alias("max_key")
    )
    return (
        bounds.crossJoin(F.broadcast(agg))
        .select(
            F.lit(n_keys).cast("long").alias("n_keys"),
            F.col("min_key").cast("long"),
            F.col("max_key").cast("long"),
            "n_missing",
            "n_islands",
            "max_gap",
        )
    )


ORDERKEY_GAP_AUDIT_SQL = """
WITH ranked AS (
  SELECT o_orderkey AS k,
         LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS k_next
  FROM orders
),
gaps AS (
  SELECT k_next - k - 1 AS gap FROM ranked WHERE k_next IS NOT NULL
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_keys,
       (SELECT CAST(MIN(o_orderkey) AS BIGINT) FROM orders) AS min_key,
       (SELECT CAST(MAX(o_orderkey) AS BIGINT) FROM orders) AS max_key,
       CAST(SUM(gap) AS BIGINT) AS n_missing,
       CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) + 1 AS BIGINT)
         AS n_islands,
       CAST(COALESCE(MAX(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT)
         AS max_gap
FROM gaps
"""
