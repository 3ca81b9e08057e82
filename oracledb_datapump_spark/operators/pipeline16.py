"""Pipeline dashboards, batch 17: interval sweeps, FIFO transport
matching, categorical-distribution distances, and planner cardinality
calibration.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``interval_coverage_report``: classic sweep-line interval algebra —
  per-nation covered days, peak concurrency, and order-day mass over
  each order's [placement, last shipment] lifetime, computed from
  +1/−1 boundary events and ONE cumulative window, never a per-day
  explode or a self-join.
- ``fifo_lot_attribution``: a FIFO transport plan between day-level
  inflow lots (booked quantity by order date) and outflow lots
  (shipped quantity by ship date) in cumulative-unit coordinates —
  the classic "match cumulative intervals" formulation, executed as a
  BANDED EQUI-JOIN on coordinate blocks (each pair meets exactly once,
  in its overlap-start block) instead of the O(n²) inequality join the
  textbook writes.
- ``source_unigram_l1_matrix``: pairwise L1 (total-variation×2)
  distance between provider unigram distributions over the global
  top-V vocabulary — the corpus-mix fingerprint that catches two
  "different" providers reselling the same crawl.
- ``card_est_error_report``: the optimizer-calibration audit — exact
  selectivities vs estimates extrapolated from a deterministic 1-in-64
  key-mod sample, all predicates measured in ONE scan of the fact
  table via conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

DAY_US = 86_400_000_000


def _nation_orders(spark: SparkSession, sf_dir: str):
    """orders ⋈ customer ⋈ nation with broadcast dims: (o_orderkey,
    order_day, nation)."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "o_orderkey",
            F.expr(
                f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}"
            ).alias("order_day"),
            F.col("n_name").alias("nation"),
        )
    )


# -- sweep-line interval coverage --------------------------------------------


def interval_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_orders, covered_days, max_concurrent,
    total_order_days): per nation, how many distinct days have at least
    one order "open" (between placement and its last line's ship date),
    the peak number of concurrently open orders, and the total open
    order-day mass (Σ interval lengths, multiplicity counted). The
    capacity-planning view of the order book: covered vs span says how
    bursty demand is, peak concurrency sizes the warehouse.

    Interval endpoints are normalized with least/greatest (the synthetic
    fixture ships some lines before the order date; both engines apply
    the same normalization). End days are EXCLUSIVE at hi+1 so a
    same-day order contributes exactly one day.

    Plan at 100 TB: the only big shuffles are the lineitem
    groupBy(l_orderkey) for last-ship-day and its join to orders — both
    key-partitioned, no skew (orderkey is a surrogate). The sweep
    itself is +1/−1 boundary events grouped to ≤|nation×day| rows, one
    cumulative window per nation, and lead() for gap-aware day deltas —
    NEVER a day explode (a 7-year order book explodes 2500× under
    per-day expansion; boundary events don't)."""
    lastship = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.max(
                F.expr(
                    f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {DAY_US}"
                )
            ).alias("ship_day")
        )
    )
    iv = (
        _nation_orders(spark, sf_dir)
        .join(lastship, "o_orderkey")
        .select(
            "nation",
            F.least("order_day", "ship_day").alias("lo"),
            F.greatest("order_day", "ship_day").alias("hi"),
        )
    )
    ev = iv.select("nation", F.col("lo").alias("day"), F.lit(1).alias("d")).unionByName(
        iv.select("nation", (F.col("hi") + 1).alias("day"), F.lit(-1).alias("d"))
    )
    daily = ev.groupBy("nation", "day").agg(F.sum("d").alias("net"))
    wc = (
        W.partitionBy("nation")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wl = W.partitionBy("nation").orderBy("day")
    swept = daily.withColumn("active", F.sum("net").over(wc)).withColumn(
        "nxt", F.lead("day").over(wl)
    )
    seg = F.coalesce(F.col("nxt") - F.col("day"), F.lit(0))
    n_orders = iv.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    cov = swept.groupBy("nation").agg(
        F.sum(F.when(F.col("active") > 0, seg).otherwise(F.lit(0)))
        .cast("long")
        .alias("covered_days"),
        F.max("active").cast("long").alias("max_concurrent"),
        F.sum(F.col("active") * seg).cast("long").alias("total_order_days"),
    )
    return (
        n_orders.join(cov, "nation")
        .select(
            "nation", "n_orders", "covered_days", "max_concurrent",
            "total_order_days",
        )
        .orderBy("nation")
    )


INTERVAL_COVERAGE_REPORT_SQL = f"""
WITH iv AS (
  SELECT n.n_name AS nation,
         LEAST(epoch_us(o.o_orderdate) // {DAY_US}, ls.ship_day) AS lo,
         GREATEST(epoch_us(o.o_orderdate) // {DAY_US}, ls.ship_day) AS hi
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN (SELECT l_orderkey, MAX(epoch_us(l_shipdate) // {DAY_US}) AS ship_day
        FROM lineitem GROUP BY l_orderkey) ls
    ON ls.l_orderkey = o.o_orderkey
),
ev AS (
  SELECT nation, lo AS day, 1 AS d FROM iv
  UNION ALL
  SELECT nation, hi + 1 AS day, -1 AS d FROM iv
),
daily AS (SELECT nation, day, SUM(d) AS net FROM ev GROUP BY nation, day),
swept AS (
  SELECT nation, day,
         SUM(net) OVER (PARTITION BY nation ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS active,
         LEAD(day) OVER (PARTITION BY nation ORDER BY day) AS nxt
  FROM daily
)
,
norders AS (SELECT nation, COUNT(*) AS n_orders FROM iv GROUP BY nation),
agg AS (
  SELECT nation,
         SUM(CASE WHEN active > 0 THEN COALESCE(nxt - day, 0)
                  ELSE 0 END) AS covered_days,
         MAX(active) AS max_concurrent,
         SUM(active * COALESCE(nxt - day, 0)) AS total_order_days
  FROM swept GROUP BY nation
)
SELECT a.nation, CAST(n.n_orders AS BIGINT) AS n_orders,
       CAST(a.covered_days AS BIGINT) AS covered_days,
       CAST(a.max_concurrent AS BIGINT) AS max_concurrent,
       CAST(a.total_order_days AS BIGINT) AS total_order_days
FROM agg a JOIN norders n ON n.nation = a.nation
ORDER BY a.nation
"""


# -- FIFO lot matching in cumulative coordinates -----------------------------

FIFO_BLK = 4096  # cumulative-unit block width for the banded equi-join


def fifo_lot_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_in_lots, n_out_lots, n_pairs, total_units,
    lag_unit_days): the FIFO transport plan between booked units
    (lineitem quantity keyed by the parent order's date) and shipped
    units (the same quantity keyed by ship date), per nation. Each side
    becomes day-level lots with cumulative-unit intervals
    [cum_prev, cum); FIFO allocation is exactly interval intersection
    in that coordinate, so ``lag_unit_days`` = Σ overlap × (out_day −
    in_day) is the exact unit-weighted booking→shipping lag of the
    first-in-first-out discipline (negative contributions are real:
    the fixture ships some lines before their order date).

    The pair join is where the textbook writes an inequality join
    (b.prev < a.cum AND a.prev < b.cum) — a CartesianProduct in any
    engine. Here it is a BANDED EQUI-JOIN: both lot tables explode to
    the {FIFO_BLK}-unit coordinate blocks they span (fan-out
    total_units/{FIFO_BLK} + n_lots, tiny), join on (nation, block),
    and keep a pair only in the block containing its overlap start —
    each qualifying pair survives exactly once, provably equal to the
    inequality join (the oracle IS that inequality join). Lots are
    ≤|nation×day| aggregated rows; every shuffle is key-partitioned."""
    base = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.expr(
                f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {DAY_US}"
            ).alias("out_day"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .join(_nation_orders(spark, sf_dir), "o_orderkey")
        # r16 note: pinning this frame (both lot arms re-run the
        # enrichment join) was A/B-measured same-JVM at sf0.1 and
        # REJECTED (2.20 s → 2.55 s): the join re-runs cheaper than the
        # eager materialization. Left as-is deliberately.
    )

    def lots(day_col: str):
        w = (
            W.partitionBy("nation")
            .orderBy("day")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return (
            base.groupBy("nation", F.col(day_col).alias("day"))
            .agg(F.sum("qty").alias("q"))
            .withColumn("cum", F.sum("q").over(w))
            .withColumn("prev", F.col("cum") - F.col("q"))
        )

    ilots = lots("order_day")
    olots = lots("out_day")

    def banded(df, side):
        return df.select(
            F.col("nation"),
            F.col("day").alias(f"{side}_day"),
            F.col("prev").alias(f"{side}_prev"),
            F.col("cum").alias(f"{side}_cum"),
            F.explode(
                F.sequence(
                    F.expr(f"prev div {FIFO_BLK}"),
                    F.expr(f"(cum - 1) div {FIFO_BLK}"),
                )
            ).alias("blk"),
        )

    pairs = (
        banded(ilots, "in")
        .join(banded(olots, "out"), ["nation", "blk"])
        .withColumn(
            "ov",
            F.least("in_cum", "out_cum") - F.greatest("in_prev", "out_prev"),
        )
        .filter(
            (F.col("ov") > 0)
            & (
                F.expr(f"greatest(in_prev, out_prev) div {FIFO_BLK}")
                == F.col("blk")
            )
        )
    )
    return (
        pairs.groupBy("nation")
        .agg(
            F.countDistinct("in_day").cast("long").alias("n_in_lots"),
            F.countDistinct("out_day").cast("long").alias("n_out_lots"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("ov").cast("long").alias("total_units"),
            F.sum(F.col("ov") * (F.col("out_day") - F.col("in_day")))
            .cast("long")
            .alias("lag_unit_days"),
        )
        .orderBy("nation")
    )


FIFO_LOT_ATTRIBUTION_SQL = f"""
WITH base AS (
  SELECT n.n_name AS nation,
         epoch_us(o.o_orderdate) // {DAY_US} AS in_day,
         epoch_us(l.l_shipdate) // {DAY_US} AS out_day,
         CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
ilots AS (
  SELECT nation, in_day AS day, SUM(qty) AS q,
         SUM(SUM(qty)) OVER (PARTITION BY nation ORDER BY in_day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM base GROUP BY nation, in_day
),
olots AS (
  SELECT nation, out_day AS day, SUM(qty) AS q,
         SUM(SUM(qty)) OVER (PARTITION BY nation ORDER BY out_day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM base GROUP BY nation, out_day
),
pairs AS (
  SELECT a.nation, a.day AS in_day, b.day AS out_day,
         LEAST(a.cum, b.cum)
           - GREATEST(a.cum - a.q, b.cum - b.q) AS ov
  FROM ilots a JOIN olots b
    ON a.nation = b.nation
   AND b.cum - b.q < a.cum AND a.cum - a.q < b.cum
)
SELECT nation,
       CAST(COUNT(DISTINCT in_day) AS BIGINT) AS n_in_lots,
       CAST(COUNT(DISTINCT out_day) AS BIGINT) AS n_out_lots,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ov) AS BIGINT) AS total_units,
       CAST(SUM(ov * (out_day - in_day)) AS BIGINT) AS lag_unit_days
FROM pairs
WHERE ov > 0
GROUP BY nation
ORDER BY nation
"""


# -- provider unigram-distribution distance matrix ---------------------------

L1_TOP_V = 150  # global top-V vocabulary (by count desc, token asc)


def source_unigram_l1_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, overlap_tokens, l1_ppm): pairwise L1
    distance (= 2 × total-variation) between each provider pair's
    unigram distributions over the GLOBAL top-{L1_TOP_V} vocabulary,
    shares in exact ppm of each provider's own top-V token mass. Two
    providers reselling the same crawl sit near 0; disjoint domains
    approach 2,000,000. ``overlap_tokens`` counts top-V tokens both
    providers actually use.

    Plan at 100 TB: ONE token explode + groupBy(source, tok) — the
    same partial-aggregated shuffle zipf_vocab_curve pays — then
    everything shrinks: the top-V vocabulary is a {L1_TOP_V}-row
    broadcast (distributed TakeOrderedAndProject, no vocabulary-wide
    window), the share grid is |sources|×V rows built by a broadcast
    cross join so absent tokens materialize as true zeros, and the
    pair matrix is a token-keyed self-join of that grid
    (|sources|²×V rows, provider counts are bounded). Integer-floor
    shares in both engines; a provider with zero top-V mass divides by
    greatest(tot, 1) in both."""
    from ..functions.text import tokens as _tokens
    from .docs_source import load_docs

    d = load_docs(spark, sf_dir)
    counts = (
        d.select("source", F.explode(_tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topv = (
        counts.groupBy("tok")
        .agg(F.sum("cnt").alias("gcnt"))
        .orderBy(F.desc("gcnt"), F.asc("tok"))
        .limit(L1_TOP_V)
        .select("tok")
    )
    tv_counts = counts.join(F.broadcast(topv), "tok")
    stot = tv_counts.groupBy("source").agg(F.sum("cnt").alias("tot"))
    grid = (
        stot.crossJoin(F.broadcast(topv))
        .join(tv_counts, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.coalesce("cnt", F.lit(0)).alias("cnt0"),
            F.expr(
                "coalesce(cnt, 0) * 1000000 div greatest(tot, 1)"
            ).alias("share_ppm"),
        )
    )
    a = grid.alias("a")
    b = grid.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.sum(
                ((F.col("a.cnt0") > 0) & (F.col("b.cnt0") > 0)).cast("long")
            )
            .cast("long")
            .alias("overlap_tokens"),
            F.sum(F.abs(F.col("a.share_ppm") - F.col("b.share_ppm")))
            .cast("long")
            .alias("l1_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


def _source_unigram_l1_sql() -> str:
    from ..functions.text import TOKEN_SPLIT_RE

    return f"""
WITH counts AS (
  SELECT source, tok, COUNT(*) AS cnt FROM (
    SELECT source, unnest(list_filter(
      string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != ''))
        AS tok
    FROM documents)
  GROUP BY source, tok
),
topv AS (
  SELECT tok FROM (SELECT tok, SUM(cnt) AS gcnt FROM counts GROUP BY tok)
  ORDER BY gcnt DESC, tok LIMIT {L1_TOP_V}
),
tv_counts AS (SELECT c.* FROM counts c JOIN topv USING (tok)),
stot AS (SELECT source, SUM(cnt) AS tot FROM tv_counts GROUP BY source),
grid AS (
  SELECT s.source, v.tok, COALESCE(c.cnt, 0) AS cnt0,
         COALESCE(c.cnt, 0) * 1000000 // GREATEST(s.tot, 1) AS share_ppm
  FROM stot s CROSS JOIN topv v
  LEFT JOIN tv_counts c ON c.source = s.source AND c.tok = v.tok
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(CASE WHEN a.cnt0 > 0 AND b.cnt0 > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS overlap_tokens,
       CAST(SUM(ABS(a.share_ppm - b.share_ppm)) AS BIGINT) AS l1_ppm
FROM grid a JOIN grid b ON a.tok = b.tok AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


SOURCE_UNIGRAM_L1_SQL = _source_unigram_l1_sql()


# -- cardinality-estimation calibration --------------------------------------

CARD_SAMPLE_MOD = 64  # deterministic 1-in-64 key-mod sample


def card_est_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(predicate, exact_rows, est_rows, abs_err_ppm): the optimizer
    calibration table — for a fixed panel of orders predicates, the
    exact selectivity vs the estimate extrapolated from the
    deterministic 1-in-{CARD_SAMPLE_MOD} key-mod sample
    (o_orderkey % {CARD_SAMPLE_MOD} = 0, identical rows in any engine —
    no RNG, no engine-specific hash). The ``cust_mod10`` arm is the
    planted trap: a predicate arithmetically correlated with a key-mod
    sampling scheme misestimates where the others calibrate well — the
    reason real samplers hash rather than mod.

    Plan: ONE scan of orders computes every exact count and every
    sample count as conditional sums in a single partial-aggregated
    groupBy-less aggregate (8 longs cross the wire per partition);
    stack() unpivots the one-row aggregate into the report. At 100 TB
    the cost is the scan, and only the three projected columns are
    read."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice",
    )
    preds = {
        "bulk_order": "o_totalprice >= 250000.0",
        "cust_mod10": "o_custkey % 10 = 0",
        "hi_priority": "substring(o_orderpriority, 1, 1) IN ('1', '2')",
        "status_f": "o_orderstatus = 'F'",
    }
    samp = f"o_orderkey % {CARD_SAMPLE_MOD} = 0"
    aggs = []
    for name, p in preds.items():
        aggs.append(
            F.expr(f"sum(CASE WHEN {p} THEN 1 ELSE 0 END)").alias(f"x_{name}")
        )
        aggs.append(
            F.expr(
                f"sum(CASE WHEN ({p}) AND ({samp}) THEN 1 ELSE 0 END)"
            ).alias(f"s_{name}")
        )
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', x_{name}, {CARD_SAMPLE_MOD} * s_{name}" for name in preds
    )
    return (
        one.selectExpr(
            f"stack({len(preds)}, {stack_args})"
            " AS (predicate, exact_rows, est_rows)"
        )
        .select(
            "predicate",
            F.col("exact_rows").cast("long"),
            F.col("est_rows").cast("long"),
            F.expr(
                "CAST(abs(est_rows - exact_rows) * 1000000"
                " div greatest(exact_rows, 1) AS BIGINT)"
            ).alias("abs_err_ppm"),
        )
        .orderBy("predicate")
    )


def _card_est_sql() -> str:
    preds = {
        "bulk_order": "o_totalprice >= 250000.0",
        "cust_mod10": "o_custkey % 10 = 0",
        "hi_priority": "substring(o_orderpriority, 1, 1) IN ('1', '2')",
        "status_f": "o_orderstatus = 'F'",
    }
    samp = f"o_orderkey % {CARD_SAMPLE_MOD} = 0"
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS predicate,"
        f" SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS exact_rows,"
        f" {CARD_SAMPLE_MOD} * SUM(CASE WHEN ({p}) AND ({samp})"
        f" THEN 1 ELSE 0 END) AS est_rows FROM orders"
        for name, p in preds.items()
    )
    return f"""
WITH arms AS (
{arms}
)
SELECT predicate, CAST(exact_rows AS BIGINT) AS exact_rows,
       CAST(est_rows AS BIGINT) AS est_rows,
       CAST(ABS(est_rows - exact_rows) * 1000000
            // GREATEST(exact_rows, 1) AS BIGINT) AS abs_err_ppm
FROM arms
ORDER BY predicate
"""


CARD_EST_ERROR_SQL = _card_est_sql()
