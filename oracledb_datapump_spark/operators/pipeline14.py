"""Pipeline dashboards, batch 15: analytic families the suite did not
yet cover — multi-objective skyline, integer least-squares trend,
gaps-and-islands streaks, CUSUM changepoint, edit-distance dedup
verification, and sessionized path mining.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL). Each is the Spark-first formulation of a classic operator:

- ``part_price_skyline``: the Pareto-optimal (non-dominated) set under
  (min price, max size) — computed distributed via a range-partitioned
  strict-prefix max, never the O(n²) pairwise dominance test the SQL
  oracle uses as ground truth.
- ``revenue_trend_ols``: per-nation ordinary-least-squares slope of
  monthly revenue, as pure integer moment algebra (the regression
  family's entry in the deterministic-cross-engine catalog).
- ``user_activity_streaks``: longest run of consecutive active days per
  user — the canonical gaps-and-islands window idiom.
- ``cusum_changepoint``: the day each nation's cumulative revenue
  deviates most from its own linear pace — offline CUSUM, the
  standard mean-shift changepoint statistic, cross-multiplied so no
  mean is ever materialized as a fraction.
- ``dedup_edit_distance``: exact Levenshtein over the MinHash-LSH
  candidate set — character-level near-dup verification where Jaccard
  on shingles is too coarse (e.g. templated docs differing in a slot).
- ``event_path_trigrams``: within-session event-type trigram counts —
  the path-mining primitive behind funnel discovery (funnels you did
  not know to look for, vs session_funnel_rates' fixed chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..events_source import load_events

# -- skyline -----------------------------------------------------------------

SKYLINE_N_RANGES = 32


def part_price_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_partkey, p_brand, price_cents, p_size): the skyline of parts
    under (minimize retail price, maximize size) — a part is dominated
    when another is no more expensive AND no smaller, with at least one
    strict; ties on both axes are mutually non-dominating so exact
    duplicates all survive. The buy-side shortlist query (cheapest
    option at every capability level) and the classic multi-objective
    operator relational engines lack.

    Distributed formulation (the oracle's NOT EXISTS pairwise test is
    O(n²) and exists only as ground truth): a part survives iff its
    size equals its price-group max AND beats the max size over all
    STRICTLY cheaper prices. That strict-prefix max is computed the
    ``functions/global_order`` way — range-partition the per-price
    aggregate on price, per-partition running max (ROWS ... 1
    PRECEDING), then shift by driver-collected per-partition maxes
    (|partitions| rows of model state, never data). Two shuffles total
    (price groupBy, range partition) at any scale; the final domination
    test is a broadcast-joined row-local comparison."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    pm = part.groupBy("p_retailprice").agg(F.max("p_size").alias("msize"))
    ranged = (
        pm.repartitionByRange(SKYLINE_N_RANGES, F.col("p_retailprice"))
        .withColumn("__pid", F.spark_partition_id())
        # pin the partitioning the offsets describe
        .localCheckpoint(eager=True)
    )
    part_maxes = {
        r.pid: int(r.m)
        for r in ranged.groupBy(F.col("__pid").alias("pid"))
        .agg(F.max("msize").alias("m"))
        .collect()
    }
    prior, acc = {}, None
    for pid in sorted(part_maxes):
        prior[pid] = acc  # max msize over all earlier partitions
        acc = part_maxes[pid] if acc is None else max(acc, part_maxes[pid])
    off = F.coalesce(
        *[
            F.when(F.col("__pid") == pid, F.lit(mx))
            for pid, mx in sorted(prior.items())
            if mx is not None
        ],
        F.lit(-1),  # sizes are >= 1; -1 = "no cheaper price exists"
    )
    w = (
        W.partitionBy("__pid")
        .orderBy("p_retailprice")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky_prices = (
        ranged.withColumn(
            "prefix_max", F.greatest(F.coalesce(F.max("msize").over(w), F.lit(-1)), off)
        )
        .filter(F.col("msize") > F.col("prefix_max"))
        .select(
            F.col("p_retailprice").alias("sky_price"),
            F.col("msize").alias("sky_msize"),
        )
    )
    return (
        part.join(
            F.broadcast(sky_prices),
            (part.p_retailprice == sky_prices.sky_price)
            & (part.p_size == sky_prices.sky_msize),
        )
        .select(
            "p_partkey",
            "p_brand",
            F.round(part.p_retailprice * 100).cast("long").alias("price_cents"),
            part.p_size.cast("long").alias("p_size"),
        )
        .orderBy("p_partkey")
    )


PART_PRICE_SKYLINE_SQL = """
SELECT p.p_partkey, p.p_brand,
       CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents,
       CAST(p.p_size AS BIGINT) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p.p_partkey
"""


# -- OLS trend ---------------------------------------------------------------


def revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_months, rev_total_cents, slope_cents_ppm): per-nation
    OLS slope of monthly order revenue over the month index — the
    regression-family primitive (is this market growing, and how
    fast?). ``slope_cents_ppm`` is the fitted revenue change per month
    in millionths of a cent, exact:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    computed entirely in DECIMAL(38,0)/HUGEINT integer moments (y is
    cents, x the 0-based month rank), with the repo's signed-ratio
    recipe sign(num)·(|num|·1e6 div den) so Spark's truncating div and
    DuckDB's flooring // agree on negative slopes.

    Plan: customer⋈nation is a broadcast dim; one month-keyed groupBy;
    the rank window and moment reduce run over ≤|nation×month|
    aggregated rows. Σxy is summed as DECIMAL(38,0) so the moments
    cannot overflow at any corpus size."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("y")
        )
    )
    xw = W.partitionBy("nation").orderBy("ym")
    d = F.col("y").cast("decimal(38,0)")
    idx = monthly.withColumn("x", F.row_number().over(xw) - 1)
    mom = idx.groupBy("nation").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum(d).alias("sy"),
        F.sum((F.col("x") * d).cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        mom.filter((F.col("n") >= 2) & (den > 0))
        .select(
            "nation",
            F.col("n").cast("long").alias("n_months"),
            F.col("sy").cast("long").alias("rev_total_cents"),
            (
                F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr(
                    "CAST((abs(n * sxy - sx * sy) * 1000000)"
                    " div (n * sxx - sx * sx) AS BIGINT)"
                )
            ).cast("long").alias("slope_cents_ppm"),
        )
        .orderBy("nation")
    )


REVENUE_TREND_OLS_SQL = """
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
mom AS (
  SELECT nation, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM idx GROUP BY nation
)
SELECT nation, CAST(n AS BIGINT) AS n_months,
       CAST(sy AS BIGINT) AS rev_total_cents,
       CAST((CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
            * (abs(n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx))
            AS BIGINT) AS slope_cents_ppm
FROM mom
WHERE n >= 2 AND n * sxx - sx * sx > 0
ORDER BY nation
"""


# -- gaps and islands --------------------------------------------------------

DAY_US = 86_400_000_000


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(streak_days, n_users): distribution of each user's LONGEST run
    of consecutive active days — the retention team's streak metric and
    the canonical gaps-and-islands idiom: distinct (user, day) rows,
    island id = day − row_number() (constant within a consecutive run),
    longest island per user, then a histogram.

    Plan: one distinct on (user, day_idx), one user-keyed window
    (row_number over day order — partitions are per-user day counts,
    bounded by the calendar), two groupBys shrinking to |users| then
    |distinct streak lengths| rows. Day arithmetic is integer division
    of epoch-µs (pipeline7's day-index convention)."""
    e = load_events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {DAY_US}").cast("long").alias("day_idx")
    )
    days = e.distinct()
    w = W.partitionBy("user_id").orderBy("day_idx")
    islands = days.withColumn(
        "island", F.col("day_idx") - F.row_number().over(w)
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    longest = runs.groupBy("user_id").agg(F.max("run_len").alias("streak_days"))
    return (
        longest.groupBy("streak_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("streak_days")
    )


USER_ACTIVITY_STREAKS_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day_idx FROM events
),
islands AS (
  SELECT user_id,
         day_idx - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_idx)
           AS island
  FROM days
),
runs AS (
  SELECT user_id, island, COUNT(*) AS run_len
  FROM islands GROUP BY user_id, island
),
longest AS (
  SELECT user_id, MAX(run_len) AS streak_days FROM runs GROUP BY user_id
)
SELECT CAST(streak_days AS BIGINT) AS streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM longest GROUP BY streak_days
ORDER BY streak_days
"""


# -- CUSUM changepoint -------------------------------------------------------


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, cp_day_idx, n_days, max_dev): offline CUSUM changepoint
    per nation — the day k where the cumulative daily order revenue
    S_k deviates most from the nation's own linear pace, i.e. argmax of
    |S_k·n − k·S_n| (the mean-shift statistic cross-multiplied so both
    engines stay in integers; dividing by n would introduce a
    fraction). A regime change (demand shift, pipeline outage, pricing
    migration) maximizes exactly this deviation; ties resolve to the
    earliest day.

    Plan: broadcast-dim joins, one (nation, day) groupBy, then three
    per-nation windows over ≤|days| aggregated rows each (cumsum with a
    pinned ROWS frame, total via full-frame, argmax via rank) — the
    heavy table is touched once. Products are DECIMAL(38,0)/HUGEINT so
    S_k·n cannot overflow at warehouse scale."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr(
                f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}"
            )
            .cast("long")
            .alias("day_idx"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
    )
    wcum = (
        W.partitionBy("nation")
        .orderBy("day_idx")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy("nation")
    d = F.col("y").cast("decimal(38,0)")
    cum = (
        daily.withColumn("k", F.row_number().over(W.partitionBy("nation").orderBy("day_idx")))
        .withColumn("s_k", F.sum(d).over(wcum))
        .withColumn("s_n", F.sum(d).over(wall))
        .withColumn("n_days", F.count(F.lit(1)).over(wall))
        .withColumn(
            "dev",
            F.abs(
                F.col("s_k") * F.col("n_days").cast("decimal(38,0)")
                - F.col("k").cast("decimal(38,0)") * F.col("s_n")
            ),
        )
    )
    pick = W.partitionBy("nation").orderBy(F.col("dev").desc(), F.col("day_idx"))
    return (
        cum.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "nation",
            F.col("day_idx").alias("cp_day_idx"),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("dev").cast("long").alias("max_dev"),
        )
        .orderBy("nation")
    )


CUSUM_CHANGEPOINT_SQL = f"""
WITH daily AS (
  SELECT n.n_name AS nation,
         epoch_us(o.o_orderdate) // {DAY_US} AS day_idx,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
cum AS (
  SELECT nation, day_idx,
         ROW_NUMBER() OVER w AS k,
         SUM(y) OVER (PARTITION BY nation ORDER BY day_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_k,
         SUM(y) OVER (PARTITION BY nation) AS s_n,
         COUNT(*) OVER (PARTITION BY nation) AS n_days
  FROM daily
  WINDOW w AS (PARTITION BY nation ORDER BY day_idx)
),
dev AS (
  SELECT nation, day_idx, n_days,
         abs(s_k * n_days - k * s_n) AS dev,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY abs(s_k * n_days - k * s_n) DESC,
                                     day_idx) AS rn
  FROM cum
)
SELECT nation, CAST(day_idx AS BIGINT) AS cp_day_idx,
       CAST(n_days AS BIGINT) AS n_days, CAST(dev AS BIGINT) AS max_dev
FROM dev WHERE rn = 1
ORDER BY nation
"""


# -- edit-distance dedup verification ----------------------------------------

EDIT_PREFIX_CHARS = 160  # bounded DP cost per pair: 160^2 cells
EDIT_BAND_WIDTH = 8


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dist_band, n_pairs, min_dist, max_dist): exact Levenshtein
    distance over the MinHash-LSH candidate pairs, banded by
    {EDIT_BAND_WIDTH} edits — character-level near-dup verification for
    the cases shingle-Jaccard is too coarse to separate (templated
    documents differing only in a filled slot score near-identical
    Jaccard but a slot-sized edit distance). The curation decision
    "same page, trivially edited" vs "same template, different
    content" is exactly this histogram's low vs mid bands.

    Cost control at 100 TB: distance runs ONLY on the LSH candidate set
    (never all pairs) and on a {EDIT_PREFIX_CHARS}-char prefix, so the
    per-pair DP is a fixed ~25k cells of JVM codegen
    (``F.levenshtein``) — row-local after the two text joins, whose
    probe side is the candidate list, not the corpus."""
    from .dedup import dedup_minhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.substring("text", 1, EDIT_PREFIX_CHARS).alias("snip")
    )
    pairs = dedup_minhash_pairs(spark, sf_dir)
    a = docs.alias("a")
    b = docs.alias("b")
    dist = (
        pairs.join(a, pairs.doc_a == F.col("a.doc_id"))
        .join(b, pairs.doc_b == F.col("b.doc_id"))
        .select(
            F.levenshtein(F.col("a.snip"), F.col("b.snip")).alias("d")
        )
    )
    return (
        dist.groupBy(
            (F.col("d") / F.lit(EDIT_BAND_WIDTH)).cast("long").alias("dist_band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("d").cast("long").alias("min_dist"),
            F.max("d").cast("long").alias("max_dist"),
        )
        .orderBy("dist_band")
    )


def _edit_distance_sql() -> str:
    from .dedup import DEDUP_MINHASH_SQL

    pairs = DEDUP_MINHASH_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH pairs AS ({pairs}),
dist AS (
  SELECT levenshtein(substr(da.text, 1, {EDIT_PREFIX_CHARS}),
                     substr(db.text, 1, {EDIT_PREFIX_CHARS})) AS d
  FROM pairs
  JOIN documents da ON da.doc_id = pairs.doc_a
  JOIN documents db ON db.doc_id = pairs.doc_b
)
SELECT CAST(d // {EDIT_BAND_WIDTH} AS BIGINT) AS dist_band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(d) AS BIGINT) AS min_dist,
       CAST(MAX(d) AS BIGINT) AS max_dist
FROM dist GROUP BY 1
ORDER BY dist_band
"""


DEDUP_EDIT_DISTANCE_SQL = _edit_distance_sql()


# -- session path mining -----------------------------------------------------

from .pipeline7 import SESSION_GAP_US  # noqa: E402  (single gap constant)


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(e1, e2, e3, n_paths): counts of consecutive event-type trigrams
    WITHIN a session (the standard 30-minute-gap sessionizer) — path
    mining's smallest useful unit. session_funnel_rates asks "did the
    known view→click→purchase chain happen"; this surfaces the chains
    you did not know to ask about (e.g. error→error→error runs or
    signup→purchase shortcuts) ranked by support.

    Plan: the sessionizer's user-keyed window (lag + running sum), two
    leads over the same window spec (one shuffle serves all three), a
    groupBy that collapses to ≤|event_types|³ rows. Nothing beyond the
    sessionizer touches row volume."""
    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts_us"
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "session_seq").orderBy("ts_us", "event_id")
    tri = (
        sess.withColumn("e2", F.lead("event_type", 1).over(ws))
        .withColumn("e3", F.lead("event_type", 2).over(ws))
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    )
    return (
        tri.groupBy(F.col("event_type").alias("e1"), "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy("e1", "e2", "e3")
    )


EVENT_PATH_TRIGRAMS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
tri AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER ws AS e2,
         LEAD(event_type, 2) OVER ws AS e3
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, session_seq ORDER BY ts_us, event_id)
)
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM tri
WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY e1, e2, e3
"""
