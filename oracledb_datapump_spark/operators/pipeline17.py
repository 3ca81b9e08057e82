"""Pipeline dashboards, batch 18: shuffle-skew planning, histogram
selectivity calibration, robust order statistics, and growth-state
accounting.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``join_skew_report``: the "should I salt this join key" planner
  report — exact per-key concentration, the exact self-join fan-out
  Σcnt² (what a skewed shuffle actually materializes), and a
  recommended salt factor for the hottest key, per candidate join
  column. The exact companion to ``selfjoin_size_estimate``'s sampled
  estimator.
- ``hist_est_error_report``: selectivity estimates from a 32-bucket
  equi-width histogram (the classic optimizer statistic) vs exact
  counts, at three data-derived thresholds — the calibration table
  that says how far bucket arithmetic drifts on a skewed column.
- ``trimmed_price_stats``: exact 10%-trimmed mean per brand computed
  from a GLOBAL range-partition rank (the distributed order-statistic
  helper), never a |brands|-partition window over fact-sized data.
- ``user_state_transitions``: week-over-week growth accounting with
  the full four-state machine (new / retained / resurrected /
  churned) — the lifecycle ledger behind any DAU chart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

DAY_US = 86_400_000_000

# -- join-key skew planning ---------------------------------------------------

SKEW_TARGET_PARTITIONS = 200  # assumed reduce-side parallelism for salting


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(join_key, n_keys, total_rows, max_key_rows, skew_x1000,
    selfjoin_rows, salt_factor): for each candidate join column —
    ``events.user_id`` and ``lineitem.l_suppkey`` — the exact key
    concentration diagnostics a shuffle planner wants BEFORE picking a
    strategy: ``skew_x1000`` = max_key_rows / (total/n_keys) ×1000 (how
    many times the uniform share the hottest key holds),
    ``selfjoin_rows`` = exact Σ cnt² (the fan-out a self-join or a
    matching-distribution join materializes; its p99 partition is the
    straggler), and ``salt_factor`` = how many salts split the hottest
    key down to one uniform {SKEW_TARGET_PARTITIONS}-partition share
    (ceil(max_key_rows · P / total), min 1). salt_factor 1 = don't
    bother; 8 = append hash(row)%8 to the key on the hot side and
    explode the dim side 8×.

    Plan at 100 TB: one groupBy per column (partial-aggregated, the
    shuffle is |keys|-sized) and a one-row reduce over the key counts;
    Σcnt² accumulates as DECIMAL(38,0) — 10¹² rows on one key squares
    past int64. The exact twin of ``selfjoin_size_estimate``'s sampled
    scan: run the sample first, this one when the estimate says
    trouble."""
    from ..events_source import load_events

    def arm(df, col, name):
        counts = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return counts.agg(
            F.lit(name).alias("join_key"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("total_rows"),
            F.max("cnt").cast("long").alias("max_key_rows"),
            F.expr(
                "CAST(max(cnt) * 1000 * count(1) div sum(cnt) AS BIGINT)"
            ).alias("skew_x1000"),
            F.sum(
                F.col("cnt").cast("decimal(38,0)") * F.col("cnt")
            )
            .cast("long")
            .alias("selfjoin_rows"),
            F.expr(
                f"CAST(greatest((max(cnt) * {SKEW_TARGET_PARTITIONS}"
                " + sum(cnt) - 1) div sum(cnt), 1) AS BIGINT)"
            ).alias("salt_factor"),
        )

    e = load_events(spark, sf_dir).select("user_id")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_suppkey")
    return (
        arm(e, "user_id", "events.user_id")
        .unionByName(arm(l, "l_suppkey", "lineitem.l_suppkey"))
        .orderBy("join_key")
    )


JOIN_SKEW_REPORT_SQL = f"""
WITH ec AS (SELECT user_id AS k, COUNT(*) AS cnt FROM events GROUP BY 1),
lc AS (SELECT l_suppkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
arms AS (
  SELECT 'events.user_id' AS join_key, COUNT(*) AS n_keys,
         SUM(cnt) AS total_rows, MAX(cnt) AS max_key_rows,
         MAX(cnt) * 1000 * COUNT(*) // SUM(cnt) AS skew_x1000,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS selfjoin_rows,
         GREATEST((MAX(cnt) * {SKEW_TARGET_PARTITIONS} + SUM(cnt) - 1)
                  // SUM(cnt), 1) AS salt_factor
  FROM ec
  UNION ALL
  SELECT 'lineitem.l_suppkey', COUNT(*), SUM(cnt), MAX(cnt),
         MAX(cnt) * 1000 * COUNT(*) // SUM(cnt),
         SUM(CAST(cnt AS HUGEINT) * cnt),
         GREATEST((MAX(cnt) * {SKEW_TARGET_PARTITIONS} + SUM(cnt) - 1)
                  // SUM(cnt), 1)
  FROM lc
)
SELECT join_key, CAST(n_keys AS BIGINT) AS n_keys,
       CAST(total_rows AS BIGINT) AS total_rows,
       CAST(max_key_rows AS BIGINT) AS max_key_rows,
       CAST(skew_x1000 AS BIGINT) AS skew_x1000,
       CAST(selfjoin_rows AS BIGINT) AS selfjoin_rows,
       CAST(salt_factor AS BIGINT) AS salt_factor
FROM arms
ORDER BY join_key
"""


# -- histogram selectivity calibration ---------------------------------------

HIST_N_BUCKETS = 32
HIST_THRESH_EIGHTHS = (2, 5, 7)  # thresholds at min + k/8 of the range


def hist_est_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, threshold_cents, exact_rows, est_rows, abs_err_ppm): the
    optimizer-statistics calibration table — selectivity of
    ``o_totalprice >= T`` estimated from a {HIST_N_BUCKETS}-bucket
    equi-width histogram (full buckets above T counted whole, the
    boundary bucket prorated linearly in integer arithmetic) vs the
    exact count, at three data-derived thresholds (min + k/8 of the
    observed range). The histogram-vs-sample pair
    (``card_est_error_report``) shows WHICH statistic drifts on which
    predicate shape.

    Plan: a one-row min/max aggregate, ONE scan building the
    |{HIST_N_BUCKETS}|-row histogram AND the three exact conditional
    counts in the same partial aggregate, then row-local bucket
    arithmetic on broadcast-sized frames. Bucket width =
    (range div {HIST_N_BUCKETS}) + 1 so the max lands inside the last
    bucket; every division floors identically in both engines."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc")
    )
    b = o.agg(
        F.min("pc").alias("lo"), F.max("pc").alias("hi")
    ).withColumn("width", F.expr(f"(hi - lo) div {HIST_N_BUCKETS} + 1"))
    ob = o.crossJoin(F.broadcast(b))
    hist = (
        ob.groupBy(F.expr("(pc - lo) div width").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    arms = []
    for k in HIST_THRESH_EIGHTHS:
        t = f"(lo + (hi - lo) * {k} div 8)"
        arms.append(F.expr(f"sum(CASE WHEN pc >= {t} THEN 1 ELSE 0 END)").alias(f"exact_{k}"))
        arms.append(F.expr(f"min({t})").alias(f"t_{k}"))
    # ONE exact-counts aggregate, unpivoted to a 3-row (k, threshold,
    # exact) frame so the histogram join below runs once — not one
    # re-scan of orders per threshold arm
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), t_{k}, exact_{k}" for k in HIST_THRESH_EIGHTHS
    )
    thresholds = ob.agg(*arms).selectExpr(
        f"stack({len(HIST_THRESH_EIGHTHS)}, {stack_args})"
        " AS (k, threshold_cents, exact_rows)"
    )
    hb = (
        hist.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(thresholds))
        .withColumn("tb", F.expr("(threshold_cents - lo) div width"))
    )
    out = hb.groupBy("k", "threshold_cents", "exact_rows").agg(
        F.sum(
            F.when(F.col("bucket") > F.col("tb"), F.col("cnt"))
            .when(
                F.col("bucket") == F.col("tb"),
                F.expr(
                    "cnt * (lo + (bucket + 1) * width - threshold_cents)"
                    " div width"
                ),
            )
            .otherwise(F.lit(0))
        ).alias("est_rows")
    )
    return out.select(
        "k",
        F.col("threshold_cents").cast("long"),
        F.col("exact_rows").cast("long"),
        F.col("est_rows").cast("long"),
        F.expr(
            "CAST(abs(est_rows - exact_rows) * 1000000"
            " div greatest(exact_rows, 1) AS BIGINT)"
        ).alias("abs_err_ppm"),
    ).orderBy("k")


def _hist_est_sql() -> str:
    arms = []
    for k in HIST_THRESH_EIGHTHS:
        t = f"(SELECT lo + (hi - lo) * {k} // 8 FROM b)"
        arms.append(
            f"""
  SELECT {k} AS k, {t} AS threshold_cents,
         (SELECT COUNT(*) FROM pc WHERE pc >= {t}) AS exact_rows,
         (SELECT SUM(CASE
             WHEN bucket > ({t} - lo) // width THEN cnt
             WHEN bucket = ({t} - lo) // width
               THEN cnt * (lo + (bucket + 1) * width - {t}) // width
             ELSE 0 END)
          FROM hist CROSS JOIN b) AS est_rows"""
        )
    union = "\n  UNION ALL\n".join(arms)
    return f"""
WITH pc AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders
),
b AS (
  SELECT MIN(pc) AS lo, MAX(pc) AS hi,
         (MAX(pc) - MIN(pc)) // {HIST_N_BUCKETS} + 1 AS width
  FROM pc
),
hist AS (
  SELECT (pc - lo) // width AS bucket, COUNT(*) AS cnt
  FROM pc CROSS JOIN b GROUP BY 1
),
arms AS (
{union}
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(threshold_cents AS BIGINT) AS threshold_cents,
       CAST(exact_rows AS BIGINT) AS exact_rows,
       CAST(est_rows AS BIGINT) AS est_rows,
       CAST(ABS(est_rows - exact_rows) * 1000000
            // GREATEST(exact_rows, 1) AS BIGINT) AS abs_err_ppm
FROM arms
ORDER BY k
"""


HIST_EST_ERROR_SQL = _hist_est_sql()


# -- exact trimmed mean via the global-rank helper ---------------------------

TRIM_PCT = 10  # drop the lowest and highest 10% per brand


def trimmed_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, n_items, n_trimmed, trimmed_sum_cents, mean_milli_cents,
    trimmed_mean_milli_cents): exact {TRIM_PCT}%-trimmed mean of
    lineitem extended price per brand — the robust-center statistic
    that ignores loss-leader and luxury tails. k = n div {TRIM_PCT}0/10
    rows are dropped from EACH end; ties are interchangeable for sums,
    so any deterministic tie order gives the same answer.

    Plan at 100 TB: per-brand order statistics WITHOUT a |brands|-
    partition window (25 partitions holding a fact table each is the
    canonical skew trap). The rank comes from ONE global range-
    partition sort on (brand, price, rowid) via the distributed
    order-statistic helper (`functions/global_order`); per-brand ranks
    are recovered by subtracting each brand's min global rank (a
    |brands|-row broadcast), and the trim filter + final sums are
    row-local / partial-aggregated."""
    from ..functions.global_order import with_global_order_stat

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("pc"),
        )
    )
    pt = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    rows = li.join(pt, "l_partkey").select(
        "brand", "pc", "l_orderkey", "l_linenumber"
    )
    ranked, _n = with_global_order_stat(
        rows,
        [F.col("brand"), F.col("pc"), F.col("l_orderkey"),
         F.col("l_linenumber")],
        out="grk",
    )
    bounds = ranked.groupBy("brand").agg(
        F.min("grk").alias("base"), F.count(F.lit(1)).alias("n")
    )
    r = ranked.join(F.broadcast(bounds), "brand").withColumn(
        "rk", F.col("grk") - F.col("base") + 1
    )
    # r16 (guide §2.4): the trimmed and full aggregates are ONE
    # conditional-agg pass — k and n ride every row off the broadcast
    # bounds join, so the in-trim predicate is row-local and the old
    # second groupBy (a second full pass + exchange over the fact-sized
    # ranked stream) folds away. Values are bit-identical: same rows,
    # same integer sums.
    k = F.expr(f"n div {TRIM_PCT}")
    in_trim = (F.col("rk") > k) & (F.col("rk") <= F.col("n") - k)
    stats = r.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.expr("sum(pc) * 10 div count(1)").cast("long").alias(
            "mean_milli_cents"
        ),
        F.sum(F.when(in_trim, 1).otherwise(0)).cast("long").alias(
            "n_trimmed"
        ),
        F.sum(F.when(in_trim, F.col("pc")).otherwise(0)).cast("long").alias(
            "trimmed_sum_cents"
        ),
    )
    return (
        stats.select(
            "brand",
            "n_items",
            "n_trimmed",
            "trimmed_sum_cents",
            "mean_milli_cents",
            F.expr("trimmed_sum_cents * 10 div n_trimmed")
            .cast("long")
            .alias("trimmed_mean_milli_cents"),
        )
        .orderBy("brand")
    )


TRIMMED_PRICE_STATS_SQL = f"""
WITH rows_ AS (
  SELECT p.p_brand AS brand,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS pc,
         ROW_NUMBER() OVER (PARTITION BY p.p_brand
                            ORDER BY round(l.l_extendedprice * 100),
                                     l.l_orderkey, l.l_linenumber) AS rk,
         COUNT(*) OVER (PARTITION BY p.p_brand) AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
tstats AS (
  SELECT brand, COUNT(*) AS n_trimmed, SUM(pc) AS trimmed_sum_cents
  FROM rows_
  WHERE rk > n // {TRIM_PCT} AND rk <= n - n // {TRIM_PCT}
  GROUP BY brand
),
full_ AS (
  SELECT brand, COUNT(*) AS n_items,
         SUM(pc) * 10 // COUNT(*) AS mean_milli_cents
  FROM rows_ GROUP BY brand
)
SELECT f.brand, CAST(f.n_items AS BIGINT) AS n_items,
       CAST(t.n_trimmed AS BIGINT) AS n_trimmed,
       CAST(t.trimmed_sum_cents AS BIGINT) AS trimmed_sum_cents,
       CAST(f.mean_milli_cents AS BIGINT) AS mean_milli_cents,
       CAST(t.trimmed_sum_cents * 10 // t.n_trimmed AS BIGINT)
         AS trimmed_mean_milli_cents
FROM full_ f JOIN tstats t ON t.brand = f.brand
ORDER BY f.brand
"""


# -- week-over-week growth state machine -------------------------------------


def user_state_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week, n_new, n_retained, n_resurrected, n_churned): the full
    four-state week-over-week growth ledger. For each week w after the
    first observed week: ``new`` = active in w, first-ever activity in
    w; ``retained`` = active in w and w−1; ``resurrected`` = active in
    w, inactive in w−1, seen before; ``churned`` = active in w−1,
    inactive in w (attributed to w, the week the loss shows). DAU
    charts hide WHICH flow moved; this ledger is the decomposition
    (growth accounting identity: active_w = new + retained +
    resurrected).

    Plan: one distinct (user, week) frame (partial-aggregated), a min()
    per user for first-week, and a user-keyed FULL OUTER self-join of
    week w against week w−1 — all shuffles are |users|-keyed; the
    output collapses to ≤|weeks| rows."""
    from ..events_source import load_events

    au = (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr(f"ts_us div {DAY_US} div 7").alias("week"),
        )
        .distinct()
    )
    first = au.groupBy("user_id").agg(F.min("week").alias("first_week"))
    cur = au.join(first, "user_id")
    prev = au.select("user_id", (F.col("week") + 1).alias("week"))
    wk = au.agg(
        F.min("week").alias("wmin"), F.max("week").alias("wmax")
    )
    j = (
        cur.withColumn("in_cur", F.lit(1))
        .join(prev.withColumn("in_prev", F.lit(1)), ["user_id", "week"],
              "full_outer")
        .crossJoin(F.broadcast(wk))
        .filter((F.col("week") > F.col("wmin")) & (F.col("week") <= F.col("wmax")))
    )
    return (
        j.groupBy("week")
        .agg(
            F.sum(
                ((F.col("in_cur") == 1) & (F.col("week") == F.col("first_week")))
                .cast("long")
            ).alias("n_new"),
            F.sum(
                ((F.col("in_cur") == 1) & (F.col("in_prev") == 1)).cast("long")
            ).alias("n_retained"),
            F.sum(
                (
                    (F.col("in_cur") == 1)
                    & F.col("in_prev").isNull()
                    & (F.col("week") > F.col("first_week"))
                ).cast("long")
            ).alias("n_resurrected"),
            F.sum(
                ((F.col("in_prev") == 1) & F.col("in_cur").isNull()).cast("long")
            ).alias("n_churned"),
        )
        .select(
            F.col("week").cast("long"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).cast("long").alias(
                "n_resurrected"
            ),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("week")
    )


USER_STATE_TRANSITIONS_SQL = f"""
WITH au AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} // 7 AS week FROM events
),
first_ AS (SELECT user_id, MIN(week) AS first_week FROM au GROUP BY user_id),
wk AS (SELECT MIN(week) AS wmin, MAX(week) AS wmax FROM au),
cur AS (SELECT au.user_id, au.week, f.first_week, 1 AS in_cur
        FROM au JOIN first_ f USING (user_id)),
prev AS (SELECT user_id, week + 1 AS week, 1 AS in_prev FROM au),
j AS (
  SELECT COALESCE(c.user_id, p.user_id) AS user_id,
         COALESCE(c.week, p.week) AS week,
         c.first_week, c.in_cur, p.in_prev
  FROM cur c FULL OUTER JOIN prev p
    ON p.user_id = c.user_id AND p.week = c.week
),
f AS (
  SELECT j.* FROM j CROSS JOIN wk
  WHERE j.week > wk.wmin AND j.week <= wk.wmax
)
SELECT CAST(week AS BIGINT) AS week,
       CAST(COALESCE(SUM(CASE WHEN in_cur = 1 AND week = first_week
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_new,
       CAST(COALESCE(SUM(CASE WHEN in_cur = 1 AND in_prev = 1
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_retained,
       CAST(COALESCE(SUM(CASE WHEN in_cur = 1 AND in_prev IS NULL
                              AND week > first_week
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_resurrected,
       CAST(COALESCE(SUM(CASE WHEN in_prev = 1 AND in_cur IS NULL
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_churned
FROM f
GROUP BY week
ORDER BY week
"""
