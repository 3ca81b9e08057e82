"""Pipeline dashboards, batch 22: time-series autocorrelation, FK
discovery, split-half estimator stability, and set-membership Venn
accounting.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``orders_autocorrelation``: lag-1 and lag-7 Pearson autocorrelation
  of the DENSE daily order-count series (missing days are real zeros —
  skipping them silently misaligns every lagged pair, the classic
  autocorrelation bug). Lag-7 ≫ lag-1 is the numeric signature of
  weekly seasonality.
- ``fk_candidate_scan``: schema inference from data — containment of
  distinct child values in the candidate parent key, with a planted
  near-miss (events.user_id → customer.c_custkey) showing why the flag
  needs exact containment, not "mostly matches".
  ``data_quality_audit`` checks DECLARED FKs; this DISCOVERS them.
- ``median_stability_check``: split-half reliability — the median of
  deterministic key-parity halves vs the full median; a metric whose
  halves disagree is not stable enough to alert on.
- ``event_type_venn``: exact inclusion–exclusion accounting of user
  membership across click/purchase/signup — the 8-cell Venn breakdown
  behind any "overlap of audiences" question, via one bitmask groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

DAY_US = 86_400_000_000

# -- dense-series autocorrelation --------------------------------------------

AC_LAGS = (1, 7)


def orders_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lag_days, n_pairs, r_ppm): Pearson autocorrelation of the daily
    order-count series at lags {AC_LAGS}, computed over the DENSE day
    axis (min..max observed day, absent days = 0 — dropping them would
    misalign every lagged pair). Exact-integer moments + the
    floor-sqrt/sign-split normalization recipe; r ∈ [−1e6, 1e6] ppm.

    Plan: one scan → (day) groupBy; the dense axis is a sequence()
    explode of ONE row into |days| rows (bounded by the calendar, not
    the data) left-joined to the counts; lag windows and the moment
    reduce run over those |days| rows."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {DAY_US}")
        .alias("day")
    )
    counts = o.groupBy("day").agg(F.count(F.lit(1)).alias("cnt"))
    axis = counts.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi)")).alias("day"))
    dense = axis.join(counts, "day", "left").select(
        "day", F.coalesce("cnt", F.lit(0)).alias("x")
    )
    w = W.orderBy("day")
    out = None
    for k in AC_LAGS:
        pairs = dense.withColumn("y", F.lag("x", k).over(w)).filter(
            F.col("y").isNotNull()
        )
        m = pairs.agg(
            F.lit(k).cast("long").alias("lag_days"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        )
        out = m if out is None else out.unionByName(m)
    return out.select(
        "lag_days",
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(
            "CAST(sign(n * sxy - sx * sy) *"
            " (abs(n * sxy - sx * sy) * 1000000 div"
            "  greatest(CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)))"
            "           AS DECIMAL(38,0)) *"
            "           CAST(floor(sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
            "           AS DECIMAL(38,0)), 1)) AS BIGINT)"
        ).alias("r_ppm"),
    ).orderBy("lag_days")


def _ac_sql() -> str:
    arms = []
    for k in AC_LAGS:
        arms.append(f"""
  SELECT {k} AS lag_days, COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM (SELECT x, LAG(x, {k}) OVER (ORDER BY day) AS y FROM dense)
  WHERE y IS NOT NULL""")
    union = "\n  UNION ALL\n".join(arms)
    return f"""
WITH counts AS (
  SELECT epoch_us(o_orderdate) // {DAY_US} AS day, COUNT(*) AS cnt
  FROM orders GROUP BY 1
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(day) FROM counts),
                                (SELECT MAX(day) FROM counts))) AS day
),
dense AS (
  SELECT a.day, COALESCE(c.cnt, 0) AS x
  FROM axis a LEFT JOIN counts c ON c.day = a.day
),
arms AS (
{union}
)
SELECT CAST(lag_days AS BIGINT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END *
            (ABS(n * sxy - sx * sy) * 1000000 //
             GREATEST(CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)))
                      AS HUGEINT) *
                      CAST(FLOOR(SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
                      AS HUGEINT), 1)) AS BIGINT) AS r_ppm
FROM arms
ORDER BY lag_days
"""


ORDERS_AUTOCORRELATION_SQL = _ac_sql()


# -- FK candidate discovery --------------------------------------------------

FK_PAIRS = [
    ("lineitem.l_orderkey", "orders.o_orderkey"),
    ("orders.o_custkey", "customer.c_custkey"),
    ("customer.c_nationkey", "nation.n_nationkey"),
    # planted near-miss: overlapping integer ranges, not a real FK
    ("events.user_id", "customer.c_custkey"),
]


def fk_candidate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(candidate, n_child_keys, n_contained, containment_ppm, is_fk):
    data-driven foreign-key discovery — for each (child column, parent
    key) candidate, the share of DISTINCT child values present in the
    parent. is_fk demands EXACT containment; the planted
    events.user_id → c_custkey near-miss (overlapping surrogate
    ranges) is why "99% contained" must not flag — coincidental range
    overlap is the classic false positive of threshold-based FK
    miners.

    Plan: per candidate, two distinct-key partial aggregates and one
    left join on the distinct CHILD keys (|keys|-sized, never the fact
    table); small parents broadcast automatically. Four one-row
    aggregates union."""
    out = None
    for child, parent in FK_PAIRS:
        ct, cc = child.split(".")
        pt, pc = parent.split(".")
        ch = (
            spark.read.parquet(f"{sf_dir}/{ct}.parquet")
            .select(F.col(cc).alias("k"))
            .distinct()
        )
        pa = (
            spark.read.parquet(f"{sf_dir}/{pt}.parquet")
            .select(F.col(pc).alias("k"), F.lit(1).alias("hit"))
            .distinct()
        )
        arm = (
            ch.join(pa, "k", "left")
            .agg(
                F.lit(f"{child} -> {parent}").alias("candidate"),
                F.count(F.lit(1)).cast("long").alias("n_child_keys"),
                F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias(
                    "n_contained"
                ),
                F.expr(
                    "CAST(sum(coalesce(hit, 0)) * 1000000 div count(1)"
                    " AS BIGINT)"
                ).alias("containment_ppm"),
                (
                    F.sum(F.coalesce("hit", F.lit(0))) == F.count(F.lit(1))
                ).alias("is_fk"),
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out.orderBy("candidate")


def _fk_sql() -> str:
    arms = []
    for child, parent in FK_PAIRS:
        ct, cc = child.split(".")
        pt, pc = parent.split(".")
        arms.append(f"""
  SELECT '{child} -> {parent}' AS candidate,
         COUNT(*) AS n_child_keys,
         SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS n_contained,
         SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) * 1000000
           // COUNT(*) AS containment_ppm,
         SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) = COUNT(*)
           AS is_fk
  FROM (SELECT DISTINCT {cc} AS k FROM {ct}) c
  LEFT JOIN (SELECT DISTINCT {pc} AS k FROM {pt}) p ON p.k = c.k""")
    union = "\n  UNION ALL\n".join(arms)
    return f"""
WITH arms AS (
{union}
)
SELECT candidate, CAST(n_child_keys AS BIGINT) AS n_child_keys,
       CAST(n_contained AS BIGINT) AS n_contained,
       CAST(containment_ppm AS BIGINT) AS containment_ppm, is_fk
FROM arms
ORDER BY candidate
"""


FK_CANDIDATE_SCAN_SQL = _fk_sql()


# -- split-half median stability ---------------------------------------------


def median_stability_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, n_rows, median_cents): the lower median of order value for
    the full table and for the two deterministic key-parity halves
    (o_orderkey odd / even) — split-half reliability for the median
    estimator. Halves that disagree by more than sampling noise mean
    the metric is too unstable to alert on; parity splitting is the
    RNG-free version of a random half.

    Plan: one scan feeds all three arms (parity is row-local); each
    arm's median comes from a cumulative-count window over the
    (arm, price) AGGREGATED rows — |distinct prices| per arm, never a
    raw-row global sort window."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    arms = (
        o.select(F.lit("full").alias("arm"), "pc")
        .unionByName(
            o.filter("o_orderkey % 2 = 1").select(
                F.lit("odd").alias("arm"), "pc"
            )
        )
        .unionByName(
            o.filter("o_orderkey % 2 = 0").select(
                F.lit("even").alias("arm"), "pc"
            )
        )
    )
    g = arms.groupBy("arm", "pc").agg(F.count(F.lit(1)).alias("cnt"))
    wc = W.partitionBy("arm").orderBy("pc").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy("arm")
    cum = g.withColumn("cumn", F.sum("cnt").over(wc)).withColumn(
        "totn", F.sum("cnt").over(wall)
    )
    return (
        cum.filter(F.expr("2 * cumn >= totn"))
        .groupBy("arm")
        .agg(
            F.max("totn").cast("long").alias("n_rows"),
            F.min("pc").cast("long").alias("median_cents"),
        )
        .orderBy("arm")
    )


MEDIAN_STABILITY_SQL = """
WITH pc AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS pc
  FROM orders
),
arms AS (
  SELECT 'full' AS arm, pc FROM pc
  UNION ALL
  SELECT 'odd', pc FROM pc WHERE o_orderkey % 2 = 1
  UNION ALL
  SELECT 'even', pc FROM pc WHERE o_orderkey % 2 = 0
),
g AS (SELECT arm, pc, COUNT(*) AS cnt FROM arms GROUP BY arm, pc),
cum AS (
  SELECT arm, pc, cnt,
         SUM(cnt) OVER (PARTITION BY arm ORDER BY pc
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumn,
         SUM(cnt) OVER (PARTITION BY arm) AS totn
  FROM g
)
SELECT arm, CAST(MAX(totn) AS BIGINT) AS n_rows,
       CAST(MIN(pc) AS BIGINT) AS median_cents
FROM cum
WHERE 2 * cumn >= totn
GROUP BY arm
ORDER BY arm
"""


# -- event-type Venn ---------------------------------------------------------

VENN_TYPES = ("click", "purchase", "signup")


def event_type_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(mask, subset, n_users, share_ppm): exact inclusion–exclusion
    accounting — every user lands in exactly one of the 8 cells of the
    {VENN_TYPES} Venn diagram (bit0=click, bit1=purchase, bit2=signup;
    mask 0 = users with activity of other types only). The overlap
    table behind "how many purchasers never signed up" — read cell
    (click?,purchase=1,signup=0) directly instead of chaining
    inclusion–exclusion by hand.

    Plan: one scan → per-user bool_or flags (partial-aggregated) →
    an 8-row mask groupBy; share denominators ride a one-row
    broadcast."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select("user_id", "event_type")
    flags = e.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == t).cast("int")).alias(f"f{i}")
            for i, t in enumerate(VENN_TYPES)
        ]
    )
    mask = flags.select(
        (
            F.col("f0") + F.col("f1") * 2 + F.col("f2") * 4
        ).alias("mask")
    )
    cells = mask.groupBy("mask").agg(F.count(F.lit(1)).alias("n_users"))
    tot = cells.agg(F.sum("n_users").alias("tot"))
    label = F.concat_ws(
        "+",
        F.when(F.expr("mask % 2 = 1"), VENN_TYPES[0]),
        F.when(F.expr("mask div 2 % 2 = 1"), VENN_TYPES[1]),
        F.when(F.expr("mask div 4 % 2 = 1"), VENN_TYPES[2]),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("mask").cast("long"),
            F.when(label == "", "(none)").otherwise(label).alias("subset"),
            F.col("n_users").cast("long"),
            F.expr("CAST(n_users * 1000000 div tot AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("mask")
    )


EVENT_TYPE_VENN_SQL = f"""
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = '{VENN_TYPES[0]}' THEN 1 ELSE 0 END)
           AS f0,
         MAX(CASE WHEN event_type = '{VENN_TYPES[1]}' THEN 1 ELSE 0 END)
           AS f1,
         MAX(CASE WHEN event_type = '{VENN_TYPES[2]}' THEN 1 ELSE 0 END)
           AS f2
  FROM events GROUP BY user_id
),
cells AS (
  SELECT f0 + f1 * 2 + f2 * 4 AS mask, COUNT(*) AS n_users
  FROM flags GROUP BY 1
),
tot AS (SELECT SUM(n_users) AS tot FROM cells)
SELECT CAST(mask AS BIGINT) AS mask,
       CASE WHEN mask = 0 THEN '(none)'
            ELSE concat_ws('+',
                 CASE WHEN mask % 2 = 1 THEN '{VENN_TYPES[0]}' END,
                 CASE WHEN mask // 2 % 2 = 1 THEN '{VENN_TYPES[1]}' END,
                 CASE WHEN mask // 4 % 2 = 1 THEN '{VENN_TYPES[2]}' END)
       END AS subset,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users * 1000000 // tot AS BIGINT) AS share_ppm
FROM cells CROSS JOIN tot
ORDER BY mask
"""
