"""Batch 43: rank correlation, weekly seasonality, source concentration.

Companions to batch 41's rank statistics: Spearman's rho over the daily
rollup, a day-of-week uniformity chi-square per event type, and the
Gini coefficient of per-source character mass. All integer-exact; every
ordered structure is a window over a tiny aggregate (days, 7 buckets,
sources), never a row-level sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# chi-square 95% critical value for df=6, times 100 (12.59)
CHI2_DF6_95_X100 = 1259


def spearman_rho_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Spearman rank correlation between daily order count and
    daily revenue (cents): (n_days, sum_d2, rho_ppm) — the
    outlier-robust companion to kendall_tau_daily (tau counts pair
    inversions; rho squares rank displacement, so one wild day shows up
    quadratically). Ranks are ROW_NUMBER with the DATE as the
    deterministic tie-break (the documented convention — with it, both
    engines assign identical ranks and the d² sum is exact);
    rho_ppm = 1e6 − 6e6·Σd² / (n(n²−1)) by integer division, everything
    inside int64 at any plausible day count. Two windows over the
    ≤|days| rollup."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = o.groupBy("d").agg(
        F.count(F.lit(1)).alias("x"), F.sum("cents").alias("y")
    )
    rx = F.row_number().over(Window.orderBy("x", "d"))
    ry = F.row_number().over(Window.orderBy("y", "d"))
    ranked = daily.withColumn("rx", rx).withColumn("ry", ry)
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(
                (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
            ).alias("sum_d2"),
        )
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("sum_d2").cast("long").alias("sum_d2"),
            F.expr(
                "1000000 - (6000000 * sum_d2)"
                " div (n_days * (n_days * n_days - 1))"
            )
            .cast("long")
            .alias("rho_ppm"),
        )
    )


SPEARMAN_RHO_DAILY_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY d
), ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY x, d) AS rx,
         ROW_NUMBER() OVER (ORDER BY y, d) AS ry
  FROM daily
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
  FROM ranked
)
SELECT n_days, sum_d2,
       CAST(1000000 - (6000000 * sum_d2)
            // (n_days * (n_days * n_days - 1)) AS BIGINT) AS rho_ppm
FROM agg
"""


def dow_seasonality_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, peak_dow, nonuniform): is a type's
    day-of-week profile flat, and where does it peak? The chi-square
    against uniform over 7 buckets reduces to the integer inequality
    (7·Σoᵢ² − N²)·100 > 1259·N  (χ² = (7Σo² − N²)/N, df=6 critical
    12.59) — no expected-count division ever happens. Day-of-week is
    pinned to 0=Monday on BOTH engines (Spark weekday(); DuckDB
    isodow−1 — the off-by-one family that silently shifts a peak).
    peak_dow ties break to the smallest index. One rollup to
    ≤|types×7| rows, then a per-type reduce."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir)
    dow = (
        e.groupBy(
            "event_type", F.expr("weekday(to_date(ts))").alias("dow")
        ).agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        dow.groupBy("event_type")
        .agg(
            F.sum("c").alias("n_events"),
            F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
            # composite argmax: count·8 − dow (dow < 8) → ties to the
            # smallest dow
            F.max(F.col("c") * 8 - F.col("dow")).alias("peak_key"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            # peak_dow = (8·c − key) where c = ceil(key/8)
            F.expr(
                "CAST(((peak_key + 7) div 8) * 8 - peak_key AS BIGINT)"
            ).alias("peak_dow"),
            F.expr(
                f"(7 * sum_c2 - n_events * n_events) * 100"
                f" > {CHI2_DF6_95_X100} * n_events"
            ).alias("nonuniform"),
        )
        .orderBy("event_type")
    )


DOW_SEASONALITY_CHI2_SQL = f"""
WITH dw AS (
  SELECT event_type,
         isodow(CAST(CAST(ts AS TIMESTAMP) AS DATE)) - 1 AS dow,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, dow
), agg AS (
  SELECT event_type, SUM(c) AS n_events, SUM(c * c) AS sum_c2,
         MAX(c * 8 - dow) AS peak_key
  FROM dw GROUP BY event_type
)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(((peak_key + 7) // 8) * 8 - peak_key AS BIGINT) AS peak_dow,
       (7 * sum_c2 - n_events * n_events) * 100
         > {CHI2_DF6_95_X100} * n_events AS nonuniform
FROM agg
ORDER BY event_type
"""


def gini_source_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row source-concentration report: (n_sources, total_chars,
    gini_ppm) — the Gini coefficient of per-source character mass, the
    single number a corpus-diversity review asks for first (0 = every
    provider contributes equally; →1 = one provider IS the corpus).
    Exact integer form over the ascending-sorted source totals:
    G = Σ(2i − n − 1)·xᵢ / (n·Σx), i = 1-based rank by (chars, source).
    The window runs over ≤|sources| rows — the per-source rollup is the
    only thing ever sorted."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_source = d.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    ranked = per_source.withColumn(
        "i", F.row_number().over(Window.orderBy("chars", "source"))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum("chars").alias("total_chars"),
            F.sum(
                (2 * F.col("i") - F.col("n") - 1) * F.col("chars")
            ).alias("num"),
        )
        .select(
            F.col("n_sources").cast("long").alias("n_sources"),
            F.col("total_chars").cast("long").alias("total_chars"),
            F.expr("num * 1000000 div (n_sources * total_chars)")
            .cast("long")
            .alias("gini_ppm"),
        )
    )


GINI_SOURCE_CHARS_SQL = """
WITH per_source AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
), ranked AS (
  SELECT chars,
         ROW_NUMBER() OVER (ORDER BY chars, source) AS i,
         COUNT(*) OVER () AS n
  FROM per_source
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(chars) AS BIGINT) AS total_chars,
         CAST(SUM((2 * i - n - 1) * chars) AS BIGINT) AS num
  FROM ranked
)
SELECT n_sources, total_chars,
       CAST(num * 1000000 // (n_sources * total_chars) AS BIGINT)
         AS gini_ppm
FROM agg
"""


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_pairs): verified near-dup pairs broken
    down by the PROVIDER pair — the provenance question behind a dedup
    pass ("which feeds mirror each other?"). Within-source cells
    (source_a = source_b) measure internal redundancy; off-diagonal
    cells expose syndication/mirroring between feeds, which changes the
    dedup policy (drop the mirrored feed wholesale instead of pairwise
    deduping forever). Unordered provider pairs canonicalize as
    source_a <= source_b. Rides the memoized verified-pair table; the
    matrix is two broadcast-able doc_id→source joins + one ≤|sources|²
    groupBy."""
    from .dedup import verified_pairs_cached

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    pairs = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    joined = (
        pairs.join(
            docs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("sa"),
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("sb"),
            ),
            "doc_b",
        )
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


def _cross_source_dup_sql() -> str:
    from .dedup import DEDUP_MINHASH_VERIFIED_SQL

    base = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH pairs AS ({base})
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN documents da ON da.doc_id = pairs.doc_a
JOIN documents db ON db.doc_id = pairs.doc_b
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


CROSS_SOURCE_DUP_SQL = _cross_source_dup_sql()


def user_type_entropy_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(entropy_proxy, n_users): how concentrated each user's behavior
    is across event types, as a histogram over the integer entropy
    PROXY Σᵢ cᵢ·(bitlen(N) − bitlen(cᵢ)) — the bitlen(x) = ⌊log₂x⌋+1
    Shannon surrogate the engine uses wherever a log would break
    cross-engine exactness (lmscore, gap histograms). 0 means every
    event is one type (pure specialist); larger means an even spread
    over many types. The proxy is monotone-comparable, never a float.
    Two partial-aggregated groupBys (user×type, then user) + a small
    histogram — the user-keyed shuffle any behavioral profile pays."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir)
    per_ut = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    # join-free: Σ c·bitlen(c) aggregates alongside N, then the proxy
    # combines with N·bitlen(N) at the user level
    per_user = (
        per_ut.groupBy("user_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(
                F.col("c") * F.expr("CAST(length(bin(c)) AS BIGINT)")
            ).alias("sum_c_bitlen"),
        )
        .select(
            (
                F.col("n") * F.expr("CAST(length(bin(n)) AS BIGINT)")
                - F.col("sum_c_bitlen")
            ).alias("entropy_proxy")
        )
    )
    return (
        per_user.groupBy("entropy_proxy")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("entropy_proxy").cast("long").alias("entropy_proxy"),
            "n_users",
        )
        .orderBy("entropy_proxy")
    )


USER_TYPE_ENTROPY_BANDS_SQL = """
WITH per_ut AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
), per_user AS (
  SELECT user_id, SUM(c) AS n,
         SUM(c * CAST(length(bin(c)) AS BIGINT)) AS sum_c_bitlen
  FROM per_ut GROUP BY user_id
)
SELECT CAST(n * CAST(length(bin(n)) AS BIGINT) - sum_c_bitlen AS BIGINT)
         AS entropy_proxy,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user
GROUP BY 1
ORDER BY entropy_proxy
"""
