"""Pipeline dashboards, batch 14: data-profiling and experimentation
audits — functional dependencies, Benford's law, sample-ratio mismatch.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL). These are the profiling checks a warehouse team schedules
against a 100 TB lake:

- ``fd_violation_report``: classic FD discovery/verification — for each
  candidate "lhs determines rhs" rule, how many lhs groups see >1 rhs
  value and how many rows sit in violating groups. The constraint-mining
  primitive behind normalization advice and dbt `accepted_values`-style
  contracts.
- ``benford_price_audit``: first-significant-digit distribution of
  order totals vs Benford's expectation in exact ppm — the standard
  fabricated-data / ETL-truncation smell test.
- ``srm_bucket_audit``: sample-ratio mismatch over deterministic hash
  bucketing — the first gate of any A/B platform (an unbalanced split
  invalidates every downstream metric). The z-test is expressed as an
  integer moment inequality so the verdict is bit-stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import hash64, sql_hash64

# -- functional dependencies -------------------------------------------------

# candidate rules: (table, lhs, rhs, expected-to-hold?)
FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey", True),  # key → anything
    ("lineitem", "l_orderkey", "l_returnflag", False),  # lines can split flags
    ("customer", "c_custkey", "c_nationkey", True),
    ("lineitem", "l_partkey", "l_suppkey", False),  # parts multi-sourced
    ("orders", "o_custkey", "o_orderpriority", False),  # customers vary
]


def fd_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule, n_groups, n_violating_groups, n_violating_rows, holds):
    verification of candidate functional dependencies — ``lhs → rhs``
    holds when every lhs value maps to exactly one rhs value; violating
    groups are lhs values with ≥2 distinct rhs. The profiling primitive
    behind normalization advice, key discovery, and silent-denormal-
    ization drift alarms (a rule that held last month and broke this
    month names the upstream bug).

    Plan: per rule ONE groupBy(lhs) with countDistinct(rhs) + a one-row
    reduce — the shuffle is lhs-cardinality-keyed and each rule is
    independent (Spark runs the union's branches as sibling stages).
    At 100 TB each check is the cost of a distinct-count on its
    table; nothing is quadratic in rules or rows."""
    out = None
    for table, lhs, rhs, _ in FD_CANDIDATES:
        t = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        g = t.groupBy(lhs).agg(
            F.countDistinct(rhs).alias("n_rhs"),
            F.count(F.lit(1)).alias("n_rows_g"),
        )
        r = g.agg(
            F.lit(f"{table}.{lhs}->{rhs}").alias("rule"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, F.col("n_rows_g")).otherwise(0))
            .cast("long")
            .alias("n_violating_rows"),
        ).withColumn("holds", F.col("n_violating_groups") == 0)
        out = r if out is None else out.unionByName(r)
    return out.orderBy("rule")


def _fd_sql() -> str:
    arms = []
    for table, lhs, rhs, _ in FD_CANDIDATES:
        arms.append(
            f"""SELECT '{table}.{lhs}->{rhs}' AS rule,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN n_rows_g ELSE 0 END) AS BIGINT) AS n_violating_rows,
       SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs, COUNT(*) AS n_rows_g
      FROM {table} GROUP BY {lhs})"""
        )
    return "\nUNION ALL\n".join(arms) + "\nORDER BY rule"


FD_VIOLATION_REPORT_SQL = _fd_sql()


# -- Benford first-digit audit -----------------------------------------------

# Benford expectation log10(1+1/d) in ppm (exact constants, not computed
# at query time — keeps both engines off transcendental functions)
BENFORD_PPM = {
    1: 301030,
    2: 176091,
    3: 124939,
    4: 96910,
    5: 79181,
    6: 66947,
    7: 57992,
    8: 51153,
    9: 45757,
}


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(digit, n_orders, observed_ppm, benford_ppm, abs_dev_ppm): the
    first-significant-digit distribution of order totals against
    Benford's law — naturally-grown monetary amounts track log10(1+1/d)
    closely; flat or spiked digits are the classic fingerprint of
    fabricated rows, unit-conversion bugs, or a price floor/cap
    clipping the distribution. Total |deviation| is the audit score;
    per-digit deviations name the suspect digit.

    Determinism: the first digit of an exact cents integer (totalprice
    is DECIMAL(15,2)) via string head — no float log; Benford ppm are
    baked constants. Plan: row-local digit extraction + a ≤9-row
    groupBy with a broadcast total — scan-bound at any scale."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("CAST(floor(o_totalprice * 100) AS LONG)").alias("cents")
    )
    digit = F.substring(F.col("cents").cast("string"), 1, 1).cast("long")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = counts.agg(F.sum("n_orders").alias("n_all"))
    bppm = F.create_map(
        *[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            F.expr("n_orders * 1000000 div n_all").alias("observed_ppm"),
            bppm[F.col("digit")].cast("long").alias("benford_ppm"),
        )
        .withColumn(
            "abs_dev_ppm",
            F.abs(F.col("observed_ppm") - F.col("benford_ppm")),
        )
        .orderBy("digit")
    )


def _benford_sql() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {ppm}" for d, ppm in BENFORD_PPM.items()
    )
    return f"""
WITH o AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
counts AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         COUNT(*) AS n_orders
  FROM o GROUP BY 1
),
total AS (SELECT SUM(n_orders) AS n_all FROM counts)
SELECT digit, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_orders * 1000000 // n_all AS BIGINT) AS observed_ppm,
       CAST(CASE digit {cases} END AS BIGINT) AS benford_ppm,
       ABS(CAST(n_orders * 1000000 // n_all AS BIGINT)
           - CASE digit {cases} END) AS abs_dev_ppm
FROM counts CROSS JOIN total
ORDER BY digit
"""


BENFORD_PRICE_AUDIT_SQL = _benford_sql()


# -- sample-ratio mismatch ---------------------------------------------------

SRM_N_BUCKETS = 2
SRM_Z2_X100 = 384  # z^2 threshold 3.84 = chi-square(1) at p=0.05


def srm_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_users, expected_users, srm_flag): the sample-ratio
    mismatch gate of an A/B platform — users deterministically hashed
    into {SRM_N_BUCKETS} buckets; if the realized split diverges from
    50/50 beyond the chi-square(1) p=0.05 bound, every downstream
    metric of the "experiment" is invalid (the assignment itself is
    biased — the single most common silent A/B failure). ``srm_flag``
    is the same verdict on every row (the gate is global).

    Determinism: chi-square with expected n/2 reduces to
    (n0 − n1)² vs 3.84·n — one integer inequality, scaled ×100 to keep
    the 3.84 exact; no float ever. Plan: one distinct-user pass, a
    2-row groupBy, a broadcast total. Trivially scan-bound."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    users = ev.distinct().select(
        (
            F.pmod(hash64(F.col("user_id").cast("string")), F.lit(SRM_N_BUCKETS))
        ).alias("bucket")
    )
    counts = users.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_users"))
    tot = counts.agg(
        F.sum("n_users").alias("n_all"),
        (F.max("n_users") - F.min("n_users")).alias("diff"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_users",
            F.expr(f"n_all div {SRM_N_BUCKETS}").alias("expected_users"),
            (
                F.col("diff") * F.col("diff") * 100
                > F.lit(SRM_Z2_X100) * F.col("n_all")
            ).alias("srm_flag"),
        )
        .orderBy("bucket")
    )


def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split_a, split_b, n_pairs, leak): verified near-dup pairs
    bucketed by the two documents' train/val/test assignment (the SAME
    deterministic hash split corpus_split ships). A near-dup pair that
    straddles train and an eval split is CONTAMINATION the n-gram
    decontamination pass can miss (near-dups share most but not all
    n-grams) — this is the dedup-aware leakage audit run before any
    eval number is trusted. ``leak`` marks cross-split pairs touching
    val/test; the split pair is canonicalized (a ≤ b alphabetically) so
    the report is orientation-free.

    Plan: the memoized verified-pair list joins the row-local split
    assignment twice (broadcast pair side, corpus side streams), then a
    ≤9-row groupBy. Rides dedup's LSH + memo — no new corpus pass."""
    from .dedup import verified_pairs_cached
    from .textprep import corpus_split

    splits = corpus_split(spark, sf_dir).select("doc_id", "split")
    p = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    half = splits.join(F.broadcast(p), splits.doc_id == p.doc_a).select(
        F.col("split").alias("sa"), "doc_b"
    )
    both = splits.join(F.broadcast(half), splits.doc_id == half.doc_b).select(
        F.least("sa", "split").alias("split_a"),
        F.greatest("sa", "split").alias("split_b"),
    )
    return (
        both.groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            (
                (F.col("split_a") != F.col("split_b"))
                & (
                    F.col("split_a").isin("test", "val")
                    | F.col("split_b").isin("test", "val")
                )
            ).alias("leak"),
        )
        .orderBy("split_a", "split_b")
    )


def _split_leakage_sql() -> str:
    from .dedup import DEDUP_MINHASH_VERIFIED_SQL
    from .textprep import CORPUS_SPLIT_SQL

    verified = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    splits = CORPUS_SPLIT_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH v AS ({verified}),
s AS ({splits}),
both_sides AS (
  SELECT LEAST(sa.split, sb.split) AS split_a,
         GREATEST(sa.split, sb.split) AS split_b
  FROM v JOIN s sa ON sa.doc_id = v.doc_a
         JOIN s sb ON sb.doc_id = v.doc_b
)
SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       split_a <> split_b AND (split_a IN ('test','val') OR split_b IN ('test','val')) AS leak
FROM both_sides
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""


SPLIT_LEAKAGE_PAIRS_SQL = _split_leakage_sql()


SRM_BUCKET_AUDIT_SQL = f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
),
b AS (
  SELECT (({sql_hash64("CAST(user_id AS VARCHAR)")}) % {SRM_N_BUCKETS}
          + {SRM_N_BUCKETS}) % {SRM_N_BUCKETS} AS bucket
  FROM u
),
counts AS (SELECT bucket, COUNT(*) AS n_users FROM b GROUP BY bucket),
tot AS (
  SELECT SUM(n_users) AS n_all, MAX(n_users) - MIN(n_users) AS diff
  FROM counts
)
SELECT bucket, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_all // {SRM_N_BUCKETS} AS BIGINT) AS expected_users,
       diff * diff * 100 > {SRM_Z2_X100} * n_all AS srm_flag
FROM counts CROSS JOIN tot
ORDER BY bucket
"""
