"""Batch 38: exact distributed order statistics WITHOUT a global sort.

``exact_percentile_two_pass`` computes exact (not approximate) order
statistics by histogram refinement — the pattern that replaces "sort
100 TB to find a median": pass 1 aggregates per-group min/max/count,
pass 2 aggregates a fixed-width bucket histogram, the driver walks the
tiny |groups|×|buckets| table to find each target rank's bucket and its
in-bucket offset, and pass 3 ranks ONLY the rows of the located buckets
(a ~1/B fraction of each group) to pull the exact value. Three
column-pruned scans, zero corpus-scale sorts, exact answers — where
``percentile_approx``/KLL trade exactness and a full sort pays a
shuffle the size of the table.

The oracle computes the same order statistic the classical way (one
rank window over everything), so hash equality proves the refinement
logic — bucket arithmetic, offset bookkeeping, tie handling — lands on
exactly the classical value. Values are cent-quantized
(floor(price·100) on the shared double bits) so both engines rank
identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_table import values_df

PCTS = (50, 90)  # order statistics to extract: rank = ceil(n·pct/100)
N_BUCKETS = 1024


def exact_percentile_two_pass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(grp, pct, n_rows, value_cents): exact p50/p90 of cent-quantized
    ``l_extendedprice`` per ``l_returnflag`` via histogram refinement
    (module docstring). The driver touches only the |groups|×|buckets|
    histogram and the final |groups|×|pcts| scalars; the only shuffle
    of row-level data is the located buckets' rank window (~1/B of
    each group)."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice").cast("double") * 100)
        .cast("long")
        .alias("v"),
    )
    return order_stats_two_pass(spark, l, PCTS)


def order_stats_two_pass(
    spark: SparkSession, l: DataFrame, pcts=PCTS
) -> DataFrame:
    """Core refinement over any (grp string, v long) frame — factored
    out so degenerate distributions (constant groups, singletons, heavy
    ties, one-bucket skew) are property-testable without the fixture
    (tests/test_two_pass_percentile.py)."""
    # r16 note: pinning the projected frame across the three passes was
    # A/B-measured same-JVM at sf0.1 and REJECTED (1.26 s → 1.34 s):
    # re-scanning two narrow parquet columns per pass is cheaper than
    # materializing the rows. Left as-is deliberately.
    # pass 1: per-group envelope
    env = {
        r["grp"]: (r["lo"], r["hi"], r["n"])
        for r in l.groupBy("grp")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    # bucket id = ((v - lo) · B) div span, clamped — integer arithmetic
    cases = F.when(F.lit(False), F.lit(0))
    for g, (lo, hi, _) in env.items():
        span = max(hi - lo + 1, 1)
        cases = cases.when(
            F.col("grp") == g,
            F.expr(
                f"least(((v - {lo}) * {N_BUCKETS}) div {span},"
                f" {N_BUCKETS - 1})"
            ),
        )
    # pass 2: the fixed-width histogram (|groups|×|buckets| rows)
    hist = {
        (r["grp"], r["b"]): r["c"]
        for r in l.withColumn("b", cases)
        .groupBy("grp", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # driver: walk each group's histogram to the bucket holding each
    # target rank and the residual offset within that bucket
    targets = []  # (grp, pct, n, bucket, offset_in_bucket)
    for g, (lo, hi, n) in env.items():
        for pct in pcts:
            rank = max(1, (n * pct + 99) // 100)  # ceil, 1-based
            seen = 0
            for b in range(N_BUCKETS):
                c = hist.get((g, b), 0)
                if seen + c >= rank:
                    targets.append((g, pct, n, b, rank - seen))
                    break
                seen += c
    tdf = values_df(spark,
        targets, "grp string, pct long, n_rows long, b long, off long"
    )
    # pass 3: exact k-th smallest WITHIN each located bucket only
    w = Window.partitionBy("grp", "pct").orderBy("v")
    picked = (
        l.withColumn("b", cases)
        .join(F.broadcast(tdf), ["grp", "b"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == F.col("off"))
        .select(
            "grp",
            "pct",
            "n_rows",
            F.col("v").alias("value_cents"),
        )
    )
    return picked.orderBy("grp", "pct")


EXACT_PERCENTILE_TWO_PASS_SQL = f"""
WITH v AS (
  SELECT l_returnflag AS grp,
         CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS v
  FROM lineitem
),
ranked AS (
  SELECT grp, v,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM v
)
SELECT grp,
       CAST(p.pct AS BIGINT) AS pct,
       CAST(n AS BIGINT) AS n_rows,
       v AS value_cents
FROM ranked, (SELECT unnest([{", ".join(str(p) for p in PCTS)}]) AS pct) p
WHERE rn = GREATEST(1, (n * p.pct + 99) // 100)
ORDER BY grp, pct
"""
