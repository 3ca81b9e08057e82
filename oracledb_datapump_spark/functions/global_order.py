"""Distributed global order statistics — rank and running sum over a
TOTAL order, without the single-partition window Spark warns about.

A naive ``row_number() OVER (ORDER BY ...)`` (or a global running SUM)
moves every row to one partition. The standard distributed pattern used
here instead:

  1. range-partition the (narrow) projection on the full sort tuple —
     range boundaries respect the total order, so partition p's rows all
     precede partition p+1's;
  2. compute the stat within each partition (row_number / running sum);
  3. shift by per-partition prefix offsets — a |partitions|-row driver
     collect of COUNTs (for rank) or SUMs (for cumsum), model-state
     sized, never data.

The result is bit-identical to the single-partition formulation. Three
operators share this helper: ``corpus_shard_plan`` (global rank → LPT
shard deal), ``pack_plan`` (global token cumsum → pack boundaries), and
``curriculum_order`` (global rank + exact NTILE bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_RANGE_PARTITIONS = 32


def with_global_order_stat(
    df: DataFrame,
    order_exprs: list[Column],
    *,
    cumsum_col: str | None = None,
    out: str = "rk",
    n_partitions: int = N_RANGE_PARTITIONS,
) -> tuple[DataFrame, int]:
    """Return (df + column ``out``, grand_total).

    ``cumsum_col`` None → ``out`` is the 1-based global rank under
    ``order_exprs`` and grand_total is the row count; otherwise ``out``
    is the INCLUSIVE global running sum of ``cumsum_col`` and
    grand_total is its full sum. The input should already be projected
    narrow — every column rides through the range shuffle.

    ``order_exprs`` MUST be a UNIQUE tuple per row (all callers include
    a key column): range partitioning can split a tie group across a
    partition boundary, and no window frame makes a split tie both
    partition-stable and equal to the single-partition formulation. The
    cumsum window below pins an explicit ROWS frame so that WITH unique
    keys the result is bit-identical to ``SUM() OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)`` — the default RANGE frame would hand
    every member of an intra-partition tie the tie-group total.
    """
    part = (
        df.repartitionByRange(n_partitions, *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        # pin the partitioning the offsets describe (a replan could
        # rebalance ranges and break the offset mapping)
        .localCheckpoint(eager=True)
    )
    agg = (
        F.count(F.lit(1)) if cumsum_col is None else F.sum(cumsum_col)
    ).alias("t")
    totals = {
        r.pid: int(r.t)
        for r in part.groupBy(F.col("__pid").alias("pid")).agg(agg).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_col = (
        F.coalesce(
            *[
                F.when(F.col("__pid") == pid, F.lit(off))
                for pid, off in sorted(offsets.items())
            ],
            F.lit(0),
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("__pid").orderBy(*order_exprs)
    stat = (
        F.row_number().over(w)
        if cumsum_col is None
        else F.sum(cumsum_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    )
    return part.withColumn(out, (stat + off_col).cast("long")).drop("__pid"), acc


def exact_ntile(rank_col: Column, n_rows: int, n_tiles: int) -> Column:
    """SQL-exact NTILE(n_tiles) from a 1-based global rank and the known
    total row count: the first ``n_rows % n_tiles`` tiles take
    ``n_rows DIV n_tiles + 1`` rows, the rest one fewer — the ANSI
    definition DuckDB and Spark both implement. n_rows is driver-known
    (the helper above returns it), so the formula folds to arithmetic."""
    q, r = divmod(n_rows, n_tiles)
    big = r * (q + 1)  # rows covered by the larger leading tiles
    if q == 0:
        # fewer rows than tiles: rank IS the tile
        return rank_col.cast("long")
    # Integral division via remainder subtraction, NOT floor(a/b):
    # Spark's `/` on longs is double division, and a rank past 2^53 is
    # inexact as a double, so floor could land one tile off while
    # DuckDB's integer NTILE stays exact. Subtracting the exact long
    # remainder first makes the numerator exactly divisible; the small
    # integer quotient (≤ n_tiles) then survives the double round-trip
    # bit-exactly at any rank magnitude.
    def _idiv(num: Column, den: int) -> Column:
        return ((num - (num % den)) / den).cast("long")

    return (
        F.when(rank_col <= big, _idiv(rank_col - 1, q + 1))
        .otherwise(F.lit(r) + _idiv(rank_col - 1 - big, q))
        .cast("long")
        + F.lit(1)
    ).cast("long")
