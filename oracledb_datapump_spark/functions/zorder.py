"""Z-order (Morton) curve helpers for multi-dimensional dump layout.

A Z-value interleaves the bits of several quantized columns so that
rows close in EVERY dimension land close on the curve. Range-
partitioning + locally sorting a dump by Z-value clusters the parquet
row groups in all interleaved dimensions at once, so an importer
filtering on ANY of them prunes row groups via min/max stats — the
same layout trick Delta/Iceberg OPTIMIZE ZORDER applies, built here
from plain Spark expressions (shift/and/or chains, whole-stage
codegen'd; no UDF).

Quantization is min/max linear to ``bits`` levels per column; min/max
come from one cheap aggregate over the frame being written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # quantization levels per dimension (up to 3 dims in 48 bits)


def quantize(col: Column, cmin: Column, cmax: Column, bits: int = ZBITS) -> Column:
    """Map a numeric column linearly onto [0, 2^bits - 1] as a long.
    Degenerate ranges (min == max) map to 0."""
    span = cmax - cmin
    lvl = (1 << bits) - 1
    q = F.when(span <= 0, F.lit(0)).otherwise(
        F.floor(((col - cmin) / span) * lvl)
    )
    return F.least(F.greatest(q.cast("long"), F.lit(0)), F.lit(lvl))


def interleave(cols: list[Column], bits: int = ZBITS) -> Column:
    """Morton-interleave already-quantized long columns (bit i of column
    j lands at position i*len(cols)+j). Pure shift/mask expression
    chain — stays inside whole-stage codegen."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return z


def zorder_dataframe(df: DataFrame, columns: list[str], bits: int = ZBITS) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-curve of ``columns``:
    range-partitioned (keeps partition count) then locally sorted by the
    Z-value; the helper column is dropped before return. Cost: one
    min/max aggregate + one range shuffle — the write itself is what
    pays for clustered scans forever after."""
    aggs = []
    for c in columns:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    qcols = [
        quantize(
            F.col(c).cast("double"),
            F.col(f"__min_{c}").cast("double"),
            F.col(f"__max_{c}").cast("double"),
            bits,
        )
        for c in columns
    ]
    n_parts = df.rdd.getNumPartitions()
    return (
        with_stats.withColumn("__z", interleave(qcols, bits))
        .drop(*[f"__min_{c}" for c in columns], *[f"__max_{c}" for c in columns])
        .repartitionByRange(max(n_parts, 1), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
