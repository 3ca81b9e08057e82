"""Scale-adaptive input widening (guide §2.2 — make partitioning track
the data and the hardware, not a constant).

Spark sizes file-scan partitions for cluster economics:
``maxSplitBytes = max(openCostInBytes=4MB, min(maxPartitionBytes,
bytes/minPartitionNum))``, so a fixture-sized parquet file (≪ 4 MB per
core) yields ONE scan partition and every row-heavy first stage —
bit-plane chains, tokenize→shingle explodes, media decodes — runs on a
single core no matter how many the session has. At production scale the
same scan has thousands of partitions and none of this applies.

``widen_small_scan`` repartitions UP to the session's default
parallelism only when the plan's current partitioning is narrower —
a conditional exchange of the (already projected, narrow) frame that is
a NO-OP at any scale where the scan is wide, and at small scale costs
one tiny shuffle to unlock full-width execution of everything above it.
Derived entirely from the plan and the session — no tuned constants."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session default parallelism iff
    the frame currently has fewer partitions. Values are unaffected
    (row placement only); callers that need a total order sort AFTER
    this, as they must anyway."""
    width = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width)
