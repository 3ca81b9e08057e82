"""Streaming Count-Min sketch maintenance: bounded-state frequency
counting over an unbounded stream.

The batch CMS (operators.sketches.cms_heavy_hitters) builds its 4x1024
counter grid in one groupBy; the streaming form maintains the SAME grid
as explicit state with ``applyInPandasWithState`` keyed by (row,
counter) cell. That inverts the usual stateful-streaming scaling
problem: state size is the SKETCH size (CMS_D x CMS_W cells, a few KB)
no matter how many distinct values the stream carries — per-key exact
counting would grow state with stream cardinality, the precise failure
the sketch exists to avoid at 100 TB/day ingest.

Each micro-batch appends the cells it touched with their new running
total (totals are monotone, so a reader folds the sink with max() per
cell to get the current sketch — file sinks can't rewrite in place); an
``availableNow`` catch-up over a static source converges to exactly the
batch sketch (asserted in tests, cell by cell).

Tokens are hashed with the shared md5-based hash64 + per-row salt —
identical to the batch/DuckDB formulation, so all three agree.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..events_source import pin_utc, stream_events_raw
from ..functions.text import hash64
from ..operators.sketches import CMS_D, CMS_W

CELL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.IntegerType()),
        T.StructField("counter", T.LongType()),
        T.StructField("c", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("c", T.LongType())])


def _update_cell(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate one sketch cell. State = a single long."""
    row, counter = key
    total = state.get[0] if state.exists else 0
    n = sum(len(p) for p in pdfs)
    if n:
        total += n
        state.update((total,))
        yield pd.DataFrame({"row": [row], "counter": [counter], "c": [total]})


def stream_cms_cells(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming DataFrame of updated CMS cells over the ``event_type``
    column of a parquet events stream."""
    ev = stream_events_raw(spark, src_dir)
    cells = (
        ev.select(F.col("event_type").alias("token"))
        .withColumn("row", F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])))
        .select(
            F.col("row").cast("int").alias("row"),
            (
                hash64(
                    F.concat(F.lit("cms"), F.col("row"), F.lit(":"), F.col("token"))
                )
                % CMS_W
            ).alias("counter"),
        )
    )
    return cells.groupBy("row", "counter").applyInPandasWithState(
        _update_cell,
        outputStructType=CELL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_cms_cycle(spark: SparkSession, src_dir: str, out_dir: str) -> dict:
    """availableNow catch-up: drain the source, persist the updated
    cells, keep sketch state checkpointed for the next cycle."""
    q = (
        stream_cms_cells(spark, src_dir)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(out_dir, "cells"))
        .option("checkpointLocation", os.path.join(out_dir, "_cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "cells")}


def batch_cms_cells(spark: SparkSession, src_dir: str) -> DataFrame:
    """Batch twin: the same cells via one groupBy over the static data."""
    from ..events_source import events_stream_schema

    pin_utc(spark)
    ev = spark.read.schema(events_stream_schema(src_dir)).parquet(src_dir)
    return (
        ev.select(F.col("event_type").alias("token"))
        .withColumn("row", F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])))
        .select(
            F.col("row").cast("int").alias("row"),
            (
                hash64(
                    F.concat(F.lit("cms"), F.col("row"), F.lit(":"), F.col("token"))
                )
                % CMS_W
            ).alias("counter"),
        )
        .groupBy("row", "counter")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def streaming_cms_cells_cycle(spark: SparkSession, src_dir: str) -> DataFrame:
    """(row, counter, c): one availableNow cycle of the stateful
    streaming Count-Min sketch over the events fixture's event_type
    column — hash-gated against the batch cell counts in SQL. A single
    staged file drains in one micro-batch, so each cell's appended
    running total equals the batch count exactly; with that, all four
    custom streaming families (windowed rollup, stateful sessionizer,
    interval join, CMS sketch) carry value-hash oracles.

    Runs against throwaway source/sink/checkpoint dirs; result pinned
    with localCheckpoint before cleanup."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="dp_cms_src_")
    out = tempfile.mkdtemp(prefix="dp_cms_out_")
    try:
        shutil.copy(
            os.path.join(src_dir, "events.parquet"),
            os.path.join(src, "events.parquet"),
        )
        info = run_cms_cycle(spark, src, out)
        return (
            spark.read.parquet(info["sink_path"])
            .select(F.col("row").cast("long").alias("row"), "counter", "c")
            .orderBy("row", "counter")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def _cms_cells_sql() -> str:
    from ..functions.text import sql_hash64

    return f"""
WITH cells AS (
  SELECT r.row,
         {sql_hash64("'cms' || CAST(r.row AS VARCHAR) || ':' || e.event_type")}
           % {CMS_W} AS counter
  FROM events e CROSS JOIN (SELECT unnest(range({CMS_D})) AS row) r
)
SELECT CAST(row AS BIGINT) AS row, counter, COUNT(*) AS c
FROM cells
GROUP BY 1, 2
ORDER BY row, counter
"""


STREAMING_CMS_CELLS_SQL = _cms_cells_sql()
