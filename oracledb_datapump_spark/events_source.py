"""Type-sniffing reader for the ``events`` fixture — the single place
that knows what physical type ``ts`` is.

The driver's fixtures have shipped ``ts`` as parquet TIMESTAMP(NANOS)
(which Spark's vectorized reader only accepts as epoch-ns BIGINT under
``spark.sql.legacy.parquet.nanosAsLong``) and, since round 3, as plain
``timestamp[us]`` (TIMESTAMP_NTZ to Spark). The engine contract is that
every consumer sees one derived column ``ts_us`` — epoch microseconds as
BIGINT — no matter which physical type the file carries. Reference
precedent for dialect-aware time handling:
/root/reference/src/oracledb_datapump/database.py:141-174 (zone-name and
offset parsing at the read boundary, engine-neutral values inside).

Why BIGINT micros and not a timestamp column: the DuckDB oracles compare
via ``epoch_us(ts)``, and integer micros are bit-stable across engines
while timestamp rendering is not. Conversions use integer arithmetic
only — epoch-ns (~1.7e18) exceeds double's 53-bit mantissa, so any float
path corrupts the low digits.

Timezone note: the NTZ→epoch conversion interprets the wall time in the
session timezone; DuckDB's ``epoch_us`` interprets naive timestamps as
UTC. ``get_spark`` already pins the session to UTC, and the helpers here
re-pin defensively so a foreign session (the driver's harness) gets the
same values.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: ts column dtypes we accept, as reported by ``df.dtypes``.
_LONG_TYPES = ("bigint", "long")
_TS_TYPES = ("timestamp", "timestamp_ntz")


def pin_utc(spark: SparkSession) -> None:
    # runtime-settable; makes NTZ→epoch match DuckDB's UTC interpretation
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # harmless when ts is already µs; required when a fixture ships NANOS
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def ts_us_expr(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds BIGINT from whatever ``col`` was loaded as."""
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"events source has no '{col}' column: {df.dtypes}")
    if dt in _LONG_TYPES:  # epoch nanos via nanosAsLong
        return F.expr(f"{col} DIV 1000")
    if dt in _TS_TYPES:
        return F.unix_micros(F.col(col).cast("timestamp"))
    raise ValueError(
        f"events source '{col}' has unsupported dtype {dt}; expected one of "
        f"{_LONG_TYPES + _TS_TYPES}"
    )


def event_time_expr(df: DataFrame, col: str = "ts") -> Column:
    """TIMESTAMP column (for watermarks/windows) from either physical type."""
    dt = dict(df.dtypes).get(col)
    if dt in _LONG_TYPES:
        return F.timestamp_micros(F.expr(f"{col} DIV 1000"))
    if dt in _TS_TYPES:
        return F.col(col).cast("timestamp")
    # same hard failure as ts_us_expr: a silent cast of e.g. a string
    # column yields all-NULL event_time and an empty (not wrong-looking,
    # MISSING) result downstream
    raise ValueError(
        f"events source '{col}' has unsupported dtype {dt}; expected one of "
        f"{_LONG_TYPES + _TS_TYPES}"
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of ``events.parquet`` with the derived ``ts_us`` column."""
    pin_utc(spark)
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return e.withColumn("ts_us", ts_us_expr(e))


# ---------------------------------------------------------------------------
# streaming: readStream needs an explicit schema, so sniff one footer
# ---------------------------------------------------------------------------


def sniff_ts_arrow_type(src_dir: str) -> str:
    """Arrow type string of ``ts`` across ALL parquet footers under
    ``src_dir`` ('' if the directory is empty — streaming sources may
    start before any file lands). Footer-only reads, so this stays
    cheap; a directory whose files DISAGREE on the ts type is rejected
    here rather than letting readStream silently drop every row of the
    mismatched files (the exact failure this module exists to prevent)."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(src_dir, "*.parquet")))
    if not files:
        return ""
    types = {str(pq.ParquetFile(f).schema_arrow.field("ts").type) for f in files}
    if len(types) > 1:
        raise ValueError(
            f"events source under {src_dir} mixes ts types {sorted(types)}; "
            "a fixed readStream schema would silently drop the mismatched "
            "files' rows — repartition the source to one type first"
        )
    return next(iter(types))


def events_stream_schema(src_dir: str) -> T.StructType:
    """Schema for ``readStream`` over an events directory, with ``ts``
    typed to match the files actually present. TIMESTAMP(NANOS) and raw
    int64 read as LongType (epoch ns, the nanosAsLong contract);
    µs/ms-precision timestamps read as TIMESTAMP_NTZ (tz-naive fixture)
    or TIMESTAMP if the writer adjusted to UTC; an empty directory
    defaults to the current fixture type (timestamp[us] → NTZ)."""
    arrow = sniff_ts_arrow_type(src_dir)
    if arrow in ("timestamp[ns]", "int64"):
        ts_type: T.DataType = T.LongType()
    elif "tz=" in arrow:
        ts_type = T.TimestampType()
    else:
        ts_type = T.TimestampNTZType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def validate_events_source(spark: SparkSession, src_dir: str) -> None:
    """Guard: a ``ts`` type the schema sniffer can't map would silently
    yield zero rows from readStream (observed with a fixed-schema
    mismatch) instead of erroring, so reject it up front."""
    arrow = sniff_ts_arrow_type(src_dir)
    if not arrow:
        return
    ok = (
        arrow in ("timestamp[ns]", "int64")
        or arrow.startswith("timestamp[us")
        or arrow.startswith("timestamp[ms")
    )
    if not ok:
        raise ValueError(
            f"events source under {src_dir} has ts type {arrow}; expected "
            "timestamp[ns]/int64 (nanosAsLong contract) or timestamp[us|ms] "
            "— an unmapped type would silently produce no rows"
        )


def stream_events_raw(spark: SparkSession, src_dir: str) -> DataFrame:
    """readStream over a parquet events directory (stand-in for Kafka),
    schema sniffed from the files present; no derived columns."""
    pin_utc(spark)
    validate_events_source(spark, src_dir)
    return spark.readStream.schema(events_stream_schema(src_dir)).parquet(src_dir)
