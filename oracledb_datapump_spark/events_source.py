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
_STRING_TYPES = ("string",)

#: epoch-integer unit → factor to MICROseconds (micros = value * factor,
#: or DIV (1/factor) when factor < 1). Integer arithmetic only.
_UNIT_BOUNDS = (
    # (unit, inclusive lower bound of abs(max_ts) for plausible epochs)
    ("ns", 10**17),  # ~1973+ in nanoseconds
    ("us", 10**14),  # ~1973+ in microseconds
    ("ms", 10**11),  # ~1973+ in milliseconds
    ("s", 10**8),  # ~1973+ in seconds
)


def pin_utc(spark: SparkSession) -> None:
    # runtime-settable; makes NTZ→epoch match DuckDB's UTC interpretation
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # harmless when ts is already µs; required when a fixture ships NANOS
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _long_to_us(col: str, unit: str) -> Column:
    if unit == "ns":
        return F.expr(f"{col} DIV 1000")
    if unit == "us":
        return F.col(col).cast("long")
    if unit == "ms":
        return (F.col(col) * 1000).cast("long")
    if unit == "s":
        return (F.col(col) * 1000000).cast("long")
    raise ValueError(f"unknown epoch unit {unit!r}; expected ns/us/ms/s")


def ts_us_expr(df: DataFrame, col: str = "ts", long_unit: str = "ns") -> Column:
    """Epoch-microseconds BIGINT from whatever ``col`` was loaded as.

    ``long_unit`` names the epoch unit of an integer-typed ``col``
    (default "ns" — the nanosAsLong contract). ``load_events`` sniffs the
    real unit from parquet footer statistics; call sites holding a bare
    DataFrame keep the ns default. ISO-8601 string columns parse via
    to_timestamp (UTC session) — an unparseable string yields NULL, which
    the matrix test pins as the documented contract."""
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"events source has no '{col}' column: {df.dtypes}")
    if dt in _LONG_TYPES:
        return _long_to_us(col, long_unit)
    if dt in _TS_TYPES:
        return F.unix_micros(F.col(col).cast("timestamp"))
    if dt in _STRING_TYPES:
        return F.unix_micros(F.to_timestamp(F.col(col)))
    raise ValueError(
        f"events source '{col}' has unsupported dtype {dt}; expected one of "
        f"{_LONG_TYPES + _TS_TYPES + _STRING_TYPES}"
    )


def event_time_expr(df: DataFrame, col: str = "ts", long_unit: str = "ns") -> Column:
    """TIMESTAMP column (for watermarks/windows) from any accepted
    physical type; same hard-fail contract as ts_us_expr — a silent cast
    of an unmapped column would yield all-NULL event_time and an empty
    (not wrong-looking, MISSING) result downstream."""
    dt = dict(df.dtypes).get(col)
    if dt in _TS_TYPES:
        return F.col(col).cast("timestamp")
    return F.timestamp_micros(ts_us_expr(df, col, long_unit))


def _sniff_epoch_unit(path: str) -> str:
    """Epoch unit ('ns'/'us'/'ms'/'s') of an int64 ``ts`` column, decided
    from parquet FOOTER max statistics (no data scan): plausible modern
    epochs differ by 1000× per unit, so magnitude is unambiguous. Raw
    int64 fixtures have shipped as epoch-ns; a regenerated fixture
    switching to epoch-ms must not silently read 1000× off."""
    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    # Sniff EVERY file and demand agreement: deciding from the first
    # file with statistics would silently misread a directory that mixes
    # epoch-ns and epoch-ms int64 files by 1,000,000× — the exact silent
    # shift this guard exists to prevent (the type sniffer already
    # rejects mixed physical types the same way).
    # Inference is per ROW GROUP, and intra-file disagreement must raise
    # like the cross-file case: overwriting one slot per file would let
    # the last row group silently win when a file mixes units internally.
    seen: dict[tuple[str, int], str] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            cols = [rgm.column(i) for i in range(rgm.num_columns)]
            ts_cols = [c for c in cols if c.path_in_schema == "ts"]
            if not ts_cols:
                continue
            st = ts_cols[0].statistics
            if st is None or st.max is None:
                continue
            if not isinstance(st.max, int):
                # logical timestamp column (stat is a datetime): the unit
                # is carried by the type, and nanosAsLong only maps NANOS
                # to long — epoch-ns by contract
                seen[(f, rg)] = "ns"
                continue
            mx = abs(int(st.max))
            for unit, lo in _UNIT_BOUNDS:
                if mx >= lo:
                    seen[(f, rg)] = unit
                    break
            else:
                raise ValueError(
                    f"events source {f}: int64 ts max {st.max} matches no "
                    "plausible epoch unit (ns/us/ms/s)"
                )
    units = set(seen.values())
    if len(units) > 1:
        raise ValueError(
            f"events source {path}: files disagree on the ts epoch unit "
            f"({ {k: v for k, v in sorted(seen.items())} }); a mixed-unit "
            "directory cannot be read with one schema — normalize the "
            "files first"
        )
    if units:
        return units.pop()
    # no statistics anywhere — keep the historical contract
    return "ns"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of ``events.parquet`` with the derived ``ts_us`` column.
    Integer ts columns get their epoch unit sniffed from footer stats;
    timestamp and ISO-string columns convert directly."""
    pin_utc(spark)
    path = os.path.join(sf_dir, "events.parquet")
    e = spark.read.parquet(path)
    unit = "ns"
    if dict(e.dtypes).get("ts") in _LONG_TYPES and sniff_ts_arrow_type(path) == "int64":
        # RAW int64 only: a timestamp[ns] column also loads as long (the
        # nanosAsLong contract) but its unit is fixed by the logical type
        unit = _sniff_epoch_unit(path)
    return e.withColumn("ts_us", ts_us_expr(e, long_unit=unit))


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

    files = (
        [src_dir]
        if os.path.isfile(src_dir)
        else sorted(glob.glob(os.path.join(src_dir, "*.parquet")))
    )
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
    if arrow == "int64":
        # the STREAMING consumers interpret raw int64 as epoch-ns (the
        # nanosAsLong contract); an epoch-ms/us/s int64 source would be
        # silently misread 1000×+ off, so reject it here (the BATCH path,
        # load_events, sniffs and supports every unit)
        unit = _sniff_epoch_unit(src_dir)
        if unit != "ns":
            raise ValueError(
                f"events stream source under {src_dir} carries raw int64 ts "
                f"in epoch-{unit}; streaming interprets int64 as epoch-ns — "
                "rewrite the source as timestamp[us]/[ms] (or epoch-ns) "
                "instead of letting every event time silently shift"
            )


def stream_events_raw(spark: SparkSession, src_dir: str) -> DataFrame:
    """readStream over a parquet events directory (stand-in for Kafka),
    schema sniffed from the files present; no derived columns.

    An EMPTY directory is rejected loudly: the readStream schema is fixed
    at construction, so a default picked before any file lands (say NTZ)
    would silently yield zero rows for the stream's whole life if
    ns-typed files then arrive — the exact failure this module exists to
    prevent. Callers that cycle availableNow batches (run_*_export)
    reconstruct the stream per cycle and therefore re-sniff."""
    pin_utc(spark)
    if not sniff_ts_arrow_type(src_dir):
        raise ValueError(
            f"events stream source {src_dir} has no parquet files yet; "
            "a schema fixed now could mismatch the files that later land "
            "and silently drop every row — write at least one file before "
            "constructing the stream"
        )
    validate_events_source(spark, src_dir)
    return spark.readStream.schema(events_stream_schema(src_dir)).parquet(src_dir)
