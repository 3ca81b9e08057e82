"""events_source: the engine's ts contract must absorb every physical
type the fixture generator has shipped (or plausibly could) — the r3
regression was exactly a fixture precision change breaking hard-coded
readers. Reference precedent for dialect-aware time handling:
reference src/oracledb_datapump/database.py:141-174."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oracledb_datapump_spark.events_source import (
    events_stream_schema,
    load_events,
    sniff_ts_arrow_type,
    validate_events_source,
)

# one event at a microsecond-precise instant, one a day later
US = [1_700_000_000_123_456, 1_700_086_400_654_321]


def _write_events(dirpath: str, ts_array: pa.Array) -> str:
    os.makedirs(dirpath, exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, os.path.join(dirpath, "events.parquet"), version="2.6")
    return dirpath


# streaming-safe variants: accepted by BOTH load_events and the
# readStream schema sniffer
VARIANTS = {
    "us_ntz": pa.array(US, pa.timestamp("us")),
    "ms_ntz": pa.array([v // 1000 for v in US], pa.timestamp("ms")),
    "ns": pa.array([v * 1000 for v in US], pa.timestamp("ns")),
    "us_utc": pa.array(US, pa.timestamp("us", tz="UTC")),
    "int64_ns": pa.array([v * 1000 for v in US], pa.int64()),
}

# batch-only variants: load_events absorbs these too (epoch unit sniffed
# from footer statistics; ISO strings parsed), but streaming rejects
# them loudly (raw int64 is epoch-ns by contract there; strings unmapped)
BATCH_ONLY = {
    "int64_ms": pa.array([v // 1000 for v in US], pa.int64()),
    "int64_us": pa.array(US, pa.int64()),
    "iso_str": pa.array(
        [
            "2023-11-14 22:13:20.123456",
            "2023-11-15 22:13:20.654321",
        ],
        pa.string(),
    ),
}

EXPECTED = {
    "us_ntz": US,
    "ms_ntz": [(v // 1000) * 1000 for v in US],  # ms precision floors µs
    "ns": US,
    "us_utc": US,
    "int64_ns": US,
    "int64_ms": [(v // 1000) * 1000 for v in US],
    "int64_us": US,
    "iso_str": US,
}

ALL_VARIANTS = {**VARIANTS, **BATCH_ONLY}


@pytest.mark.parametrize("variant", sorted(ALL_VARIANTS))
def test_ts_us_identical_across_physical_types(spark, tmp_path, variant):
    d = _write_events(str(tmp_path / variant), ALL_VARIANTS[variant])
    got = {
        r.event_id: r.ts_us
        for r in load_events(spark, d).select("event_id", "ts_us").collect()
    }
    assert got == {1: EXPECTED[variant][0], 2: EXPECTED[variant][1]}, variant


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_stream_schema_maps_every_variant(spark, tmp_path, variant):
    d = _write_events(str(tmp_path / variant), VARIANTS[variant])
    validate_events_source(spark, d)  # must not raise
    schema = events_stream_schema(d)
    ts_type = schema["ts"].dataType.simpleString()
    arrow = sniff_ts_arrow_type(d)
    if arrow in ("timestamp[ns]", "int64"):
        assert ts_type == "bigint"
    elif "tz=" in arrow:
        assert ts_type == "timestamp"
    else:
        assert ts_type == "timestamp_ntz"
    # the sniffed schema must actually read rows back (the r3 failure
    # mode was a schema mismatch that silently yielded zero rows)
    n = spark.read.schema(schema).parquet(d).count()
    assert n == 2, (variant, ts_type)


def test_unmapped_type_rejected(spark, tmp_path):
    d = _write_events(
        str(tmp_path / "bad"), pa.array(["a", "b"], pa.string())
    )
    with pytest.raises(ValueError, match="silently"):
        validate_events_source(spark, d)


def test_empty_dir_defaults(spark, tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    validate_events_source(spark, d)  # no files: nothing to reject
    assert events_stream_schema(d)["ts"].dataType.simpleString() == "timestamp_ntz"


def test_mixed_type_directory_rejected(spark, tmp_path):
    """Files disagreeing on ts type would silently lose the mismatched
    files' rows under a fixed readStream schema — reject up front."""
    d = str(tmp_path / "mixed")
    _write_events(d, VARIANTS["us_ntz"])
    t = pa.table(
        {
            "event_id": pa.array([3], pa.int64()),
            "ts": pa.array([US[0] * 1000], pa.timestamp("ns")),
            "user_id": pa.array([30], pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([3.5], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(t, os.path.join(d, "later.parquet"), version="2.6")
    with pytest.raises(ValueError, match="mixes ts types"):
        validate_events_source(spark, d)


def test_stream_rejects_non_ns_int64(spark, tmp_path):
    """A raw int64 epoch-ms source must be rejected at stream
    construction — streaming reads int64 as epoch-ns (nanosAsLong), so
    accepting it would silently shift every event time 10^6×."""
    d = _write_events(str(tmp_path / "int64_ms"), BATCH_ONLY["int64_ms"])
    with pytest.raises(ValueError, match="epoch-ms"):
        validate_events_source(spark, d)


def test_batch_only_variants_rejected_by_stream_validation(spark, tmp_path):
    d = _write_events(str(tmp_path / "iso"), BATCH_ONLY["iso_str"])
    with pytest.raises(ValueError, match="silently"):
        validate_events_source(spark, d)
