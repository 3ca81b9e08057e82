"""Small driver-side tables WITHOUT the Python boundary.

``spark.createDataFrame(list_of_tuples)`` plants a PythonRDD leaf
(``applySchemaToPythonRDD``) in every plan built on top of it. That leaf
is re-evaluated through a Python worker round-trip by EVERY job that
scans it — range-partition sampling passes, broadcast builds, retried
stages, each action of a multi-action operator — and the cost is per
PARTITION, so a ``.coalesce(1)`` over the default 32-slice
parallelization chains 32 sequential worker round-trips into one task
(measured ~5.7 s per job in this sandbox; guide §4's boundary cost on a
frame of a few rows). It also carries unknown size statistics, which at
larger SFs silently flips broadcastable joins to CartesianProduct (the
shapley_attribution regression).

``values_df`` builds the same frame purely in the JVM: every cell
becomes a typed literal inside an array-of-structs that one
``explode`` emits from a 1-row Range — zero Python at execution time,
one trivial task, exact literal values (``F.lit`` handles string
escaping natively, so corpus-derived strings round-trip bit-exactly).
Intended for MODEL-STATE sized tables only (thresholds, channel lists,
driver-computed result rows); anything data-sized must stay a
distributed frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cell(value, dtype: T.DataType):
    if isinstance(dtype, T.ArrayType):
        if value is None:
            return F.lit(None).cast(dtype)
        return F.array(
            *[_cell(x, dtype.elementType) for x in value]
        ).cast(dtype)
    return F.lit(value).cast(dtype)


#: past this many cells the literal array-of-structs stops paying:
#: Catalyst re-analyzes the whole literal tree per action, which the
#: sweep A/B measured as a 1.4-2.1x REGRESSION on ~1000-cell tables
#: (greedy_coverage_select's covered-shingle list, the PQ centroid
#: tables, lsh_band_planner's 250-row s-curve), while <~100-cell tables
#: ran 0.6-0.9x. Larger tables go through Arrow instead: columnar
#: batches ship to the JVM once with no per-row pickling and no literal
#: tree (dedup.py's _VERIFIED_PAIRS_CACHE precedent).
LITERAL_MAX_CELLS = 256

_ARROW_TYPES = {
    T.LongType(): "int64",
    T.IntegerType(): "int32",
    T.DoubleType(): "float64",
    T.FloatType(): "float32",
    T.StringType(): "string",
    T.BooleanType(): "bool_",
}


def _arrow_type(dtype: T.DataType):
    import pyarrow as pa

    if isinstance(dtype, T.ArrayType):
        return pa.list_(_arrow_type(dtype.elementType))
    name = _ARROW_TYPES.get(dtype)
    if name is None:
        raise TypeError(f"values_df: no arrow mapping for {dtype}")
    return getattr(pa, name)()


def _arrow_df(spark: SparkSession, rows: Sequence, st: T.StructType) -> DataFrame:
    import pyarrow as pa

    try:
        arrays = [
            pa.array([row[i] for row in rows], type=_arrow_type(f.dataType))
            for i, f in enumerate(st.fields)
        ]
    except TypeError:
        # a dtype with no Arrow mapping (date, timestamp, decimal,
        # nested struct): fall back to the classic path rather than
        # fail only once a call site's table grows past the literal
        # threshold (r16 advice) — the PythonRDD-leaf cost is the
        # lesser evil for a type we cannot batch
        return spark.createDataFrame([tuple(r) for r in rows], st)
    tbl = pa.Table.from_arrays(arrays, names=[f.name for f in st.fields])
    # select through the parsed schema so BOTH build paths emit
    # identical column types/nullability — a call site whose row count
    # drifts across LITERAL_MAX_CELLS must not see a schema change
    return spark.createDataFrame(tbl).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in st.fields]
    )


def values_df(
    spark: SparkSession,
    rows: Sequence,
    schema: str | T.StructType,
) -> DataFrame:
    """DataFrame of ``rows`` (sequence of tuples/lists, positional per
    schema field) with ``schema``, built as JVM literals — a drop-in for
    ``spark.createDataFrame(rows, schema)`` on small driver-side tables.
    Preserves row order (explode emits array elements in order on one
    partition). Empty ``rows`` falls back to createDataFrame — an empty
    frame plans as an empty RDD scan no job ever pays for."""
    st = (
        T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    if not isinstance(st, T.StructType):
        raise TypeError(f"values_df needs a struct schema, got {st}")
    if not rows:
        return spark.createDataFrame([], st)
    for row in rows:
        if len(row) != len(st.fields):
            # createDataFrame raises on length mismatch; diverging here
            # would hide a caller bug as silent data loss (r16 advice)
            raise ValueError(
                f"values_df: row has {len(row)} elements, schema has "
                f"{len(st.fields)} fields: {row!r}"
            )
    n_cells = sum(
        len(row[i]) if isinstance(f.dataType, T.ArrayType) and row[i] else 1
        for row in rows
        for i, f in enumerate(st.fields)
    )
    if n_cells > LITERAL_MAX_CELLS:
        return _arrow_df(spark, rows, st)
    structs = [
        F.struct(
            *[
                _cell(row[i], f.dataType).alias(f.name)
                for i, f in enumerate(st.fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .coalesce(1)
        .select(F.explode(F.array(*structs)).alias("__r"))
        .select("__r.*")
    )
    # Schema note: values and data types match createDataFrame exactly;
    # nullability is STRICTER (a column with no NULL literal infers
    # non-nullable — Spark 4 folds every literal-true conditional at
    # analysis, so there is no cheap way to relax it). Strictly-more-
    # informed nullability cannot change any value: unions widen, casts
    # and aggregates are nullability-agnostic.
