"""REMAP_DATA transform registry — deterministic, cross-engine column
rewrites applied at export plan time.

Oracle Data Pump's REMAP_DATA parameter rewrites column values through a
user PL/SQL function during export/import; the reference client does not
wrap it (its directives.py registry stops at REMAP_SCHEMA /
REMAP_TABLESPACE / REMAP_DATAFILE — see
/root/reference/src/oracledb_datapump/directives.py:440-470), so like
QUERY this is parity-plus surface. Spark-first, the "function" is a
named entry in this registry: a row-local Column expression (stays
inside WholeStageCodegen, adds no shuffle) paired with a DuckDB SQL twin
so the lifecycle is provable under the cross-engine value hash.

Every transform must be deterministic and engine-agnostic — the same
rules as the gated queries (md5-derived hash64, no RNG, no
engine-native hash functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import UsageError
from .text import hash64, sql_hash64


def _hash_mask(df: DataFrame, col: str) -> Column:
    """Deterministic pseudonymization: 'anon_<hash64>' — the same input
    maps to the same token everywhere, so joins on the masked column
    still work; NULL stays NULL."""
    c = F.col(col)
    return F.when(
        c.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("anon_"), hash64(c.cast("string")).cast("string")))


def _sql_hash_mask(expr: str) -> str:
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE 'anon_' || "
        f"CAST({sql_hash64(f'CAST({expr} AS VARCHAR)')} AS VARCHAR) END"
    )


def _null_out(df: DataFrame, col: str) -> Column:
    """Redact the column entirely, keeping its type (schema-stable)."""
    return F.lit(None).cast(df.schema[col].dataType)


def _sql_null_out(expr: str) -> str:  # type kept by the caller's CAST
    return "NULL"


# name -> (spark builder (df, col) -> Column, duckdb twin expr -> expr)
REMAP_FUNCTIONS = {
    "hash_mask": (_hash_mask, _sql_hash_mask),
    "null_out": (_null_out, _sql_null_out),
}


def parse_remap(value: str) -> tuple[str, str]:
    """'column:function' -> (column, function), validated against the
    registry at directive-apply time (fail at submit, not mid-export)."""
    parts = [p.strip() for p in str(value).split(":")]
    if len(parts) != 2 or not parts[0] or not parts[1]:
        raise UsageError(
            f"REMAP_DATA value must be '<column>:<function>', got {value!r}"
        )
    col, fn = parts
    if fn not in REMAP_FUNCTIONS:
        raise UsageError(
            f"REMAP_DATA function {fn!r} not registered; "
            f"known: {sorted(REMAP_FUNCTIONS)}"
        )
    return col, fn


def apply_remaps(df: DataFrame, remaps: list[tuple[str, str]]) -> DataFrame:
    """Apply each (column, function) rewrite — row-local projections,
    no shuffle. A remap naming a column the read did not produce (e.g.
    projected away by COLUMNS) fails loudly with both names."""
    for col, fn in remaps:
        if col not in df.columns:
            raise UsageError(
                f"REMAP_DATA({col}:{fn}) names a column not present in the "
                f"exported frame (have: {df.columns}) — check COLUMNS/"
                "projection directives"
            )
        df = df.withColumn(col, REMAP_FUNCTIONS[fn][0](df, col))
    return df
