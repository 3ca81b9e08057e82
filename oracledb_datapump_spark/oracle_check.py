"""Local replica of the driver's DuckDB-oracle correctness check.

For each (queries()[name], oracle_sql()[name]) pair: run the Spark query
and the DuckDB SQL on the same parquet tables; compare row count, column
names, and order-insensitive values. Used by tests and by ad-hoc dev runs
so mismatches surface before the driver's per-round CORRECTNESS gate.
"""

from __future__ import annotations

import math
from typing import Any

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (int, str, bool)):
        return v
    # decimals, dates, timestamps, lists
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return str(v)


def _rows_multiset(cols: list[str], rows: list[tuple]) -> dict:
    """Order-insensitive multiset of rows, columns sorted by name
    (mirrors the driver: 'sorts columns by name before hashing')."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for r in rows:
        key = tuple(_norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(spark_df, con, sql: str, name: str = "?", float_tol: float = 0.0) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d = con.sql(sql)
    d_cols = list(d.columns)
    d_rows = [tuple(r) for r in d.fetchall()]

    result = {
        "name": name,
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "values_match": False,
        "mismatch_sample": None,
    }
    if not (result["rows_match"] and result["cols_match"]):
        return result
    ms_s = _rows_multiset(s_cols, s_rows)
    ms_d = _rows_multiset(d_cols, d_rows)
    if ms_s == ms_d:
        result["values_match"] = True
        return result
    if float_tol > 0:
        only_s = sorted(set(ms_s) - set(ms_d))
        only_d = sorted(set(ms_d) - set(ms_s))
        if len(only_s) == len(only_d) and _within_tol(only_s, only_d, float_tol):
            result["values_match"] = True
            result["mismatch_sample"] = "within float_tol"
            return result
    only_s = list(set(ms_s) - set(ms_d))[:3]
    only_d = list(set(ms_d) - set(ms_s))[:3]
    result["mismatch_sample"] = {"spark_only": only_s, "oracle_only": only_d}
    return result


def _within_tol(rows_a: list[tuple], rows_b: list[tuple], tol: float) -> bool:
    for ra, rb in zip(rows_a, rows_b):
        if len(ra) != len(rb):
            return False
        for a, b in zip(ra, rb):
            if isinstance(a, float) and isinstance(b, float):
                if not math.isclose(a, b, rel_tol=tol, abs_tol=tol):
                    return False
            elif a != b:
                return False
    return True


def check_all(spark, sf_dir: str, float_tol: float = 0.0) -> list[dict]:
    import __spark_entry__ as entry_mod

    con = duckdb_con(sf_dir)
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    out = []
    for name, fn in qs.items():
        if name not in sqls:
            df = fn(spark, sf_dir)
            out.append(
                {
                    "name": name,
                    "rows_spark": df.count(),
                    "rows_match": None,
                    "values_match": None,
                    "note": "no oracle (rows-only check)",
                }
            )
            continue
        try:
            out.append(compare(fn(spark, sf_dir), con, sqls[name], name, float_tol))
        except Exception as e:
            out.append({"name": name, "error": str(e)[:500]})
    return out
