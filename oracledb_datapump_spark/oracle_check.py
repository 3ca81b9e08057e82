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
    """Normalize a cell for cross-engine comparison, DTYPE-FAITHFULLY.

    The driver's comparator hashes the pandas representation, so ``123``
    (int64) and ``123.0`` (float64 — what DuckDB's HUGEINT sums land as)
    must NOT compare equal here, or the local gate passes queries the
    driver fails (round-1 lesson: 4 avoidable reds). Cells are tagged with
    a type class so Python's cross-type numeric equality can't paper over
    representation differences. Array/list cells raise, mirroring the
    driver's ``unhashable type: 'list'`` crash."""
    import numpy as np

    if isinstance(v, (list, tuple, set, dict, np.ndarray)):
        raise TypeError(
            f"array-typed output cell ({type(v).__name__}): the driver's "
            "comparator crashes on these — stringify or explode the column"
        )
    if v is None:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("f", "NaN") if math.isnan(f) else ("f", f)
    if isinstance(v, str):
        return ("s", v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    try:
        import pandas as pd

        if v is pd.NaT:
            return ("null",)
        if isinstance(v, pd.Timestamp):
            return ("t", v.isoformat())
    except Exception:
        pass
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", v.isoformat())
    return ("s", str(v))


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
    # Route BOTH sides through pandas exactly like the driver's comparator,
    # so dtype coercions (DuckDB HUGEINT→float64, nullable int→float64)
    # surface locally instead of at the per-round gate.
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = list(s_pdf.itertuples(index=False, name=None))
    d_pdf = con.sql(sql).df()
    d_cols = list(d_pdf.columns)
    d_rows = list(d_pdf.itertuples(index=False, name=None))

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
            if (
                isinstance(a, tuple)
                and isinstance(b, tuple)
                and a[:1] == ("f",)
                and b[:1] == ("f",)
                and isinstance(a[1], float)
                and isinstance(b[1], float)
            ):
                if not math.isclose(a[1], b[1], rel_tol=tol, abs_tol=tol):
                    return False
            elif a != b:
                return False
    return True


def check_all(
    spark, sf_dir: str, float_tol: float = 0.0, workers: int = 1
) -> list[dict]:
    """Run every declared query's oracle comparison.

    ``workers > 1`` overlaps independent comparisons from a small thread
    pool (guide §2.6 — Spark happily runs concurrent jobs in one
    application; the driver-side pandas/DuckDB halves of each comparison
    release the GIL, so the session's cores stay busy during them).
    Each worker thread holds its own DuckDB connection (connections are
    not thread-safe). Results keep queries() order either way. Safety
    audit for the parallel path: query functions use unique
    tempfile/table names; the only session-conf window
    (bucket_pruned_lookup's autoBucketedScan toggle) affects scan
    STRATEGY, never values, and no two queries toggle it; the model-fit
    memos are deterministic, so a racing duplicate fit wastes work but
    cannot corrupt. Per-query ``secs`` under workers>1 reflect
    co-running load — callers using the timing canary should run
    single-threaded or skip the guard."""
    import time

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()

    def one(item, con) -> dict:
        name, fn = item
        t0 = time.perf_counter()
        if name not in sqls:
            try:
                df = fn(spark, sf_dir)
                r = {
                    "name": name,
                    "rows_spark": df.count(),
                    "rows_match": None,
                    "values_match": None,
                    "note": "no oracle (rows-only check)",
                }
            except Exception as e:
                r = {"name": name, "error": str(e)[:500]}
        else:
            try:
                r = compare(fn(spark, sf_dir), con, sqls[name], name, float_tol)
            except Exception as e:
                r = {"name": name, "error": str(e)[:500]}
        # wall-time witness: a query suddenly 3x its committed trailing
        # time means environment drag (co-running load) or a real plan
        # regression — either way a diagnosable signal, recorded here so
        # the correctness suite doubles as a contamination canary
        r["secs"] = round(time.perf_counter() - t0, 3)
        return r

    items = list(qs.items())
    if workers <= 1:
        con = duckdb_con(sf_dir)
        return [one(it, con) for it in items]

    import threading
    from concurrent.futures import ThreadPoolExecutor

    tl = threading.local()

    def one_tl(item) -> dict:
        con = getattr(tl, "con", None)
        if con is None:
            con = tl.con = duckdb_con(sf_dir)
        return one(item, con)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(one_tl, items))
