"""Dataset profiling: the pre-ingest statistics pass every curation /
training-data pipeline runs before accepting a new source (null rates,
cardinalities, value ranges per column).

The reference's ESTIMATE machinery sizes a dump before export
(/root/reference/src/oracledb_datapump/directives.py ESTIMATE,
commands.py estimate handling); this operator is the data-quality
sibling: one scan, one aggregate row, per-column stats.

Scale design: ONE pass over the fact computes every per-column
aggregate (Spark plans the multi-DISTINCT via a single Expand +
partial-aggregate — shuffle volume is |columns| x |distinct values|,
not |columns| x |rows|); the 1-row result is exploded driver-free into
the per-column report. At 100 TB you'd swap the exact COUNT(DISTINCT)
for approx_count_distinct / the repo's HLL sketch (operators/sketches)
— the plan shape is otherwise unchanged. Doubles and timestamps are
canonicalized to integer cents / epoch-us BIGINTs first so min/max/
distinct are bit-stable cross-engine (see SCALE.md determinism notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (column, canonical kind): bigint columns stay as-is; doubles become
# integer cents; timestamps become epoch-us; strings profile natively.
PROFILE_COLS = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "cents"),
    ("l_extendedprice", "cents"),
    ("l_discount", "cents"),
    ("l_tax", "cents"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _canon(col: str, kind: str):
    c = F.col(col)
    if kind == "int":
        return c.cast("long")
    if kind == "cents":
        return F.floor(c * 100).cast("long")
    if kind == "ts":
        # parquet TIMESTAMP reads as NTZ; the session tz is UTC, so the
        # LTZ cast makes unix_micros agree with DuckDB's epoch_us
        return F.unix_micros(c.cast("timestamp"))
    return c


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_repr, max_repr) — one
    row per lineitem column, computed in a single scan + aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    canon = li.select(
        *[_canon(c, k).alias(c) for c, k in PROFILE_COLS]
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, _ in PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = canon.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_repr"),
                    F.col(f"__max_{c}").alias("max_repr"),
                )
                for c, _ in PROFILE_COLS
            ]
        )
    ).alias("p")
    return (
        one.select("n_rows", per_col)
        .select(
            F.col("p.col_name").alias("col_name"),
            "n_rows",
            F.col("p.n_null").alias("n_null"),
            F.col("p.n_distinct").alias("n_distinct"),
            F.col("p.min_repr").alias("min_repr"),
            F.col("p.max_repr").alias("max_repr"),
        )
        .orderBy("col_name")
    )


def _canon_sql(col: str, kind: str) -> str:
    if kind == "int":
        return f"CAST({col} AS BIGINT)"
    if kind == "cents":
        return f"CAST(FLOOR({col} * 100) AS BIGINT)"
    if kind == "ts":
        return f"epoch_us({col})"
    return col


_PROFILE_BRANCHES = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, n_rows,
       __null_{c} AS n_null, __nd_{c} AS n_distinct,
       __min_{c} AS min_repr, __max_{c} AS max_repr FROM agg"""
    for c, _ in PROFILE_COLS
)

TABLE_PROFILE_SQL = (
    """
WITH canon AS (
  SELECT """
    + ",\n         ".join(f"{_canon_sql(c, k)} AS {c}" for c, k in PROFILE_COLS)
    + """
  FROM lineitem
), agg AS (
  SELECT COUNT(*) AS n_rows,
         """
    + ",\n         ".join(
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS __null_{c},"
        f" COUNT(DISTINCT {c}) AS __nd_{c},"
        f" CAST(MIN({c}) AS VARCHAR) AS __min_{c},"
        f" CAST(MAX({c}) AS VARCHAR) AS __max_{c}"
        for c, _ in PROFILE_COLS
    )
    + """
  FROM canon
)
"""
    + _PROFILE_BRANCHES
    + "\nORDER BY col_name"
)
