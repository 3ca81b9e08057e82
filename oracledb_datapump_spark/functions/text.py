"""Text primitives shared by the dedup/textstats operators.

Each primitive exists twice — as a Spark ``Column`` builder and as a DuckDB
SQL fragment — and the pair is kept provably equivalent by the oracle
checks. Determinism rules:

- Tokenization: ``lower(text)`` split on ``[^a-z0-9]+``, empties dropped.
- hash64: first 15 hex chars of md5 parsed base-16 → BIGINT in [0, 2^60).
  Identical in Spark (``conv``) and DuckDB (``CAST('0x…' AS UBIGINT)``);
  md5 is bit-stable everywhere, unlike engine-native hash functions
  (Spark murmur3 ≠ DuckDB's hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text_col: str | Column) -> Column:
    """Array of non-empty lowercase tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def hash64(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (cross-engine stable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash64(expr: str) -> str:
    """DuckDB twin of :func:`hash64`."""
    return f"CAST(CAST('0x' || substr(md5({expr}), 1, 15) AS UBIGINT) AS BIGINT)"


def sql_tokens_cte(doc_table: str = "documents") -> str:
    """DuckDB CTE producing (doc_id, pos, tok) — twin of
    ``posexplode(tokens(text))``. pos is 0-based to match Spark.
    (DuckDB 1.0 lacks WITH ORDINALITY; generate_subscripts + unnest in the
    same SELECT stay aligned.)"""
    return f"""
tokens AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS tok
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                           t -> t != '') AS l
        FROM {doc_table})
)"""
