"""Reusable column-level functions (Spark Column builders) and their
DuckDB-SQL textual twins, so every operator can keep its Spark plan and its
oracle SQL in lock-step."""

from .text import (
    TOKEN_SPLIT_RE,
    hash64,
    sql_hash64,
    sql_tokens_cte,
    tokens,
)

__all__ = [
    "TOKEN_SPLIT_RE",
    "hash64",
    "sql_hash64",
    "sql_tokens_cte",
    "tokens",
]
