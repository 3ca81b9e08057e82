"""Skew-mitigation helpers.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
at runtime; these helpers cover the cases AQE can't: skewed *aggregations*
and skewed broadcast-side build keys.

``salted_agg`` implements the standard two-phase pattern: add a random-ish
salt derived deterministically from other columns (no rand() — keeps jobs
replayable/resumable), partially aggregate on (key, salt), then combine on
key. The hot key's rows spread over ``n_salts`` reducers in phase 1; phase
2 touches only |keys|×n_salts rows.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, from_cols: list[str]) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of ``from_cols``
    (use high-cardinality columns, e.g. the row's natural id)."""
    return df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in from_cols]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[DataFrame], list[Column]],
    n_salts: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: aggregates over (key, salt) — must be decomposable
    (sum/count/min/max). ``final_aggs(pre)``: combining aggregates over the
    phase-1 result. Example::

        salted_agg(df, ["k"],
                   [F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")],
                   lambda pre: [F.sum("c").alias("n"), F.sum("s").alias("total")],
                   salt_from=["id"])
    """
    salt_from = salt_from or df.columns
    phase1 = (
        with_salt(df, n_salts, salt_from)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
    )
    return phase1.groupBy(*key_cols).agg(*final_aggs(phase1))
