"""Batch 53: winnowing parameter planner.

``winnow_param_planner`` — the window-size sweep for the winnowing
fingerprint scheme (Schleimer/Wilkerson/Aiken, SIGMOD'03), completing
the parameter-planning trio next to lsh_band_planner (bandings) and
the BPE merge curve (vocab size). For each window W the paper gives
two closed forms — expected fingerprint density 2/(W+1) and the match
guarantee length K+W−1 — and the planner pairs them with the two
EMPIRICAL numbers measured on the corpus's real grams: fingerprints
actually kept and candidate pairs actually generated (under the same
frequency cap and min-shared threshold as the production pass). Read
across the rows: W up = index shrinks and pairs drop, but only
matches ≥ K+W−1 chars stay guaranteed — the planner prices that trade
per corpus before the real dedup run.

Scale posture: ONE char-gram explode feeds all three window sizes
(pinned via localCheckpoint — the in-session form of writing the gram
table once, the sparse_text inverted-index device); each W adds one
per-doc window + two partial-aggregated groupBys on the ~1/W-dense
fingerprint stream. Pair joins stay under the production frequency
cap — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .pipeline27 import WINNOW_CAP, WINNOW_K, WINNOW_MIN_SHARED
from ..functions.local_table import values_df

PLAN_WINDOWS = [4, 8, 16]


def winnow_param_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, guarantee_len, density_ppm, n_fps, n_pairs): the winnowing
    W sweep — analytic columns exact (guarantee K+W−1; density
    2·10⁶ div (W+1) in ppm of grams), empirical columns measured on
    the real corpus (distinct (doc, fingerprint) rows kept; candidate
    pairs with ≥{WINNOW_MIN_SHARED} shared fingerprints under the
    {WINNOW_CAP}-doc frequency cap — production semantics at W=8,
    sweep semantics at 4 and 16).

    Plan: the gram hash stream is computed once and pinned; per W the
    work is one doc-partitioned window min + a distinct + the capped
    pair join — the exact production shapes, measured not guessed."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN length(t) >= {WINNOW_K} THEN "
                f"transform(sequence(1, length(t) - {WINNOW_K - 1}), p -> "
                f"CAST(CONV(SUBSTRING(md5(substring(t, p, {WINNOW_K})), 1, 15),"
                " 16, 10) AS BIGINT)) "
                "ELSE CAST(array() AS array<bigint>) END"
            )
        ).alias("pos", "h"),
    ).localCheckpoint(eager=True)

    rows = []
    for wsz in PLAN_WINDOWS:
        win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
            0, wsz - 1
        )
        fps = grams.select(
            "doc_id", F.min("h").over(win).alias("fp")
        ).distinct()
        n_fps = fps.count()
        capped = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("ndocs"))
            .filter(F.col("ndocs") <= WINNOW_CAP)
            .select("fp")
        )
        ff = fps.join(capped, "fp")
        n_pairs = (
            ff.alias("a")
            .join(
                ff.alias("b"),
                (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= WINNOW_MIN_SHARED)
            .count()
        )
        rows.append(
            (
                wsz,
                WINNOW_K + wsz - 1,
                2_000_000 // (wsz + 1),
                int(n_fps),
                int(n_pairs),
            )
        )
    return values_df(spark,
        rows,
        "w long, guarantee_len long, density_ppm long, n_fps long,"
        " n_pairs long",
    ).orderBy("w")


def _planner_sql() -> str:
    arms = []
    for wsz in PLAN_WINDOWS:
        arms.append(f"""
SELECT {wsz} AS w, {WINNOW_K + wsz - 1} AS guarantee_len,
       {2_000_000 // (wsz + 1)} AS density_ppm,
       (SELECT COUNT(*) FROM (
          SELECT DISTINCT doc_id,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND {wsz - 1} FOLLOWING)
                   AS fp
          FROM g)) AS n_fps,
       (SELECT COUNT(*) FROM (
          SELECT a.doc_id, b.doc_id AS doc_b, COUNT(*) AS shared
          FROM (SELECT f.doc_id, f.fp FROM f{wsz} f
                JOIN (SELECT fp FROM f{wsz} GROUP BY fp
                      HAVING COUNT(*) <= {WINNOW_CAP}) c USING (fp)) a
          JOIN (SELECT f.doc_id, f.fp FROM f{wsz} f
                JOIN (SELECT fp FROM f{wsz} GROUP BY fp
                      HAVING COUNT(*) <= {WINNOW_CAP}) c USING (fp)) b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING COUNT(*) >= {WINNOW_MIN_SHARED})) AS n_pairs
""")
    fcte = ",\n".join(
        f"""f{wsz} AS (
  SELECT DISTINCT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {wsz - 1} FOLLOWING) AS fp
  FROM g)"""
        for wsz in PLAN_WINDOWS
    )
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
g0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(length(t) - {WINNOW_K - 1}, 0)))
           AS pos
  FROM d
),
g AS (
  SELECT doc_id, pos,
         CAST(CAST('0x' || substr(md5(substr(t, pos, {WINNOW_K})), 1, 15)
              AS UBIGINT) AS BIGINT) AS h
  FROM g0
),
{fcte}
SELECT CAST(w AS BIGINT) AS w, CAST(guarantee_len AS BIGINT) AS guarantee_len,
       CAST(density_ppm AS BIGINT) AS density_ppm,
       CAST(n_fps AS BIGINT) AS n_fps, CAST(n_pairs AS BIGINT) AS n_pairs
FROM ({union})
ORDER BY w
"""


WINNOW_PARAM_PLANNER_SQL = _planner_sql()
