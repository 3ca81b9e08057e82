"""Batch 51: multi-method dedup governance.

The engine carries FIVE near-dup candidate paths (MinHash-LSH,
SimHash bands, prefix-filter, winnowing, containment). Before a corpus
team trusts any one method's delete list at 100 TB, two numbers decide:

- ``dedup_method_recall_report`` — the method-selection table: each
  path's candidate volume, hits against the EXACT 3-gram Jaccard truth
  (dedup_ngram_jaccard at the engine threshold), recall and precision
  in ppm. The cheap methods buy their speed with recall or precision —
  this is the table that prices the trade per corpus.
- ``dedup_rater_kappa`` — Fleiss' κ (Fleiss 1971) across three
  fingerprint raters (MinHash-verified, SimHash, winnowing) over the
  union pair universe: agreement beyond chance, as one number. κ near
  1 means any single method is a safe proxy; low κ means the methods
  see DIFFERENT duplicates and a union/vote policy is required.
  Integer-exact: κ_ppm from cross-multiplied DECIMAL(38,0) sums.

Scale posture: every pair set is banded/prefix-bounded (never
all-pairs); the audits join pair-list-sized frames and reduce to ≤5
rows. The exact-Jaccard truth is itself the shingle-join the engine
already gates (dedup_ngram_jaccard) — nothing new touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.local_table import values_df

# ---------------------------------------------------------------------------
# dedup_method_recall_report
# ---------------------------------------------------------------------------


def _pair_sets(spark: SparkSession, sf_dir: str) -> list[tuple[str, DataFrame]]:
    from . import dedup as DD
    from . import pipeline10 as P10
    from . import pipeline12 as P12
    from . import pipeline15 as P15
    from . import pipeline27 as P27

    return [
        ("containment", P10.dedup_containment_pairs(spark, sf_dir).select("doc_a", "doc_b")),
        ("minhash_verified", DD.verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")),
        ("prefix_filter", P15.dedup_prefix_filter_pairs(spark, sf_dir).select("doc_a", "doc_b")),
        ("simhash", P12._simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")),
        ("winnowing", P27.winnowing_fingerprint_pairs(spark, sf_dir).select("doc_a", "doc_b")),
    ]


def dedup_method_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, n_candidates, n_truth_hits, recall_ppm, precision_ppm):
    every candidate path scored against the exact 3-gram Jaccard truth
    at the engine threshold. recall = hits/|truth|, precision =
    hits/candidates, both exact integer ppm. MinHash-verified and
    prefix-filter are exact-at-threshold by construction (their rows
    prove it: recall/precision 10⁶); SimHash/winnowing/containment
    trade one or the other — the row quantifies how much, on THIS
    corpus.

    Plan: five pair-list-sized left-semi joins against the truth frame
    and five 1-row counts, unioned. Candidate generation itself is the
    banded machinery the individual gates already exercise."""
    from . import dedup as DD

    truth = DD.dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    truth = truth.localCheckpoint(eager=True)  # reused by all five methods
    n_truth = truth.count()
    outs = []
    for name, pairs in _pair_sets(spark, sf_dir):
        pairs = pairs.localCheckpoint(eager=True)
        n_cand = pairs.count()
        hits = pairs.join(truth, ["doc_a", "doc_b"], "left_semi").count()
        outs.append(
            (
                name,
                int(n_cand),
                int(hits),
                int(hits * 1_000_000 // n_truth) if n_truth else 0,
                int(hits * 1_000_000 // n_cand) if n_cand else 0,
            )
        )
    return values_df(spark,
        sorted(outs),
        "method string, n_candidates long, n_truth_hits long,"
        " recall_ppm long, precision_ppm long",
    ).orderBy("method")


def _recall_report_sql() -> str:
    from . import dedup as DD
    from . import pipeline10 as P10
    from . import pipeline12 as P12
    from . import pipeline15 as P15
    from . import pipeline27 as P27

    truth = DD.DEDUP_JACCARD_SQL.replace("ORDER BY doc_a, doc_b", "")
    sets = {
        "containment": "SELECT doc_a, doc_b FROM ("
        + P10.DEDUP_CONTAINMENT_PAIRS_SQL.replace("ORDER BY doc_a, doc_b", "")
        + ")",
        "minhash_verified": "SELECT doc_a, doc_b FROM ("
        + DD.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
        + ")",
        "prefix_filter": "SELECT doc_a, doc_b FROM ("
        + P15.DEDUP_PREFIX_FILTER_SQL.replace("ORDER BY doc_a, doc_b", "")
        + ")",
        "simhash": P12.simhash_pairs_sql(),
        "winnowing": "SELECT doc_a, doc_b FROM ("
        + P27.WINNOWING_FINGERPRINT_PAIRS_SQL.replace(
            "ORDER BY doc_a, doc_b", ""
        )
        + ")",
    }
    arms = []
    for name, sql in sorted(sets.items()):
        arms.append(f"""
SELECT '{name}' AS method,
       CAST((SELECT COUNT(*) FROM ({sql})) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM ({sql}) c
             WHERE EXISTS (SELECT 1 FROM truth t
                           WHERE t.doc_a = c.doc_a AND t.doc_b = c.doc_b))
            AS BIGINT) AS n_truth_hits
""")
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH truth AS ({truth}),
arms AS (
{union}
)
SELECT method, n_candidates, n_truth_hits,
       CAST(CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 0
            ELSE n_truth_hits * 1000000 // (SELECT COUNT(*) FROM truth) END
            AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN n_candidates = 0 THEN 0
            ELSE n_truth_hits * 1000000 // n_candidates END
            AS BIGINT) AS precision_ppm
FROM arms
ORDER BY method
"""


DEDUP_METHOD_RECALL_SQL = _recall_report_sql()


# ---------------------------------------------------------------------------
# dedup_rater_kappa
# ---------------------------------------------------------------------------

KAPPA_RATERS = 3  # minhash_verified, simhash, winnowing


def dedup_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Fleiss' κ across the three fingerprint raters
    (MinHash-verified, SimHash, winnowing) on the union pair universe:
    (n_pairs, dup_votes, sum_agree, kappa_ppm). Each pair gets d
    dup-votes (1..3); with n=3 raters and 2 categories,
    P̄ = Σ[d(d−1)+(3−d)(2−d)]/(6N), P̄e = (T² + (3N−T)²)/(9N²), and
    κ = (3N·SA − 2E) / (2·(9N² − E)) after clearing denominators
    (SA = the agreement sum, T = total dup votes, E = T² + (3N−T)²) —
    all in DECIMAL(38,0), emitted as a signed ppm. Perfect unanimous
    agreement (denominator 0) reports κ = 10⁶.

    Plan: three banded pair sets full-outer-merged on the pair key
    (pair-list-sized), one global 1-row reduce."""
    from . import dedup as DD
    from . import pipeline12 as P12
    from . import pipeline27 as P27

    mh = DD.verified_pairs_cached(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("v_mh")
    )
    sh = P12._simhash_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("v_sh")
    )
    wn = P27.winnowing_fingerprint_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("v_wn")
    )
    u = (
        mh.join(sh, ["doc_a", "doc_b"], "full_outer")
        .join(wn, ["doc_a", "doc_b"], "full_outer")
        .select(
            (
                F.coalesce("v_mh", F.lit(0))
                + F.coalesce("v_sh", F.lit(0))
                + F.coalesce("v_wn", F.lit(0))
            ).alias("d")
        )
    )
    agg = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("t"),
        F.sum(
            F.col("d") * (F.col("d") - 1)
            + (3 - F.col("d")) * (2 - F.col("d"))
        ).alias("sa"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("t").cast("long").alias("dup_votes"),
        F.col("sa").cast("long").alias("sum_agree"),
        F.expr(
            """
            CAST(CASE
              WHEN 2 * (9 * CAST(n AS DECIMAL(38,0)) * n
                        - (CAST(t AS DECIMAL(38,0)) * t
                           + CAST(3*n - t AS DECIMAL(38,0)) * (3*n - t))) = 0
              THEN 1000000
              ELSE (CASE WHEN 3 * CAST(n AS DECIMAL(38,0)) * sa
                              - 2 * (CAST(t AS DECIMAL(38,0)) * t
                                     + CAST(3*n - t AS DECIMAL(38,0)) * (3*n - t)) < 0
                    THEN -1 ELSE 1 END)
                   * (abs(3 * CAST(n AS DECIMAL(38,0)) * sa
                          - 2 * (CAST(t AS DECIMAL(38,0)) * t
                                 + CAST(3*n - t AS DECIMAL(38,0)) * (3*n - t)))
                      * 1000000
                      div (2 * (9 * CAST(n AS DECIMAL(38,0)) * n
                                - (CAST(t AS DECIMAL(38,0)) * t
                                   + CAST(3*n - t AS DECIMAL(38,0)) * (3*n - t)))))
            END AS BIGINT)
            """
        ).alias("kappa_ppm"),
    )


def _rater_kappa_sql() -> str:
    from . import dedup as DD
    from . import pipeline12 as P12
    from . import pipeline27 as P27

    mh = DD.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    wn = P27.WINNOWING_FINGERPRINT_PAIRS_SQL.replace("ORDER BY doc_a, doc_b", "")
    e = (
        "(CAST(t AS HUGEINT) * t"
        " + CAST(3*n - t AS HUGEINT) * (3*n - t))"
    )
    return f"""
WITH mh AS (SELECT doc_a, doc_b, 1 AS v_mh FROM ({mh})),
sh AS (SELECT doc_a, doc_b, 1 AS v_sh FROM ({P12.simhash_pairs_sql()})),
wn AS (SELECT doc_a, doc_b, 1 AS v_wn FROM ({wn})),
u AS (
  SELECT COALESCE(mh.v_mh, 0) + COALESCE(sh.v_sh, 0) + COALESCE(wn.v_wn, 0)
           AS d
  FROM mh
  FULL OUTER JOIN sh USING (doc_a, doc_b)
  FULL OUTER JOIN wn USING (doc_a, doc_b)
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d) AS BIGINT) AS t,
         CAST(SUM(d * (d - 1) + (3 - d) * (2 - d)) AS BIGINT) AS sa
  FROM u
)
SELECT n AS n_pairs, t AS dup_votes, sa AS sum_agree,
       CAST(CASE
         WHEN 2 * (9 * CAST(n AS HUGEINT) * n - {e}) = 0 THEN 1000000
         ELSE (CASE WHEN 3 * CAST(n AS HUGEINT) * sa - 2 * {e} < 0
               THEN -1 ELSE 1 END)
              * (abs(3 * CAST(n AS HUGEINT) * sa - 2 * {e}) * 1000000
                 // (2 * (9 * CAST(n AS HUGEINT) * n - {e})))
       END AS BIGINT) AS kappa_ppm
FROM agg
"""


DEDUP_RATER_KAPPA_SQL = _rater_kappa_sql()
