"""Pipeline QA dashboards, batch 3 (round 6; first in line for the
round-7 gated prefix — hash-verified locally at both fixture scales by
tests/test_queries_oracle.py until then).

- ``doc_embedding_coverage``   referential QA between documents/embeddings
- ``session_length_histogram`` bitlen histogram of session sizes
- ``quality_vs_dup_matrix``    Gopher-pass × near-dup-loser contingency
- ``token_share_by_lang``      per-language token budget shares
- ``conversion_by_hour``       click→purchase conversion rate per hour
- ``shard_balance_report``     write-shard token balance audit
- ``pq_code_histogram``        PQ codebook utilization per subquantizer
- ``events_dow_hour_profile``  day-of-week × hour activity heatmap

Same contracts as operators/pipeline.py: every statistic integer-exact
(ppm divisions, bitlen log2 proxies, epoch-day arithmetic), every oracle
composed from the primitive's own SQL so the derivation sits under the
cross-engine value hash. No reference analog (SURVEY.md §2.3 — the
reference delegates analytics to Oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import load_events
from .docs_source import load_docs
from . import dedup as D
from . import textprep as TP
from . import textstats as TS


# ---------------------------------------------------------------------------
# documents ↔ embeddings referential coverage
# ---------------------------------------------------------------------------


def doc_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(status, n_rows): 'both' / 'doc_only' / 'emb_only' counts from a
    full-outer id join of the documents and embeddings tables — the
    referential-integrity screen a multimodal pipeline runs before any
    join-dependent stage (a nonzero doc_only means un-embedded text;
    emb_only means orphaned vectors whose source doc was filtered).

    Plan: one shuffle join on the id, one 3-row groupBy."""
    from .emb_source import load_embeddings

    d = load_docs(spark, sf_dir).select(F.col("doc_id").alias("id"))
    e = load_embeddings(spark, sf_dir).select(F.col("vec_id").alias("id"))
    j = d.withColumn("has_doc", F.lit(1)).join(
        e.withColumn("has_emb", F.lit(1)), "id", "full_outer"
    )
    status = (
        F.when(F.col("has_doc").isNotNull() & F.col("has_emb").isNotNull(), "both")
        .when(F.col("has_doc").isNotNull(), "doc_only")
        .otherwise("emb_only")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


DOC_EMBEDDING_COVERAGE_SQL = """
WITH j AS (
  SELECT CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL THEN 'both'
              WHEN d.doc_id IS NOT NULL THEN 'doc_only'
              ELSE 'emb_only' END AS status
  FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT status, COUNT(*) AS n_rows FROM j GROUP BY status ORDER BY status
"""


# ---------------------------------------------------------------------------
# session length histogram
# ---------------------------------------------------------------------------


def session_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(len_bitlen, n_sessions): session sizes in power-of-two buckets
    (bitlen of the per-session event count) — the engagement-shape
    histogram that distinguishes drive-by traffic (all mass at bitlen 1)
    from session-heavy products, without materializing per-session rows
    anywhere downstream.

    Plan: the batch sessionizer's single user-keyed shuffle, then a
    |buckets|-row groupBy."""
    from .analytics import events_sessionize

    s = events_sessionize(spark, sf_dir)
    return (
        s.select(
            F.expr("CAST(length(bin(n_events)) AS BIGINT)").alias("len_bitlen")
        )
        .groupBy("len_bitlen")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("len_bitlen")
    )


def _session_length_histogram_sql() -> str:
    from .analytics import EVENTS_SESSIONIZE_SQL

    base = EVENTS_SESSIONIZE_SQL.replace("ORDER BY user_id, session_seq", "")
    return f"""
WITH s AS ({base})
SELECT CAST(length(bin(n_events)) AS BIGINT) AS len_bitlen,
       COUNT(*) AS n_sessions
FROM s GROUP BY 1 ORDER BY 1
"""


SESSION_LENGTH_HISTOGRAM_SQL = _session_length_histogram_sql()


# ---------------------------------------------------------------------------
# quality × near-dup contingency
# ---------------------------------------------------------------------------


def quality_vs_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(passes, is_dup_loser, n_docs, lift_ppm): the 2×2 contingency of
    Gopher quality against near-duplicate-loser status, with the
    independence lift in ppm (n·N·1e6 div (row_total·col_total)) — the
    one-table answer to "does our quality filter already remove the
    duplicates?" (lift ≫ 1e6 on the fail/loser cell means yes, the two
    filters overlap and the dedup budget can shrink).

    Plan: quality_gopher's linear pass, the driver-memoized verified
    pair list for the loser set (broadcast — it is dedup OUTPUT sized),
    a 4-row groupBy, and broadcast row/column totals. Integer-exact."""
    q = TP.quality_gopher(spark, sf_dir).select("doc_id", "passes")
    losers = (
        D.verified_pairs_cached(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("l", F.lit(1))
    )
    flags = q.join(F.broadcast(losers), "doc_id", "left").select(
        "passes", F.col("l").isNotNull().alias("is_dup_loser")
    )
    cells = flags.groupBy("passes", "is_dup_loser").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    rows = flags.groupBy("passes").agg(F.count(F.lit(1)).alias("row_tot"))
    cols = flags.groupBy("is_dup_loser").agg(F.count(F.lit(1)).alias("col_tot"))
    tot = flags.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        cells.join(F.broadcast(rows), "passes")
        .join(F.broadcast(cols), "is_dup_loser")
        .crossJoin(F.broadcast(tot))
        .select(
            "passes",
            "is_dup_loser",
            "n_docs",
            F.expr(
                "(CAST(n_docs AS DECIMAL(38,0)) * n_tot * 1000000)"
                " div (CAST(row_tot AS DECIMAL(38,0)) * col_tot)"
            )
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy("passes", "is_dup_loser")
    )


def _quality_vs_dup_sql() -> str:
    gopher = TP.QUALITY_GOPHER_SQL.replace("ORDER BY doc_id", "")
    verified = D.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH g AS ({gopher}),
v AS ({verified}),
losers AS (SELECT DISTINCT doc_b AS doc_id FROM v),
flags AS (
  SELECT g.passes, l.doc_id IS NOT NULL AS is_dup_loser
  FROM g LEFT JOIN losers l USING (doc_id)
),
cells AS (
  SELECT passes, is_dup_loser, COUNT(*) AS n_docs
  FROM flags GROUP BY 1, 2
),
rt AS (SELECT passes, COUNT(*) AS row_tot FROM flags GROUP BY 1),
ct AS (SELECT is_dup_loser, COUNT(*) AS col_tot FROM flags GROUP BY 1),
tt AS (SELECT COUNT(*) AS n_tot FROM flags)
SELECT c.passes, c.is_dup_loser, c.n_docs,
       CAST((CAST(c.n_docs AS HUGEINT) * n_tot * 1000000)
            // (CAST(row_tot AS HUGEINT) * col_tot) AS BIGINT) AS lift_ppm
FROM cells c JOIN rt USING (passes) JOIN ct USING (is_dup_loser), tt
ORDER BY c.passes, c.is_dup_loser
"""


QUALITY_VS_DUP_MATRIX_SQL = _quality_vs_dup_sql()


# ---------------------------------------------------------------------------
# token budget share per language
# ---------------------------------------------------------------------------


def token_share_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, total_tokens, share_ppm): the labeled-language
    token budget table — what fraction of the corpus' training tokens
    each language contributes (the input to any multilingual sampling-
    temperature decision; the temperature itself needs float pow and
    lives outside the hash gate).

    Plan: row-local token counts, one |langs|-row groupBy, a 1-row
    grand-total broadcast."""
    t = TS.token_count(spark, sf_dir).select("doc_id", "ws_tokens")
    d = load_docs(spark, sf_dir).select("doc_id", "lang")
    per = (
        d.join(t, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("total_tokens"),
        )
    )
    tot = per.agg(F.sum("total_tokens").alias("grand"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            # DECIMAL(38,0): total_tokens·1e6 exceeds int64 once the
            # corpus passes ~9e12 tokens — a 100 TB certainty
            F.expr(
                "CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000)"
                " div grand AS LONG)"
            ).alias("share_ppm"),
        )
        .orderBy("lang")
    )


TOKEN_SHARE_BY_LANG_SQL = """
WITH t AS (
  SELECT lang,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
              AS BIGINT) AS ws_tokens
  FROM documents
),
per AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens
  FROM t GROUP BY lang
),
tot AS (SELECT SUM(total_tokens) AS grand FROM per)
SELECT lang, n_docs, total_tokens,
       CAST((CAST(total_tokens AS HUGEINT) * 1000000) // grand AS BIGINT)
         AS share_ppm
FROM per, tot
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# click→purchase conversion by hour
# ---------------------------------------------------------------------------

CONV_HORIZON_US = 3_600_000_000  # attribute a purchase to a click ≤ 1h prior


def conversion_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_epoch, n_purchases, n_converted, conv_ppm): per purchase
    hour, how many purchases had an attributable click (latest prior
    click within {CONV_HORIZON_US // 3_600_000_000}h) — the conversion
    dashboard the attribution join exists to feed.

    Plan: rides the batch as-of join; one |hours|-row groupBy."""
    from . import temporal as TM

    att = TM.asof_attribution(spark, sf_dir)
    hour = (F.floor(F.col("purchase_ts_us") / 3_600_000_000) * 3600).cast("long")
    converted = (
        F.col("click_id").isNotNull() & (F.col("gap_us") <= CONV_HORIZON_US)
    ).cast("long")
    return (
        att.groupBy(hour.alias("hour_epoch"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(converted).alias("n_converted"),
        )
        .select(
            "hour_epoch",
            "n_purchases",
            F.col("n_converted").cast("long").alias("n_converted"),
            F.expr("(n_converted * 1000000) div n_purchases").alias("conv_ppm"),
        )
        .orderBy("hour_epoch")
    )


def _conversion_by_hour_sql() -> str:
    from .temporal import ASOF_ATTRIBUTION_SQL

    base = ASOF_ATTRIBUTION_SQL.replace("ORDER BY purchase_id", "")
    return f"""
WITH att AS ({base}),
agg AS (
  SELECT CAST(floor(purchase_ts_us / 3600000000) * 3600 AS BIGINT) AS hour_epoch,
         COUNT(*) AS n_purchases,
         SUM(CASE WHEN click_id IS NOT NULL AND gap_us <= {CONV_HORIZON_US}
             THEN 1 ELSE 0 END) AS n_converted
  FROM att GROUP BY 1
)
SELECT hour_epoch, n_purchases, CAST(n_converted AS BIGINT) AS n_converted,
       CAST((n_converted * 1000000) // n_purchases AS BIGINT) AS conv_ppm
FROM agg
ORDER BY hour_epoch
"""


CONVERSION_BY_HOUR_SQL = _conversion_by_hour_sql()


# ---------------------------------------------------------------------------
# write-shard balance audit
# ---------------------------------------------------------------------------


def shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, total_tokens, dev_ppm): per planned write shard,
    its token total and signed deviation from the perfectly-balanced
    share (total·N_SHARDS·1e6 div grand − 1e6) — the audit that proves
    (or falsifies) corpus_shard_plan's LPT balance claim on real data.
    |dev_ppm| is bounded by ~one max-document of tokens per shard.

    Plan: rides the shard plan's distributed global rank; one
    N_SHARDS-row groupBy + a 1-row broadcast."""
    from .evaluation import corpus_shard_plan, N_SHARDS

    p = corpus_shard_plan(spark, sf_dir)
    per = p.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe_ish_tokens").cast("long").alias("total_tokens"),
    )
    tot = per.agg(F.sum("total_tokens").alias("grand"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.expr(
                f"CAST((CAST(total_tokens AS DECIMAL(38,0)) * {N_SHARDS}"
                f" * 1000000) div grand - 1000000 AS LONG)"
            ).alias("dev_ppm"),
        )
        .orderBy("shard")
    )


def _shard_balance_sql() -> str:
    from .evaluation import CORPUS_SHARD_PLAN_SQL, N_SHARDS

    base = CORPUS_SHARD_PLAN_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH p AS ({base}),
per AS (
  SELECT shard, COUNT(*) AS n_docs,
         CAST(SUM(bpe_ish_tokens) AS BIGINT) AS total_tokens
  FROM p GROUP BY shard
),
tot AS (SELECT SUM(total_tokens) AS grand FROM per)
SELECT shard, n_docs, total_tokens,
       CAST((CAST(total_tokens AS HUGEINT) * {N_SHARDS} * 1000000) // grand
            - 1000000 AS BIGINT) AS dev_ppm
FROM per, tot
ORDER BY shard
"""


SHARD_BALANCE_REPORT_SQL = _shard_balance_sql()


# ---------------------------------------------------------------------------
# PQ codebook utilization
# ---------------------------------------------------------------------------


def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subq, code, n_vecs): how many vectors land on each centroid of
    each PQ subquantizer — the codebook-utilization report (a dead code
    wastes index bits; one hot code per subspace means the quantizer
    collapsed and recall will crater). The PQ twin of
    minhash_band_hitrates.

    Plan: the memoized PQ encode (row-local against the broadcast
    codebook), a PQ_M-way stack, one bounded groupBy."""
    from . import pq as PQ

    codes = PQ.embedding_pq_codes(spark, sf_dir)
    stack_args = ", ".join(f"{m}L, code_{m}" for m in range(PQ.PQ_M))
    return (
        codes.select(
            F.expr(f"stack({PQ.PQ_M}, {stack_args}) AS (subq, code)")
        )
        .groupBy("subq", "code")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("subq", "code")
    )


def _pq_code_histogram_sql() -> str:
    from . import pq as PQ

    base = PQ.EMBEDDING_PQ_CODES_SQL.replace("ORDER BY vec_id", "")
    arms = "\n  UNION ALL ".join(
        f"SELECT CAST({m} AS BIGINT) AS subq, code_{m} AS code FROM c"
        for m in range(PQ.PQ_M)
    )
    return f"""
WITH c AS ({base})
SELECT subq, code, COUNT(*) AS n_vecs
FROM ({arms})
GROUP BY subq, code
ORDER BY subq, code
"""


PQ_CODE_HISTOGRAM_SQL = _pq_code_histogram_sql()


# ---------------------------------------------------------------------------
# day-of-week × hour activity profile
# ---------------------------------------------------------------------------


def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dow, hour, n_events): the weekly activity heatmap — event counts
    per (day-of-week, hour-of-day) cell, with dow computed ARITHMETICALLY
    from the epoch day (epoch day 0 = Thursday → dow = (day+4) % 7,
    0 = Sunday) so both engines agree without any calendar/locale
    function.

    Plan: one partial-aggregated groupBy to ≤ 168 rows."""
    e = load_events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000")
    return (
        e.groupBy(
            ((day + 4) % 7).cast("long").alias("dow"),
            F.expr("(ts_us div 3600000000) % 24").cast("long").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("dow", "hour")
    )


EVENTS_DOW_HOUR_PROFILE_SQL = """
SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT) AS dow,
       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""
