"""PII detection / redaction over the ``documents`` table.

Row-local regexp scrubbing — the standard pre-training privacy pass
(emails, IPv4 addresses, phone-shaped numbers) — entirely in built-in
``regexp_count`` / ``regexp_replace``: no shuffle, no Python, full
whole-stage codegen. At 100 TB this is a pure map over the corpus scan.

The fixture documents contain no planted PII, so the query surface
injects a deterministic contact line into every 5th document before
scrubbing; that makes the redaction path observable (and oracle-checked)
on driver fixtures without touching the read-only test data. The
patterns are chosen to parse identically under Java regex (Spark) and
RE2 (DuckDB): character classes, bounded repetition and ``\\b`` only —
no backrefs or lookarounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def _with_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    contact = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.1.2."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call 555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )
    text = F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), contact)).otherwise(
        F.col("text")
    )
    return d.select("doc_id", text.alias("text"))


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_email, n_ip, n_phone, clean_text): per-doc PII counts
    and the scrubbed text (email -> <EMAIL>, IPv4 -> <IP>,
    phone -> <PHONE>, applied in that order)."""
    d = _with_contacts(spark, sf_dir)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count("text", F.lit(IPV4_RE)).cast("long").alias("n_ip"),
        F.regexp_count("text", F.lit(PHONE_RE)).cast("long").alias("n_phone"),
        clean.alias("clean_text"),
    ).orderBy("doc_id")


PII_REDACT_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com from 10.1.2.' || CAST(doc_id % 250 AS VARCHAR)
                   || ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phone,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM d
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

KANON_BAND_CENTS = 100_000  # $1000 account-balance bands
KANON_K = 5  # the k in "k-anonymous"


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_size, n_groups, n_rows, at_risk): the k-anonymity audit of
    the customer table under the quasi-identifier (nation, market
    segment, $1000 account-balance band) — for each equivalence-class
    size, how many classes and rows have it, flagged ``at_risk`` when
    the size is below k={KANON_K}. min(group_size) IS the table's
    k-anonymity; the at_risk row mass is what a generalization ladder
    (coarser bands, merged segments) must eliminate before release.

    Plan: one groupBy over the QI tuple (banded via exact integer cents
    arithmetic so both engines agree on band edges), then a
    count-of-counts reduce — the same two-agg shape as any histogram,
    corpus-scan-bound at 100 TB."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    band = F.expr(
        f"CAST(floor(c_acctbal * 100) AS LONG) div {KANON_BAND_CENTS}"
    )
    qi = c.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        "c_mktsegment",
        band.alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    return (
        qi.groupBy("group_size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_rows"),
        )
        .select(
            "group_size",
            "n_groups",
            "n_rows",
            (F.col("group_size") < KANON_K).alias("at_risk"),
        )
        .orderBy("group_size")
    )


K_ANONYMITY_REPORT_SQL = f"""
WITH qi AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment,
         CAST(floor(c_acctbal * 100) AS BIGINT) // {KANON_BAND_CENTS}
           AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT group_size,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(group_size) AS BIGINT) AS n_rows,
       group_size < {KANON_K} AS at_risk
FROM qi
GROUP BY group_size
ORDER BY group_size
"""
