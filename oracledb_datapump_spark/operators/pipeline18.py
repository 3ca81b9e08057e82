"""Pipeline dashboards, batch 19: one-pass privacy generalization
search, the native session-window operator under the cross-engine hash,
process-mining conformance rules, and the Heaps-law vocabulary growth
curve.

Extension operators past the reference surface (SURVEY.md §2 maps the
reference's inventory; the reference delegates all query processing to
Oracle SQL).

- ``k_anon_generalization_ladder``: the privacy officer's question is
  not "is this k-anonymous" (``k_anonymity_report``) but "how much do I
  have to coarsen until it is". The generalization ladder (drop the
  rightmost quasi-identifier per level) is exactly SQL ROLLUP, so every
  level's group-size profile comes from ONE aggregation pass with
  GROUPING_ID separating the levels.
- ``session_window_builtin``: Spark's native ``session_window``
  operator (batch mode) hash-proved equivalent to the relational
  gap-islands formulation the rest of the repo uses — the boundary
  probe shows a gap of exactly 30min MERGES (new session strictly on
  gap > g), matching ``events_sessionize``'s convention.
- ``process_conformance_report``: declarative process-mining rules
  over the event log (purchase-requires-prior-signup,
  click-requires-view-in-session, no error→purchase adjacency), each
  reported as checked/violations/ppm — the conformance-checking side
  of the sessionizer family.
- ``vocab_growth_curve``: Heaps' law — vocabulary size as a function
  of corpus prefix size, from each token's FIRST document only (one
  groupBy(token) min + a document rank), never a per-prefix re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

# -- k-anonymity generalization ladder ---------------------------------------

K_ANON_TARGET = 10


def k_anon_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(level, qi_cols, n_groups, min_group_size, satisfies_k): the
    generalization ladder over customer quasi-identifiers — level 0 =
    (nation, segment, acctbal-100-band), each next level drops the
    rightmost QI, level 3 = fully generalized. For each level the
    minimum equivalence-class size and whether it meets
    k ≥ {K_ANON_TARGET}; the release policy picks the smallest level
    with satisfies_k = true.

    Plan at 100 TB: the whole ladder is ONE ROLLUP aggregate (Spark
    expands levels map-side; the shuffle carries one partial count per
    (level, group)) followed by a ≤|groups|-row groupBy(level) min.
    Never one scan per level. The acctbal band shifts by +1e6 before
    the integer divide so Spark's truncating div and DuckDB's flooring
    // agree on negative balances."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) div 10000"
        ).alias("bal_band"),
    )
    groups = c.rollup("nation", "segment", "bal_band").agg(
        F.count(F.lit(1)).alias("cnt"), F.grouping_id().alias("gid")
    )
    names = F.when(F.col("gid") == 0, "nation,segment,bal_band").when(
        F.col("gid") == 1, "nation,segment"
    ).when(F.col("gid") == 3, "nation").otherwise("(all)")
    lvl = (
        F.when(F.col("gid") == 0, 0)
        .when(F.col("gid") == 1, 1)
        .when(F.col("gid") == 3, 2)
        .otherwise(3)
    )
    return (
        groups.groupBy(lvl.alias("level"), names.alias("qi_cols"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("cnt").cast("long").alias("min_group_size"),
        )
        .select(
            F.col("level").cast("long"),
            "qi_cols",
            "n_groups",
            "min_group_size",
            (F.col("min_group_size") >= K_ANON_TARGET).alias("satisfies_k"),
        )
        .orderBy("level")
    )


K_ANON_LADDER_SQL = f"""
WITH qi AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 10000
           AS bal_band
  FROM customer
),
groups_ AS (
  SELECT nation, segment, bal_band, COUNT(*) AS cnt,
         GROUPING(nation) * 4 + GROUPING(segment) * 2 + GROUPING(bal_band)
           AS gid
  FROM qi GROUP BY ROLLUP (nation, segment, bal_band)
)
SELECT CAST(CASE gid WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 3 THEN 2
            ELSE 3 END AS BIGINT) AS level,
       CASE gid WHEN 0 THEN 'nation,segment,bal_band'
                WHEN 1 THEN 'nation,segment'
                WHEN 3 THEN 'nation' ELSE '(all)' END AS qi_cols,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(cnt) AS BIGINT) AS min_group_size,
       MIN(cnt) >= {K_ANON_TARGET} AS satisfies_k
FROM groups_
GROUP BY gid
ORDER BY level
"""


# -- native session_window parity --------------------------------------------

SW_GAP = "30 minutes"
SW_GAP_US = 1_800_000_000


def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_sessions, n_events, longest_us, max_events): per-user
    session stats computed with Spark's NATIVE ``session_window``
    operator in batch mode — the one-line declarative form of the
    lag/cumsum islands pattern ``events_sessionize`` hand-builds. The
    DuckDB oracle IS that islands formulation, so the driver hash
    proves the two semantics identical on real data (the boundary
    probe: an event at exactly last+{SW_GAP} MERGES — a new session
    starts strictly on gap > {SW_GAP}, the same convention as the
    manual sessionizer).

    Plan: session_window is a native aggregate — one user-keyed
    shuffle, state merged map-side; the per-user rollup runs over
    ≤|sessions| rows. At 100 TB it is the SAME shuffle as the manual
    pattern, minus one window pass."""
    from ..events_source import load_events, pin_utc

    pin_utc(spark)
    e = load_events(spark, sf_dir).select(
        "user_id", F.expr("timestamp_micros(ts_us)").alias("ts")
    )
    sess = e.groupBy("user_id", F.session_window("ts", SW_GAP)).agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.expr("unix_micros(max(ts)) - unix_micros(min(ts))").alias("span_us"),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_ev").cast("long").alias("n_events"),
            F.max("span_us").cast("long").alias("longest_us"),
            F.max("n_ev").cast("long").alias("max_events"),
        )
        .orderBy("user_id")
    )


SESSION_WINDOW_BUILTIN_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SW_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS sid
  FROM flagged
),
per AS (
  SELECT user_id, sid, COUNT(*) AS n_ev,
         MAX(ts_us) - MIN(ts_us) AS span_us
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(MAX(span_us) AS BIGINT) AS longest_us,
       CAST(MAX(n_ev) AS BIGINT) AS max_events
FROM per
GROUP BY user_id
ORDER BY user_id
"""


# -- process-mining conformance ----------------------------------------------


def process_conformance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule, n_checked, n_violations, violation_ppm): declarative
    conformance rules over the event log — the process-mining audit
    that catches instrumentation bugs and broken funnels:

    - ``purchase_requires_signup``: checked = purchasing users;
      violation = first purchase strictly before first signup, or no
      signup at all.
    - ``click_requires_view``: checked = clicks; violation = a click
      with no view EARLIER OR SIMULTANEOUS in the same 30-min session
      (running view count window, ties by (ts, event_id) order).
    - ``no_error_then_purchase``: checked = adjacent within-session
      event pairs; violation = an error immediately followed by a
      purchase.

    Plan: ONE user-keyed shuffle builds sessions (the shared lag/cumsum
    pattern); every rule is then windows + conditional sums over the
    sessionized frame; the report is three one-row aggregates unioned.
    No per-rule re-scan of events."""
    from ..events_source import load_events

    e = load_events(spark, sf_dir).select("user_id", "event_id", "ts_us", "event_type")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    sess = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    ).withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))

    # rule 1: user-level first-timestamp comparison
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias(
            "first_purchase"
        ),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).alias(
            "first_signup"
        ),
    )
    r1 = firsts.filter(F.col("first_purchase").isNotNull()).agg(
        F.lit("purchase_requires_signup").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(
            (
                F.col("first_signup").isNull()
                | (F.col("first_purchase") < F.col("first_signup"))
            ).cast("long")
        )
        .cast("long")
        .alias("n_violations"),
    )

    ws = W.partitionBy("user_id", "sid").orderBy("ts_us", "event_id")
    enriched = sess.withColumn(
        "views_so_far",
        F.sum((F.col("event_type") == "view").cast("long")).over(
            ws.rowsBetween(W.unboundedPreceding, 0)
        ),
    ).withColumn("next_type", F.lead("event_type").over(ws))
    r2 = enriched.filter(F.col("event_type") == "click").agg(
        F.lit("click_requires_view").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum((F.col("views_so_far") == 0).cast("long"))
        .cast("long")
        .alias("n_violations"),
    )
    r3 = enriched.filter(F.col("next_type").isNotNull()).agg(
        F.lit("no_error_then_purchase").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(
            (
                (F.col("event_type") == "error")
                & (F.col("next_type") == "purchase")
            ).cast("long")
        )
        .cast("long")
        .alias("n_violations"),
    )
    return (
        r1.unionByName(r2)
        .unionByName(r3)
        .select(
            "rule",
            "n_checked",
            "n_violations",
            F.expr(
                "CAST(n_violations * 1000000 div greatest(n_checked, 1)"
                " AS BIGINT)"
            ).alias("violation_ppm"),
        )
        .orderBy("rule")
    )


PROCESS_CONFORMANCE_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN ts_us END)
           AS first_purchase,
         MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS first_signup
  FROM e GROUP BY user_id
),
flagged AS (
  SELECT user_id, event_id, ts_us, event_type,
         CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sid
  FROM flagged
),
enriched AS (
  SELECT *,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, sid ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS views_so_far,
         LEAD(event_type) OVER (PARTITION BY user_id, sid
                                ORDER BY ts_us, event_id) AS next_type
  FROM sess
),
arms AS (
  SELECT 'purchase_requires_signup' AS rule, COUNT(*) AS n_checked,
         SUM(CASE WHEN first_signup IS NULL
                    OR first_purchase < first_signup
                  THEN 1 ELSE 0 END) AS n_violations
  FROM firsts WHERE first_purchase IS NOT NULL
  UNION ALL
  SELECT 'click_requires_view', COUNT(*),
         SUM(CASE WHEN views_so_far = 0 THEN 1 ELSE 0 END)
  FROM enriched WHERE event_type = 'click'
  UNION ALL
  SELECT 'no_error_then_purchase', COUNT(*),
         SUM(CASE WHEN event_type = 'error' AND next_type = 'purchase'
                  THEN 1 ELSE 0 END)
  FROM enriched WHERE next_type IS NOT NULL
)
SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_violations * 1000000 // GREATEST(n_checked, 1) AS BIGINT)
         AS violation_ppm
FROM arms
ORDER BY rule
"""


# -- Heaps-law vocabulary growth ---------------------------------------------

def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, docs_cum, n_new_tokens, vocab_size): Heaps' law — the
    vocabulary size after reading the first 1, 3, 7, …, 2^s−1 documents
    in doc_id order (doubling prefixes: linear deciles are blind here —
    a synthetic or template-heavy corpus exhausts its vocabulary inside
    the first percent, which is itself the finding). A healthy
    natural-language corpus keeps discovering tokens (V ∝ n^β, β≈0.5);
    a curve that flattens after step 5 means template duplication or a
    closed vocabulary.

    Plan at 100 TB: a token's contribution depends only on its FIRST
    document — one token explode + groupBy(tok) min(doc_id) (the zipf
    shuffle), one distributed rank of doc_ids (range-partition helper,
    no single-partition window over the corpus), a rank join, and the
    curve itself is a ≤log₂(n_docs)-row cumulative window. Never a
    per-prefix re-scan (log n scans of a 100 TB corpus is the naive
    formulation). ``step = bitlen(rank)`` is the established
    cross-engine log2 proxy (length(bin(x)) in both engines)."""
    from ..functions.global_order import with_global_order_stat
    from ..functions.text import tokens as _tokens
    from .docs_source import load_docs

    d = load_docs(spark, sf_dir)
    first_doc = (
        d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    ranked, n_docs = with_global_order_stat(
        d.select("doc_id"), [F.col("doc_id")], out="rk"
    )
    steps = (
        first_doc.join(
            ranked.select(
                F.col("doc_id").alias("first_doc"), "rk"
            ),
            "first_doc",
        )
        .groupBy(F.expr("CAST(length(bin(rk)) AS BIGINT)").alias("step"))
        .agg(F.count(F.lit(1)).alias("n_new_tokens"))
    )
    wc = W.orderBy("step").rowsBetween(W.unboundedPreceding, 0)
    return (
        steps.withColumn("vocab_size", F.sum("n_new_tokens").over(wc))
        .select(
            "step",
            F.expr(f"least(shiftleft(1, CAST(step AS INT)) - 1, {n_docs})")
            .cast("long")
            .alias("docs_cum"),
            F.col("n_new_tokens").cast("long"),
            F.col("vocab_size").cast("long"),
        )
        .orderBy("step")
    )


def _vocab_growth_sql() -> str:
    from ..functions.text import TOKEN_SPLIT_RE

    return f"""
WITH first_doc AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM (
    SELECT doc_id, unnest(list_filter(
      string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != ''))
        AS tok
    FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rk FROM documents
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
steps AS (
  SELECT CAST(length(bin(r.rk)) AS BIGINT) AS step,
         COUNT(*) AS n_new_tokens
  FROM first_doc f
  JOIN ranked r ON r.doc_id = f.first_doc
  GROUP BY 1
)
SELECT step,
       CAST(LEAST((1::BIGINT << CAST(step AS INT)) - 1,
                  (SELECT n_docs FROM n)) AS BIGINT) AS docs_cum,
       CAST(n_new_tokens AS BIGINT) AS n_new_tokens,
       CAST(SUM(n_new_tokens) OVER (ORDER BY step
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM steps
ORDER BY step
"""


VOCAB_GROWTH_CURVE_SQL = _vocab_growth_sql()
