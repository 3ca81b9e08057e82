"""Pipeline QA dashboards, batch 4 (round 6; queued behind the
pipeline2 batch for the round-7 gated prefix — hash-verified locally at
both fixture scales by tests/test_queries_oracle.py until then).

- ``event_transition_gaps``     (prev_type → type) latency histogram
- ``repeat_purchase_gaps``      inter-purchase gap histogram per user
- ``quality_length_moments``    integer moment sums: doc length × quality
- ``prefix_collision_histogram`` 64-char-prefix exact-dup candidate sizes
- ``hourly_event_dups``         within-hour exact duplicate event screen
- ``payload_k_band_profile``    JSON payload value bands per event type
- ``orders_backlog_timeline``   placed-vs-completed cumulative backlog
- ``mktsegment_yoy``            per-segment yearly revenue + YoY delta
- ``embedding_dim_profile``     per-dimension quantized moment profile
- ``pq_subspace_error``         PQ quantization error per subquantizer

Same contracts as operators/pipeline.py: every statistic integer-exact
(ppm divisions on non-negative operands only — Spark ``div`` truncates
toward zero while DuckDB ``//`` floors, so signed ratios are emitted as
sign(x)·(|x|·1e6 div y); bitlen log2 proxies; epoch-us arithmetic),
every oracle composed from the primitive's own SQL so the derivation
sits under the cross-engine value hash. No reference analog (SURVEY.md
§2.3 — the reference delegates analytics to Oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..events_source import load_events
from .docs_source import load_docs
from ..functions.text import TOKEN_SPLIT_RE


# ---------------------------------------------------------------------------
# event transition latency histogram
# ---------------------------------------------------------------------------


def event_transition_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, event_type, gap_ms_bitlen, n_transitions): for every
    consecutive event pair within a user's stream, the transition edge
    and the bitlen (power-of-two bucket) of its latency in ms — the
    funnel-latency heatmap behind "how long after a view does the click
    come", without picking a step list up front.

    Plan: ONE user-keyed shuffle for the lag window (the same partition
    profile as the sessionizer — at 100 TB this is the unavoidable
    shuffle of any per-user sequence op), then a ≤|types|²·64-row
    groupBy. Ties inside a timestamp are ordered by event_id, so the
    lag is deterministic under the cross-engine hash."""
    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    ).where(F.col("prev_type").isNotNull())
    return (
        g.select(
            "prev_type",
            "event_type",
            F.expr("CAST(length(bin(gap_us div 1000)) AS BIGINT)").alias(
                "gap_ms_bitlen"
            ),
        )
        .groupBy("prev_type", "event_type", "gap_ms_bitlen")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "event_type", "gap_ms_bitlen")
    )


EVENT_TRANSITION_GAPS_SQL = """
WITH g AS (
  SELECT event_type,
         LAG(event_type) OVER w AS prev_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type, event_type,
       CAST(length(bin(gap_us // 1000)) AS BIGINT) AS gap_ms_bitlen,
       COUNT(*) AS n_transitions
FROM g WHERE prev_type IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# inter-purchase gap histogram
# ---------------------------------------------------------------------------


def repeat_purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gap_s_bitlen, n_gaps, n_users): the repeat-purchase cadence
    histogram — for users with ≥2 purchases, the bitlen bucket of each
    consecutive inter-purchase gap in seconds, plus how many distinct
    users contributed to the bucket.

    Plan: filter pushed to the scan (event_type = 'purchase' prunes
    ~4/5 of the table before the shuffle), one user-keyed lag window,
    a ≤64-row groupBy with a distinct-user count."""
    e = load_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = e.select(
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        g.select(
            "user_id",
            F.expr("CAST(length(bin(gap_us div 1000000)) AS BIGINT)").alias(
                "gap_s_bitlen"
            ),
        )
        .groupBy("gap_s_bitlen")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("gap_s_bitlen")
    )


REPEAT_PURCHASE_GAPS_SQL = """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM p
)
SELECT CAST(length(bin(gap_us // 1000000)) AS BIGINT) AS gap_s_bitlen,
       COUNT(*) AS n_gaps,
       COUNT(DISTINCT user_id) AS n_users
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# doc length × quality integer moments
# ---------------------------------------------------------------------------


def quality_length_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, sum_len, sum_q, sum_ll, sum_qq, sum_lq,
    corr_sign): per source, the exact integer moment sums of document
    length (chars) against an integer quality proxy (type-token ratio in
    ppm: distinct_tokens·1e6 div tokens), plus the sign of the
    covariance n·Σlq − Σl·Σq — enough to reconstruct Pearson r offline
    while keeping every gated value integer-exact. The moment-sums
    pattern is the same map-side-combinable shape the PCA gram matrix
    uses: one linear pass, one |sources|-row reduce.

    Sums accumulate in DECIMAL(38,0) before the BIGINT cast: at 100 TB
    Σ(len·q_ppm) exceeds int64 (len~1e3 × 1e6 ppm × 1e11 docs)."""
    d = load_docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower("text"), TOKEN_SPLIT_RE), lambda t: t != "")
    base = d.select(
        "source",
        F.length("text").cast("long").alias("len"),
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_dis"),
    ).where(F.col("n_tok") > 0)
    q = F.expr("(n_dis * 1000000) div n_tok")
    m = base.select(
        "source",
        F.col("len"),
        q.alias("q"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dec("len")).alias("dsl"),
        F.sum(dec("q")).alias("dsq"),
        F.sum(dec("len") * dec("len")).alias("dll"),
        F.sum(dec("q") * dec("q")).alias("dqq"),
        F.sum(dec("len") * dec("q")).alias("dlq"),
    )
    cov = F.col("n_docs").cast("decimal(38,0)") * F.col("dlq") - F.col(
        "dsl"
    ) * F.col("dsq")
    return agg.select(
        "source",
        "n_docs",
        F.col("dsl").cast("long").alias("sum_len"),
        F.col("dsq").cast("long").alias("sum_q"),
        F.col("dll").cast("long").alias("sum_ll"),
        F.col("dqq").cast("long").alias("sum_qq"),
        F.col("dlq").cast("long").alias("sum_lq"),
        F.when(cov > 0, F.lit(1))
        .when(cov < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("corr_sign"),
    ).orderBy("source")


QUALITY_LENGTH_MOMENTS_SQL = f"""
WITH t AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS len,
         len(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
             x -> x != '')) AS n_tok,
         len(list_distinct(list_filter(
             string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
             x -> x != ''))) AS n_dis
  FROM documents
),
m AS (
  SELECT source, len, (n_dis * 1000000) // n_tok AS q
  FROM t WHERE n_tok > 0
),
agg AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(CAST(len AS HUGEINT)) AS dsl,
         SUM(CAST(q AS HUGEINT)) AS dsq,
         SUM(CAST(len AS HUGEINT) * len) AS dll,
         SUM(CAST(q AS HUGEINT) * q) AS dqq,
         SUM(CAST(len AS HUGEINT) * q) AS dlq
  FROM m GROUP BY source
)
SELECT source, n_docs,
       CAST(dsl AS BIGINT) AS sum_len,
       CAST(dsq AS BIGINT) AS sum_q,
       CAST(dll AS BIGINT) AS sum_ll,
       CAST(dqq AS BIGINT) AS sum_qq,
       CAST(dlq AS BIGINT) AS sum_lq,
       CAST(CASE WHEN CAST(n_docs AS HUGEINT) * dlq - dsl * dsq > 0 THEN 1
                 WHEN CAST(n_docs AS HUGEINT) * dlq - dsl * dsq < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS corr_sign
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# prefix-collision histogram (exact-substring dedup candidate screen)
# ---------------------------------------------------------------------------

PREFIX_LEN = 64


def prefix_collision_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_size, n_prefixes, n_docs): how many {PREFIX_LEN}-char
    lowercased text prefixes are shared by exactly s documents — the
    cheap exact-substring-dup candidate screen (the suffix-array
    first-pass of "Deduplicating Training Data Makes Language Models
    Better" collapsed to its prefix-bucket histogram). A heavy tail at
    group_size ≥ 2 routes those buckets into the byte-exact verifier.

    Plan: one groupBy on the prefix (the only full shuffle — key
    cardinality ≈ |corpus|, the same profile as dedup_exact), then a
    ≤64-row size histogram."""
    d = load_docs(spark, sf_dir)
    g = (
        d.select(F.substring(F.lower("text"), 1, PREFIX_LEN).alias("pfx"))
        .groupBy("pfx")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return (
        g.groupBy(F.col("s").alias("group_size"))
        .agg(
            F.count(F.lit(1)).alias("n_prefixes"),
            F.sum("s").cast("long").alias("n_docs"),
        )
        .orderBy("group_size")
    )


PREFIX_COLLISION_HISTOGRAM_SQL = f"""
WITH g AS (
  SELECT substr(lower(text), 1, {PREFIX_LEN}) AS pfx, COUNT(*) AS s
  FROM documents GROUP BY 1
)
SELECT s AS group_size, COUNT(*) AS n_prefixes,
       CAST(SUM(s) AS BIGINT) AS n_docs
FROM g GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# within-hour exact duplicate event screen
# ---------------------------------------------------------------------------


def hourly_event_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_epoch, n_events, n_dup_events): per hour, total events and
    how many are exact duplicates of an earlier event in the same hour
    (same user, type, payload) — the at-least-once-delivery screen a
    streaming ingest runs before counting anything. n_dup = Σ(c−1) over
    identity cells, computed as n − |cells| so the duplicate count
    never materializes per-event rows.

    Plan: one groupBy on (hour, user, type, props) with map-side
    partial agg (duplicates collapse in the combiner — the same
    de-skew argument as span_dup_score), then a |hours|-row rollup."""
    e = load_events(spark, sf_dir)
    hour = (F.expr("ts_us div 3600000000") * 3600).cast("long")
    cells = (
        e.groupBy(
            hour.alias("hour_epoch"), "user_id", "event_type", "props"
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cells.groupBy("hour_epoch")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_dup_events"),
        )
        .orderBy("hour_epoch")
    )


HOURLY_EVENT_DUPS_SQL = """
WITH cells AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
         user_id, event_type, props, COUNT(*) AS c
  FROM events GROUP BY 1, 2, 3, 4
)
SELECT CAST(hour_epoch AS BIGINT) AS hour_epoch,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_events
FROM cells GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# JSON payload value bands per event type
# ---------------------------------------------------------------------------


def payload_k_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, k_band, n_events, sum_k): the payload-value
    distribution dashboard — events bucketed by event type and the
    decade band (k div 10) of their JSON payload's `k` field
    (get_json_object ≡ DuckDB json_extract_string, the contract
    events_json_stats already pins); missing/unparsable payloads land
    in band −1 so ingest corruption is visible instead of dropped.

    Plan: row-local JSON extraction, one bounded groupBy
    (|types| × ~11 bands)."""
    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    t = e.select("event_type", k.alias("k"))
    band = F.when(F.col("k").isNull(), F.lit(-1)).otherwise(
        F.expr("k div 10")
    )
    return (
        t.select(
            "event_type",
            band.cast("long").alias("k_band"),
            F.coalesce(F.col("k"), F.lit(0)).alias("k"),
        )
        .groupBy("event_type", "k_band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
        )
        .orderBy("event_type", "k_band")
    )


PAYLOAD_K_BAND_PROFILE_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CASE WHEN k IS NULL THEN -1 ELSE k // 10 END AS k_band,
       COUNT(*) AS n_events,
       CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# order backlog timeline
# ---------------------------------------------------------------------------


def orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, n_placed, n_done, backlog): per calendar month, orders
    placed, orders completed (last lineitem shipped), and the running
    placed-minus-completed backlog — the classic open-interval
    accumulation that SQL window engines (and the reference's Oracle
    target) express as a cumulative sum over event deltas.

    Plan: the lineitem max-shipdate agg is the one big shuffle
    (orderkey-keyed, map-side combinable); the delta union and the
    cumulative window then run over |months| rows (~84) — the
    single-partition window is bounded by the calendar, not the data.
    Orders with no lineitem stay open forever (left join)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    done = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done_ts"))
    ym = lambda c: (F.year(c) * 100 + F.month(c)).cast("long")  # noqa: E731
    j = o.join(done, o.o_orderkey == done.l_orderkey, "left").select(
        ym("o_orderdate").alias("placed_ym"), ym("done_ts").alias("done_ym")
    )
    deltas = j.select(
        F.col("placed_ym").alias("ym"), F.lit(1).alias("p"), F.lit(0).alias("d")
    ).unionAll(
        j.where(F.col("done_ym").isNotNull()).select(
            F.col("done_ym").alias("ym"), F.lit(0).alias("p"), F.lit(1).alias("d")
        )
    )
    per = deltas.groupBy("ym").agg(
        F.sum("p").cast("long").alias("n_placed"),
        F.sum("d").cast("long").alias("n_done"),
    )
    w = W.orderBy("ym").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per.select(
        "ym",
        "n_placed",
        "n_done",
        (F.sum("n_placed").over(w) - F.sum("n_done").over(w))
        .cast("long")
        .alias("backlog"),
    ).orderBy("ym")


ORDERS_BACKLOG_TIMELINE_SQL = """
WITH done AS (
  SELECT l_orderkey, MAX(l_shipdate) AS done_ts FROM lineitem GROUP BY 1
),
j AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS placed_ym,
         CAST(year(done_ts) * 100 + month(done_ts) AS BIGINT) AS done_ym
  FROM orders o LEFT JOIN done ON o.o_orderkey = done.l_orderkey
),
deltas AS (
  SELECT placed_ym AS ym, 1 AS p, 0 AS d FROM j
  UNION ALL
  SELECT done_ym, 0, 1 FROM j WHERE done_ym IS NOT NULL
),
per AS (
  SELECT ym, CAST(SUM(p) AS BIGINT) AS n_placed,
         CAST(SUM(d) AS BIGINT) AS n_done
  FROM deltas GROUP BY ym
)
SELECT ym, n_placed, n_done,
       CAST(SUM(n_placed) OVER w - SUM(n_done) OVER w AS BIGINT) AS backlog
FROM per
WINDOW w AS (ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY ym
"""


# ---------------------------------------------------------------------------
# market-segment yearly revenue + YoY
# ---------------------------------------------------------------------------


def mktsegment_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(mktsegment, o_year, n_orders, rev_cents, yoy_ppm): yearly
    revenue per customer market segment with the signed year-over-year
    delta in ppm of the prior year. Revenue accumulates in
    DECIMAL(25,2) (exact, order-independent — the Q1 money recipe) and
    is emitted in integer cents; the YoY ratio is computed as
    sign(diff)·(|diff|·1e6 div prev) so truncation direction agrees
    across engines for revenue declines.

    Plan: one orders⋈customer shuffle join (both sides big at 100 TB —
    no broadcast), a |segments×years|-row agg, a lag window over that
    tiny frame."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(25,2)")) * 100)
            .cast("long")
            .alias("rev_cents"),
        )
    )
    w = W.partitionBy("mktsegment").orderBy("o_year")
    # sign convention matches the SQL CASE exactly: diff == 0 → +1 (a
    # signum() here would emit 0 and break the cross-engine hash)
    yoy = F.when(F.col("prev_cents").isNull(), F.lit(None).cast("long")).otherwise(
        F.when(F.col("rev_cents") >= F.col("prev_cents"), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        * F.expr(
            "CAST((abs(CAST(rev_cents AS DECIMAL(38,0)) - prev_cents) * 1000000)"
            " div prev_cents AS LONG)"
        )
    )
    return (
        per.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .select(
            "mktsegment",
            "o_year",
            "n_orders",
            "rev_cents",
            yoy.alias("yoy_ppm"),
        )
        .orderBy("mktsegment", "o_year")
    )


MKTSEGMENT_YOY_SQL = """
WITH per AS (
  SELECT c_mktsegment AS mktsegment,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT *, LAG(rev_cents) OVER (PARTITION BY mktsegment ORDER BY o_year)
           AS prev_cents
  FROM per
)
SELECT mktsegment, o_year, n_orders, rev_cents,
       CASE WHEN prev_cents IS NULL THEN NULL
            ELSE CAST(CASE WHEN rev_cents >= prev_cents THEN 1 ELSE -1 END
                 * ((abs(CAST(rev_cents AS HUGEINT) - prev_cents) * 1000000)
                    // prev_cents) AS BIGINT)
       END AS yoy_ppm
FROM lagged
ORDER BY mktsegment, o_year
"""


# ---------------------------------------------------------------------------
# per-dimension embedding profile
# ---------------------------------------------------------------------------

DIM_SCALE = 10_000_000  # the PQ quantization scale (pq.PQ_SCALE), int form


def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim, n_vecs, sum_q, min_q, max_q, sum_q2m): per embedding
    dimension, exact moments of the canonically quantized value
    (floor(x·1e7) — the same scale the PQ encoder pins): count, sum,
    min, max, and Σ((q²) div 1e6) (term-wise division keeps every
    operand non-negative, so trunc-vs-floor division cannot diverge and
    the per-term value fits int64 at any corpus size; the sum itself is
    DECIMAL-accumulated). Feeds whitening/dead-dimension decisions
    without a float anywhere under the hash.

    Plan: posexplode is row-local (64 rows out per vector), one
    64-row groupBy with map-side partial agg — the canonical
    narrow-then-reduce profile; no join, no window."""
    from .emb_source import load_embeddings

    e = load_embeddings(spark, sf_dir)
    q = F.floor(F.col("x").cast("double") * DIM_SCALE).cast("long")
    exploded = e.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(F.col("dim").cast("long").alias("dim"), q.alias("q"))
    return (
        exploded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("q").cast("long").alias("sum_q"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            F.sum(F.expr("(q * q) div 1000000").cast("decimal(38,0)"))
            .cast("long")
            .alias("sum_q2m"),
        )
        .orderBy("dim")
    )


EMBEDDING_DIM_PROFILE_SQL = f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {DIM_SCALE}) AS BIGINT)
           AS q
  FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n_vecs,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       MIN(q) AS min_q, MAX(q) AS max_q,
       CAST(SUM((q * q) // 1000000) AS BIGINT) AS sum_q2m
FROM q GROUP BY dim ORDER BY dim
"""


# ---------------------------------------------------------------------------
# PQ per-subspace quantization error
# ---------------------------------------------------------------------------


def pq_subspace_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subq, n_vecs, total_err, max_err, mean_err): the PQ codebook
    quality report — per subquantizer, the summed / max / mean exact
    integer squared-L2 between each vector's quantized subspace and its
    assigned centroid. The companion of pq_code_histogram: utilization
    says whether codes are USED, this says how much signal each
    subspace loses (one subspace dominating total_err → re-allocate
    bits or re-split dims).

    Plan: rides the memoized codebook fit (driver model state) and the
    row-local encode — the only post-encode cost is a PQ_M-way stack
    into a 4-row groupBy."""
    from . import pq as PQ

    q = PQ._quantized(spark, sf_dir)
    books = PQ._fit_codebooks(spark, sf_dir)
    coded = PQ._with_codes(q, PQ._packed_codebooks(spark, books))
    stack_args = ", ".join(f"{m}L, dist_{m}" for m in range(PQ.PQ_M))
    return (
        coded.select(F.expr(f"stack({PQ.PQ_M}, {stack_args}) AS (subq, d)"))
        .groupBy("subq")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("d").cast("long").alias("total_err"),
            F.max("d").cast("long").alias("max_err"),
            F.expr(
                "CAST(CAST(SUM(d) AS DECIMAL(38,0)) div COUNT(1) AS LONG)"
            ).alias("mean_err"),
        )
        .orderBy("subq")
    )


def _pq_subspace_error_sql() -> str:
    from . import pq as PQ

    return (
        "WITH "
        + ",\n".join(PQ._pq_fit_ctes())
        + """
SELECT CAST(m AS BIGINT) AS subq, COUNT(*) AS n_vecs,
       CAST(SUM(d) AS BIGINT) AS total_err,
       CAST(MAX(d) AS BIGINT) AS max_err,
       CAST(CAST(SUM(d) AS HUGEINT) // COUNT(*) AS BIGINT) AS mean_err
FROM coded
GROUP BY m ORDER BY m
"""
    )


PQ_SUBSPACE_ERROR_SQL = _pq_subspace_error_sql()
