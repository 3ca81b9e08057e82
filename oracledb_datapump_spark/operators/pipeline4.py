"""Pipeline QA dashboards, batch 5 (round 6; queued behind pipeline3
for the round-7 gated prefix — hash-verified locally at both fixture
scales by tests/test_queries_oracle.py until then).

- ``source_lang_gini``       language-diversity Gini per source
- ``pair_jaccard_histogram`` verified near-dup pair similarity bands
- ``customer_rfm_bands``     RFM segmentation in power-of-two bands
- ``nation_fulfillment_lag`` order→ship latency moments per nation
- ``value_anomaly_days``     σ-outlier days of event value totals

Same contracts as operators/pipeline.py: integer-exact statistics
(Gini via Σc²·1e6 div N², the integer moment inequality for the sigma
test, bitlen log2 bands, epoch-µs day arithmetic), oracles composed
from the primitives' own SQL. No reference analog (SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import load_events
from .docs_source import load_docs
from . import dedup as D


# ---------------------------------------------------------------------------
# language-diversity Gini per source
# ---------------------------------------------------------------------------


def source_lang_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_langs, gini_ppm): per source, how
    language-diverse its documents are — the Gini impurity
    1 − Σ share² stated integer-exact as 1e6 − Σc²·1e6 div N²
    (0 = monolingual, →1e6 = uniform across languages). The
    concentration twin of token_share_by_lang: that table says WHICH
    languages, this one number per source says HOW concentrated.

    Plan: one (source, lang) groupBy with map-side partial agg, then a
    |sources|-row reduce — cell counts never leave the combiner
    unaggregated."""
    d = load_docs(spark, sf_dir)
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    return (
        cells.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ssq"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            F.expr(
                "CAST(1000000 - (ssq * 1000000)"
                " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS LONG)"
            ).alias("gini_ppm"),
        )
        .orderBy("source")
    )


SOURCE_LANG_GINI_SQL = """
WITH cells AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
agg AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs, COUNT(*) AS n_langs,
         SUM(CAST(c AS HUGEINT) * c) AS ssq
  FROM cells GROUP BY source
)
SELECT source, n_docs, n_langs,
       CAST(1000000 - (ssq * 1000000)
            // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS gini_ppm
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# verified-pair similarity histogram
# ---------------------------------------------------------------------------

JACCARD_BANDS = 20  # 0.05-wide similarity bands


def pair_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, n_pairs): verified near-dup pairs bucketed by similarity
    (floor(jaccard·{JACCARD_BANDS}) — 0.05-wide bands). The shape of
    this histogram is the dedup-policy dial: mass piled at the
    threshold band means the corpus is full of borderline templates
    (lower the threshold and the pair count explodes); mass at band
    {JACCARD_BANDS} means true mirrors that exact-hash dedup would
    already have caught. The jaccard double is a ratio of small ints
    (identical IEEE division in both engines — the same contract the
    verified-pairs gate itself relies on).

    Plan: rides the driver-memoized verified pair list (dedup OUTPUT
    sized); one ≤{JACCARD_BANDS}-row groupBy."""
    p = D.verified_pairs_cached(spark, sf_dir)
    return (
        p.select(
            F.floor(F.col("jaccard") * JACCARD_BANDS).cast("long").alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("band")
    )


def _pair_jaccard_histogram_sql() -> str:
    verified = D.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH v AS ({verified})
SELECT CAST(floor(jaccard * {JACCARD_BANDS}) AS BIGINT) AS band,
       COUNT(*) AS n_pairs
FROM v GROUP BY 1 ORDER BY 1
"""


PAIR_JACCARD_HISTOGRAM_SQL = _pair_jaccard_histogram_sql()


# ---------------------------------------------------------------------------
# RFM segmentation bands
# ---------------------------------------------------------------------------


def customer_rfm_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r_band, f_band, m_band, n_customers): the classic
    recency/frequency/monetary segmentation collapsed to power-of-two
    bands — recency = bitlen(days since last order + 1) against the
    corpus' latest order date, frequency = bitlen(order count),
    monetary = bitlen(lifetime revenue in whole dollars). Bands are
    log-scaled on purpose: RFM deciles need a global sort, bitlen needs
    nothing.

    Plan: one custkey-keyed groupBy over orders (map-side combinable),
    a 1-row global max broadcast, row-local band math, a ≤ 12³-row
    reduce. No window, no sort, no join wider than one row."""
    from ..events_source import pin_utc

    pin_utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = o.groupBy("o_custkey").agg(
        F.max(F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))")).alias("last_us"),
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(25,2)")) * 100)
        .cast("long")
        .alias("cents"),
    )
    ref = o.agg(F.max(F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))")).alias("ref_us"))
    bands = per.crossJoin(F.broadcast(ref)).select(
        F.expr(
            "CAST(length(bin((ref_us - last_us) div 86400000000 + 1)) AS BIGINT)"
        ).alias("r_band"),
        F.expr("CAST(length(bin(n_orders)) AS BIGINT)").alias("f_band"),
        F.expr("CAST(length(bin(cents div 100)) AS BIGINT)").alias("m_band"),
    )
    return (
        bands.groupBy("r_band", "f_band", "m_band")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_band", "f_band", "m_band")
    )


CUSTOMER_RFM_BANDS_SQL = """
WITH per AS (
  SELECT o_custkey, MAX(epoch_us(o_orderdate)) AS last_us,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ref AS (SELECT MAX(epoch_us(o_orderdate)) AS ref_us FROM orders),
bands AS (
  SELECT CAST(length(bin((ref_us - last_us) // 86400000000 + 1)) AS BIGINT)
           AS r_band,
         CAST(length(bin(n_orders)) AS BIGINT) AS f_band,
         CAST(length(bin(cents // 100)) AS BIGINT) AS m_band
  FROM per, ref
)
SELECT r_band, f_band, m_band, COUNT(*) AS n_customers
FROM bands GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# order→ship fulfillment lag per nation
# ---------------------------------------------------------------------------


def nation_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_items, sum_lag_days, max_lag_days, mean_lag_x100):
    per supplier nation, the order-to-ship latency moments (lag in
    whole epoch days — non-negative by the data's nature, so trunc/
    floor division agree; mean emitted ×100 via integer division).
    The supply-chain twin of q21: q21 counts late suppliers, this
    profiles the whole latency distribution's first moments.

    Plan: the lineitem⋈orders orderkey shuffle is the one big exchange
    (both sides fact-sized at 100 TB); supplier and nation joins are
    broadcast; the reduce is |nations| rows with map-side partials."""
    from ..events_source import pin_utc

    pin_utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    lag = F.expr(
        "(unix_micros(CAST(l_shipdate AS TIMESTAMP)) - unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), lag.alias("lag_days"))
    )
    return (
        j.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("lag_days").cast("long").alias("sum_lag_days"),
            F.max("lag_days").cast("long").alias("max_lag_days"),
        )
        .select(
            "nation",
            "n_items",
            "sum_lag_days",
            "max_lag_days",
            F.expr(
                "CAST((CAST(sum_lag_days AS DECIMAL(38,0)) * 100)"
                " div n_items AS LONG)"
            ).alias("mean_lag_x100"),
        )
        .orderBy("nation")
    )


NATION_FULFILLMENT_LAG_SQL = """
WITH j AS (
  SELECT n.n_name AS nation,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
           AS lag_days
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT nation, COUNT(*) AS n_items,
       CAST(SUM(lag_days) AS BIGINT) AS sum_lag_days,
       CAST(MAX(lag_days) AS BIGINT) AS max_lag_days,
       CAST((CAST(SUM(lag_days) AS HUGEINT) * 100) // COUNT(*) AS BIGINT)
         AS mean_lag_x100
FROM j GROUP BY nation
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# σ-outlier days of event value totals
# ---------------------------------------------------------------------------

VALUE_SIGMAS = 2


def value_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day_epoch, sum_cents, is_anomaly): days whose total
    event VALUE (quantized to cents — floor(value·100), identical IEEE
    double math in both engines) sits more than {VALUE_SIGMAS}σ from
    that type's daily mean. The revenue-anomaly twin of
    events_anomaly_hours: that one flags traffic spikes, this flags
    value spikes at constant traffic — stated with the same integer
    moment inequality (S_d·D − T)² > k²·(D·Q − T²), all DECIMAL(38,0)/
    HUGEINT, no float mean, no sqrt.

    Plan: daily sums (partial-agg groupBy), a |types|-row moment table
    broadcast, row-local comparison."""
    e = load_events(spark, sf_dir)
    day = (F.expr("ts_us div 86400000000") * 86400).cast("long")
    cents = F.expr("CAST(floor(value * 100) AS LONG)")
    sums = e.groupBy(F.col("event_type"), day.alias("day_epoch")).agg(
        F.sum(cents).cast("long").alias("sum_cents")
    )
    stats = sums.groupBy("event_type").agg(
        F.sum("sum_cents").alias("t"),
        F.sum(F.expr("CAST(sum_cents AS DECIMAL(38,0)) * sum_cents")).alias("q"),
        F.count(F.lit(1)).alias("nd"),
    )
    k2 = VALUE_SIGMAS * VALUE_SIGMAS
    flag = F.expr(
        f"""
        CAST(sum_cents AS DECIMAL(38,0)) * nd - t != 0 AND
        (CAST(sum_cents AS DECIMAL(38,0)) * nd - t)
          * (CAST(sum_cents AS DECIMAL(38,0)) * nd - t)
        > {k2} * (CAST(nd AS DECIMAL(38,0)) * q - CAST(t AS DECIMAL(38,0)) * t)
        """
    )
    return (
        sums.join(F.broadcast(stats), "event_type")
        .select("event_type", "day_epoch", "sum_cents", flag.alias("is_anomaly"))
        .orderBy("event_type", "day_epoch")
    )


VALUE_ANOMALY_DAYS_SQL = f"""
WITH s AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 86400000000) * 86400 AS BIGINT) AS day_epoch,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, SUM(sum_cents) AS t,
         SUM(CAST(sum_cents AS HUGEINT) * sum_cents) AS q,
         COUNT(*) AS nd
  FROM s GROUP BY event_type
)
SELECT s.event_type, s.day_epoch, s.sum_cents,
       CAST(s.sum_cents AS HUGEINT) * st.nd - st.t != 0 AND
       (CAST(s.sum_cents AS HUGEINT) * st.nd - st.t)
         * (CAST(s.sum_cents AS HUGEINT) * st.nd - st.t)
       > {VALUE_SIGMAS * VALUE_SIGMAS}
         * (CAST(st.nd AS HUGEINT) * st.q - CAST(st.t AS HUGEINT) * st.t)
       AS is_anomaly
FROM s JOIN st USING (event_type)
ORDER BY s.event_type, s.day_epoch
"""
