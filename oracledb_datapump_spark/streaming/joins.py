"""Watermarked stream-stream interval join: click→purchase attribution
over an unbounded event feed — the last Structured Streaming operator
family the extension suite lacked (windowed agg, dropDuplicates state,
applyInPandasWithState sessionizer/CMS live in the sibling modules).

Semantics: every purchase is joined to every click by the SAME user
whose click time is within [purchase_time - HORIZON, purchase_time]
(inclusive) — the interval-bounded attribution that the batch as-of
join (operators.temporal.asof_attribution) answers with "latest prior
click only". Inner-join multiplicity is kept: a purchase inside two
clicks' horizons emits two rows, exactly like the batch twin below, so
stream and batch converge row-for-row on a static source.

At scale: both sides are watermarked and the join condition bounds
event-time distance, so each side's state store holds only
HORIZON+LATENESS of history per user — the textbook bounded-state
stream-stream join. Without the time bound Spark would (correctly)
refuse to run it append-mode; with it, state GC follows the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events_source import event_time_expr, pin_utc, stream_events_raw

# single source of truth for the horizon: the SQL oracle derives its
# microsecond literal from this value, so tuning it cannot silently
# desynchronize the streaming join from its hash-gate twin
ATTRIBUTION_HORIZON_US = 3_600_000_000
ATTRIBUTION_HORIZON = f"{ATTRIBUTION_HORIZON_US // 1_000_000} seconds"
LATENESS = "30 minutes"


def _sides(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clicks, purchases) with event_time and per-side watermarks."""
    et = event_time_expr(raw)
    clicks = (
        raw.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            et.alias("click_time"),
        )
        .withWatermark("click_time", LATENESS)
    )
    purchases = (
        raw.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            et.alias("purchase_time"),
        )
        .withWatermark("purchase_time", LATENESS)
    )
    return clicks, purchases


def _joined(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("click_time") <= F.col("purchase_time"))
        & (
            F.col("click_time")
            >= F.col("purchase_time") - F.expr(f"INTERVAL {ATTRIBUTION_HORIZON}")
        )
    )
    return purchases.join(clicks, cond).select(
        "purchase_id",
        F.col("purchase_user").alias("user_id"),
        "click_id",
        (
            F.unix_micros("purchase_time") - F.unix_micros("click_time")
        ).alias("gap_us"),
    )


def stream_attribution(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming click→purchase interval join (returns the streaming DF;
    caller attaches a sink)."""
    raw = stream_events_raw(spark, src_dir)
    clicks, purchases = _sides(raw)
    return _joined(clicks, purchases)


def run_attribution_export(
    spark: SparkSession, src_dir: str, out_dir: str
) -> dict:
    """One availableNow cycle: attributed (purchase, click) pairs
    appended to parquet with checkpointed join state across cycles."""
    q = (
        stream_attribution(spark, src_dir)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "attributed"))
        .option("checkpointLocation", os.path.join(out_dir, "_attr_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "attributed")}


def batch_equivalent(spark: SparkSession, src_dir: str) -> DataFrame:
    """The batch query the stream must converge to on a static source
    (same expressions, no watermarks)."""
    pin_utc(spark)
    raw = spark.read.parquet(src_dir)
    et = event_time_expr(raw)
    clicks = raw.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        et.alias("click_time"),
    )
    purchases = raw.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        et.alias("purchase_time"),
    )
    return _joined(clicks, purchases)


def streaming_attribution_pairs(spark: SparkSession, src_dir: str) -> DataFrame:
    """(purchase_id, user_id, click_id, gap_us): one availableNow cycle
    of the watermarked stream-stream interval join, hash-gated against
    the plain batch interval-join SQL. A single staged file drains in
    one micro-batch, and inner stream-stream joins emit matches
    immediately, so the emitted set equals the batch join exactly
    (verified at both fixture SFs); a multi-batch drain may withhold
    pairs whose click-side state the watermark already evicted — that
    subset-vs-convergence contract is covered in
    tests/test_streaming_joins.py.

    Runs against throwaway source/sink/checkpoint dirs; result pinned
    with localCheckpoint before cleanup."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="dp_attr_src_")
    out = tempfile.mkdtemp(prefix="dp_attr_out_")
    try:
        shutil.copy(
            os.path.join(src_dir, "events.parquet"),
            os.path.join(src, "events.parquet"),
        )
        info = run_attribution_export(spark, src, out)
        return (
            spark.read.parquet(info["sink_path"])
            .orderBy("purchase_id", "click_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STREAMING_ATTRIBUTION_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
c AS (SELECT event_id AS click_id, user_id, us AS cus FROM e
      WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, us AS pus FROM e
      WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, c.click_id, p.pus - c.cus AS gap_us
FROM p JOIN c ON p.user_id = c.user_id
             AND c.cus <= p.pus
             AND c.cus >= p.pus - {ATTRIBUTION_HORIZON_US}
ORDER BY purchase_id, click_id
"""


# ---------------------------------------------------------------------------
# stream-static SCD2 enrichment (dimension history join at event time)
# ---------------------------------------------------------------------------


def run_scd2_enrich_cycle(
    spark: SparkSession,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    dim: DataFrame,
) -> None:
    """One availableNow cycle of stream-static enrichment: every event
    joins the SCD2 dimension row valid AT its event time
    (valid_from ≤ ts < valid_to, open version unbounded) and lands in an
    exactly-once parquet file sink. Stream-static joins need no
    watermark (the static side never grows stale mid-batch), and the
    file sink's transaction log makes replayed batches idempotent — the
    classic enrich-and-land pipeline shape. At 100 TB the static
    dimension is a broadcast or storage-partitioned join per
    micro-batch; per-event state is zero."""
    from .incremental import stream_events

    ev = (
        stream_events(spark, src_dir)
        .select(
            "event_id",
            "event_type",
            "user_id",
            F.unix_micros("event_time").alias("ts_us"),
        )
        .alias("e")
    )
    d = dim.alias("d")
    cond = (
        (F.col("e.user_id") == F.col("d.user_id"))
        & (F.col("d.valid_from_us") <= F.col("e.ts_us"))
        & (F.col("d.valid_to_us").isNull() | (F.col("e.ts_us") < F.col("d.valid_to_us")))
    )
    enriched = ev.join(d, cond, "left_outer").select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.ts_us").alias("ts_us"),
        F.col("d.version").alias("version"),
        F.col("d.value_cents").alias("value_cents"),
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, n_enriched, sum_matched_cents): TWO
    checkpointed availableNow cycles of stream-static SCD2 enrichment
    over a time-split events source, then one batch aggregate over the
    landed sink. The oracle is the equivalent batch as-of join against
    the same dimension history — row conservation (versions never
    overlap, so each event matches ≤ 1 row) plus the value sum put the
    stream-static join AND the exactly-once file sink under the
    cross-engine hash. Sibling of streaming_merge_apply: that gates the
    upsert path, this gates the enrichment path. The arrival split is
    Spark-side (incremental.stage_events_arrivals)."""
    import shutil
    import tempfile

    from ..operators.temporal import scd2_user_value
    from .incremental import stage_events_arrivals

    src = tempfile.mkdtemp(prefix="dp_enrich_src_")
    sink = tempfile.mkdtemp(prefix="dp_enrich_sink_")
    cp = tempfile.mkdtemp(prefix="dp_enrich_cp_")
    try:
        dim = scd2_user_value(spark, sf_dir).localCheckpoint(eager=True)
        for land in stage_events_arrivals(spark, sf_dir, src):
            land()
            run_scd2_enrich_cycle(spark, src, sink, cp, dim)
        out = (
            spark.read.parquet(sink)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.count("version").alias("n_enriched"),
                F.sum(F.coalesce(F.col("value_cents"), F.lit(0)))
                .cast("long")
                .alias("sum_matched_cents"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(cp, ignore_errors=True)


def _streaming_scd2_enrich_sql() -> str:
    from ..operators.temporal import SCD2_SQL

    scd = SCD2_SQL.replace("ORDER BY user_id, version", "")
    return f"""
WITH scd AS ({scd}),
e AS (
  SELECT event_id, event_type, user_id, epoch_us(ts) AS ts_us FROM events
),
j AS (
  SELECT e.event_type, s.version, s.value_cents
  FROM e LEFT JOIN scd s
    ON e.user_id = s.user_id
   AND s.valid_from_us <= e.ts_us
   AND (s.valid_to_us IS NULL OR e.ts_us < s.valid_to_us)
)
SELECT event_type, COUNT(*) AS n_events,
       COUNT(version) AS n_enriched,
       CAST(SUM(COALESCE(value_cents, 0)) AS BIGINT) AS sum_matched_cents
FROM j GROUP BY 1 ORDER BY 1
"""


STREAMING_SCD2_ENRICH_SQL = _streaming_scd2_enrich_sql()
