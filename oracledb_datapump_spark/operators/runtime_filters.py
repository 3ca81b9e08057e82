"""Runtime-filter / data-skipping analytics: the query-optimization
primitives a 100 TB deployment leans on, each made deterministic enough
to sit under the cross-engine hash gate.

- ``bloom_join_prune``: build a Bloom filter from a selective dimension
  key set and probe the fact side through it — the runtime-filter
  (semi-join reduction) pattern Spark itself applies as
  ``InSubqueryExec``/bloom pushdown. Built from integer bit ops on the
  shared md5-based hash64, so Spark and DuckDB agree bit-for-bit.
- ``zonemap_skip_report``: min/max zone-map simulation over two file
  layouts (time-clustered vs hash-scattered) showing how many files a
  range predicate can skip under each — the report a table-layout
  (Z-order / partition-sort) decision is made from.
- ``selfjoin_size_estimate``: join-cardinality estimation from a
  deterministic 10% key sample vs the exact sum-of-squares — the
  statistic a cost-based optimizer needs before picking a join
  strategy.

No reference counterpart (the reference delegates query planning to
Oracle); these extend SURVEY.md §2's analytics family with the
planning-side operators a Spark data platform actually runs.

Scale notes are per-operator; none of them shuffles more than one
aggregation of the fact side, and every dimension-side structure
(bitmap chunks, zone-map bounds, sampled key counts) is bounded and
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64

# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 17  # m = 131072 bits
BLOOM_K = 3  # hash functions
_CHUNK_SHIFT = 5  # 32-bit chunks: chunk = pos >> 5, bit = pos & 31
BLOOM_SEGMENT = "BUILDING"  # selective customer slice the filter encodes


def _bloom_pos(i: int, key) -> F.Column:
    """Bit position of hash i for a key column (cross-engine stable)."""
    return hash64(
        F.concat(F.lit(f"bloom{i}:"), key.cast("string"))
    ) % F.lit(BLOOM_BITS)


def _sql_bloom_pos(i: int, expr: str) -> str:
    hashed = sql_hash64(f"'bloom{i}:' || CAST({expr} AS VARCHAR)")
    return f"{hashed} % {BLOOM_BITS}"


def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_keys, n_probes, n_passed, n_true, n_false_pos): build a
    {BLOOM_BITS}-bit / {BLOOM_K}-hash Bloom filter over the custkeys of
    the '{BLOOM_SEGMENT}' market segment, probe every order through it,
    and score the filter against the exact semi-join.

    Plan shape (the 100 TB point): the filter is a ≤4096-row
    (chunk, bitmask) table built with one small aggregation on the
    dimension side; the probe is {BLOOM_K} BROADCAST joins plus
    row-local bit tests — the fact table is never shuffled. That is
    exactly how a runtime filter beats a shuffle-hash semi-join when
    the dimension is selective: all pruning happens map-side at the
    scan."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    keys = cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT).select(
        F.col("c_custkey").alias("k")
    )
    positions = keys.select(
        F.explode(
            F.array(*[_bloom_pos(i, F.col("k")) for i in range(BLOOM_K)])
        ).alias("pos")
    )
    # shiftleft's bit-count arg must be a literal in the PySpark API;
    # the per-row shift goes through F.expr instead
    bitmap = (
        positions.select(
            F.shiftright("pos", _CHUNK_SHIFT).alias("chunk"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("chunk")
        .agg(F.bit_or("mask").alias("bm"))
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    probe = o
    hit_cols = []
    for i in range(BLOOM_K):
        probe = probe.withColumn(f"pos{i}", _bloom_pos(i, F.col("o_custkey")))
        probe = probe.withColumn(f"chunk{i}", F.shiftright(F.col(f"pos{i}"), _CHUNK_SHIFT))
        probe = probe.withColumn(
            f"mask{i}",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos{i} % 32 AS INT))"),
        )
        b = F.broadcast(
            bitmap.select(
                F.col("chunk").alias(f"bchunk{i}"), F.col("bm").alias(f"bm{i}")
            )
        )
        probe = probe.join(b, F.col(f"chunk{i}") == F.col(f"bchunk{i}"), "left")
        hit_cols.append(
            (F.col(f"bm{i}").isNotNull())
            & (F.col(f"bm{i}").bitwiseAND(F.col(f"mask{i}")) != 0)
        )
    passed = hit_cols[0]
    for h in hit_cols[1:]:
        passed = passed & h
    truth = F.broadcast(keys.select(F.col("k").alias("tk")))
    probe = probe.join(truth, F.col("o_custkey") == F.col("tk"), "left")
    agg = probe.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(passed, 1).otherwise(0)).cast("long").alias("n_passed"),
        F.sum(F.when(F.col("tk").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_true"),
        F.sum(F.when(passed & F.col("tk").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )
    n_keys = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    return agg.crossJoin(F.broadcast(n_keys)).select(
        "n_keys", "n_probes", "n_passed", "n_true", "n_false_pos"
    )


def _bloom_sql() -> str:
    pos_build = ", ".join(
        f"({_sql_bloom_pos(i, 'k')})" for i in range(BLOOM_K)
    )
    probe_exprs = []
    for i in range(BLOOM_K):
        p = _sql_bloom_pos(i, "o_custkey")
        probe_exprs.append(
            f"COALESCE((SELECT bm FROM bitmap WHERE chunk = ({p}) >> {_CHUNK_SHIFT})"
            f" & (1::BIGINT << CAST(({p}) % 32 AS INT)), 0) != 0"
        )
    passed = " AND ".join(probe_exprs)
    return f"""
WITH keys AS (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
positions AS (
  SELECT unnest([{pos_build}]) AS pos FROM keys
),
bitmap AS (
  SELECT pos >> {_CHUNK_SHIFT} AS chunk,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bm
  FROM positions GROUP BY 1
),
probe AS (
  SELECT o_custkey,
         ({passed}) AS passed,
         o_custkey IN (SELECT k FROM keys) AS is_true
  FROM orders
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS n_keys,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
       CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN passed AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos
FROM probe
"""


BLOOM_JOIN_PRUNE_SQL = _bloom_sql()


# ---------------------------------------------------------------------------
# zone-map (min/max) skip report
# ---------------------------------------------------------------------------

ZONEMAP_FILES = 16


def zonemap_skip_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(layout, file_id, n_rows, min_ts_us, max_ts_us, skipped): simulate
    {ZONEMAP_FILES}-file layouts of the events table — 'time_range'
    (rows bucketed by equal time slices, the layout a sort-on-write or
    Z-order compaction produces) and 'hash' (rows scattered by a key
    hash) — and report each file's min/max zone map plus whether the
    middle-third time-range predicate can SKIP the file entirely.

    The point at 100 TB: a time-clustered layout lets the scan skip
    ~2/3 of the files on footer metadata alone, the hash layout skips
    none; this report is the measurement that justifies paying for the
    clustered write. File assignment is arithmetic on (ts, event_id) —
    row-local, no global sort, no single-partition window — so the
    simulation itself scales."""
    from ..events_source import load_events

    ev = load_events(spark, sf_dir).select("event_id", "ts_us")
    bounds = ev.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    )
    e = ev.crossJoin(F.broadcast(bounds))
    # INTEGER division throughout: double division + cast would truncate
    # in Spark but round in DuckDB (known cross-engine hazard)
    time_file = F.expr(f"(ts_us - lo) * {ZONEMAP_FILES} DIV (hi - lo + 1)")
    hash_file = hash64(F.concat(F.lit("zf:"), F.col("event_id").cast("string"))) % F.lit(
        ZONEMAP_FILES
    )
    t_lo = F.expr("lo + (hi - lo) DIV 3")
    t_hi = F.expr("lo + (hi - lo) * 2 DIV 3")
    tagged = e.select(
        "ts_us",
        time_file.alias("f_time"),
        hash_file.alias("f_hash"),
        t_lo.alias("t_lo"),
        t_hi.alias("t_hi"),
    )
    out = []
    for layout, fcol in (("time_range", "f_time"), ("hash", "f_hash")):
        g = (
            tagged.groupBy(F.col(fcol).alias("file_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("ts_us").alias("min_ts_us"),
                F.max("ts_us").alias("max_ts_us"),
                F.min("t_lo").alias("t_lo"),
                F.min("t_hi").alias("t_hi"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "file_id",
                "n_rows",
                "min_ts_us",
                "max_ts_us",
                (
                    (F.col("max_ts_us") < F.col("t_lo"))
                    | (F.col("min_ts_us") >= F.col("t_hi"))
                ).alias("skipped"),
            )
        )
        out.append(g)
    return out[0].unionByName(out[1]).orderBy("layout", "file_id")


ZONEMAP_SKIP_REPORT_SQL = f"""
WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
b AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM e),
tagged AS (
  SELECT ts_us,
         (ts_us - lo) * {ZONEMAP_FILES} // (hi - lo + 1) AS f_time,
         {sql_hash64("'zf:' || CAST(event_id AS VARCHAR)")} % {ZONEMAP_FILES} AS f_hash,
         lo + (hi - lo) // 3 AS t_lo,
         lo + (hi - lo) * 2 // 3 AS t_hi
  FROM e, b
),
per AS (
  SELECT 'time_range' AS layout, f_time AS file_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us,
         MIN(t_lo) AS t_lo, MIN(t_hi) AS t_hi
  FROM tagged GROUP BY 2
  UNION ALL
  SELECT 'hash' AS layout, f_hash AS file_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us,
         MIN(t_lo) AS t_lo, MIN(t_hi) AS t_hi
  FROM tagged GROUP BY 2
)
SELECT layout, file_id, n_rows, min_ts_us, max_ts_us,
       (max_ts_us < t_lo OR min_ts_us >= t_hi) AS skipped
FROM per
ORDER BY layout, file_id
"""


# ---------------------------------------------------------------------------
# sampled join-cardinality estimation
# ---------------------------------------------------------------------------

JOINEST_SAMPLE_PCT = 10


def selfjoin_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_keys, n_sample_keys, exact_pairs, est_pairs, abs_err_ppm): the
    size of the lineitem self-join on l_partkey (Σ cnt² over keys),
    exactly and from a deterministic {JOINEST_SAMPLE_PCT}% key sample
    scaled up — the cardinality statistic a cost-based optimizer uses
    to choose broadcast vs shuffle before running the join.

    Key-sampling (hash the KEY, keep all its rows) is the correct
    scheme for join estimation: row-sampling underestimates Σ cnt²
    quadratically, key-sampling is unbiased. One groupBy(key) pass
    computes both (the sample membership is a row-local hash test), so
    the estimate costs one aggregation of the fact table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey")
    cnts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    in_sample = (
        hash64(F.concat(F.lit("samp:"), F.col("l_partkey").cast("string")))
        % 100
        < JOINEST_SAMPLE_PCT
    )
    scale = 100 // JOINEST_SAMPLE_PCT  # integer scale-up, both engines
    agg = cnts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(in_sample, 1).otherwise(0)).cast("long").alias("n_sample_keys"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("exact_pairs"),
        (
            F.sum(F.when(in_sample, F.col("cnt") * F.col("cnt")).otherwise(0))
            * F.lit(scale)
        )
        .cast("long")
        .alias("est_pairs"),
    )
    return agg.select(
        "n_keys",
        "n_sample_keys",
        "exact_pairs",
        "est_pairs",
        F.expr(
            "CAST(abs(est_pairs - exact_pairs) * 1000000 DIV exact_pairs AS BIGINT)"
        ).alias("abs_err_ppm"),
    )


SELFJOIN_SIZE_ESTIMATE_SQL = f"""
WITH cnts AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
flagged AS (
  SELECT cnt,
         ({sql_hash64("'samp:' || CAST(l_partkey AS VARCHAR)")} % 100
          < {JOINEST_SAMPLE_PCT}) AS in_sample
  FROM cnts
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sample_keys,
         CAST(SUM(cnt * cnt) AS BIGINT) AS exact_pairs,
         CAST(SUM(CASE WHEN in_sample THEN cnt * cnt ELSE 0 END)
              * (100 // {JOINEST_SAMPLE_PCT}) AS BIGINT) AS est_pairs
  FROM flagged
)
SELECT n_keys, n_sample_keys, exact_pairs, est_pairs,
       CAST(abs(est_pairs - exact_pairs) * 1000000 // exact_pairs AS BIGINT)
         AS abs_err_ppm
FROM agg
"""
