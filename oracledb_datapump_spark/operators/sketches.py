"""Distinct-count sketches over the fixture tables.

hll_distinct: a from-scratch HyperLogLog whose every step is
deterministic and engine-portable, so the *estimate itself* hash-matches
a DuckDB twin — normally sketches are unverifiable across engines
because they use engine-native hashing; building on the shared md5-based
hash64 makes the whole sketch part of the hard correctness gate.

Construction (P=9, m=512 buckets, standard HLL):
- h = hash64(value) in [0, 2^60)
- bucket = top 9 bits, rest = low 51 bits
- rank = leading-zeros(rest) + 1 = 52 - bitlen(rest), via
  length(bin(x)) — an integer string op, identical in both engines
- per (group, bucket): M = max(rank)        <- the only data-sized agg
- S = sum over buckets of 2^(52 - M) as BIGINT (exact integer; the
  classic sum of 2^-M floats is order-dependent in the last ulp, so we
  scale by 2^52 and stay integral), V = count of empty buckets
- estimate = alpha * m^2 * 2^52 / S, with the small-range linear-count
  branch (V > 0 and est <= 2.5m -> m * ln(m / V)); the final float
  expression is a single identical formula in both engines.

Scale: one groupBy(group, value)-free pass — the sketch is
groupBy(group, bucket) max, i.e. at most |groups| * 512 rows out of the
shuffle regardless of corpus size; that is the whole point of HLL at
100 TB (exact COUNT(DISTINCT) shuffles every distinct value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64

HLL_P = 9
HLL_M = 1 << HLL_P  # 512
_REST_BITS = 60 - HLL_P  # 51
_TWO_REST = 1 << _REST_BITS
_MAX_RANK = _REST_BITS + 1  # 52
_TWO52 = float(1 << 52)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, exact_distinct, hll_estimate): distinct
    customers per order priority, exactly and by the deterministic HLL."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", F.col("o_custkey").cast("string").alias("v")
    )
    h = hash64(F.col("v"))
    rest = h % F.lit(_TWO_REST)
    rank = F.when(rest == 0, F.lit(_MAX_RANK)).otherwise(
        F.lit(_MAX_RANK) - F.length(F.bin(rest))
    )
    buckets = (
        o.select(
            "o_orderpriority",
            # integer shift, NOT `/`: h has 60 bits and long `/` goes
            # through double (53-bit mantissa), which can flip buckets
            F.shiftright(h, _REST_BITS).alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max("rank").alias("m_rank"))
    )
    agg = buckets.groupBy("o_orderpriority").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 52 - m_rank)")).alias("s"),
        F.count(F.lit(1)).alias("nonzero"),
    )
    v = F.lit(HLL_M) - F.col("nonzero")  # empty buckets
    # empty buckets have M=0 and contribute 2^52 each; the groupBy only
    # saw observed buckets, so add the missing terms back
    s_full = F.col("s") + v.cast("long") * F.lit(1 << 52).cast("long")
    raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(_TWO52) / s_full.cast(
        "double"
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    exact = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    )
    return (
        agg.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_distinct",
            F.floor(est).cast("long").alias("hll_estimate"),
        )
        .orderBy("o_orderpriority")
    )


HLL_DISTINCT_SQL = f"""
WITH hashed AS (
  SELECT o_orderpriority,
         {sql_hash64("CAST(o_custkey AS VARCHAR)")} AS h
  FROM orders
),
ranks AS (
  SELECT o_orderpriority,
         (h >> {_REST_BITS}) AS bucket,
         CASE WHEN h % {_TWO_REST} = 0 THEN {_MAX_RANK}
              ELSE {_MAX_RANK} - length(bin(h % {_TWO_REST})) END AS rank
  FROM hashed
),
buckets AS (
  SELECT o_orderpriority, bucket, MAX(rank) AS m_rank
  FROM ranks GROUP BY o_orderpriority, bucket
),
agg AS (
  SELECT o_orderpriority,
         SUM((1::BIGINT << (52 - m_rank))) AS s,
         COUNT(*) AS nonzero
  FROM buckets GROUP BY o_orderpriority
),
sfull AS (
  SELECT o_orderpriority, nonzero,
         s + ({HLL_M} - nonzero) * (1::BIGINT << 52) AS s_full
  FROM agg
),
est AS (
  SELECT o_orderpriority,
         CASE WHEN ({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)!r}::DOUBLE
                    * {_TWO52!r}::DOUBLE / CAST(s_full AS DOUBLE)) <= {2.5 * HLL_M!r}::DOUBLE
                   AND ({HLL_M} - nonzero) > 0
              THEN {float(HLL_M)!r}::DOUBLE
                   * ln({float(HLL_M)!r}::DOUBLE / CAST({HLL_M} - nonzero AS DOUBLE))
              ELSE ({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)!r}::DOUBLE
                    * {_TWO52!r}::DOUBLE / CAST(s_full AS DOUBLE)) END AS est
  FROM sfull
)
SELECT e.o_orderpriority, x.exact_distinct,
       CAST(FLOOR(e.est) AS BIGINT) AS hll_estimate
FROM est e
JOIN (SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_distinct
      FROM orders GROUP BY o_orderpriority) x USING (o_orderpriority)
ORDER BY e.o_orderpriority
"""


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row
CMS_TOPK = 20


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, est_count, exact_count): the CMS_TOPK most frequent
    document tokens, frequency estimated by a Count-Min sketch and
    verified against the exact count in the same result.

    The corpus is tokenized ONCE and reduced in ONE corpus-scale
    groupBy(token) (map-side combined, |vocab| rows out of the
    shuffle); the CMS_D x CMS_W counter grid then folds from that
    vocab-sized table — cell(r,c) = Σ exact_count over tokens hashing
    to (r,c), algebraically identical to counting the raw stream but
    the ×CMS_D explode runs over |vocab| rows, not |tokens|. Sketch
    state out of the vocab fold is 4096 rows regardless of corpus
    size, the whole point at 100 TB. Hashes are the shared md5-based
    hash64 with per-row salts, so every counter — and therefore the
    estimate — is bit-identical in DuckDB and part of the hard hash
    gate. est >= exact always (CMS never undercounts); collisions in
    1024-wide rows make the overestimate visible, which is the honest
    demonstration of the sketch's error bound.

    The estimate-every-candidate join below scans distinct tokens (fine
    here; production keeps a per-partition candidate pre-filter so only
    locally-frequent tokens probe the sketch). Ordering: est desc,
    token asc — deterministic."""
    from ..functions.text import tokens

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(F.explode(tokens("text")).alias("token"))
    # vocab-sized; reused by the sketch fold AND the probe side below
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    rows = exact.withColumn(
        "row", F.explode(F.array(*[F.lit(i) for i in range(CMS_D)]))
    ).select(
        "exact_count",
        "row",
        (
            hash64(F.concat(F.lit("cms"), F.col("row"), F.lit(":"), F.col("token")))
            % CMS_W
        ).alias("counter"),
    )
    sketch = rows.groupBy("row", "counter").agg(
        F.sum("exact_count").alias("c")
    )
    probes = exact.select(
        "token",
        "exact_count",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("row"),
    ).select(
        "token",
        "exact_count",
        "row",
        (
            hash64(F.concat(F.lit("cms"), F.col("row"), F.lit(":"), F.col("token")))
            % CMS_W
        ).alias("counter"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["row", "counter"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.orderBy(F.desc("est_count"), "token")
        .limit(CMS_TOPK)
        .select("token", "est_count", "exact_count")
    )


CMS_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            t -> t != '')) AS token
  FROM documents
),
rows_ AS (
  SELECT token, r.row,
         {sql_hash64("'cms' || CAST(r.row AS VARCHAR) || ':' || token")} % {CMS_W}
           AS counter
  FROM toks CROSS JOIN (SELECT unnest(range({CMS_D})) AS row) r
),
sketch AS (
  SELECT row, counter, COUNT(*) AS c FROM rows_ GROUP BY row, counter
),
exact AS (SELECT token, COUNT(*) AS exact_count FROM toks GROUP BY token),
probes AS (
  SELECT e.token, e.exact_count, r.row,
         {sql_hash64("'cms' || CAST(r.row AS VARCHAR) || ':' || e.token")} % {CMS_W}
           AS counter
  FROM exact e CROSS JOIN (SELECT unnest(range({CMS_D})) AS row) r
),
est AS (
  SELECT p.token, p.exact_count, MIN(s.c) AS est_count
  FROM probes p JOIN sketch s USING (row, counter)
  GROUP BY p.token, p.exact_count
)
SELECT token, est_count, exact_count
FROM est
ORDER BY est_count DESC, token ASC
LIMIT {CMS_TOPK}
"""


# ---------------------------------------------------------------------------
# fixed-bin histogram quantile sketch
# ---------------------------------------------------------------------------

HIST_BIN_W = 1000  # dollars per bin
HIST_PCTS = (25, 50, 75, 90, 99)


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pct, approx_lo, bin_id): percentile estimates of
    lineitem.l_extendedprice from a fixed-width histogram — the
    mergeable-sketch path for quantiles at 100 TB (t-digest/KLL stand-in
    with fully deterministic arithmetic).

    The estimate for percentile p is the lower edge of the first bin
    whose cumulative count reaches ceil(p*N/100). Binning is
    floor(x/{HIST_BIN_W}) — IEEE double division + floor, bit-identical
    across engines — and every later step is BIGINT-exact, so the sketch
    sits inside the cross-engine hash gate (the exact-quantile twin is
    ``price_quantiles``, which shuffles the full column; this one's
    shuffle output is |bins| rows regardless of corpus size, and the
    cumulative window runs over those ~100 bin rows, not the data).
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bins = (
        li.select(
            F.floor(F.col("l_extendedprice") / HIST_BIN_W)
            .cast("long")
            .alias("bin_id")
        )
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum", F.sum("cnt").over(w))
    total = bins.agg(F.sum("cnt").alias("n"))
    pcts = spark.range(0, len(HIST_PCTS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in HIST_PCTS]), (F.col("id") + 1).cast("int")
        )
        .cast("long")
        .alias("pct")
    )
    return (
        F.broadcast(pcts.crossJoin(total))
        .join(cum, F.col("cum") >= F.expr("(pct * n + 99) div 100"))
        .groupBy("pct")
        .agg(F.min("bin_id").alias("bin_id"))
        .select(
            "pct",
            (F.col("bin_id") * HIST_BIN_W).cast("long").alias("approx_lo"),
            "bin_id",
        )
        .orderBy("pct")
    )


HISTOGRAM_QUANTILES_SQL = f"""
WITH b AS (
  SELECT CAST(FLOOR(l_extendedprice / {HIST_BIN_W}) AS BIGINT) AS bin_id,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT bin_id, CAST(SUM(cnt) OVER (ORDER BY bin_id) AS BIGINT) AS cum FROM b
), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM b),
pcts AS (SELECT CAST(unnest({list(HIST_PCTS)}) AS BIGINT) AS pct)
SELECT pct,
       CAST(MIN(bin_id) * {HIST_BIN_W} AS BIGINT) AS approx_lo,
       MIN(bin_id) AS bin_id
FROM pcts CROSS JOIN tot
JOIN cum ON cum.cum >= (pct * n + 99) // 100
GROUP BY pct
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# HLL set algebra (mergeable-sketch union / intersection)
# ---------------------------------------------------------------------------

HLL_SET_A = "click"
HLL_SET_B = "purchase"


def hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(set_tag, exact_distinct, hll_estimate): distinct users who
    {HLL_SET_A}ed, who {HLL_SET_B}d, their UNION — estimated by merging
    the two register tables with a register-wise max, never rescanning
    the data — and their INTERSECTION via inclusion-exclusion
    (|A|+|B|−|A∪B|, clamped at 0). Each row carries the exact answer
    beside the estimate so the gate verifies the sketch algebra itself.

    This is the property that makes HLL the 100 TB distinct-count tool:
    per-partition (or per-day, per-source) sketches are |m|-row tables
    that MERGE by max — union cardinality across any grouping
    re-aggregates register tables, not data. The merge here is a
    groupBy(bucket).max over 2·{HLL_M} rows."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin(HLL_SET_A, HLL_SET_B)
    )
    h = hash64(F.col("user_id").cast("string"))
    rest = h % F.lit(_TWO_REST)
    rank = F.when(rest == 0, F.lit(_MAX_RANK)).otherwise(
        F.lit(_MAX_RANK) - F.length(F.bin(rest))
    )
    regs = (
        ev.select(
            F.col("event_type").alias("set_tag"),
            F.shiftright(h, _REST_BITS).alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy("set_tag", "bucket")
        .agg(F.max("rank").alias("m_rank"))
        .localCheckpoint(eager=True)  # reused by the merge AND per-set arms
    )
    union_regs = (
        regs.groupBy("bucket")
        .agg(F.max("m_rank").alias("m_rank"))
        .select(F.lit("union").alias("set_tag"), "bucket", "m_rank")
    )
    stacked = regs.unionByName(union_regs)
    agg = stacked.groupBy("set_tag").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 52 - m_rank)")).alias("s"),
        F.count(F.lit(1)).alias("nonzero"),
    )
    v = F.lit(HLL_M) - F.col("nonzero")
    s_full = F.col("s") + v.cast("long") * F.lit(1 << 52).cast("long")
    raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(_TWO52) / s_full.cast(
        "double"
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    ests = agg.select(
        "set_tag", F.floor(est).cast("long").alias("hll_estimate")
    )
    exact_ab = (
        ev.groupBy(F.col("event_type").alias("set_tag"))
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    exact_union = ev.agg(
        F.countDistinct("user_id").alias("exact_distinct")
    ).select(F.lit("union").alias("set_tag"), "exact_distinct")
    per_set = (
        exact_ab.unionByName(exact_union).join(ests, "set_tag")
    )
    # intersection: exact via per-user both-types test; estimate via
    # inclusion-exclusion over the three sketch rows (all driver-free)
    exact_inter = (
        ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    # explicit pivot values: if either event type is absent from the data,
    # a data-derived pivot would drop the column and F.col() would fail to
    # resolve — degrade to a 0 estimate instead (matching the oracle's
    # COALESCEd scalar subqueries)
    e = ests.groupBy().pivot("set_tag", [HLL_SET_A, HLL_SET_B, "union"]).sum(
        "hll_estimate"
    )
    inter = (
        exact_inter.crossJoin(F.broadcast(e))
        .select(
            F.lit("intersection").alias("set_tag"),
            "exact_distinct",
            F.greatest(
                F.lit(0).cast("long"),
                (
                    F.coalesce(F.col(HLL_SET_A), F.lit(0))
                    + F.coalesce(F.col(HLL_SET_B), F.lit(0))
                    - F.coalesce(F.col("union"), F.lit(0))
                ).cast("long"),
            ).alias("hll_estimate"),
        )
    )
    return (
        per_set.select("set_tag", "exact_distinct", "hll_estimate")
        .unionByName(inter)
        .orderBy("set_tag")
    )


HLL_SET_ALGEBRA_SQL = f"""
WITH ev AS (
  SELECT event_type, user_id FROM events
  WHERE event_type IN ('{HLL_SET_A}', '{HLL_SET_B}')
),
ranks AS (
  SELECT event_type AS set_tag,
         ({sql_hash64("CAST(user_id AS VARCHAR)")} >> {_REST_BITS}) AS bucket,
         CASE WHEN {sql_hash64("CAST(user_id AS VARCHAR)")} % {_TWO_REST} = 0
              THEN {_MAX_RANK}
              ELSE {_MAX_RANK}
                   - length(bin({sql_hash64("CAST(user_id AS VARCHAR)")} % {_TWO_REST}))
         END AS rank
  FROM ev
),
regs AS (
  SELECT set_tag, bucket, MAX(rank) AS m_rank FROM ranks GROUP BY 1, 2
),
stacked AS (
  SELECT set_tag, bucket, m_rank FROM regs
  UNION ALL
  SELECT 'union', bucket, MAX(m_rank) FROM regs GROUP BY 2
),
agg AS (
  SELECT set_tag,
         SUM((1::BIGINT << (52 - m_rank))) AS s,
         COUNT(*) AS nonzero
  FROM stacked GROUP BY set_tag
),
sfull AS (
  SELECT set_tag, nonzero,
         s + ({HLL_M} - nonzero) * (1::BIGINT << 52) AS s_full
  FROM agg
),
ests AS (
  SELECT set_tag,
         CAST(FLOOR(
           CASE WHEN ({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)!r}::DOUBLE
                      * {_TWO52!r}::DOUBLE / CAST(s_full AS DOUBLE)) <= {2.5 * HLL_M!r}::DOUBLE
                     AND ({HLL_M} - nonzero) > 0
                THEN {float(HLL_M)!r}::DOUBLE
                     * ln({float(HLL_M)!r}::DOUBLE / CAST({HLL_M} - nonzero AS DOUBLE))
                ELSE ({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)!r}::DOUBLE
                      * {_TWO52!r}::DOUBLE / CAST(s_full AS DOUBLE)) END
         ) AS BIGINT) AS hll_estimate
  FROM sfull
),
exacts AS (
  SELECT event_type AS set_tag, COUNT(DISTINCT user_id) AS exact_distinct
  FROM ev GROUP BY 1
  UNION ALL
  SELECT 'union', COUNT(DISTINCT user_id) FROM ev
),
per_set AS (
  SELECT x.set_tag, x.exact_distinct, e.hll_estimate
  FROM exacts x JOIN ests e USING (set_tag)
),
inter AS (
  SELECT 'intersection' AS set_tag,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT user_id FROM ev GROUP BY user_id
            HAVING COUNT(DISTINCT event_type) = 2)) AS exact_distinct,
         GREATEST(0::BIGINT,
           COALESCE((SELECT hll_estimate FROM ests WHERE set_tag = '{HLL_SET_A}'), 0)
           + COALESCE((SELECT hll_estimate FROM ests WHERE set_tag = '{HLL_SET_B}'), 0)
           - COALESCE((SELECT hll_estimate FROM ests WHERE set_tag = 'union'), 0))
           AS hll_estimate
)
SELECT set_tag, CAST(exact_distinct AS BIGINT) AS exact_distinct,
       hll_estimate
FROM (SELECT * FROM per_set UNION ALL SELECT * FROM inter)
ORDER BY set_tag
"""
