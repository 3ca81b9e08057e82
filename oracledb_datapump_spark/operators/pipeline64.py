"""Batch 64: ABC-XYZ inventory matrix, Cochran–Mantel–Haenszel pooled
odds, capture–recapture dedup coverage, Hurst R/S curve.

- ``abc_xyz_matrix`` — the inventory planner's two-way classification:
  ABC by cumulative revenue share (A ≤ 70%, B ≤ 90%, C rest — the
  Pareto cut revenue_pareto_bands applies to customers, here per part)
  crossed with XYZ by demand variability (coefficient of variation of
  the monthly quantity series over the DENSE month axis: X < 0.5,
  Y < 1.0, Z else). The cell counts drive safety-stock policy; both
  axes exact integer (cum-share ppm; CV via isqrt(M·Σq²−(Σq)²)).
- ``cmh_pooled_odds`` — the Cochran–Mantel–Haenszel common odds ratio
  across return-flag strata for exposure = discount ≥ 5% vs outcome =
  quantity ≥ 25: Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ), each term exact-integer
  ppm. THE textbook fix for batch 63's Simpson reversals — pool
  within-stratum association instead of pooling rows.
- ``dedup_capture_recapture`` — Chapman's bias-corrected
  capture–recapture estimate of the TRUE near-dup pair population
  from two independent catch methods (≥3 shared shingles vs shared
  16-char prefix): N̂ = (n₁+1)(n₂+1)/(m+1) − 1. Every dedup-eval op
  so far scores methods against each other; this estimates what ALL
  of them miss (the ecology estimator, Chapman 1951).
- ``hurst_rs_report`` — the rescaled-range (R/S) curve of the daily
  event-count series at block sizes 3/6/12/24 days (the fixture timeline spans 30 days; the doubling chain is what matters, not the absolute sizes) (Hurst 1951,
  Mandelbrot's long-memory diagnostic). rs_ratio_ppm between
  consecutive block sizes encodes 2^H smoothly (ratio ≈ 2^H), so the
  curve reads H without any float log: ~1.41e6 ⇒ H≈0.5 (no memory),
  higher ⇒ persistent trends.

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat
from ..functions.local_table import values_df

DAY_US = 86_400_000_000
#: ABC cumulative revenue-share cuts (ppm).
ABC_A_PPM = 700_000
ABC_B_PPM = 900_000
#: XYZ coefficient-of-variation cuts (ppm).
XYZ_X_PPM = 500_000
XYZ_Y_PPM = 1_000_000
#: CMH exposure/outcome cuts.
CMH_DISC_PCT = 5
CMH_QTY = 25
#: capture-recapture method-1 floor (shared 3-shingles).
CRC_MIN_SHARED = 3
#: capture-recapture method-2 key length (alnum prefix).
CRC_KEY_LEN = 16
#: Hurst block sizes (days).
HURST_BLOCKS = (3, 6, 12, 24)


# ---------------------------------------------------------------------------
# ABC-XYZ matrix
# ---------------------------------------------------------------------------


def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(abc, xyz, n_parts, revenue_cents): the 9-cell inventory
    classification. ABC: parts sorted by revenue desc, cumulative
    revenue share in exact ppm, cut at {ABC_A_PPM}/{ABC_B_PPM} (the
    cut applies to the share INCLUDING the part — the cumulative-band
    convention revenue_pareto_bands pins). XYZ: per part, CV of the
    monthly quantity over the dense min..max month axis, cv_ppm =
    isqrt(M·Σq² − (Σq)²)·1e6 div Σq (σ/mean with the M² cancelled —
    absent months count as zero demand, which is the point of XYZ).
    Cells missing from the data are absent rows, identically so in
    both engines.

    Scale shape: one lineitem scan → (part, month) groupBy → part
    rollup; the cum-share window is a range-partitioned total sort of
    the PART aggregate (dimension-sized, not fact-sized); the matrix
    is a ≤9-row groupBy."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.expr("CAST(round(l_extendedprice * 100) AS LONG)").alias("rc"),
        F.expr("CAST(l_quantity AS LONG)").alias("q"),
        F.expr(
            "(year(l_shipdate) - 1990) * 12 + month(l_shipdate) - 1"
        ).alias("mon"),
    )
    bounds = li.agg(
        (F.max("mon") - F.min("mon") + 1).alias("mm")
    )
    pm = li.groupBy("l_partkey", "mon").agg(F.sum("q").alias("mq"))
    part = pm.groupBy("l_partkey").agg(
        F.sum("mq").alias("sq"),
        F.sum(F.col("mq") * F.col("mq")).alias("sq2"),
    )
    rev = li.groupBy("l_partkey").agg(F.sum("rc").alias("rev"))
    # range-partitioned global cumsum (functions/global_order) over the
    # per-part revenue — the Pareto sort distributes, and the helper's
    # grand total IS trev (no separate total pass/crossJoin)
    cumdf, trev = with_global_order_stat(
        rev,
        [F.desc("rev"), F.asc("l_partkey")],
        cumsum_col="rev",
        out="cum",
    )
    classified = (
        cumdf.join(part, "l_partkey")
        .crossJoin(F.broadcast(bounds))
        .select(
            "l_partkey",
            "rev",
            F.expr(
                f"CASE WHEN cum * 1000000 <= {ABC_A_PPM} * {trev} THEN 'A' "
                f"WHEN cum * 1000000 <= {ABC_B_PPM} * {trev} THEN 'B' "
                "ELSE 'C' END"
            ).alias("abc"),
            F.expr(
                "CAST(FLOOR(SQRT(CAST(mm * sq2 - sq * sq AS DOUBLE))) "
                "AS BIGINT) * 1000000 div greatest(sq, 1)"
            ).alias("cv_ppm"),
        )
        .withColumn(
            "xyz",
            F.expr(
                f"CASE WHEN cv_ppm < {XYZ_X_PPM} THEN 'X' "
                f"WHEN cv_ppm < {XYZ_Y_PPM} THEN 'Y' ELSE 'Z' END"
            ),
        )
    )
    return (
        classified.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
        )
        .orderBy("abc", "xyz")
    )


ABC_XYZ_SQL = f"""
WITH li AS (
  SELECT l_partkey, CAST(round(l_extendedprice * 100) AS BIGINT) AS rc,
         CAST(l_quantity AS BIGINT) AS q,
         (year(l_shipdate) - 1990) * 12 + month(l_shipdate) - 1 AS mon
  FROM lineitem
),
bounds AS (SELECT MAX(mon) - MIN(mon) + 1 AS mm FROM li),
pm AS (SELECT l_partkey, mon, SUM(q) AS mq FROM li GROUP BY 1, 2),
part AS (
  SELECT l_partkey, SUM(mq) AS sq, SUM(mq * mq) AS sq2
  FROM pm GROUP BY l_partkey
),
rev AS (SELECT l_partkey, SUM(rc) AS rev FROM li GROUP BY l_partkey),
tot AS (SELECT SUM(rev) AS trev FROM rev),
classified AS (
  SELECT r.l_partkey, r.rev,
         CASE WHEN SUM(r.rev) OVER (ORDER BY r.rev DESC, r.l_partkey
                                    ROWS UNBOUNDED PRECEDING) * 1000000
                   <= {ABC_A_PPM} * t.trev THEN 'A'
              WHEN SUM(r.rev) OVER (ORDER BY r.rev DESC, r.l_partkey
                                    ROWS UNBOUNDED PRECEDING) * 1000000
                   <= {ABC_B_PPM} * t.trev THEN 'B'
              ELSE 'C' END AS abc,
         CAST(FLOOR(SQRT(CAST(b.mm * p.sq2 - p.sq * p.sq AS DOUBLE)))
              AS BIGINT) * 1000000 // GREATEST(p.sq, 1) AS cv_ppm
  FROM rev r JOIN part p ON p.l_partkey = r.l_partkey
  CROSS JOIN bounds b CROSS JOIN tot t
)
SELECT abc,
       CASE WHEN cv_ppm < {XYZ_X_PPM} THEN 'X'
            WHEN cv_ppm < {XYZ_Y_PPM} THEN 'Y' ELSE 'Z' END AS xyz,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents
FROM classified
GROUP BY 1, 2
ORDER BY abc, xyz
"""


# ---------------------------------------------------------------------------
# Cochran–Mantel–Haenszel pooled odds ratio
# ---------------------------------------------------------------------------


def cmh_pooled_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stratum, a, b, c, d, or_ppm, cmh_or_ppm): the 2×2×K analysis of
    exposure = discount ≥ {CMH_DISC_PCT}% vs outcome = quantity ≥
    {CMH_QTY}, stratified by return flag. Per-stratum odds ratio
    a·d·1e6 div b·c; the pooled CMH estimator weights each stratum by
    1/nᵢ — numerator Σ(aᵢ·dᵢ·1e6 div nᵢ), denominator
    Σ(bᵢ·cᵢ·1e6 div nᵢ), ratio re-scaled to ppm. Same value on every
    row (the pooled verdict, batch 63's Simpson scan is its
    motivation). Int64: a·d ≤ n²/4 — exact to n ≈ 4e9 per stratum.

    Scale shape: one scan, one ≤|flags| groupBy, one ≤K-row reduce."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_returnflag").alias("stratum"),
        (
            F.expr("CAST(floor(l_discount * 100) AS LONG)") >= CMH_DISC_PCT
        ).alias("exp"),
        (F.expr("CAST(l_quantity AS LONG)") >= CMH_QTY).alias("out"),
    )
    cells = li.groupBy("stratum").agg(
        F.sum((F.col("exp") & F.col("out")).cast("long")).alias("a"),
        F.sum((F.col("exp") & ~F.col("out")).cast("long")).alias("b"),
        F.sum((~F.col("exp") & F.col("out")).cast("long")).alias("c"),
        F.sum((~F.col("exp") & ~F.col("out")).cast("long")).alias("d"),
    )
    pooled = cells.agg(
        F.sum(
            F.expr("a * d * 1000000 div (a + b + c + d)")
        ).alias("num"),
        F.sum(
            F.expr("b * c * 1000000 div (a + b + c + d)")
        ).alias("den"),
    )
    return (
        cells.crossJoin(F.broadcast(pooled))
        .select(
            "stratum",
            F.col("a").cast("long"),
            F.col("b").cast("long"),
            F.col("c").cast("long"),
            F.col("d").cast("long"),
            F.expr("a * d * 1000000 div greatest(b * c, 1)")
            .cast("long")
            .alias("or_ppm"),
            F.expr("num * 1000000 div greatest(den, 1)")
            .cast("long")
            .alias("cmh_or_ppm"),
        )
        .orderBy("stratum")
    )


CMH_POOLED_SQL = f"""
WITH li AS (
  SELECT l_returnflag AS stratum,
         CAST(floor(l_discount * 100) AS BIGINT) >= {CMH_DISC_PCT} AS expo,
         CAST(l_quantity AS BIGINT) >= {CMH_QTY} AS outc
  FROM lineitem
),
cells AS (
  SELECT stratum,
         SUM(CASE WHEN expo AND outc THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN expo AND NOT outc THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN NOT expo AND outc THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN NOT expo AND NOT outc THEN 1 ELSE 0 END) AS d
  FROM li GROUP BY stratum
),
pooled AS (
  SELECT SUM(a * d * 1000000 // (a + b + c + d)) AS num,
         SUM(b * c * 1000000 // (a + b + c + d)) AS den
  FROM cells
)
SELECT stratum, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       CAST(a * d * 1000000 // GREATEST(b * c, 1) AS BIGINT) AS or_ppm,
       CAST(num * 1000000 // GREATEST(den, 1) AS BIGINT) AS cmh_or_ppm
FROM cells CROSS JOIN pooled
ORDER BY stratum
"""


# ---------------------------------------------------------------------------
# Capture–recapture dedup coverage
# ---------------------------------------------------------------------------


def dedup_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_method1, n_method2, overlap, chapman_est, cov1_ppm, cov2_ppm):
    Chapman's capture–recapture estimate of the true near-dup pair
    count from two independent catch methods — method 1 = pairs with
    ≥{CRC_MIN_SHARED} shared 3-shingles (content catch), method 2 =
    pairs sharing their first {CRC_KEY_LEN} alnum chars (prefix
    catch). N̂ = (n₁+1)(n₂+1) div (overlap+1) − 1; covᵢ = nᵢ/N̂ is how
    much of the estimated population each method sees — the
    what-are-we-missing number no pairwise method-agreement report can
    give. (Independence caveat documented: both catches key on text,
    so N̂ is a LOWER bound on the true population — the standard
    ecology reading.)

    Scale shape: method 1 is the blocked shingle pair join (guarded-
    quadratic posture at 100 TB: ride LSH candidates); method 2 is a
    groupBy(prefix) with C(m,2) per group — bounded by the prefix
    histogram; the estimator is a 1-row reduce."""
    from .dedup import _shingles, shingle_pair_intersections

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # r16: both catch methods expand pairs row-locally from posting
    # lists (guide §2.4, the shared shingle_pair_intersections plan)
    # instead of self-joins — same pair sets, one exchange each instead
    # of two + SMJ sorts, and the shingle lineage computed once.
    m1 = (
        shingle_pair_intersections(_shingles(spark, sf_dir))
        .filter(F.col("inter") >= CRC_MIN_SHARED)
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    keyed = d.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""),
            1,
            CRC_KEY_LEN,
        ).alias("shingle"),
    )
    # each doc has exactly one prefix key, so every same-key pair
    # appears once (inter ≡ 1) — identical to the old prefix self-join
    m2 = (
        shingle_pair_intersections(keyed)
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    ov = m1.join(m2, ["d1", "d2"]).count()
    n1, n2 = m1.count(), m2.count()
    chap = (n1 + 1) * (n2 + 1) // (ov + 1) - 1
    return values_df(spark,
        [
            (
                n1,
                n2,
                ov,
                chap,
                n1 * 1_000_000 // max(chap, 1),
                n2 * 1_000_000 // max(chap, 1),
            )
        ],
        "n_method1 long, n_method2 long, overlap long, chapman_est long,"
        " cov1_ppm long, cov2_ppm long",
    )


def _crc_sql() -> str:
    from .dedup import SQL_SHINGLES_CTE

    return f"""
WITH {SQL_SHINGLES_CTE.strip()},
m1 AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM shingles a JOIN shingles b
    ON b.shingle = a.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {CRC_MIN_SHARED}
),
keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, {CRC_KEY_LEN}) AS k
  FROM documents
),
m2 AS (
  SELECT ka.doc_id AS d1, kb.doc_id AS d2
  FROM keyed ka JOIN keyed kb
    ON kb.k = ka.k AND ka.doc_id < kb.doc_id
),
counts AS (
  SELECT (SELECT COUNT(*) FROM m1) AS n1,
         (SELECT COUNT(*) FROM m2) AS n2,
         (SELECT COUNT(*) FROM m1 JOIN m2 USING (d1, d2)) AS ov
)
SELECT CAST(n1 AS BIGINT) AS n_method1, CAST(n2 AS BIGINT) AS n_method2,
       CAST(ov AS BIGINT) AS overlap,
       CAST((n1 + 1) * (n2 + 1) // (ov + 1) - 1 AS BIGINT) AS chapman_est,
       CAST(n1 * 1000000
            // GREATEST((n1 + 1) * (n2 + 1) // (ov + 1) - 1, 1) AS BIGINT)
         AS cov1_ppm,
       CAST(n2 * 1000000
            // GREATEST((n1 + 1) * (n2 + 1) // (ov + 1) - 1, 1) AS BIGINT)
         AS cov2_ppm
FROM counts
"""


DEDUP_CRC_SQL = _crc_sql()


# ---------------------------------------------------------------------------
# Hurst rescaled-range curve
# ---------------------------------------------------------------------------


def hurst_rs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(block_days, n_blocks, rs_avg_q, rs_ratio_ppm): the R/S curve of
    the daily event-count series. For each block size b ∈
    {HURST_BLOCKS} the series splits into complete b-day blocks; within
    a block, deviations are scaled ×b to stay integer (zᵢ = b·xᵢ −
    Σx), R_b = max cum z − min cum z, and S_b = isqrt(b·Σx² − (Σx)²)
    (= b·σ, the same ×b scale, so R/S = R_b div S_b exactly).
    rs_avg_q = mean of per-block R/S ×1000; rs_ratio_ppm between
    consecutive sizes reads the Hurst exponent without any float log:
    E[R/S] ∝ b^H ⇒ ratio ≈ 2^H·1e6 (1.41e6 ⇒ H = 0.5, i.i.d.; the
    persistent-memory diagnostic of Hurst 1951).

    Scale shape: one scan → |days| rows (dense axis via sequence
    explode, pipeline21's pattern), ×4 block sizes, per-(size, block)
    window cumsums over ≤64-row partitions, a 4-row output."""
    from ..events_source import load_events

    daily = (
        load_events(spark, sf_dir)
        .select(F.expr(f"ts_us div {DAY_US}").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dense = (
        bounds.select(
            F.explode(F.expr("sequence(d0, d1)")).alias("day")
        )
        .join(daily, "day", "left")
        .select(
            "day", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x")
        )
        .crossJoin(F.broadcast(bounds.select("d0")))
        .select((F.col("day") - F.col("d0")).alias("i"), "x")
    )
    sizes = values_df(spark,
        [(b,) for b in HURST_BLOCKS], "b long"
    )
    blk = dense.crossJoin(F.broadcast(sizes)).select(
        "b", F.expr("i div b").alias("blk"), "i", "x"
    )
    stats = blk.groupBy("b", "blk").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    wcum = (
        Window.partitionBy("b", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = blk.join(stats, ["b", "blk"]).select(
        "b",
        "blk",
        "i",
        (F.sum(F.col("x") * F.col("b")).over(wcum)
         - F.expr("(i - blk * b + 1) * sx")).alias("z"),
        "nb",
        "sx",
        "sx2",
    )
    per_block = (
        cum.filter(F.col("nb") == F.col("b"))
        .groupBy("b", "blk", "sx", "sx2")
        .agg((F.max("z") - F.min("z")).alias("r"))
        .select(
            "b",
            F.expr(
                "r * 1000 div greatest(CAST(FLOOR(SQRT(CAST("
                "b * sx2 - sx * sx AS DOUBLE))) AS BIGINT), 1)"
            ).alias("rs_q"),
        )
    )
    agg = per_block.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.expr("sum(rs_q) div count(1)").cast("long").alias("rs_avg_q"),
    )
    wlag = Window.orderBy("b")
    return (
        agg.withColumn(
            "rs_ratio_ppm",
            F.expr(
                "CASE WHEN lag(rs_avg_q, 1) over (order by b) IS NULL "
                "THEN 0 ELSE rs_avg_q * 1000000 div "
                "lag(rs_avg_q, 1) over (order by b) END"
            ).cast("long"),
        )
        .select(
            F.col("b").cast("long").alias("block_days"),
            "n_blocks",
            "rs_avg_q",
            "rs_ratio_ppm",
        )
        .orderBy("block_days")
    )


HURST_RS_SQL = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
dense AS (
  SELECT g.day - b.d0 AS i, COALESCE(d.x, 0) AS x
  FROM bounds b
  CROSS JOIN (SELECT unnest(range((SELECT d0 FROM bounds),
                                  (SELECT d1 FROM bounds) + 1)) AS day) g
  LEFT JOIN daily d ON d.day = g.day
),
sizes AS (SELECT unnest([{", ".join(str(b) for b in HURST_BLOCKS)}]) AS b),
blk AS (
  SELECT s.b, dn.i // s.b AS blk, dn.i, dn.x
  FROM dense dn CROSS JOIN sizes s
),
stats AS (
  SELECT b, blk, COUNT(*) AS nb, SUM(x) AS sx, SUM(x * x) AS sx2
  FROM blk GROUP BY b, blk
),
cum AS (
  SELECT k.b, k.blk,
         SUM(k.x * k.b) OVER (PARTITION BY k.b, k.blk ORDER BY k.i
                              ROWS UNBOUNDED PRECEDING)
           - (k.i - k.blk * k.b + 1) * s.sx AS z,
         s.nb, s.sx, s.sx2
  FROM blk k JOIN stats s ON s.b = k.b AND s.blk = k.blk
),
per_block AS (
  SELECT b, blk,
         (MAX(z) - MIN(z)) * 1000
           // GREATEST(CAST(FLOOR(SQRT(CAST(
                b * sx2 - sx * sx
              AS DOUBLE))) AS BIGINT), 1) AS rs_q
  FROM cum WHERE nb = b
  GROUP BY b, blk, sx, sx2
),
agg AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(rs_q) // COUNT(*) AS BIGINT) AS rs_avg_q
  FROM per_block GROUP BY b
)
SELECT CAST(b AS BIGINT) AS block_days, n_blocks, rs_avg_q,
       CAST(CASE WHEN LAG(rs_avg_q, 1) OVER (ORDER BY b) IS NULL THEN 0
            ELSE rs_avg_q * 1000000
                 // LAG(rs_avg_q, 1) OVER (ORDER BY b) END
            AS BIGINT) AS rs_ratio_ppm
FROM agg
ORDER BY block_days
"""
