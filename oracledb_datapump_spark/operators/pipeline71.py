"""Batch 71: one-way ANOVA, Brown–Forsythe variance check,
Kruskal–Wallis — the group-difference test family.

- ``anova_price_by_type`` — the one-way ANOVA F of part retail price
  across the part-type groups, exact integer sums of squares
  (SSB = Σ Sⱼ²/nⱼ − S²/n, SSW = Σx² − Σ Sⱼ²/nⱼ) and F in milli-units
  against the F(k−1, ∞) 5% literal. THE parametric "do groups differ
  in mean" test, previously missing from the stats family (χ²
  covers categorical×categorical, MW-U covers two groups).
- ``levene_variance_check`` — Brown–Forsythe (1974): the same ANOVA F
  applied to |x − group median| (exact lower medians). Equal means
  can hide unequal VARIANCES — the homoscedasticity gate ANOVA's own
  validity rests on, and a drift signal in its own right.
- ``kruskal_wallis_price`` — the rank-based ANOVA (Kruskal–Wallis
  1952): H = 12·Σ Rⱼ²/nⱼ / (n(n+1)) − 3(n+1) with average ranks
  carried ×2 to stay integer. Distribution-free — the cross-check
  when the parametric F's normality assumption is in doubt; H vs the
  χ²(k−1) 5% literal.

All integer under the cross-engine hash. Reference scope: analytics
extensions per SURVEY §2.9-2.10 (the reference ships data movement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.global_order import with_global_order_stat

#: F(5, ∞) upper 5% ≈ 2.214 (milli) — k = 6 part types.
ANOVA_F_CRIT_MILLI = 2_214
#: χ²(5) upper 5% ≈ 11.070 (milli).
KW_CHI2_CRIT_MILLI = 11_070


def _cents(col: str) -> str:
    return f"CAST(round({col} * 100) AS LONG)"


# ---------------------------------------------------------------------------
# shared integer ANOVA reduce (Spark side)
# ---------------------------------------------------------------------------


def _anova_frame(vals: DataFrame) -> DataFrame:
    """vals(grp, x) → 1-row (k_groups, n, ssb_q, ssw_q, f_milli,
    signif_flag). Truncating div inside Σ Sⱼ²/nⱼ is shared by both
    engines; f_milli = (SSB div (k−1))·1000 div (SSW div (n−k)) keeps
    every intermediate under ~2e16 for 1e5 groups rows of 1e5-cent
    values (past that, rescale x by 10 — documented)."""
    per = vals.groupBy("grp").agg(
        F.count(F.lit(1)).alias("nj"),
        F.sum("x").alias("sj"),
        F.sum(F.col("x") * F.col("x")).alias("sjj"),
    )
    return (
        per.agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("nj").alias("n"),
            F.sum("sj").alias("s"),
            F.sum("sjj").alias("sxx"),
            F.sum(F.expr("sj * sj div nj")).alias("sb"),
        )
        .select(
            F.col("k").cast("long").alias("k_groups"),
            F.col("n").cast("long").alias("n"),
            F.expr("sb - s * s div n").cast("long").alias("ssb_q"),
            F.expr("sxx - sb").cast("long").alias("ssw_q"),
        )
        .withColumn(
            "f_milli",
            F.expr(
                "(ssb_q div (k_groups - 1)) * 1000 div "
                "greatest(ssw_q div (n - k_groups), 1)"
            ).cast("long"),
        )
        .withColumn("signif_flag", F.col("f_milli") > ANOVA_F_CRIT_MILLI)
    )


_ANOVA_SQL_TAIL = f"""
per AS (
  SELECT grp, COUNT(*) AS nj, SUM(x) AS sj, SUM(x * x) AS sjj
  FROM vals GROUP BY grp
),
agg AS (
  SELECT COUNT(*) AS k, SUM(nj) AS n, SUM(sj) AS s, SUM(sjj) AS sxx,
         SUM(sj * sj // nj) AS sb
  FROM per
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
       CAST(sb - s * s // n AS BIGINT) AS ssb_q,
       CAST(sxx - sb AS BIGINT) AS ssw_q,
       CAST(((sb - s * s // n) // (k - 1)) * 1000
            // GREATEST((sxx - sb) // (n - k), 1) AS BIGINT) AS f_milli,
       ((sb - s * s // n) // (k - 1)) * 1000
         // GREATEST((sxx - sb) // (n - k), 1) > {ANOVA_F_CRIT_MILLI}
         AS signif_flag
FROM agg
"""


def anova_price_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k_groups, n, ssb_q, ssw_q, f_milli, signif_flag): one-way ANOVA
    of part retail price (cents) across part types. See module doc;
    f_milli > {ANOVA_F_CRIT_MILLI} rejects equal group means at 5%.

    Scale shape: one scan, one ≤|types| groupBy, a 1-row reduce."""
    vals = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_type").alias("grp"),
        F.expr(_cents("p_retailprice")).alias("x"),
    )
    return _anova_frame(vals)


ANOVA_PRICE_SQL = f"""
WITH vals AS (
  SELECT p_type AS grp, CAST(round(p_retailprice * 100) AS BIGINT) AS x
  FROM part
),
{_ANOVA_SQL_TAIL}
"""


def levene_variance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k_groups, n, ssb_q, ssw_q, f_milli, signif_flag): Brown–
    Forsythe — the ANOVA F over zᵢⱼ = |xᵢⱼ − median(group j)| (exact
    lower medians, rank (nⱼ+1) div 2). A significant F here means the
    SPREADS differ across part types, whatever the means do.

    Scale shape: one scan, one per-group rank window (partitioned),
    the ≤|types| median join, then the shared 1-row ANOVA reduce."""
    x = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_type").alias("grp"),
        F.col("p_partkey").alias("pk"),
        F.expr(_cents("p_retailprice")).alias("x"),
    )
    wn = Window.partitionBy("grp").orderBy("x", "pk")
    med = (
        x.withColumn("rn", F.row_number().over(wn))
        .withColumn(
            "nj", F.count(F.lit(1)).over(Window.partitionBy("grp"))
        )
        .filter(F.col("rn") == F.expr("(nj + 1) div 2"))
        .select("grp", F.col("x").alias("m"))
    )
    vals = x.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("x") - F.col("m")).alias("x")
    )
    return _anova_frame(vals)


LEVENE_SQL = f"""
WITH xs AS (
  SELECT p_type AS grp, p_partkey AS pk,
         CAST(round(p_retailprice * 100) AS BIGINT) AS x
  FROM part
),
med AS (
  SELECT grp, x AS m FROM (
    SELECT grp, x,
           ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, pk) AS rn,
           COUNT(*) OVER (PARTITION BY grp) AS nj
    FROM xs
  ) WHERE rn = (nj + 1) // 2
),
vals AS (
  SELECT xs.grp, ABS(xs.x - med.m) AS x
  FROM xs JOIN med ON med.grp = xs.grp
),
{_ANOVA_SQL_TAIL}
"""


def kruskal_wallis_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k_groups, n, h_milli, signif_flag): Kruskal–Wallis over part
    retail price ranks across part types. Average ranks for ties are
    carried ×2 (r2 = 2·avg_rank = rank() + rank()+ties−1, both
    integer), so Rⱼ²/nⱼ = (Σr2)² div (4nⱼ) exactly, and
    h_milli = 12000·Σ div (n(n+1)) − 3000(n+1). Compared against the
    χ²(k−1) 5% literal {KW_CHI2_CRIT_MILLI}. Int64 headroom: (Σr2)²
    needs n ≲ 1e5 rows at these group sizes — past that, divide ranks
    by 16 first (documented).

    Scale shape: one scan, one (grp, x) count aggregate, then the
    rank arithmetic runs entirely over the DISTINCT-VALUE table: a
    range-partitioned global cumsum of per-value counts
    (functions/global_order — ~|distinct prices| rows, never the fact
    table) gives every tie group its closed-form doubled average rank
    r2 = 2·cum − cₓ + 1 (= rank + rank + ties − 1, since
    min-rank = cum − cₓ + 1); a value-keyed join back to the
    (grp, x) counts, one ≤|types| groupBy, a 1-row reduce. No window
    ever sees a fact-sized frame."""
    x = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_type").alias("grp"),
        F.expr(_cents("p_retailprice")).alias("x"),
    )
    gx = x.groupBy("grp", "x").agg(F.count(F.lit(1)).alias("c"))
    vx = gx.groupBy("x").agg(F.sum("c").alias("cx"))
    vxr, _ = with_global_order_stat(
        vx, [F.col("x")], cumsum_col="cx", out="cum"
    )
    r2v = vxr.select(
        "x", (2 * F.col("cum") - F.col("cx") + 1).alias("r2")
    )
    per = (
        gx.join(r2v, "x")
        .groupBy("grp")
        .agg(
            F.sum("c").alias("nj"),
            F.sum(F.col("c") * F.col("r2")).alias("sr2"),
        )
    )
    return (
        per.agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("nj").alias("n"),
            F.sum(F.expr("sr2 * sr2 div (4 * nj)")).alias("rterm"),
        )
        .select(
            F.col("k").cast("long").alias("k_groups"),
            F.col("n").cast("long").alias("n"),
            F.expr(
                "12000 * rterm div (n * (n + 1)) - 3000 * (n + 1)"
            )
            .cast("long")
            .alias("h_milli"),
        )
        .withColumn("signif_flag", F.col("h_milli") > KW_CHI2_CRIT_MILLI)
    )


KRUSKAL_WALLIS_SQL = f"""
WITH xs AS (
  SELECT p_type AS grp, CAST(round(p_retailprice * 100) AS BIGINT) AS x
  FROM part
),
ranked AS (
  SELECT grp,
         RANK() OVER (ORDER BY x) + RANK() OVER (ORDER BY x)
           + COUNT(*) OVER (PARTITION BY x) - 1 AS r2
  FROM xs
),
per AS (
  SELECT grp, COUNT(*) AS nj, SUM(r2) AS sr2 FROM ranked GROUP BY grp
),
agg AS (
  SELECT COUNT(*) AS k, SUM(nj) AS n,
         SUM(sr2 * sr2 // (4 * nj)) AS rterm
  FROM per
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
       CAST(12000 * rterm // (n * (n + 1)) - 3000 * (n + 1) AS BIGINT)
         AS h_milli,
       12000 * rterm // (n * (n + 1)) - 3000 * (n + 1)
         > {KW_CHI2_CRIT_MILLI} AS signif_flag
FROM agg
"""
