"""Batch 36: categorical-dependence profiling and in-sample Markov
evaluation.

- ``chi2_independence_matrix`` — the profiling question FD discovery
  (pipeline34) cannot answer: two columns can be far from functionally
  dependent yet statistically entangled. Pearson's chi-square statistic
  over three categorical column pairs, integer-exact in ppm (the
  DECIMAL(38,0)/HUGEINT product recipe — no float expected-count
  arithmetic to diverge between engines).
- ``markov_top1_accuracy`` — closes the loop on the transition matrix
  ops (markov_transition_matrix): train the global top-1 next-event
  predictor per previous event type and measure its in-sample accuracy.
  The argmax tie-breaks lexicographically so the gate stays
  deterministic.

Both are scan + bounded-aggregate shapes: contingency tables are
|levels(a)| x |levels(b)| rows, transition tables |types|^2 — model-
scale frames after one partial-aggregated groupBy each, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..events_source import load_events

DAY_US = 86_400_000_000


def _chi2_arm(
    df: DataFrame, pair_name: str, a: str, b: str
) -> DataFrame:
    """chi2_ppm for one categorical pair: per contingency cell the
    integer term ((n·N − r·c)² · 1e6) div (N·r·c), summed — Σ of the
    classic (O−E)²/E with every division deferred and every product
    widened to DECIMAL(38,0). Row/col marginals are tiny frames joined
    back broadcast; the only corpus-scale work is the one groupBy."""
    # r16: pinned — the contingency table feeds the marginals, the
    # totals and the final join (four subtrees); unpinned, each re-ran
    # the corpus-scale groupBy from the scan. The pinned frame is
    # |a|×|b| categories — model-sized at any corpus scale.
    cells = df.groupBy(
        F.col(a).alias("av"), F.col(b).alias("bv")
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    rows = cells.groupBy("av").agg(F.sum("n").alias("r"))
    cols = cells.groupBy("bv").agg(F.sum("n").alias("c"))
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("av").alias("nr"),
        F.countDistinct("bv").alias("nc"),
    )
    term = F.expr(
        """
        (CAST(n AS DECIMAL(38,0)) * nn - CAST(r AS DECIMAL(38,0)) * c)
        * (CAST(n AS DECIMAL(38,0)) * nn - CAST(r AS DECIMAL(38,0)) * c)
        * 1000000
        div (CAST(nn AS DECIMAL(38,0)) * r * c)
        """
    )
    return (
        cells.join(F.broadcast(rows), "av")
        .join(F.broadcast(cols), "bv")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.lit(pair_name).alias("pair"),
            F.max(F.col("nn")).cast("long").alias("n_obs"),
            ((F.max("nr") - 1) * (F.max("nc") - 1))
            .cast("long")
            .alias("dof"),
            F.sum(term).cast("long").alias("chi2_ppm"),
        )
    )


def chi2_independence_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(pair, n_obs, dof, chi2_ppm): Pearson chi-square independence
    statistic for three categorical pairs — orders status × priority,
    lineitem returnflag × linestatus, events type × day-of-week (dow
    spelled as epoch-day mod 7, engine-neutral — Spark and DuckDB
    disagree on dayofweek() conventions). Integer-exact ppm via
    deferred division over DECIMAL(38,0) products, so the statistic
    sits under the value hash rather than a float tolerance."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = load_events(spark, sf_dir).withColumn(
        "dow", (F.expr(f"ts_us div {DAY_US}") % 7).cast("string")
    )
    return (
        _chi2_arm(o, "orders.status_x_priority", "o_orderstatus", "o_orderpriority")
        .unionByName(
            _chi2_arm(
                l,
                "lineitem.returnflag_x_linestatus",
                "l_returnflag",
                "l_linestatus",
            )
        )
        .unionByName(_chi2_arm(e, "events.type_x_dow", "event_type", "dow"))
        .orderBy("pair")
    )


def _chi2_arm_sql(pair_name: str, rel: str, a: str, b: str) -> str:
    return f"""
SELECT '{pair_name}' AS pair,
       CAST(MAX(nn) AS BIGINT) AS n_obs,
       CAST((MAX(nr) - 1) * (MAX(nc) - 1) AS BIGINT) AS dof,
       CAST(SUM(
         (CAST(n AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
         * (CAST(n AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
         * 1000000
         // (CAST(nn AS HUGEINT) * r * c)
       ) AS BIGINT) AS chi2_ppm
FROM (
  SELECT n, r, c, nn, nr, nc
  FROM (SELECT {a} AS av, {b} AS bv, COUNT(*) AS n FROM {rel} GROUP BY 1, 2) cells
  JOIN (SELECT {a} AS av, COUNT(*) AS r FROM {rel} GROUP BY 1) rows_ USING (av)
  JOIN (SELECT {b} AS bv, COUNT(*) AS c FROM {rel} GROUP BY 1) cols_ USING (bv)
  CROSS JOIN (SELECT COUNT(*) AS nn, COUNT(DISTINCT {a}) AS nr,
                     COUNT(DISTINCT {b}) AS nc FROM {rel}) tot
)
"""


CHI2_INDEPENDENCE_MATRIX_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {DAY_US}) % 7 AS VARCHAR) AS dow
  FROM events
)
{_chi2_arm_sql("orders.status_x_priority", "orders", "o_orderstatus", "o_orderpriority")}
UNION ALL
{_chi2_arm_sql("lineitem.returnflag_x_linestatus", "lineitem", "l_returnflag", "l_linestatus")}
UNION ALL
{_chi2_arm_sql("events.type_x_dow", "ev", "event_type", "dow")}
ORDER BY pair
"""


def markov_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, n_transitions, predicted_next, n_correct, acc_ppm):
    in-sample top-1 accuracy of the global next-event predictor. The
    transition list is a lag window per user (ordered by ts then
    event_id — the explicit tiebreak keeps simultaneous events
    deterministic); the predictor per previous type is the most
    frequent successor, ties to the lexicographically smallest. The
    report every sessionized-recommendation pipeline reads before
    shipping a 'users who did X next did Y' feature. One user-keyed
    window + two |types|-bounded aggregates — transition state never
    exceeds |types|² rows."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    tr = (
        e.select(
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = tr.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    pick = Window.partitionBy("prev_type").orderBy(
        F.desc("n"), F.asc("next_type")
    )
    pred = (
        counts.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "prev_type",
            F.col("next_type").alias("predicted_next"),
            F.col("n").alias("n_correct"),
        )
    )
    totals = counts.groupBy("prev_type").agg(
        F.sum("n").alias("n_transitions")
    )
    return (
        totals.join(pred, "prev_type")
        .select(
            "prev_type",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            "predicted_next",
            F.col("n_correct").cast("long").alias("n_correct"),
            F.expr("n_correct * 1000000 div n_transitions")
            .cast("long")
            .alias("acc_ppm"),
        )
        .orderBy("prev_type")
    )


MARKOV_TOP1_ACCURACY_SQL = """
WITH tr AS (
  SELECT prev_type, event_type AS next_type
  FROM (
    SELECT event_type,
           LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM tr GROUP BY 1, 2
),
pred AS (
  SELECT prev_type, next_type AS predicted_next, n AS n_correct
  FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY prev_type ORDER BY n DESC, next_type) AS rk
    FROM counts
  ) WHERE rk = 1
),
totals AS (
  SELECT prev_type, SUM(n) AS n_transitions FROM counts GROUP BY 1
)
SELECT t.prev_type,
       CAST(t.n_transitions AS BIGINT) AS n_transitions,
       p.predicted_next,
       CAST(p.n_correct AS BIGINT) AS n_correct,
       CAST(p.n_correct * 1000000 // t.n_transitions AS BIGINT) AS acc_ppm
FROM totals t JOIN pred p USING (prev_type)
ORDER BY prev_type
"""
