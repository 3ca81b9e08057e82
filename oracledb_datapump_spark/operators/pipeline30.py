"""Batch 30: SCD2 interval builder, golden-record fusion, item-item CF.

Warehouse-temporal, entity-resolution-completion and recommender
operators, each oracle-backed and partition-scale-sound: the SCD2 build
is one window per entity (shuffle on the entity key), the fusion rides
the memoized verified-pair groups, and the CF pair explosion is bounded
by basket width, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# SCD2 interval build from an event log
# ---------------------------------------------------------------------------


def scd2_build_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_type, valid_from_us, valid_to_us, is_current):
    the batch SCD2 build — collapse each user's event log into
    validity intervals of their ``event_type`` state: a row opens an
    interval when the state CHANGES (or at the user's first event) and
    closes at the next change (NULL = current). The classic
    dimension-history build a warehouse runs over a CDC log; the
    streaming SCD2 join (streaming/joins.py scd2_enrich) consumes
    exactly this shape.

    Plan: two windows over the same (user_id | ts, event_id) ordering —
    lag to detect changes, lead over the change rows to close
    intervals. ONE shuffle on user_id serves both (same partitioning);
    nothing else moves. At 100 TB this is the textbook sessionize-
    shape: entity-keyed windows, no driver involvement. Timestamps are
    compared as unix micros (TIMESTAMP_NTZ pinned via CAST, the
    repo-standard recipe); event_id breaks ts ties deterministically."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        changes.withColumn("valid_to_us", F.lead("us").over(w2))
        .select(
            "user_id",
            "event_type",
            F.col("us").alias("valid_from_us"),
            "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


SCD2_BUILD_INTERVALS_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
), marked AS (
  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
            AS prev_type
  FROM ev
), changes AS (
  SELECT * FROM marked
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type, us AS valid_from_us,
       LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         AS valid_to_us,
       (LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL)
         AS is_current
FROM changes
ORDER BY user_id, valid_from_us
"""


# ---------------------------------------------------------------------------
# Golden-record fusion over verified duplicate clusters
# ---------------------------------------------------------------------------


def golden_record_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_id, n_members, n_sources, exemplar_doc, total_chars):
    survivorship after entity resolution — for every multi-member
    duplicate cluster (transitive closure of the LSH-verified pairs,
    dedup_groups), fuse the member attributes into one golden record:
    exemplar = the longest member (ties → lowest doc_id), plus
    member/source/char rollups. This is the step between "we found the
    duplicate clusters" and "the corpus keeps ONE canonical doc per
    cluster with provenance" — the ER textbook's survivorship rules as
    one keyed aggregate.

    Plan: the group labels ride the memoized verified-pair fixpoint
    (dedup.py:684); the fusion itself is one groupBy(group_id) over a
    |dup-docs| frame joined to the doc attributes — model-scale, far
    below corpus scale."""
    from .dedup import dedup_groups

    g = dedup_groups(spark, sf_dir).filter(F.col("group_size") > 1)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    m = g.join(d, "doc_id")
    # exemplar = argmax(n_chars, tie → min doc_id) via a composite
    # scalar key (doc_id ≪ 1e8 in every fixture; DuckDB's max_by takes
    # a scalar, so both engines rank by the same integer)
    exemplar = F.max(
        F.struct(
            (F.col("n_chars") * 100000000 - F.col("doc_id")).alias("key"),
            F.col("doc_id").alias("id"),
        )
    )
    return (
        m.groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            exemplar.getField("id").cast("long").alias("exemplar_doc"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("group_id")
    )


def _golden_record_sql() -> str:
    from .dedup import DEDUP_GROUPS_SQL

    groups = DEDUP_GROUPS_SQL.replace("ORDER BY c.doc_id", "")
    # DEDUP_GROUPS_SQL starts "WITH RECURSIVE pairs AS (..." — reuse its
    # CTE chain and aggregate on top instead of nesting a second WITH
    head, _, tail = groups.partition("SELECT c.doc_id, c.group_id, s.group_size")
    assert tail, "dedup groups SQL changed shape"
    return (
        head
        + """
SELECT g.group_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
       CAST(MAX_BY(d.doc_id, d.n_chars * 100000000 - d.doc_id) AS BIGINT)
         AS exemplar_doc,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM comp g
JOIN (SELECT group_id AS gid, COUNT(*) AS gs FROM comp GROUP BY gid) s
  ON g.group_id = s.gid
JOIN documents d ON d.doc_id = g.doc_id
WHERE s.gs > 1
GROUP BY g.group_id
ORDER BY g.group_id
"""
    )


GOLDEN_RECORD_FUSION_SQL = _golden_record_sql()


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (co-purchase cosine)
# ---------------------------------------------------------------------------

CF_TOP_K = 5
CF_MIN_CO = 2


def item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item, neighbor, co_cnt, score_ppm, rnk): item-item collaborative
    filtering over order baskets — for every part, the top-{CF_TOP_K}
    co-purchased parts by cosine over basket membership, score_ppm =
    co(i,j) · 1e6 div isqrt(cnt(i) · cnt(j)) (floor-sqrt of an int64 is
    correctly rounded in both engines — the repo-standard integer
    cosine). Pairs below {CF_MIN_CO} co-occurrences are noise-floored.

    Scale shape: the pair explosion is the basket self-join on
    l_orderkey — quadratic in BASKET WIDTH (≤ 7 lines for TPC-H-ish
    orders, bounded for any retail schema), linear in order count; the
    item-count side table joins by key. The amazon-style 'customers
    also bought' plan, kept entirely in integer arithmetic for the
    cross-engine hash."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # feeds the self-join (both sides) and the item counts
        .localCheckpoint(eager=True)
    )
    cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    # r16 (guide §2.4): ordered pairs expand row-locally from each
    # basket's part list (≤ 7 lines per order ⇒ ≤ 42 pairs, generated
    # inside the groupBy(order) stage) instead of the basket self-join —
    # one exchange of the basket stream instead of two plus both SMJ
    # sorts; the (i, j, count) multiset is identical.
    co = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("i"), "ps")
        .select("i", F.explode("ps").alias("j"))
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("co_cnt"))
        .filter(F.col("co_cnt") >= CF_MIN_CO)
    )
    ni = cnt.select(F.col("l_partkey").alias("i"), F.col("n").alias("ni"))
    nj = cnt.select(F.col("l_partkey").alias("j"), F.col("n").alias("nj"))
    scored = (
        co.join(ni, "i")
        .join(nj, "j")
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("neighbor"),
            F.col("co_cnt").cast("long").alias("co_cnt"),
            F.expr(
                "CAST(co_cnt * 1000000 DIV "
                "CAST(FLOOR(SQRT(CAST(ni AS DOUBLE) * nj)) AS BIGINT) "
                "AS BIGINT)"
            ).alias("score_ppm"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("score_ppm"), F.desc("co_cnt"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= CF_TOP_K)
        .orderBy("item", "rnk")
    )


ITEM_CF_TOPK_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cnt AS (SELECT p, COUNT(*) AS n FROM li GROUP BY p),
co AS (
  SELECT a.p AS item, b.p AS neighbor, COUNT(*) AS co_cnt
  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {CF_MIN_CO}
), scored AS (
  SELECT item, neighbor, CAST(co_cnt AS BIGINT) AS co_cnt,
         CAST(co_cnt * 1000000 //
              CAST(FLOOR(SQRT(CAST(ni.n AS DOUBLE) * nj.n)) AS BIGINT)
              AS BIGINT) AS score_ppm
  FROM co JOIN cnt ni ON ni.p = item JOIN cnt nj ON nj.p = neighbor
)
SELECT item, neighbor, co_cnt, score_ppm,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY item
              ORDER BY score_ppm DESC, co_cnt DESC, neighbor) AS rnk
  FROM scored
)
WHERE rnk <= {CF_TOP_K}
ORDER BY item, rnk
"""
