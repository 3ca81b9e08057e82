"""Batch 44: substring-level (repeated-span) dedup and semantic dedup.

The dedup modalities a training-data pipeline still lacked after the
doc-level paths (minhash, simhash, winnowing, prefix-filter,
containment):

- ``duplicated_spans_report`` — corpus-level *duplicated-span*
  extraction in the spirit of the public Lee et al. 2022 result
  ("Deduplicating Training Data Makes Language Models Better": exact
  substring dedup beats doc-level). The suffix-array of that paper is
  replaced by a shuffle-native equivalent: group identical word
  k-grams, keep grams seen in ≥2 documents, and stitch adjacent
  duplicated gram positions per document into maximal spans with the
  classic gaps-and-islands trick (pos − row_number).
- ``semantic_dedup_report`` (SemDeDup-style) lives alongside: see its
  docstring.

Scale posture: the k-gram explode is a flatMap (≈ one row per token);
doc-frequency is one groupBy on the gram; span stitching is a per-doc
window (partitioned by doc_id, never global); the cross-source pair
join is banded BY GRAM with a doc-frequency cap, so a gram contributes
at most cap² pairs — boilerplate mega-grams are excluded exactly like
the winnowing path's frequency cap. No all-pairs structure anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K = 8  # words per gram (span unit); spans are runs of adjacent grams
DF_CAP = 16  # max doc-frequency for the pair stage (boilerplate cap)
TOP_PAIRS = 20


def _grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (doc, position): the K-word gram starting there.
    Tokenization is the cross-engine-stable whitespace split (regex
    \\s+, empty tokens dropped) used by the token_count family."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        "doc_id",
        "source",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("t"),
    ).filter(F.size("t") >= K)
    return d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t)-{K}), "
                f"i -> array_join(slice(t, i+1, {K}), ' '))"
            )
        ).alias("pos", "gram"),
    )


def duplicated_spans_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span (substring-level) dedup report over ``documents``:

    - ``span_hist`` rows: histogram of maximal duplicated-span lengths
      (in tokens). A position is *duplicated* when its K-gram occurs in
      ≥2 distinct documents; maximal runs of adjacent duplicated
      positions within one document stitch into spans of
      run_length + K − 1 tokens (gaps-and-islands: pos − row_number
      per doc). k1 = span length (as string), cnt = number of spans.
    - ``source_pair`` rows: the top offending source pairs — unordered
      cross-source pairs ranked by the number of distinct duplicated
      grams they share, over grams with doc-frequency in [2, DF_CAP]
      (the cap keeps boilerplate from exploding the gram-banded join,
      same posture as the winnowing frequency cap). k1/k2 = the pair,
      cnt = shared gram count; ties broken by (cnt desc, k1, k2),
      top 20.

    This is the bounded Spark form of Lee et al. 2022's exact substring
    dedup (suffix-array ExactSubstr): at 100 TB the explode is linear in
    tokens, doc-frequency is one gram-keyed shuffle with map-side
    partial aggregation, span stitching is a per-document window, and
    the only join is banded by gram under the frequency cap — never
    all-pairs, no global sort (the single global window ranks the
    ≤|sources|² pair aggregate, not rows)."""
    # pins (guide §2.4): the gram stream feeds THREE subtrees (the df
    # groupBy and both df-filtered joins) — unpinned, the tokenize +
    # posexplode lineage executes once per consumer. The df table is
    # filtered to df >= 2 BEFORE pinning (both consumers share that
    # predicate), so the pinned frame holds only repeated grams.
    g = _grams(spark, sf_dir).localCheckpoint(eager=True)
    dfreq = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .localCheckpoint(eager=True)
    )

    dup = g.join(dfreq, "gram")
    runs = dup.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    spans = runs.groupBy("doc_id", "grp").agg(
        (F.count(F.lit(1)) + F.lit(K - 1)).alias("span_len")
    )
    hist = spans.groupBy("span_len").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).select(
        F.lit("span_hist").alias("section"),
        F.col("span_len").cast("string").alias("k1"),
        F.lit("").alias("k2"),
        "cnt",
    )

    pg = (
        g.join(dfreq.filter(F.col("df") <= DF_CAP), "gram")
        .select("gram", "source")
        .distinct()
    )
    pairs = (
        pg.alias("a")
        .join(
            pg.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("k1"), F.col("b.source").alias("k2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = (
        pairs.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "k1", "k2")),
        )
        .filter(F.col("rn") <= TOP_PAIRS)
        .select(F.lit("source_pair").alias("section"), "k1", "k2", "cnt")
    )
    return hist.unionByName(top).orderBy("section", "k1", "k2")


DUPLICATED_SPANS_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
), d2 AS (SELECT * FROM d WHERE len(t) >= {K}),
g AS (
  SELECT doc_id, source, i AS pos,
         array_to_string(t[i+1:i+{K}], ' ') AS gram
  FROM d2, UNNEST(generate_series(0, len(t)-{K})) AS u(i)
),
dfreq AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram),
dup AS (SELECT g.* FROM g JOIN dfreq USING (gram) WHERE dfreq.df >= 2),
runs AS (
  SELECT doc_id,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dup
),
spans AS (
  SELECT doc_id, grp, COUNT(*) + {K - 1} AS span_len
  FROM runs GROUP BY doc_id, grp
),
hist AS (
  SELECT 'span_hist' AS section, CAST(span_len AS VARCHAR) AS k1,
         '' AS k2, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM spans GROUP BY span_len
),
pg AS (
  SELECT DISTINCT gram, source
  FROM g JOIN dfreq USING (gram)
  WHERE dfreq.df BETWEEN 2 AND {DF_CAP}
),
pairs AS (
  SELECT a.source AS k1, b.source AS k2, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pg a JOIN pg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY a.source, b.source
),
top AS (
  SELECT 'source_pair' AS section, k1, k2, cnt
  FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, k1, k2) AS rn
    FROM pairs
  ) WHERE rn <= {TOP_PAIRS}
)
SELECT * FROM hist UNION ALL SELECT * FROM top
ORDER BY section, k1, k2
"""


def semantic_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup report (public method: Abbas et al.
    2023 — embedding-cluster-bucketed near-dup pruning): compose the
    existing cluster-bounded semantic pair scan (clustering.dedup_semantic
    — k-means assignment memoized per session, pair join restricted to
    within-cluster blocks, never all-pairs) into the two numbers a corpus
    team acts on:

    - ``agreement`` rows: the confusion matrix between the semantic pair
      set and the MinHash-verified truth (the dedup_method_agreement
      pattern): ``both`` / ``semantic_only`` / ``minhash_only`` over the
      union of both pair lists — a fat single-method tail names the
      detector to audit before trusting its delete list.
    - ``source_yield`` rows: per-source prune impact under the
      deterministic keep-lowest-id rule (a doc is pruned when it is the
      GREATER side of any above-threshold semantic pair): k = source,
      n1 = docs total, n2 = docs pruned.

    Plan: both pair generators are bounded (cluster-bucketed /
    LSH-banded); the agreement join and the prune-set distinct are
    pair-list-sized; the yield pass is one broadcast-friendly left join
    from documents to the tiny prune set. Rides the verified-pair memo
    and the centroid memo — no recomputation of either model."""
    from . import clustering as C
    from . import dedup as DD

    # r16 note: pinning this pair list (it feeds the agreement join and
    # the prune-set distinct) was A/B-measured same-JVM at sf0.1 and
    # REJECTED at 1.14×/1.21× (med/min): dedup_semantic's expensive
    # subtree (assignment + norm) is already localCheckpointed inside
    # it, so both consumers re-run only the blocked pair join, which
    # pipelines cheaper than an eager checkpoint of the pair list.
    sem = (
        C.dedup_semantic(spark, sf_dir)
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    mh = DD.verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    j = sem.withColumn("in_sem", F.lit(1)).join(
        mh.withColumn("in_mh", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    verdict = (
        F.when(F.col("in_sem").isNotNull() & F.col("in_mh").isNotNull(), "both")
        .when(F.col("in_sem").isNotNull(), "semantic_only")
        .otherwise("minhash_only")
    )
    agree = (
        j.select(verdict.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n1"))
        .select(
            F.lit("agreement").alias("section"),
            "k",
            "n1",
            F.lit(0).cast("long").alias("n2"),
        )
    )
    pruned = sem.select(F.col("doc_b").alias("doc_id")).distinct()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    yields = (
        docs.join(
            F.broadcast(pruned.withColumn("p", F.lit(1))), "doc_id", "left"
        )
        .groupBy(F.col("source").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n1"),
            F.sum(
                F.when(F.col("p").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n2"),
        )
        .select(F.lit("source_yield").alias("section"), "k", "n1", "n2")
    )
    return agree.unionByName(yields).orderBy("section", "k")


def _semantic_dedup_report_sql() -> str:
    from . import clustering as C
    from . import dedup as DD

    sem = C.DEDUP_SEMANTIC_SQL.replace("ORDER BY vec_a, vec_b", "")
    mh = DD.DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH sem AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b FROM ({sem})
),
mh AS (
  SELECT doc_a, doc_b FROM ({mh})
),
agree AS (
  SELECT CASE WHEN s.doc_a IS NOT NULL AND m.doc_a IS NOT NULL THEN 'both'
              WHEN s.doc_a IS NOT NULL THEN 'semantic_only'
              ELSE 'minhash_only' END AS verdict
  FROM sem s FULL OUTER JOIN mh m ON s.doc_a = m.doc_a AND s.doc_b = m.doc_b
),
agree_rows AS (
  SELECT 'agreement' AS section, verdict AS k,
         CAST(COUNT(*) AS BIGINT) AS n1, CAST(0 AS BIGINT) AS n2
  FROM agree GROUP BY verdict
),
pruned AS (SELECT DISTINCT doc_b AS doc_id FROM sem),
yield_rows AS (
  SELECT 'source_yield' AS section, d.source AS k,
         CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM documents d LEFT JOIN pruned p USING (doc_id)
  GROUP BY d.source
)
SELECT * FROM agree_rows UNION ALL SELECT * FROM yield_rows
ORDER BY section, k
"""


SEMANTIC_DEDUP_REPORT_SQL = _semantic_dedup_report_sql()
