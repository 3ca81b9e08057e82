"""Batch 42: coherent sampling, dedup ROI, template detection, span
corruption planning.

Training-data pipeline primitives: a referential-integrity-preserving
sample (the subset you can actually run a relational eval on), the
byte-savings report that justifies a dedup pass, boilerplate-prefix
profiling, and T5-style span-corruption length accounting. All
integer-exact under the cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64, sql_hash64
from ..functions.local_table import values_df

COHERENT_SAMPLE_PPM = 250_000


def coherent_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, n_sampled, n_total, share_ppm, fk_orphans): a
    deterministic hash-sample of ``orders`` (≈25%) EXTENDED COHERENTLY —
    lineitem keeps exactly the sampled orders' lines (semi-join),
    customer keeps exactly the sampled orders' owners — so the subset
    satisfies every FK and a relational eval (joins, revenue rollups)
    runs on it without orphan rows. Naive per-table sampling breaks
    referential integrity (a 25% lineitem sample keeps ~25% of each
    order's lines, orphaning the rest); coherent subsetting is how a
    100 TB relational corpus is shrunk for CI. ``fk_orphans`` counts
    child rows whose parent is missing — 0 by construction, and the
    hash gate pins that it stays 0.

    Scale: one row-local hash filter on the parent + two key semi-joins
    (shuffle on the FK, broadcast-able when the sampled key set is
    small); counts are partial-aggregated."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # r16 note: pinning so/sl (each feeds 2-4 consumers) was
    # A/B-measured same-JVM at sf0.1 and REJECTED (1.81 s → 2.12 s):
    # the consumers re-run only cheap scan+filter/semi subtrees, and
    # eager materialization of the sampled rows costs more than the
    # recompute it saves. Left as-is deliberately.
    so = orders.filter(
        hash64(F.col("o_orderkey").cast("string")) % 1_000_000
        < COHERENT_SAMPLE_PPM
    )
    sl = lineitem.join(
        so.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    sc = customer.join(
        so.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    )
    orphans_l = sl.join(
        so.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    )
    orphans_o = so.join(
        customer.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    )
    rows = [
        ("customer", sc, customer, orphans_o),
        ("lineitem", sl, lineitem, orphans_l),
        ("orders", so, orders, None),
    ]
    out = None
    for name, sampled, full, orphans in rows:
        r = (
            sampled.agg(F.count(F.lit(1)).alias("n_sampled"))
            .crossJoin(full.agg(F.count(F.lit(1)).alias("n_total")))
            .select(
                F.lit(name).alias("table_name"),
                F.col("n_sampled").cast("long").alias("n_sampled"),
                F.col("n_total").cast("long").alias("n_total"),
                F.expr("n_sampled * 1000000 div n_total")
                .cast("long")
                .alias("share_ppm"),
                (
                    F.lit(0).cast("long")
                    if orphans is None
                    else F.lit(None)
                ).alias("fk_orphans"),
            )
        )
        if orphans is not None:
            r = r.drop("fk_orphans").crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("fk_orphans")
                )
            )
        out = r if out is None else out.unionByName(r)
    return out.orderBy("table_name")


COHERENT_SAMPLE_COUNTS_SQL = f"""
WITH so AS (
  SELECT * FROM orders
  WHERE {sql_hash64("CAST(o_orderkey AS VARCHAR)")} % 1000000
        < {COHERENT_SAMPLE_PPM}
), sl AS (
  SELECT l.* FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM so WHERE so.o_orderkey = l.l_orderkey)
), sc AS (
  SELECT c.* FROM customer c
  WHERE EXISTS (SELECT 1 FROM so WHERE so.o_custkey = c.c_custkey)
)
SELECT * FROM (
  SELECT 'customer' AS table_name,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS n_sampled,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_total,
         CAST((SELECT COUNT(*) FROM sc) * 1000000
              // (SELECT COUNT(*) FROM customer) AS BIGINT) AS share_ppm,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM so
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = so.o_custkey))
           AS fk_orphans
  UNION ALL
  SELECT 'lineitem',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM sl),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         CAST((SELECT COUNT(*) FROM sl) * 1000000
              // (SELECT COUNT(*) FROM lineitem) AS BIGINT),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM sl
          WHERE NOT EXISTS (SELECT 1 FROM so
                            WHERE so.o_orderkey = sl.l_orderkey))
  UNION ALL
  SELECT 'orders',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM so),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
         CAST((SELECT COUNT(*) FROM so) * 1000000
              // (SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST(0 AS BIGINT)
)
ORDER BY table_name
"""


def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup ROI report: (n_groups_multi, docs_removable,
    chars_removable, savings_ppm) — what keeping ONE canonical document
    per verified near-dup group would save. Canonical = the longest
    member (ties to the smallest doc_id) via the composite-integer
    max_by key n_chars·1e8 − doc_id, so both engines pick the same
    survivor. savings_ppm is over the WHOLE corpus's characters — the
    number a storage/compute budget review actually wants. Rides the
    memoized connected-components labels; one groupBy over them."""
    from .dedup import dedup_groups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    labeled = dedup_groups(spark, sf_dir).join(docs, "doc_id")
    per_group = labeled.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum("n_chars").alias("chars"),
        F.max(
            F.col("n_chars") * F.lit(100_000_000) - F.col("doc_id")
        ).alias("canon_key"),
    )
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    multi = per_group.filter(F.col("sz") > 1)
    return (
        multi.agg(
            F.count(F.lit(1)).alias("n_groups_multi"),
            F.sum(F.col("sz") - 1).alias("docs_removable"),
            # canon n_chars = ceil(canon_key / 1e8): canon_key is
            # n_chars·1e8 − doc_id with 0 ≤ doc_id < 1e8
            F.sum(
                F.col("chars")
                - F.expr("(canon_key + 99999999) div 100000000")
            ).alias("chars_removable"),
        )
        .select(
            F.coalesce("n_groups_multi", F.lit(0))
            .cast("long")
            .alias("n_groups_multi"),
            F.coalesce("docs_removable", F.lit(0))
            .cast("long")
            .alias("docs_removable"),
            F.coalesce("chars_removable", F.lit(0))
            .cast("long")
            .alias("chars_removable"),
            F.expr(
                f"coalesce(chars_removable, 0) * 1000000"
                f" div {int(total_chars)}"
            )
            .cast("long")
            .alias("savings_ppm"),
        )
    )


def _dedup_savings_sql() -> str:
    from .dedup import DEDUP_GROUPS_SQL

    base = DEDUP_GROUPS_SQL.replace("ORDER BY c.doc_id", "")
    return f"""
WITH labeled AS ({base}),
pg AS (
  SELECT l.group_id, CAST(COUNT(*) AS BIGINT) AS sz,
         SUM(d.n_chars) AS chars,
         MAX(d.n_chars * 100000000 - d.doc_id) AS canon_key
  FROM labeled l JOIN documents d USING (doc_id)
  GROUP BY l.group_id
), multi AS (SELECT * FROM pg WHERE sz > 1),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups_multi,
         CAST(COALESCE(SUM(sz - 1), 0) AS BIGINT) AS docs_removable,
         CAST(COALESCE(SUM(chars - (canon_key + 99999999) // 100000000), 0) AS BIGINT)
           AS chars_removable
  FROM multi
)
SELECT n_groups_multi, docs_removable, chars_removable,
       CAST(chars_removable * 1000000
            // (SELECT SUM(n_chars) FROM documents) AS BIGINT)
         AS savings_ppm
FROM agg
"""


TEMPLATE_PREFIX_TOKENS = 2


def template_prefix_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_size, n_groups, n_docs): how many documents share their
    first {TEMPLATE_PREFIX_TOKENS} tokens — the boilerplate-prefix
    profile (scraped corpora are full of shared headers; a heavy prefix
    group is a template suspect the dedup pass should look at even when
    full-document similarity is low). Histogram form so the output is
    scale-stable; one row-local prefix extract + two partial-aggregated
    groupBys."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prefix = F.array_join(
        F.slice(
            F.split(F.lower("text"), "[^a-z]+"),
            1,
            TEMPLATE_PREFIX_TOKENS,
        ),
        " ",
    )
    groups = (
        d.select(prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    return (
        groups.groupBy("group_size")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_groups").cast("long").alias("n_groups"),
            (F.col("group_size") * F.col("n_groups"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("group_size")
    )


TEMPLATE_PREFIX_HISTOGRAM_SQL = f"""
WITH groups AS (
  SELECT array_to_string(
           string_split_regex(lower(text), '[^a-z]+')[1:{TEMPLATE_PREFIX_TOKENS}],
           ' ') AS prefix,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM documents GROUP BY prefix
)
SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(group_size * COUNT(*) AS BIGINT) AS n_docs
FROM groups
GROUP BY group_size
ORDER BY group_size
"""


SPAN_CORRUPT_PPM = 150_000  # T5 default: corrupt 15% of tokens
SPAN_MEAN_LEN = 3  # T5 default mean noise-span length


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_corrupted, n_spans, inputs_len,
    targets_len): T5-style span-corruption LENGTH ACCOUNTING per
    document — the numbers a packing/budget planner needs before any
    batch is built (Raffel et al. 2020 §3.1.4: corrupt 15% of tokens in
    spans of mean length 3; each span becomes ONE sentinel in the
    inputs and sentinel+span+final-EOS in the targets):
    n_corrupted = ⌊tokens·0.15⌋, n_spans = max(1,⌊n_corrupted/3⌋) when
    anything is corrupted, inputs_len = tokens − n_corrupted + n_spans,
    targets_len = n_corrupted + n_spans + 1. Pure row-local integer
    arithmetic over the token count — at 100 TB this is a projection
    riding whatever scan already reads the text."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"),
            lambda w: F.length(w) >= 1,
        )
    ).cast("long")
    base = d.select("doc_id", toks.alias("n_tokens"))
    n_corr = F.expr(f"n_tokens * {SPAN_CORRUPT_PPM} div 1000000")
    return (
        base.withColumn("n_corrupted", n_corr.cast("long"))
        .withColumn(
            "n_spans",
            F.when(F.col("n_corrupted") <= 0, F.lit(0))
            .otherwise(
                F.greatest(
                    F.lit(1),
                    F.expr(f"n_corrupted div {SPAN_MEAN_LEN}"),
                )
            )
            .cast("long"),
        )
        .withColumn(
            "inputs_len",
            (F.col("n_tokens") - F.col("n_corrupted") + F.col("n_spans"))
            .cast("long"),
        )
        .withColumn(
            "targets_len",
            F.when(F.col("n_spans") == 0, F.lit(0))
            .otherwise(
                F.col("n_corrupted") + F.col("n_spans") + 1
            )
            .cast("long"),
        )
        .orderBy("doc_id")
    )


SPAN_CORRUPTION_PLAN_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              w -> len(w) >= 1)) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(n_tokens * {SPAN_CORRUPT_PPM} // 1000000 AS BIGINT)
           AS n_corrupted
  FROM base
), s AS (
  SELECT *, CAST(CASE WHEN n_corrupted <= 0 THEN 0
                 ELSE GREATEST(1, n_corrupted // {SPAN_MEAN_LEN})
                 END AS BIGINT) AS n_spans
  FROM c
)
SELECT doc_id, n_tokens, n_corrupted, n_spans,
       CAST(n_tokens - n_corrupted + n_spans AS BIGINT) AS inputs_len,
       CAST(CASE WHEN n_spans = 0 THEN 0
            ELSE n_corrupted + n_spans + 1 END AS BIGINT) AS targets_len
FROM s
ORDER BY doc_id
"""


DEDUP_SAVINGS_REPORT_SQL = _dedup_savings_sql()


SHUFFLE_EPOCHS = 3
SHUFFLE_SHARDS = 8


def training_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(epoch, shard, n_docs, sum_chars, top_source_share_ppm): the
    per-epoch reshuffle a training loader runs — every epoch assigns
    each document to a shard by hash(doc_id:epoch) so consecutive
    epochs see DIFFERENT shard compositions (epoch-varying salt),
    without any global permutation materialized. The report per
    (epoch, shard): document count, character budget, and the largest
    single-source share — the well-mixedness check (a shard dominated
    by one source trains a biased step). Row-local hash + two
    partial-aggregated groupBys; at 100 TB the assignment is a
    projection riding the corpus scan, and the loader derives it
    independently on every worker from (doc_id, epoch) alone."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    epochs = spark.range(SHUFFLE_EPOCHS).select(
        F.col("id").cast("long").alias("epoch")
    )
    assigned = d.crossJoin(F.broadcast(epochs)).withColumn(
        "shard",
        (
            hash64(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("epoch").cast("string"),
                )
            )
            % SHUFFLE_SHARDS
        ).cast("long"),
    )
    per_source = assigned.groupBy("epoch", "shard", "source").agg(
        F.count(F.lit(1)).alias("sc"), F.sum("n_chars").alias("ch")
    )
    return (
        per_source.groupBy("epoch", "shard")
        .agg(
            F.sum("sc").alias("n_docs"),
            F.sum("ch").alias("sum_chars"),
            F.max("sc").alias("top_sc"),
        )
        .select(
            "epoch",
            "shard",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sum_chars").cast("long").alias("sum_chars"),
            F.expr("top_sc * 1000000 div n_docs")
            .cast("long")
            .alias("top_source_share_ppm"),
        )
        .orderBy("epoch", "shard")
    )


TRAINING_SHUFFLE_PLAN_SQL = f"""
WITH assigned AS (
  SELECT d.doc_id, d.source, d.n_chars, e.epoch,
         {sql_hash64("CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)")}
           % {SHUFFLE_SHARDS} AS shard
  FROM documents d
  CROSS JOIN (SELECT unnest(range({SHUFFLE_EPOCHS})) AS epoch) e
), per_source AS (
  SELECT epoch, shard, source,
         CAST(COUNT(*) AS BIGINT) AS sc, SUM(n_chars) AS ch
  FROM assigned GROUP BY epoch, shard, source
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
       CAST(SUM(sc) AS BIGINT) AS n_docs,
       CAST(SUM(ch) AS BIGINT) AS sum_chars,
       CAST(MAX(sc) * 1000000 // SUM(sc) AS BIGINT)
         AS top_source_share_ppm
FROM per_source
GROUP BY epoch, shard
ORDER BY epoch, shard
"""


ENERGY_PREFIX_KS = (1, 2, 4, 8, 16, 32, 64)
ENERGY_QUANT = 10_000  # 1e4 quantizer keeps every sum inside int64


def embedding_dim_energy_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, energy_ppm): share of the corpus's total embedding energy
    (Σ v²) captured by the FIRST k dimensions, for k in
    {ENERGY_PREFIX_KS} — the truncatability audit behind
    Matryoshka-style dimension cuts (a front-loaded curve means a k-dim
    prefix index is nearly free; a flat one means truncation costs
    recall). Integer-exact: values quantize at 1e4 (after the mandatory
    FLOAT→DOUBLE cast — single-precision multiply diverges between
    engines), q² sums stay inside int64 at every scale here, and the
    ppm share is integer division. One posexplode + one 64-row
    per-dimension aggregate; the curve is a 7-row reduce."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.floor(
        F.col("v").cast("double") * ENERGY_QUANT
    ).cast("long")
    per_dim = (
        e.select(F.posexplode("embedding").alias("dim", "v"))
        .select("dim", q.alias("q"))
        .groupBy("dim")
        .agg(F.sum(F.col("q") * F.col("q")).alias("energy"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("dim").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_dim.withColumn("cum", F.sum("energy").over(w))
    total = per_dim.agg(F.sum("energy")).collect()[0][0]
    ks = values_df(spark,
        [(k,) for k in ENERGY_PREFIX_KS], "k long"
    )
    return (
        cum.join(F.broadcast(ks), cum.dim == ks.k - 1)
        .select(
            "k",
            F.expr(f"cum * 1000000 div {int(total)}")
            .cast("long")
            .alias("energy_ppm"),
        )
        .orderBy("k")
    )


EMBEDDING_DIM_ENERGY_SQL = f"""
WITH vals AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {ENERGY_QUANT})
              AS BIGINT) AS q
  FROM embeddings
), per_dim AS (
  SELECT dim, SUM(q * q) AS energy FROM vals GROUP BY dim
), cum AS (
  SELECT dim, SUM(energy) OVER (ORDER BY dim) AS cum
  FROM per_dim
)
SELECT CAST(dim + 1 AS BIGINT) AS k,
       CAST(cum * 1000000 // (SELECT SUM(energy) FROM per_dim) AS BIGINT)
         AS energy_ppm
FROM cum
WHERE dim + 1 IN {ENERGY_PREFIX_KS}
ORDER BY k
"""


MATRYOSHKA_DIMS = (8, 16, 32, 64)
MATRYOSHKA_TOPK = 5
# Fixed probe BUDGET (r12 verdict ask #7, replacing the vec_id % 31
# stride): the probe set is the B vec_ids with the smallest
# (hash64(vec_id), vec_id) key — deterministic in both engines and
# CONSTANT-sized at any corpus scale, so the harness cost is O(N·B)
# with fixed B instead of O(N²/31). Spark plans the selection as
# TakeOrderedAndProject (distributed top-K), never a global sort.
MATRYOSHKA_PROBE_BUDGET = 16


def matryoshka_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dims, n_probes, recall_ppm): top-{MATRYOSHKA_TOPK} recall of
    TRUNCATED-dimension cosine search against the full-64-dim truth,
    for prefix lengths {MATRYOSHKA_DIMS} — the measurement that turns
    embedding_dim_energy_curve's energy shares into an actual retrieval
    verdict (Matryoshka-style indexes serve the k-dim prefix; this is
    what that costs in recall@k). dims=64 is the identity row
    (recall_ppm = 1e6), which pins the harness itself under the hash.

    Probe-budget bounded, never all-pairs: a deterministic FIXED-size
    probe set (the {MATRYOSHKA_PROBE_BUDGET} smallest (hash64(vec_id),
    vec_id) keys — distributed top-K, no global sort) broadcast-joins
    against the corpus — O(N·B) with constant B at any corpus size, the
    exact-rerank cost an IVF/LSH pipeline pays per query batch.
    Integer-exact ranking: values quantize at 1e4
    (FLOAT→DOUBLE first), scores are sign·(|dot|·1e6 DIV (isqrt(na·nb)+1))
    with the correctly-rounded IEEE isqrt both engines share; ties
    break on candidate id."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, "
            f"v -> CAST(floor(CAST(v AS DOUBLE) * {ENERGY_QUANT}) AS BIGINT))"
        ).alias("q"),
    )
    probes = (
        e.select(
            F.col("vec_id").alias("pid"),
            F.col("q").alias("pq"),
            hash64(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h", "pid")
        .limit(MATRYOSHKA_PROBE_BUDGET)
        .drop("h")
        # r16: pinned — the pair scan and the final count both read it
        .localCheckpoint(eager=True)
    )
    # r16 note: an unrolled rewrite (per-pair prefix sums as
    # straight-line getItem multiply-adds, per-dims rows via stack —
    # the hubness_report pattern) was A/B-measured same-JVM at sf0.1
    # and REJECTED: 5.48 s → 8.16 s median (1.49×). Unlike hubness's
    # single 64-term dot, this needs 12 prefix columns (~360 terms per
    # row in one projection) and the generated code ran slower than
    # the HOF formulation it replaced. The dims cross-join stands; the
    # real win here was pinning topk below (the whole scoring pipeline
    # used to execute twice).
    dims = values_df(spark,
        [(d,) for d in MATRYOSHKA_DIMS], "dims long"
    )
    pairs = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("pid"))
        .crossJoin(F.broadcast(dims))
        .select(
            "pid",
            "dims",
            F.col("vec_id").alias("cand"),
            F.expr(
                "aggregate(zip_with(slice(pq, 1, dims), slice(q, 1, dims),"
                " (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
            F.expr(
                "aggregate(slice(pq, 1, dims), 0L,"
                " (acc, x) -> acc + x * x)"
            ).alias("na"),
            F.expr(
                "aggregate(slice(q, 1, dims), 0L,"
                " (acc, x) -> acc + x * x)"
            ).alias("nb"),
        )
        .withColumn(
            "score",
            F.expr(
                "CAST(SIGN(dot) AS BIGINT) * (ABS(dot) * 1000000 DIV"
                " (CAST(FLOOR(SQRT(CAST(na AS DOUBLE)"
                " * CAST(nb AS DOUBLE))) AS BIGINT) + 1))"
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("pid", "dims").orderBy(
        F.desc("score"), F.asc("cand")
    )
    topk = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MATRYOSHKA_TOPK)
        # r16: pinned — the truth arm and the hit join both consume the
        # top-k table; unpinned, the whole scoring pipeline ran twice
        .localCheckpoint(eager=True)
    )
    truth = topk.filter(F.col("dims") == 64).select(
        "pid", F.col("cand").alias("tcand")
    )
    n_probes = probes.count()
    hits = (
        topk.join(
            truth,
            (topk.pid == truth.pid) & (topk.cand == truth.tcand),
        )
        .groupBy("dims")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    denom = MATRYOSHKA_TOPK * int(n_probes)
    return (
        hits.select(
            "dims",
            F.lit(int(n_probes)).cast("long").alias("n_probes"),
            F.expr(f"n_hits * 1000000 div {denom}")
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("dims")
    )


MATRYOSHKA_RECALL_SQL = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           v -> CAST(floor(CAST(v AS DOUBLE) * {ENERGY_QUANT}) AS BIGINT))
           AS q
  FROM embeddings
), probes AS (
  SELECT pid, pq FROM (
    SELECT vec_id AS pid, q AS pq,
           {sql_hash64("CAST(vec_id AS VARCHAR)")} AS h
    FROM e
  ) ORDER BY h, pid LIMIT {MATRYOSHKA_PROBE_BUDGET}
), pairs AS (
  SELECT p.pid, d.dims, e.vec_id AS cand,
         list_sum(list_transform(range({0}, d.dims),
           i -> p.pq[i + 1] * e.q[i + 1])) AS dot,
         list_sum(list_transform(range({0}, d.dims),
           i -> p.pq[i + 1] * p.pq[i + 1])) AS na,
         list_sum(list_transform(range({0}, d.dims),
           i -> e.q[i + 1] * e.q[i + 1])) AS nb
  FROM e CROSS JOIN probes p
  CROSS JOIN (SELECT unnest([{", ".join(str(d) for d in MATRYOSHKA_DIMS)}])
              AS dims) d
  WHERE e.vec_id != p.pid
), scored AS (
  SELECT pid, dims, cand,
         CAST(CASE WHEN dot >= 0 THEN 1 ELSE -1 END AS BIGINT)
           * (ABS(dot) * 1000000
              // (CAST(FLOOR(SQRT(CAST(na AS DOUBLE)
                                  * CAST(nb AS DOUBLE))) AS BIGINT) + 1))
           AS score
  FROM pairs
), topk AS (
  SELECT * FROM (
    SELECT pid, dims, cand,
           ROW_NUMBER() OVER (PARTITION BY pid, dims
                              ORDER BY score DESC, cand) AS rk
    FROM scored
  ) WHERE rk <= {MATRYOSHKA_TOPK}
), truth AS (
  SELECT pid, cand AS tcand FROM topk WHERE dims = 64
)
SELECT CAST(t.dims AS BIGINT) AS dims,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
       CAST(COUNT(*) * 1000000
            // ({MATRYOSHKA_TOPK} * (SELECT COUNT(*) FROM probes))
            AS BIGINT) AS recall_ppm
FROM topk t JOIN truth ON t.pid = truth.pid AND t.cand = truth.tcand
GROUP BY t.dims
ORDER BY dims
"""
