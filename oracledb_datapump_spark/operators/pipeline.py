"""Pipeline-curation and QA dashboard operators (round 6).

Eight operators a production training-data pipeline runs on top of the
dedup / quality / importance primitives this repo already has:

- ``dedup_keep_best``      cluster-representative selection (which doc
                           survives each duplicate group)
- ``minhash_band_hitrates``  LSH index-health report per band
- ``host_cap_sample``      per-source frequency-cap sampling
- ``filter_ablation_report`` per-gate ablation of the Gopher quality rules
- ``hourly_heavy_hitters`` top-k event types per hour (ops dashboard)
- ``events_anomaly_hours`` integer-exact variance anomaly flags
- ``dsir_resample_plan``   token-budget importance resampling (DSIR)
- ``user_recency_weight``  half-life-decayed activity score, shift-exact

Every operator has a DuckDB oracle twin built by composing the SQL of
the primitive it rides, so the whole derivation sits under the driver's
cross-engine value hash. No reference analog (the reference delegates
analytics to Oracle; SURVEY.md §2.3) — these are the M5 LLM-pipeline
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..events_source import load_events
from ..functions.global_order import with_global_order_stat
from .docs_source import load_docs
from . import dedup as D
from . import textprep as TP
from . import textstats as TS
from ..functions.local_table import values_df


# ---------------------------------------------------------------------------
# duplicate-cluster representative selection
# ---------------------------------------------------------------------------


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_id, group_size, keep_doc_id, keep_n_chars, n_dropped): for
    every duplicate cluster (size ≥ 2) from ``dedup_groups``, the single
    document the pipeline KEEPS — longest text wins, ties to the lowest
    doc_id. This is the decision step dedup exists for: groups say what
    is duplicated, keep-best says what ships to training.

    Plan: rides the driver-memoized verified-pair fixpoint
    (dedup._VERIFIED_PAIRS_CACHE — no LSH re-derivation), one broadcast
    join against the doc-length projection, and a row_number window
    partitioned by group_id, whose partitions are duplicate-cluster
    sized (LSH-verified clusters are near-cliques, not corpus-scale) —
    nothing here grows beyond the dedup output at 100 TB."""
    g = D.dedup_groups(spark, sf_dir).filter(F.col("group_size") >= 2)
    d = load_docs(spark, sf_dir).select("doc_id", "n_chars")
    w = Window.partitionBy("group_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        g.join(d, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "group_id",
            "group_size",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").alias("keep_n_chars"),
            (F.col("group_size") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("group_id")
    )


DEDUP_KEEP_BEST_SQL = f"""
WITH g AS ({D.DEDUP_GROUPS_SQL.replace("ORDER BY c.doc_id", "")}),
j AS (
  SELECT g.group_id, g.group_size, g.doc_id, d.n_chars
  FROM g JOIN documents d USING (doc_id)
  WHERE g.group_size >= 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY group_id ORDER BY n_chars DESC, doc_id) AS rk
  FROM j
)
SELECT group_id, group_size, doc_id AS keep_doc_id, n_chars AS keep_n_chars,
       CAST(group_size - 1 AS BIGINT) AS n_dropped
FROM r WHERE rk = 1
ORDER BY group_id
"""


# ---------------------------------------------------------------------------
# LSH index health: per-band bucket occupancy
# ---------------------------------------------------------------------------


def minhash_band_hitrates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, n_docs, n_buckets, n_multi_buckets, n_candidate_pairs):
    per-LSH-band bucket occupancy — the index-health report that tells
    an operator whether banding parameters (b×r = {D.NUM_HASHES} hashes
    in bands of {D.BAND_ROWS}) are tuned: a band whose candidate-pair
    count explodes signals boilerplate hot buckets (fix: the
    max_bucket_size cap in dedup_minhash_pairs); a band with zero multi
    buckets recalls nothing.

    Plan: the same partial-aggregated signature groupBy the LSH path
    builds, band signatures row-local, then two bounded groupBys
    ((band, sig) → band). Output is {D.NUM_HASHES // D.BAND_ROWS} rows.
    Unlike the pair join this never expands buckets into pairs — the
    report is O(|docs|) shuffle even when the index itself is sick."""
    agg = (
        D._shingles_multiset(spark, sf_dir)
        .groupBy("doc_id")
        .agg(*D._minhash_cols())
    )
    band_sig = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{j}").cast("string")
                    for j in range(b * D.BAND_ROWS, (b + 1) * D.BAND_ROWS)
                ],
            )
        ).alias(f"sig{b}")
        for b in range(D.NUM_HASHES // D.BAND_ROWS)
    ]
    bands = agg.select(
        "doc_id", F.posexplode(F.array(*band_sig)).alias("band", "sig")
    )
    buckets = bands.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("n"))
    return (
        buckets.groupBy("band")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum((F.col("n") > 1).cast("long")).alias("n_multi_buckets"),
            F.sum(F.expr("(n * (n - 1)) div 2")).alias("n_candidate_pairs"),
        )
        .select(
            F.col("band").cast("long").alias("band"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("n_multi_buckets").cast("long").alias("n_multi_buckets"),
            F.col("n_candidate_pairs").cast("long").alias("n_candidate_pairs"),
        )
        .orderBy("band")
    )


MINHASH_BAND_HITRATES_SQL = (
    "WITH "
    + D.SQL_MINHASH_CTE
    + f""",
bands AS (
  {D._sql_band_selects()}
),
buckets AS (
  SELECT band, sig, COUNT(*) AS n FROM bands GROUP BY band, sig
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_buckets,
       CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS n_candidate_pairs
FROM buckets
GROUP BY band
ORDER BY band
"""
)


# ---------------------------------------------------------------------------
# per-source frequency-cap sampling
# ---------------------------------------------------------------------------

HOST_CAP = 15


def host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, src_rank, kept): cap every source (host/provider)
    at {HOST_CAP} documents, preferring longer texts (ties to lower
    doc_id) — the host-frequency cap every web-scale corpus applies so
    one mirror farm cannot dominate training data.

    Plan: one shuffle keyed on source + a row_number window per source.
    At 100 TB a pathological hot host serializes its window task; the
    production refinement is a two-phase cap (per-partition local top-
    (cap) combiner, then the global window over ≤ cap·P survivors) —
    same result, map-side bounded; noted here because the fixture's
    source cardinality doesn't need it."""
    d = load_docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("src_rank", F.row_number().over(w).cast("long"))
        .select(
            "doc_id",
            "source",
            "src_rank",
            (F.col("src_rank") <= HOST_CAP).alias("kept"),
        )
        .orderBy("doc_id")
    )


HOST_CAP_SAMPLE_SQL = f"""
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id) AS src_rank
  FROM documents
)
SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
       src_rank <= {HOST_CAP} AS kept
FROM r
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# quality-gate ablation
# ---------------------------------------------------------------------------

_GATES = ["ok_length", "ok_mean_len", "ok_repetition", "ok_diversity"]


def filter_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gate, n_fail, n_fail_only, n_pass_all, n_pass_if_dropped): per
    Gopher quality gate, how many documents fail it, how many fail ONLY
    it (the docs that one gate alone removes), and how the pass count
    moves if the gate were dropped — the ablation table a pipeline owner
    reads before tightening or loosening a filter. n_fail_only ==
    n_pass_if_dropped − n_pass_all by construction; both are emitted so
    the report reads directly.

    Plan: one pass of quality_gopher (its own plan is the linear
    per-token aggregation), then a single 1-row global aggregate
    unpivoted to {len(_GATES)} rows via stack — no extra scan per gate."""
    q = TP.quality_gopher(spark, sf_dir)
    aggs = [F.sum(F.col("passes").cast("long")).alias("n_pass_all")]
    for g in _GATES:
        others = [F.col(o) for o in _GATES if o != g]
        all_others = others[0] & others[1] & others[2]
        aggs.append(F.sum((~F.col(g)).cast("long")).alias(f"fail_{g}"))
        aggs.append(
            F.sum(((~F.col(g)) & all_others).cast("long")).alias(f"only_{g}")
        )
    one = q.agg(*aggs)
    stack_args = ", ".join(
        f"'{g}', fail_{g}, only_{g}" for g in _GATES
    )
    return (
        one.select(
            F.expr(
                f"stack({len(_GATES)}, {stack_args}) AS (gate, n_fail, n_fail_only)"
            ),
            "n_pass_all",
        )
        .select(
            "gate",
            "n_fail",
            "n_fail_only",
            "n_pass_all",
            (F.col("n_pass_all") + F.col("n_fail_only")).alias("n_pass_if_dropped"),
        )
        .orderBy("gate")
    )


def _filter_ablation_sql() -> str:
    base = TP.QUALITY_GOPHER_SQL.replace("ORDER BY doc_id", "")
    arms = []
    for g in _GATES:
        others = " AND ".join(o for o in _GATES if o != g)
        arms.append(
            f"""
  SELECT '{g}' AS gate,
         SUM(CASE WHEN NOT {g} THEN 1 ELSE 0 END) AS n_fail,
         SUM(CASE WHEN (NOT {g}) AND ({others}) THEN 1 ELSE 0 END) AS n_fail_only,
         SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS n_pass_all
  FROM q"""
        )
    union = "\n  UNION ALL".join(arms)
    return f"""
WITH q AS ({base})
SELECT gate, CAST(n_fail AS BIGINT) AS n_fail,
       CAST(n_fail_only AS BIGINT) AS n_fail_only,
       CAST(n_pass_all AS BIGINT) AS n_pass_all,
       CAST(n_pass_all + n_fail_only AS BIGINT) AS n_pass_if_dropped
FROM ({union})
ORDER BY gate
"""


FILTER_ABLATION_SQL = _filter_ablation_sql()


# ---------------------------------------------------------------------------
# events: hourly heavy hitters
# ---------------------------------------------------------------------------

HH_TOP_K = 3


def hourly_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_epoch, event_type, n_events, rnk): the top-{HH_TOP_K} event
    types per hour — the rolled-up "what dominated each hour" board.
    Exact within each hour because the hourly group fits an aggregate;
    the STREAMING estimate of the same question is streaming_cms_cells.

    Plan: one partial-aggregated groupBy (hour, type) — |hours|·|types|
    rows — then a row_number window partitioned per hour whose
    partitions are |types|-sized. Nothing scales with raw event count
    except the embarrassingly-parallel first aggregation."""
    e = load_events(spark, sf_dir)
    hour = (F.floor(F.col("ts_us") / 3_600_000_000) * 3600).cast("long")
    counts = e.groupBy(hour.alias("hour_epoch"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("hour_epoch").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= HH_TOP_K)
        .orderBy("hour_epoch", "rnk")
    )


HOURLY_HEAVY_HITTERS_SQL = f"""
WITH c AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS hour_epoch,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT hour_epoch, event_type, n_events,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY hour_epoch ORDER BY n_events DESC, event_type) AS BIGINT) AS rnk
FROM c
QUALIFY rnk <= {HH_TOP_K}
ORDER BY hour_epoch, rnk
"""


# ---------------------------------------------------------------------------
# events: integer-exact hourly anomaly flags
# ---------------------------------------------------------------------------

ANOMALY_SIGMAS = 2


def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hour_epoch, n_events, is_anomaly): hours whose event
    count sits more than {ANOMALY_SIGMAS}σ from that type's hourly mean
    — the load-anomaly monitor, stated INTEGER-EXACT so both engines
    agree bit-for-bit: |n−μ| > kσ  ⇔  (n·N − S)² > k²·(N·Q − S²) with
    S=Σn, Q=Σn², N=#hours, all in DECIMAL(38,0)/HUGEINT (no float mean,
    no sqrt — the determinism recipe this repo uses for every gated
    statistic).

    Plan: hourly counts (partial-agg groupBy), a per-type 3-number
    moment table (|types| rows, broadcast), and a row-local comparison.
    Scales as one scan + two bounded aggregates."""
    e = load_events(spark, sf_dir)
    hour = (F.floor(F.col("ts_us") / 3_600_000_000) * 3600).cast("long")
    counts = e.groupBy(F.col("event_type"), hour.alias("hour_epoch")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    stats = counts.groupBy("event_type").agg(
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("q"),
        F.count(F.lit(1)).alias("nh"),
    )
    k2 = ANOMALY_SIGMAS * ANOMALY_SIGMAS
    flag = F.expr(
        f"""
        CAST((n_events * nh - s) AS DECIMAL(38,0)) * (n_events * nh - s)
        > {k2} * (CAST(nh AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s)
        """
    )
    return (
        counts.join(F.broadcast(stats), "event_type")
        .select("event_type", "hour_epoch", "n_events", flag.alias("is_anomaly"))
        .orderBy("event_type", "hour_epoch")
    )


EVENTS_ANOMALY_HOURS_SQL = f"""
WITH c AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS hour_epoch,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, SUM(n_events) AS s,
         SUM(n_events * n_events) AS q, COUNT(*) AS nh
  FROM c GROUP BY event_type
)
SELECT c.event_type, c.hour_epoch, c.n_events,
       CAST((c.n_events * st.nh - st.s) AS HUGEINT) * (c.n_events * st.nh - st.s)
         > {ANOMALY_SIGMAS * ANOMALY_SIGMAS}
           * (CAST(st.nh AS HUGEINT) * st.q - CAST(st.s AS HUGEINT) * st.s)
         AS is_anomaly
FROM c JOIN st USING (event_type)
ORDER BY c.event_type, c.hour_epoch
"""


# ---------------------------------------------------------------------------
# DSIR token-budget resampling plan
# ---------------------------------------------------------------------------

DSIR_BUDGET_TOKENS = 10_000


def dsir_resample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, logratio_q, ws_tokens, cum_tokens, kept): the selection
    step of Data Selection via Importance Resampling — rank the corpus
    by DSIR importance (most target-like first, ties to doc_id) and keep
    the prefix that fits a {DSIR_BUDGET_TOKENS}-token training budget
    (a document is kept iff the running token total THROUGH it stays
    within budget).

    Plan: dsir_importance's own plan (bounded feature table broadcast),
    one join to the row-local token counter, and the DISTRIBUTED global
    running sum from functions.global_order (range partition + driver
    prefix offsets — the same helper pack_plan uses; no single-partition
    window). The cumulative sum is what makes budgeted selection exact
    rather than threshold-guessed."""
    imp = TP.dsir_importance(spark, sf_dir).select("doc_id", "logratio_q")
    t = TS.token_count(spark, sf_dir).select("doc_id", "ws_tokens")
    j = imp.join(t, "doc_id")
    ranked, _ = with_global_order_stat(
        j,
        [F.desc("logratio_q"), F.asc("doc_id")],
        cumsum_col="ws_tokens",
        out="cum_tokens",
    )
    return (
        ranked.select(
            "doc_id",
            "logratio_q",
            F.col("ws_tokens").cast("long").alias("ws_tokens"),
            "cum_tokens",
            (F.col("cum_tokens") <= DSIR_BUDGET_TOKENS).alias("kept"),
        )
        .orderBy("doc_id")
    )


def _dsir_resample_plan_sql() -> str:
    imp = TP.DSIR_IMPORTANCE_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH imp AS ({imp}),
tok AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
              AS BIGINT) AS ws_tokens
  FROM documents
),
r AS (
  SELECT i.doc_id, i.logratio_q, tok.ws_tokens,
         SUM(tok.ws_tokens) OVER (
           ORDER BY i.logratio_q DESC, i.doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM imp i JOIN tok USING (doc_id)
)
SELECT doc_id, logratio_q, ws_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       cum_tokens <= {DSIR_BUDGET_TOKENS} AS kept
FROM r
ORDER BY doc_id
"""


DSIR_RESAMPLE_PLAN_SQL = _dsir_resample_plan_sql()


# ---------------------------------------------------------------------------
# half-life-decayed user activity
# ---------------------------------------------------------------------------

HALF_LIFE_US = 24 * 3600 * 1_000_000  # 24 h


def user_recency_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_events, recency_ppm): per-user activity score where
    each event contributes 2^(−age/half-life) of a full point, with age
    quantized to whole {HALF_LIFE_US // 3_600_000_000}-hour half-lives
    relative to the newest event — i.e. SHIFT-EXACT decay:
    1e6 >> min(halflives, 62), summed in ppm. The quantized form is what
    keeps an exponential-decay feature bit-identical across engines (no
    float pow), and at ≥20 half-lives the contribution is exactly 0, so
    the score is also naturally windowed.

    Plan: a 1-row max-timestamp broadcast, a row-local shift, one
    partial-aggregated groupBy(user_id). One scan, one bounded shuffle."""
    e = load_events(spark, sf_dir).select("user_id", "ts_us")
    mx = e.agg(F.max("ts_us").alias("mx"))
    contrib = F.expr(
        f"shiftright(CAST(1000000 AS BIGINT),"
        f" CAST(least((mx - ts_us) div {HALF_LIFE_US}, 62) AS INT))"
    )
    return (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(contrib).cast("long").alias("recency_ppm"),
        )
        .orderBy("user_id")
    )


USER_RECENCY_WEIGHT_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
m AS (SELECT MAX(us) AS mx FROM e)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(1000000 >> LEAST((mx - us) // {HALF_LIFE_US}, 62)) AS BIGINT)
         AS recency_ppm
FROM e, m
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# vocabulary Zipf curve
# ---------------------------------------------------------------------------

ZIPF_TOP_K = 50


def zipf_vocab_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, tok, cnt, cnt_bitlen): the corpus' top-{ZIPF_TOP_K} token
    frequencies with a bitlen log2 proxy — the rank-frequency curve a
    corpus linguist eyeballs for Zipf conformance (a healthy natural-
    language corpus drops ~1 bit per rank doubling; a flat curve means
    boilerplate, a cliff means template spam).

    Plan: token explode → partial-aggregated groupBy(tok) — map-side
    combine keeps shuffle at |vocab| — then a distributed sort+LIMIT
    top-k (Spark plans TakeOrderedAndProject: per-partition heads, no
    single-partition window over the vocabulary); the rank window runs
    over the {ZIPF_TOP_K} survivors only."""
    from ..functions.text import tokens as _tokens

    d = load_docs(spark, sf_dir)
    counts = (
        d.select(F.explode(_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(ZIPF_TOP_K)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            "tok",
            "cnt",
            F.expr("CAST(length(bin(cnt)) AS BIGINT)").alias("cnt_bitlen"),
        )
        .orderBy("rank")
    )


def _zipf_vocab_curve_sql() -> str:
    from ..functions.text import TOKEN_SPLIT_RE

    return f"""
WITH c AS (
  SELECT tok, COUNT(*) AS cnt FROM (
    SELECT unnest(list_filter(
      string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '')) AS tok
    FROM documents)
  GROUP BY tok
),
top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT {ZIPF_TOP_K})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank,
       tok, cnt, CAST(length(bin(cnt)) AS BIGINT) AS cnt_bitlen
FROM top
ORDER BY rank
"""


ZIPF_VOCAB_CURVE_SQL = _zipf_vocab_curve_sql()


# ---------------------------------------------------------------------------
# cross-source n-gram novelty
# ---------------------------------------------------------------------------

NOVELTY_N = 8  # word n-gram order (matches contamination's gram size)


def ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_grams, n_exclusive, exclusive_ppm): per provider, how
    many of its distinct word-{NOVELTY_N}-grams appear in NO other
    source — the novelty audit that separates providers contributing
    genuinely new text from mirrors re-serving syndicated content
    (complement of source_overlap_matrix, which only sees near-dup
    DOCUMENT pairs; this sees partial/fragment reuse).

    Plan: distinct grams are built row-locally and hashed to 64-bit
    BEFORE the explode (8-byte shuffle keys); one groupBy(gh) computes
    each gram's source-spread via min/max source (a gram is exclusive
    iff min = max — no distinct-count needed); one bounded
    groupBy(source). Shuffle is |distinct grams|, the same class as the
    contamination join."""
    from ..functions.text import hash64, tokens as _tokens

    d = load_docs(spark, sf_dir)
    wt = d.select("source", _tokens("text").alias("toks")).filter(
        F.size("toks") >= NOVELTY_N
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - NOVELTY_N),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, NOVELTY_N)),
        )
    )
    # r16 (guide §2.4): sg pinned (it feeds two aggregations), and the
    # sg⋈spread join — an exchange of the full distinct-gram stream —
    # is GONE: an exclusive gram has exactly one sg row, so counting
    # spread's lo==hi rows per lo-source yields the same n_exclusive,
    # and n_grams is a direct groupBy(source) over sg. The final join
    # is |sources|-sized.
    sg = (
        wt.select("source", F.explode(grams).alias("gram"))
        .select("source", hash64(F.col("gram")).alias("gh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spread = sg.groupBy("gh").agg(
        F.min("source").alias("lo"), F.max("source").alias("hi")
    )
    n_grams = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    excl = (
        spread.filter(F.col("lo") == F.col("hi"))
        .groupBy(F.col("lo").alias("source"))
        .agg(F.count(F.lit(1)).alias("n_exclusive"))
    )
    per_src = n_grams.join(excl, "source", "left").select(
        "source",
        "n_grams",
        F.coalesce("n_exclusive", F.lit(0)).cast("long").alias("n_exclusive"),
    )
    return per_src.select(
        "source",
        "n_grams",
        "n_exclusive",
        F.expr("(n_exclusive * 1000000) div n_grams").alias("exclusive_ppm"),
    ).orderBy("source")


def _ngram_novelty_sql() -> str:
    from ..functions.text import TOKEN_SPLIT_RE, sql_hash64

    return f"""
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t != '') AS l
  FROM documents
),
sg AS (
  SELECT DISTINCT source, {sql_hash64("array_to_string(l[i+1:i+" + str(NOVELTY_N) + "], ' ')")} AS gh
  FROM toks, unnest(range(len(l) - {NOVELTY_N - 1})) AS t(i)
  WHERE len(l) >= {NOVELTY_N}
),
spread AS (SELECT gh, MIN(source) AS lo, MAX(source) AS hi FROM sg GROUP BY gh)
SELECT sg.source, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN lo = hi THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
       CAST((SUM(CASE WHEN lo = hi THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
            AS BIGINT) AS exclusive_ppm
FROM sg JOIN spread USING (gh)
GROUP BY sg.source
ORDER BY sg.source
"""


NGRAM_NOVELTY_BY_SOURCE_SQL = _ngram_novelty_sql()


# ---------------------------------------------------------------------------
# contamination rollup by source
# ---------------------------------------------------------------------------


def contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_train_docs, n_contaminated, contam_ppm): the per-
    provider rollup of the benchmark-contamination check — which
    providers ship eval-overlapping text (the decision table for
    dropping or re-filtering a provider before training).

    Plan: contamination_ngram's own candidate-bounded gram join, a
    broadcast of its (small) contaminated-doc list onto the train-doc
    projection, one bounded groupBy(source)."""
    contam = (
        TP.contamination_ngram(spark, sf_dir)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
        .withColumn("is_contam", F.lit(1))
    )
    train = load_docs(spark, sf_dir).filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", "source"
    )
    return (
        train.join(F.broadcast(contam), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.sum(F.coalesce("is_contam", F.lit(0)).cast("long")).alias(
                "n_contaminated"
            ),
        )
        .select(
            "source",
            "n_train_docs",
            "n_contaminated",
            F.expr("(n_contaminated * 1000000) div n_train_docs").alias(
                "contam_ppm"
            ),
        )
        .orderBy("source")
    )


CONTAMINATION_BY_SOURCE_SQL = f"""
WITH contam AS (
  SELECT DISTINCT train_doc_id AS doc_id
  FROM ({TP.CONTAMINATION_SQL.replace("ORDER BY train_doc_id", "")})
)
SELECT d.source, COUNT(*) AS n_train_docs,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST((SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS contam_ppm
FROM documents d LEFT JOIN contam c USING (doc_id)
WHERE d.doc_id % 10 != 0
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# embedding norm outliers (integer-exact sigma test)
# ---------------------------------------------------------------------------

EMB_QUANT = 10_000_000  # floor(x*1e7) int64 — the clustering/PCA recipe


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, norm_q, is_outlier): vectors whose squared norm sits more
    than 2σ from the corpus mean — the embedding-health screen that
    catches un-normalized batches, zero vectors, and exploded encodes
    before they poison an ANN index. norm_q = Σ floor(x·1e7)² (the
    repo's standard quantization, so the statistic is integer-exact);
    the σ test is the same DECIMAL(38,0)/HUGEINT moment inequality as
    events_anomaly_hours — no float mean, no sqrt, no engine drift.

    Plan: row-local fold per vector, a 3-number global moment aggregate
    broadcast back, row-local comparison. One scan, no data shuffle."""
    from .emb_source import load_embeddings

    e = load_embeddings(spark, sf_dir)
    q = F.aggregate(
        F.transform(
            "embedding",
            lambda x: {
                "q": F.floor(x.cast("double") * F.lit(float(EMB_QUANT))).cast(
                    "long"
                )
            }["q"],
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    )
    nq = e.select("vec_id", q.alias("norm_q"))
    stats = nq.agg(
        F.sum("norm_q").alias("s"),
        F.sum(
            F.col("norm_q").cast("decimal(38,0)") * F.col("norm_q")
        ).alias("qq"),
        F.count(F.lit(1)).alias("n"),
    )
    flag = F.expr(
        """
        CAST((norm_q * n - s) AS DECIMAL(38,0)) * (norm_q * n - s)
        > 4 * (CAST(n AS DECIMAL(38,0)) * qq - CAST(s AS DECIMAL(38,0)) * s)
        """
    )
    return (
        nq.crossJoin(F.broadcast(stats))
        .select("vec_id", "norm_q", flag.alias("is_outlier"))
        .orderBy("vec_id")
    )


EMBEDDING_NORM_OUTLIERS_SQL = f"""
WITH nq AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(embedding,
              x -> CAST(floor(x::DOUBLE * {EMB_QUANT}) AS BIGINT)
                   * CAST(floor(x::DOUBLE * {EMB_QUANT}) AS BIGINT))) AS BIGINT)
           AS norm_q
  FROM embeddings
),
st AS (
  SELECT SUM(norm_q) AS s,
         SUM(CAST(norm_q AS HUGEINT) * norm_q) AS qq,
         COUNT(*) AS n
  FROM nq
)
SELECT vec_id, norm_q,
       CAST((norm_q * n - s) AS HUGEINT) * (norm_q * n - s)
         > 4 * (CAST(n AS HUGEINT) * qq - CAST(s AS HUGEINT) * s) AS is_outlier
FROM nq, st
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# attribution latency histogram (bitlen buckets)
# ---------------------------------------------------------------------------


def attribution_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gap_bitlen, n_pairs): the click→purchase latency distribution in
    power-of-two microsecond buckets (bitlen of gap_us; gap 0 lands in
    bucket 1) — the exponential histogram an attribution-horizon owner
    reads to pick HORIZON (the streaming join's state bound) without a
    float log2.

    Plan: rides the batch as-of join (window-composed, one shuffle per
    side), then one |buckets|-row groupBy."""
    from . import temporal as TM

    att = TM.asof_attribution(spark, sf_dir)
    return (
        att.filter(F.col("click_id").isNotNull())
        .select(F.expr("CAST(length(bin(gap_us)) AS BIGINT)").alias("gap_bitlen"))
        .groupBy("gap_bitlen")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("gap_bitlen")
    )


def _attribution_latency_sql() -> str:
    from .temporal import ASOF_ATTRIBUTION_SQL

    base = ASOF_ATTRIBUTION_SQL.replace("ORDER BY purchase_id", "")
    return f"""
WITH att AS ({base})
SELECT CAST(length(bin(gap_us)) AS BIGINT) AS gap_bitlen, COUNT(*) AS n_pairs
FROM att
WHERE click_id IS NOT NULL
GROUP BY 1
ORDER BY 1
"""


ATTRIBUTION_LATENCY_HISTOGRAM_SQL = _attribution_latency_sql()


# ---------------------------------------------------------------------------
# MinHash threshold sweep (estimator precision curve)
# ---------------------------------------------------------------------------

THR_PPM_LO, THR_PPM_HI, THR_PPM_STEP = 400_000, 900_000, 100_000
_THRESHOLDS = list(range(THR_PPM_LO, THR_PPM_HI + 1, THR_PPM_STEP))


def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(thr_ppm, est_pos, exact_pos, both_pos, precision_ppm): for each
    candidate Jaccard threshold, how many LSH candidate pairs the
    MinHash ESTIMATE would accept, how many the exact computation
    accepts, their overlap, and the estimator's precision — the sweep an
    operator runs before committing a dedup threshold at 100 TB (where
    only the estimate is affordable corpus-wide).

    Plan: one pass of minhash_estimate_accuracy (candidate-bounded),
    cross-joined with a {len(_THRESHOLDS)}-row broadcast threshold
    table, one bounded groupBy."""
    acc = D.minhash_estimate_accuracy(spark, sf_dir)
    thr = values_df(spark,
        [(t,) for t in _THRESHOLDS], "thr_ppm long"
    )
    return (
        acc.crossJoin(F.broadcast(thr))
        .groupBy("thr_ppm")
        .agg(
            F.sum((F.col("est_ppm") >= F.col("thr_ppm")).cast("long")).alias(
                "est_pos"
            ),
            F.sum((F.col("exact_ppm") >= F.col("thr_ppm")).cast("long")).alias(
                "exact_pos"
            ),
            F.sum(
                (
                    (F.col("est_ppm") >= F.col("thr_ppm"))
                    & (F.col("exact_ppm") >= F.col("thr_ppm"))
                ).cast("long")
            ).alias("both_pos"),
        )
        .select(
            "thr_ppm",
            "est_pos",
            "exact_pos",
            "both_pos",
            F.expr(
                "CASE WHEN est_pos = 0 THEN 0"
                " ELSE (both_pos * 1000000) div est_pos END"
            ).alias("precision_ppm"),
        )
        .orderBy("thr_ppm")
    )


def _dedup_threshold_curve_sql() -> str:
    base = D.MINHASH_ESTIMATE_ACCURACY_SQL.replace("ORDER BY doc_a, doc_b", "")
    thrs = ", ".join(str(t) for t in _THRESHOLDS)
    return f"""
WITH acc AS ({base}),
thr AS (SELECT CAST(unnest([{thrs}]) AS BIGINT) AS thr_ppm)
SELECT thr_ppm,
       CAST(SUM(CASE WHEN est_ppm >= thr_ppm THEN 1 ELSE 0 END) AS BIGINT) AS est_pos,
       CAST(SUM(CASE WHEN exact_ppm >= thr_ppm THEN 1 ELSE 0 END) AS BIGINT) AS exact_pos,
       CAST(SUM(CASE WHEN est_ppm >= thr_ppm AND exact_ppm >= thr_ppm
                THEN 1 ELSE 0 END) AS BIGINT) AS both_pos,
       CAST(CASE WHEN SUM(CASE WHEN est_ppm >= thr_ppm THEN 1 ELSE 0 END) = 0
                 THEN 0
                 ELSE (SUM(CASE WHEN est_ppm >= thr_ppm AND exact_ppm >= thr_ppm
                           THEN 1 ELSE 0 END) * 1000000)
                      // SUM(CASE WHEN est_ppm >= thr_ppm THEN 1 ELSE 0 END) END
            AS BIGINT) AS precision_ppm
FROM acc, thr
GROUP BY thr_ppm
ORDER BY thr_ppm
"""


DEDUP_THRESHOLD_CURVE_SQL = _dedup_threshold_curve_sql()


# ---------------------------------------------------------------------------
# source × language confusion matrix
# ---------------------------------------------------------------------------


def source_lang_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, lang, lang_pred, n_docs): document counts per (provider,
    labeled language, predicted language) — the per-provider view of the
    language-ID confusion that tells you WHICH provider's metadata or
    text is lying when lang_id_confusion shows global disagreement.

    Plan: lang_id's shuffle-free codegen pass + one broadcast label
    join + a bounded triple groupBy."""
    from .textstats import lang_id

    pred = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    d = load_docs(spark, sf_dir).select("doc_id", "source", "lang")
    return (
        d.join(pred, "doc_id")
        .groupBy("source", "lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "lang", "lang_pred")
    )


def _source_lang_matrix_sql() -> str:
    from .textstats import LANG_ID_SQL

    base = LANG_ID_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH pred AS ({base})
SELECT d.source, d.lang, p.lang_pred, COUNT(*) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


SOURCE_LANG_MATRIX_SQL = _source_lang_matrix_sql()


# ---------------------------------------------------------------------------
# per-source token-length decile bands
# ---------------------------------------------------------------------------

N_DECILES = 10


def length_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, decile, n_docs, min_tokens, max_tokens): each provider's
    token-length distribution as exact NTILE({N_DECILES}) bands — the
    compact per-provider length profile a curriculum or packing planner
    reads (a provider whose top decile dwarfs its median needs chunking;
    one whose bottom decile is near-zero needs a length floor).

    Plan: row-local token counts, one window per source (ANSI NTILE is
    identical in Spark and DuckDB given the unique (ws_tokens, doc_id)
    order), one bounded groupBy. Per-source partitions are provider-
    sized; a pathological mega-provider would reuse the distributed
    global-order helper per source."""
    t = TS.token_count(spark, sf_dir).select("doc_id", "ws_tokens")
    d = load_docs(spark, sf_dir).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(F.asc("ws_tokens"), F.asc("doc_id"))
    return (
        d.join(t, "doc_id")
        .withColumn("decile", F.ntile(N_DECILES).over(w).cast("long"))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ws_tokens").cast("long").alias("min_tokens"),
            F.max("ws_tokens").cast("long").alias("max_tokens"),
        )
        .orderBy("source", "decile")
    )


LENGTH_DECILE_BANDS_SQL = f"""
WITH t AS (
  SELECT d.doc_id, d.source,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
              AS BIGINT) AS ws_tokens
  FROM documents d
),
r AS (
  SELECT source, ws_tokens,
         CAST(NTILE({N_DECILES}) OVER (
           PARTITION BY source ORDER BY ws_tokens, doc_id) AS BIGINT) AS decile
  FROM t
)
SELECT source, decile, COUNT(*) AS n_docs,
       MIN(ws_tokens) AS min_tokens, MAX(ws_tokens) AS max_tokens
FROM r
GROUP BY source, decile
ORDER BY source, decile
"""
