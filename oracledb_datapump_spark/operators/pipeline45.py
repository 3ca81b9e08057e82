"""Batch 45: pipeline planning + release operators.

Five planning/audit surfaces a 100-TB training-data pipeline runs
*before* committing to an expensive pass, plus one privacy release:

- ``lsh_band_planner`` — the MinHash-LSH (b, r) parameter sweep from
  the public S-curve analysis (Leskovec/Rajaraman/Ullman, *Mining of
  Massive Datasets* ch. 3): collision probability 1-(1-s^r)^b on an
  exact rational grid, false-positive/false-negative areas around the
  engine's Jaccard threshold, and the EMPIRICAL candidate-pair cost of
  each banding measured on the corpus's real minhash signatures.
- ``weighted_sample_report`` — deterministic weighted corpus sampling
  in the Efraimidis–Spirakis (2006) one-pass reservoir style, with the
  float exponential key replaced by the integer fixed-point priority
  ``hash64 div weight`` (bigger weight → stochastically smaller
  priority) so both engines rank identically with no float in sight.
- ``dp_release_counts`` — differentially-private group-count release
  in the geometric-mechanism family (Ghosh/Roughgarden/Sundararajan
  2009), the integer-valued analog of Laplace: noise magnitude is a
  Geometric(1/2) variable read directly off the key-hash's bit stream
  (count of leading one-bits — a 16-level CASE ladder, pure int64),
  symmetrized by an independent sign bit. The dyadic symmetrization
  puts mass 1/2 at zero, so the worst adjacent-output ratio is
  P(0)/P(±1) = 4 ⇒ ε = ln 4 at sensitivity 1 (the interior ratios are
  all 2); small-count suppression layers on top.
- ``leakage_quarantine_plan`` — the ACTION after split_leakage_pairs'
  detection: for every verified near-dup pair that straddles two
  splits, quarantine the doc on the less-trusted side
  (train < val < test), so eval stays clean and train keeps its data.
- ``source_token_entropy`` — per-source lexical concentration: token
  count, type count, type/token ratio, and the engine's integer
  entropy proxy Σc·(bitlen(N)−bitlen(c)) over the source's unigram
  distribution (the bitlen surrogate used wherever a float log would
  break cross-engine exactness).
- ``context_fill_curve`` — the no-packing padding-waste baseline: for
  each context-window size, how many windows a naive one-doc-per-window
  loader consumes and the fill ratio — read next to pack_fill_report,
  the delta is the packing ROI.

Scale posture: every operator is one or two partial-aggregated
groupBys over row-local derivations. The only join surfaces are the
band-planner's signature bucket-join (16-way banded, identical cost
shape to the production LSH pass it is sizing), the quarantine plan's
broadcast of the memoized verified-pair list, and broadcast unions of
tiny literal frames. No all-pairs, no global row sort (top-K sampling
is TakeOrderedAndProject), no Python in the row path.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE, hash64, sql_hash64, tokens
from ..functions.local_table import values_df

# ---------------------------------------------------------------------------
# lsh_band_planner
# ---------------------------------------------------------------------------

# (bands, rows) splits of the engine's 16-permutation signature
BAND_COMBOS = [(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)]
S_GRID = [Fraction(i, 20) for i in range(1, 20)]  # 0.05 .. 0.95
PLANNER_THRESHOLD = Fraction(3, 5)  # = dedup.JACCARD_THRESHOLD


def _scurve_rows() -> list[tuple[str, int, int, int, int]]:
    """Exact-rational analytic rows, computed once at import time and
    injected as identical literals into BOTH engines (they are
    compile-time constants of the method, not data)."""
    rows: list[tuple[str, int, int, int, int]] = []
    for b, r in BAND_COMBOS:
        ps = [(s, 1 - (1 - s**r) ** b) for s in S_GRID]
        for s, p in ps:
            rows.append(
                ("scurve", b, r, int(s * 1_000_000), int(p * 1_000_000))
            )
        below = [p for s, p in ps if s < PLANNER_THRESHOLD]
        above = [1 - p for s, p in ps if s >= PLANNER_THRESHOLD]
        fp = sum(below) / len(below)
        fn = sum(above) / len(above)
        rows.append(("fp_area", b, r, 0, int(fp * 1_000_000)))
        rows.append(("fn_area", b, r, 0, int(fn * 1_000_000)))
    return rows


_PLANNER_SCHEMA = "section string, b long, r long, s_ppm long, val long"


def lsh_band_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding sweep over every (b, r) split of the 16-perm
    signature (b·r = 16): the parameter-selection table a dedup owner
    reads before paying for the corpus-wide pass.

    - ``scurve`` rows: collision probability 1-(1-s^r)^b at Jaccard
      similarity s (both in ppm), exact rational arithmetic truncated
      to ppm — no float, both engines carry identical literals.
    - ``fp_area`` / ``fn_area`` rows: mean collision probability below
      the engine's Jaccard threshold (wasted verifications) and mean
      miss probability at/above it (lost duplicates) — the two numbers
      that rank bandings against each other.
    - ``candidates`` rows: the EMPIRICAL cost — candidate pairs
      Σ n·(n-1)/2 over (band, signature) buckets measured on the
      corpus's real signatures at each banding; val is that pair count.

    Plan shape: one shingle explode + ONE partial-aggregated groupBy
    builds the 16 minhash columns (same shape as the production LSH
    pass); all five bandings then explode 31 (combo, band, sig) rows
    per doc and reduce in a single groupBy — one extra shuffle total,
    not one per banding. The analytic rows are a broadcast literal
    frame. At 100 TB the planner costs one signature pass — exactly
    what it saves by steering (b, r) before the real run."""
    from .dedup import _minhash_cols, _shingles_multiset

    agg = (
        _shingles_multiset(spark, sf_dir)
        .groupBy("doc_id")
        .agg(*_minhash_cols())
    )
    entries = []
    for b, r in BAND_COMBOS:
        for band in range(b):
            # r16: the bucket key is the raw minhash ARRAY, not the
            # concat_ws(",") string the oracle uses — array equality is
            # bijective with that string encoding (longs contain no
            # commas), so bucket counts are identical, while the explode
            # skips 31 per-doc string builds and shuffles 8r bytes/sig
            # instead of ~20r (A/B same-JVM: 0.9× on the banding stage,
            # values MATCH; guide §2.3 "shuffle fewer bytes")
            sig = F.array(
                *[F.col(f"mh{j}") for j in range(band * r, (band + 1) * r)]
            )
            entries.append(
                F.struct(
                    F.lit(b).alias("b"),
                    F.lit(r).alias("r"),
                    F.lit(band).alias("band"),
                    sig.alias("sig"),
                )
            )
    buckets = (
        agg.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.b", "e.r", "e.band", "e.sig")
        .groupBy("b", "r", "band", "sig")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    empirical = (
        buckets.groupBy("b", "r")
        .agg(F.expr("sum(n * (n - 1) div 2)").cast("long").alias("val"))
        .select(
            F.lit("candidates").alias("section"),
            F.col("b").cast("long").alias("b"),
            F.col("r").cast("long").alias("r"),
            F.lit(0).cast("long").alias("s_ppm"),
            "val",
        )
    )
    analytic = values_df(spark, _scurve_rows(), _PLANNER_SCHEMA)
    return analytic.unionByName(empirical).orderBy(
        "section", "b", "s_ppm"
    )


def _planner_sql() -> str:
    from .dedup import SQL_MINHASH_CTE

    values = ",\n  ".join(
        f"('{s}', {b}, {r}, {sp}, {v})" for s, b, r, sp, v in _scurve_rows()
    )
    per_band = []
    for b, r in BAND_COMBOS:
        for band in range(b):
            cols = " || ',' || ".join(
                f"CAST(mh{j} AS VARCHAR)"
                for j in range(band * r, (band + 1) * r)
            )
            per_band.append(
                f"SELECT {b} AS b, {r} AS r, {band} AS band, {cols} AS sig FROM mh"
            )
    bands_union = "\n    UNION ALL ".join(per_band)
    return f"""
WITH {SQL_MINHASH_CTE},
bands AS (
    {bands_union}
),
buckets AS (
  SELECT b, r, band, sig, COUNT(*) AS n FROM bands GROUP BY b, r, band, sig
),
empirical AS (
  SELECT 'candidates' AS section, CAST(b AS BIGINT) AS b,
         CAST(r AS BIGINT) AS r, CAST(0 AS BIGINT) AS s_ppm,
         CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS val
  FROM buckets GROUP BY b, r
),
analytic(section, b, r, s_ppm, val) AS (VALUES
  {values}
)
SELECT section, CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
       CAST(s_ppm AS BIGINT) AS s_ppm, CAST(val AS BIGINT) AS val
FROM analytic
UNION ALL
SELECT * FROM empirical
ORDER BY section, b, s_ppm
"""


LSH_BAND_PLANNER_SQL = _planner_sql()


# ---------------------------------------------------------------------------
# weighted_sample_report
# ---------------------------------------------------------------------------

SAMPLE_K = 100


def weighted_sample_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus sample, Efraimidis–Spirakis style:
    each doc draws the fixed-point priority ``hash64('ws:'||doc_id) div
    weight`` (weight = chars, so a 10× longer doc is ~10× likelier to
    land in the sample) and the {SAMPLE_K} smallest priorities win —
    the integer analog of the A-ES exponential-key reservoir, chosen so
    both engines rank with pure int64 arithmetic (the classic
    -ln(u)/w key is float and engines disagree in the last ulp).

    Output per source: total docs, docs sampled, chars captured by the
    sample — the before-the-run audit that a chars-weighted subsample
    keeps per-source balance acceptable.

    Plan shape: priorities are row-local; the top-K is
    TakeOrderedAndProject (distributed heap, never a global sort); the
    winner set (≤{SAMPLE_K} rows) broadcast-joins back onto the
    per-source rollup."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        F.greatest(F.col("n_chars"), F.lit(1)).alias("w"),
    )
    pri = d.withColumn(
        "h", hash64(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
    ).withColumn("pri", F.expr("h div w"))
    winners = (
        pri.orderBy("pri", "doc_id")
        .limit(SAMPLE_K)
        .select("doc_id", F.lit(1).alias("hit"))
    )
    return (
        pri.join(F.broadcast(winners), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_sampled"),
            F.sum(F.when(F.col("hit").isNotNull(), F.col("w")).otherwise(0))
            .cast("long")
            .alias("chars_sampled"),
        )
        .orderBy("source")
    )


WEIGHTED_SAMPLE_REPORT_SQL = f"""
WITH d AS (
  SELECT doc_id, source, GREATEST(n_chars, 1) AS w,
         {sql_hash64("'ws:' || CAST(doc_id AS VARCHAR)")} // GREATEST(n_chars, 1)
           AS pri
  FROM documents
),
winners AS (
  SELECT doc_id FROM d ORDER BY pri, doc_id LIMIT {SAMPLE_K}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN w2.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       CAST(SUM(CASE WHEN w2.doc_id IS NOT NULL THEN d.w ELSE 0 END) AS BIGINT)
         AS chars_sampled
FROM d LEFT JOIN winners w2 USING (doc_id)
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# dp_release_counts
# ---------------------------------------------------------------------------

DP_SUPPRESS_BELOW = 5
_GEO_LEVELS = 16


def _geo_case(g: str, intdiv: str) -> str:
    """CASE ladder: index of the first ZERO bit of ``g`` — a
    Geometric(1/2) draw (P(k) = 2^-(k+1)), clamped at {_GEO_LEVELS}.
    ``intdiv`` is the engine's integer-division operator."""
    whens = "\n    ".join(
        f"WHEN (({g}) {intdiv} {1 << bit}) % 2 = 0 THEN {bit}"
        for bit in range(_GEO_LEVELS)
    )
    return f"CASE\n    {whens}\n    ELSE {_GEO_LEVELS} END"


def dp_release_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private (source, lang) document counts in the
    geometric-mechanism family — the integer analog of Laplace (Ghosh
    et al. 2009): released = max(count + sign·k, 0) where
    k ~ Geometric(1/2) with an independent sign. Privacy accounting for
    this dyadic symmetrization: P(noise=0) = 1/2 and P(noise=±j) =
    2^−(j+2), so adjacent counts shift the output distribution by at
    most a factor of P(0)/P(±1) = 4 ⇒ ε = ln 4 ≈ 1.39 at sensitivity 1
    (interior ratios are 2; the canonical two-sided geometric at
    α = 1/2 would need non-dyadic mass 1/3 at zero, which finite hash
    bits cannot produce exactly — this engine never trades determinism
    for a tighter constant). The noise is keyed determinism:
    sign and k are read straight off the bits of hash64('dp:'||key)
    (sign = lowest bit, k = index of the first zero bit above it — a
    16-level integer CASE ladder, no float, no RNG state), so a release
    is reproducible and auditable while still being a fixed sample of
    the mechanism's distribution. Groups whose released count falls
    below {DP_SUPPRESS_BELOW} are suppressed (flagged, value zeroed) —
    the standard small-cell rule layered on top.

    Plan shape: one partial-aggregated groupBy; noise is a row-local
    expression on the ≤|sources×langs| aggregate."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cnt = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    h = hash64(F.concat(F.lit("dp:"), F.col("source"), F.lit("|"), F.col("lang")))
    noised = (
        cnt.withColumn("h", h)
        .withColumn("sign", F.lit(1) - (F.col("h") % 2) * 2)
        .withColumn("g", F.expr("h div 2"))
        .withColumn("k", F.expr(_geo_case("g", "div")))
        .withColumn(
            "rel", F.greatest(F.col("cnt") + F.col("sign") * F.col("k"), F.lit(0))
        )
    )
    return noised.select(
        "source",
        "lang",
        F.when(F.col("rel") < DP_SUPPRESS_BELOW, F.lit(0))
        .otherwise(F.col("rel"))
        .cast("long")
        .alias("released"),
        (F.col("rel") < DP_SUPPRESS_BELOW).alias("suppressed"),
    ).orderBy("source", "lang")


DP_RELEASE_COUNTS_SQL = f"""
WITH cnt AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY source, lang
),
noised AS (
  SELECT source, lang, cnt,
         {sql_hash64("'dp:' || source || '|' || lang")} AS h
  FROM cnt
),
drawn AS (
  SELECT source, lang, cnt,
         1 - (h % 2) * 2 AS sign,
         {_geo_case('h // 2', '//')} AS k
  FROM noised
),
rel AS (
  SELECT source, lang, GREATEST(cnt + sign * k, 0) AS rel FROM drawn
)
SELECT source, lang,
       CAST(CASE WHEN rel < {DP_SUPPRESS_BELOW} THEN 0 ELSE rel END AS BIGINT)
         AS released,
       rel < {DP_SUPPRESS_BELOW} AS suppressed
FROM rel
ORDER BY source, lang
"""


# ---------------------------------------------------------------------------
# leakage_quarantine_plan
# ---------------------------------------------------------------------------


def leakage_quarantine_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The action after split_leakage_pairs' detection: every verified
    near-dup pair that straddles two splits quarantines the doc on the
    LESS-trusted side (train < val < test — contamination flows from
    train into eval, so eval sheds the doc and train keeps its data;
    a val×test pair sheds the test doc). Same-split pairs are the
    dedup pass's business, not leakage, and quarantine nothing.

    Output per (split, source): docs total, docs quarantined — the
    eval-set shrinkage a team signs off on before the numbers are
    trusted.

    Plan shape: the memoized verified-pair list (tiny) broadcasts onto
    the row-local split assignment twice; the quarantine set is a
    pair-list-sized distinct; one broadcast left-join onto the
    documents rollup. Rides dedup's LSH + memo — no new corpus pass."""
    from .dedup import verified_pairs_cached
    from .textprep import corpus_split

    splits = corpus_split(spark, sf_dir).select("doc_id", "split")
    rank = F.when(F.col("split") == "train", 0).when(
        F.col("split") == "val", 1
    ).otherwise(2)
    ranked = splits.withColumn("rk", rank)
    p = verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    a = ranked.join(F.broadcast(p), ranked.doc_id == p.doc_a).select(
        F.col("doc_id").alias("ida"), F.col("rk").alias("rka"), "doc_b"
    )
    both = ranked.join(F.broadcast(a), ranked.doc_id == a.doc_b).select(
        "ida", "rka", F.col("doc_id").alias("idb"), F.col("rk").alias("rkb")
    )
    quarantined = (
        both.filter(F.col("rka") != F.col("rkb"))
        .select(
            F.when(F.col("rka") > F.col("rkb"), F.col("ida"))
            .otherwise(F.col("idb"))
            .alias("doc_id")
        )
        .distinct()
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    return (
        d.join(splits, "doc_id")
        .join(
            F.broadcast(quarantined.withColumn("q", F.lit(1))),
            "doc_id",
            "left",
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("q").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_quarantined"),
        )
        .orderBy("split", "source")
    )


def _quarantine_sql() -> str:
    from .dedup import DEDUP_MINHASH_VERIFIED_SQL
    from .textprep import CORPUS_SPLIT_SQL

    verified = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    splits = CORPUS_SPLIT_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH v AS ({verified}),
s AS (
  SELECT doc_id, split,
         CASE split WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END AS rk
  FROM ({splits})
),
quarantined AS (
  SELECT DISTINCT CASE WHEN sa.rk > sb.rk THEN v.doc_a ELSE v.doc_b END
           AS doc_id
  FROM v JOIN s sa ON sa.doc_id = v.doc_a
         JOIN s sb ON sb.doc_id = v.doc_b
  WHERE sa.rk <> sb.rk
)
SELECT s.split, d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quarantined
FROM documents d
JOIN s ON s.doc_id = d.doc_id
LEFT JOIN quarantined q ON q.doc_id = d.doc_id
GROUP BY s.split, d.source
ORDER BY s.split, d.source
"""


LEAKAGE_QUARANTINE_PLAN_SQL = _quarantine_sql()


# ---------------------------------------------------------------------------
# source_token_entropy
# ---------------------------------------------------------------------------


def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical concentration: (n_tokens, n_types, ttr_ppm,
    entropy_proxy) over the source's unigram distribution, where
    entropy_proxy = Σ c·(bitlen(N)−bitlen(c)) is the integer Shannon
    surrogate (bitlen = ⌊log₂⌋+1) the engine uses wherever a float log
    would break cross-engine exactness. Low proxy + low type/token
    ratio = template-heavy source (a dedup/boilerplate candidate);
    high = diverse prose.

    Plan shape: row-local tokenize+explode, then two partial-aggregated
    groupBys ((source, tok) → source) — the same shuffle a unigram LM
    build pays, nothing more."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_tok = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_src = per_tok.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("types"),
        F.sum(F.col("c") * F.expr("CAST(length(bin(c)) AS BIGINT)")).alias(
            "sum_c_bitlen"
        ),
    )
    return per_src.select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("types").cast("long").alias("n_types"),
        F.expr("types * 1000000 div n").cast("long").alias("ttr_ppm"),
        (
            F.col("n") * F.expr("CAST(length(bin(n)) AS BIGINT)")
            - F.col("sum_c_bitlen")
        )
        .cast("long")
        .alias("entropy_proxy"),
    ).orderBy("source")


SOURCE_TOKEN_ENTROPY_SQL = f"""
WITH toks AS (
  SELECT source, unnest(list_filter(
           string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
           t -> t != '')) AS tok
  FROM documents
),
per_tok AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
),
per_src AS (
  SELECT source, SUM(c) AS n, COUNT(*) AS types,
         SUM(c * CAST(length(bin(c)) AS BIGINT)) AS sum_c_bitlen
  FROM per_tok GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(types AS BIGINT) AS n_types,
       CAST(types * 1000000 // n AS BIGINT) AS ttr_ppm,
       CAST(n * CAST(length(bin(n)) AS BIGINT) - sum_c_bitlen AS BIGINT)
         AS entropy_proxy
FROM per_src
ORDER BY source
"""


# ---------------------------------------------------------------------------
# context_fill_curve
# ---------------------------------------------------------------------------

WINDOW_SIZES = [512, 1024, 2048, 4096]


def context_fill_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-packing padding-waste baseline per (window size, source): a
    naive loader that never concatenates documents spends
    ceil(tokens/W) windows per doc (an empty doc still burns one —
    padding-only), and fill_ppm = Σtokens·1e6 / (windows·W) is the
    fraction of the context budget carrying real tokens. Read next to
    pack_fill_report: the gap between this curve and the packed fill
    is the ROI of the packing pass at each window size.

    Plan shape: token counts are row-local; the 4 window sizes explode
    4 rows per doc; one partial-aggregated groupBy. No join."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.size(tokens("text")).cast("long").alias("n")
    )
    w = F.explode(F.array(*[F.lit(x) for x in WINDOW_SIZES])).alias("w")
    per = d.select("source", "n", w).select(
        "source",
        "n",
        "w",
        F.greatest(F.expr("(n + w - 1) div w"), F.lit(1)).alias("windows"),
    )
    return (
        per.groupBy("w", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("windows").cast("long").alias("n_windows"),
            F.sum("n").cast("long").alias("tok_total"),
        )
        .select(
            F.col("w").cast("long").alias("w"),
            "source",
            "n_docs",
            "n_windows",
            F.expr("tok_total * 1000000 div (n_windows * w)")
            .cast("long")
            .alias("fill_ppm"),
        )
        .orderBy("w", "source")
    )


CONTEXT_FILL_CURVE_SQL = f"""
WITH d AS (
  SELECT source,
         CAST(len(list_filter(
           string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
           t -> t != '')) AS BIGINT) AS n
  FROM documents
),
per AS (
  SELECT source, n, w, GREATEST((n + w - 1) // w, 1) AS windows
  FROM d CROSS JOIN (VALUES {", ".join(f"({x})" for x in WINDOW_SIZES)}) ws(w)
)
SELECT CAST(w AS BIGINT) AS w, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(windows) AS BIGINT) AS n_windows,
       CAST(SUM(n) * 1000000 // (SUM(windows) * w) AS BIGINT) AS fill_ppm
FROM per
GROUP BY w, source
ORDER BY w, source
"""
