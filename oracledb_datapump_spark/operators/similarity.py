"""Similarity search over the ``embeddings`` table (array<float> column).

- ann_bruteforce_topk: exact cosine top-k per query vector. O(n·q) pair
  evaluations — the correctness baseline. Expressed with zip_with +
  aggregate (sequential double fold → bit-identical to the DuckDB oracle).
- ann_lsh_topk: the scale path — random-hyperplane LSH bucketing, then
  exact re-rank *within* buckets. The hyperplanes are derived
  deterministically from md5 hashes, so the whole operator (and its
  recall vs brute force) is reproducible. At 100 TB: bucket join replaces
  the all-pairs cross join; bucket skew handled by multi-probe (we emit
  each vector into its bucket only; probing variants widen candidates).

Scale notes: the query side is broadcast (top-k per *query*); the corpus
side streams. For corpus×corpus at 100 TB use dedup.dedup_minhash_pairs-
style banding instead of all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import hash64

TOP_K = 5
N_QUERIES = 20  # first N vec_ids act as the query set
LSH_TABLES = 4  # L independent hash tables (union of candidates)
LSH_BITS = 4  # bits per table signature


def _emb(spark: SparkSession, sf_dir: str, widen: bool = False) -> DataFrame:
    from .emb_source import load_embeddings

    return load_embeddings(spark, sf_dir, widen=widen)


def _cosine(a, b):
    """Cosine of two array columns via the sequential double fold
    (bit-identical to DuckDB's list_sum).

    r16 negative result (A/B-measured same-JVM at sf0.1, REJECTED):
    unrolling the fold into straight-line element_at add chains — the
    hubness_report device — regressed EVERY consumer (ann_bruteforce
    1.36×, ann_lsh_topk 1.94×, centroid_topk 2.53×, ann_lsh_recall
    2.22×, embedding_dim_ablation 1.54×, dedup_semantic 8.05×). Unlike
    hubness's single 64-term INTEGER dot over pre-extracted flat
    columns, this needs ~192 double-typed element_at terms per row
    against in-row arrays; the generated code ran far slower than the
    vectorized array fold it replaced. The fold stands."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (norm(a) * norm(b))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{TOP_K} cosine neighbors for the first {N_QUERIES}
    vectors. Query side broadcast; corpus scanned once.

    widen=True (guide §2.2): the first stage is the n·|Q| cosine
    fan-out over the corpus scan — row-heavy enough that widening the
    fixture-narrow scan paid 0.48× in the r16 A/B; r17 moved the widen
    here from the shared absorber (it regressed the light consumers)."""
    e = _emb(spark, sf_dir, widen=True)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("q_emb"), F.col("c_emb")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.q_emb, c.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE))
         / (sqrt(list_sum(list_transform(q.q_emb, x -> x::DOUBLE * x::DOUBLE)))
          * sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cosine
  FROM embeddings c, q
  WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _plane_sign(tbl: int, bit: int, dim: int) -> int:
    """±1 from md5(tbl:bit:dim) parity — the hyperplane components are
    pure constants, derived identically everywhere."""
    import hashlib

    h = hashlib.md5(f"{tbl}:{bit}:{dim}".encode()).hexdigest()
    return 1 if int(h[:15], 16) % 2 == 1 else -1


QUANT = 10_000_000.0  # floor(x*1e7) — exact integer projections, portable


def _planes(dim: int) -> np.ndarray:
    """d × (tables·bits) int64 ±1 matrix, cached per dim (computed inside
    the Arrow UDF from the batch shape — no driver-side data read)."""
    key = (dim, LSH_TABLES, LSH_BITS)
    cached = _planes._cache.get(key)
    if cached is None:
        cached = np.array(
            [
                [
                    _plane_sign(t, b, i)
                    for t in range(LSH_TABLES)
                    for b in range(LSH_BITS)
                ]
                for i in range(dim)
            ],
            dtype=np.int64,
        )
        _planes._cache[key] = cached
    return cached


_planes._cache = {}


def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, tbl, bucket): {LSH_TABLES} independent {LSH_BITS}-bit
    random-hyperplane signatures; multi-table union is the standard recall
    lever (P[candidate] = 1-(1-p^bits)^tables).

    The hyperplanes are deterministic constants (md5 parity); vectors are
    quantized to floor(x*1e7) int64 so every projection is EXACT integer
    arithmetic — bit-identical across engines, which is what lets the
    DuckDB oracle reproduce bucket assignments (float-sum sign boundaries
    are not portable). Projections run as ONE vectorized Arrow UDF doing
    an integer matmul per batch (Z[n×d] @ P[d×(tables·bits)] → sign bits →
    bucket ints) — map-only, no explode/join/shuffle. (Tried alternatives,
    both worse: exploded dims×planes shuffles |vecs|×d×t·b rows; a
    4096-node column expression overflows whole-stage codegen into
    interpreted eval.) The plane matrix is derived from the batch's own
    width, so no driver-side ``.first()`` read is needed."""
    e = _emb(spark, sf_dir)
    bit_weights = np.tile(
        np.array([1 << b for b in range(LSH_BITS)], dtype=np.int64), LSH_TABLES
    )

    @F.pandas_udf("array<long>")
    def buckets_of(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray(list(emb.values), dtype=np.float64)  # n × d
        z = np.floor(x * QUANT).astype(np.int64)
        bits = (z @ _planes(x.shape[1])) > 0  # n × (tables·bits)
        weighted = bits * bit_weights
        out = weighted.reshape(len(x), LSH_TABLES, LSH_BITS).sum(axis=2)
        return pd.Series(list(out))

    return e.select(
        "vec_id", F.posexplode(buckets_of(F.col("embedding"))).alias("tbl", "bucket")
    )


def ann_lsh_topk(
    spark: SparkSession, sf_dir: str, sig: DataFrame | None = None
) -> DataFrame:
    """LSH-bucketed ANN with query-side multi-probe: each query probes its
    own bucket plus every Hamming-distance-1 bucket per table (bit flips
    are the buckets a borderline projection would have landed in), then
    exact re-rank over the candidate union. Returns (query_id,
    neighbor_id, rank). Fully oracled (ANN_LSH_SQL): signatures are exact
    integer arithmetic over quantized vectors, and the re-rank cosine is
    the sequential fold that is bit-identical to DuckDB's list_sum.

    Scale: multi-probe multiplies only the QUERY side (tables×(1+bits)
    probe rows per query, broadcast); the corpus keeps one row per table —
    the standard trade of probe count for table count."""
    e = _emb(spark, sf_dir)
    if sig is None:  # else: a pre-built index frame (export_ann_index)
        sig = lsh_signatures(spark, sf_dir)
    with_sig = e.join(sig, "vec_id")
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << b).cast("long"))
            for b in range(LSH_BITS)
        ],
    )
    q = (
        with_sig.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("tbl").alias("q_tbl"),
            F.explode(probes).alias("q_bucket"),
        )
    )
    c = with_sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("tbl").alias("c_tbl"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("c_tbl") == F.col("q_tbl"))
            & (F.col("c_bucket") == F.col("q_bucket")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # union candidates across tables before scoring
        .select("query_id", "neighbor_id", "q_emb", "c_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("q_emb"), F.col("c_emb")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


ANN_LSH_SQL = f"""
WITH ez AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(unnest(embedding)::DOUBLE * {QUANT}) AS BIGINT) AS z
  FROM embeddings
),
planes AS (
  SELECT t.tbl, b.bit, d.i,
         CASE WHEN CAST('0x' || substr(md5(CAST(t.tbl AS VARCHAR) || ':' || CAST(b.bit AS VARCHAR) || ':' || CAST(d.i AS VARCHAR)), 1, 15) AS UBIGINT) % 2 = 1
              THEN 1 ELSE -1 END AS sgn
  FROM (SELECT unnest(range({LSH_TABLES})) AS tbl) t,
       (SELECT unnest(range({LSH_BITS})) AS bit) b,
       (SELECT DISTINCT i FROM ez) d
),
proj AS (
  SELECT e.vec_id, p.tbl, p.bit, SUM(p.sgn * e.z) AS pr
  FROM ez e JOIN planes p ON e.i = p.i
  GROUP BY e.vec_id, p.tbl, p.bit
),
sig AS (
  SELECT vec_id, tbl,
         CAST(SUM(CASE WHEN pr > 0 THEN (1 << bit) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id, tbl
),
probes AS (
  SELECT vec_id AS query_id, tbl AS q_tbl,
         unnest([bucket, {", ".join(f"xor(bucket, {1 << b})" for b in range(LSH_BITS))}]) AS q_bucket
  FROM sig WHERE vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM sig c JOIN probes p ON c.tbl = p.q_tbl AND c.bucket = p.q_bucket
  WHERE c.vec_id != p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_sum(list_transform(list_zip(q.embedding, c.embedding), pr -> pr[1]::DOUBLE * pr[2]::DOUBLE))
         / (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))
          * sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def centroid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse quantization using the provided ``label`` column as
    the partition (at scale: k-means centroids): per label, the top-{TOP_K}
    vectors closest to the label centroid.

    Plan (reworked after round-1 review): per-dimension centroid sums run
    over the posexploded stream ONCE; the tiny per-label centroid table is
    assembled into arrays and BROADCAST back to the un-exploded corpus, so
    the n×d stream is never shuffled a second time — cosine runs
    row-locally via the fold. Centroid sums use floor(x*1e7) integers
    (exact, order-independent, and portably reproducible — no
    float-vs-decimal rounding ambiguity between engines)."""
    e = _emb(spark, sf_dir)
    dims = e.select("label", F.posexplode("embedding").alias("i", "x"))
    zsum = F.sum(F.floor(F.col("x").cast("double") * F.lit(QUANT)).cast("long"))
    cent = dims.groupBy("label", "i").agg(
        (zsum.cast("double") / (F.count(F.lit(1)) * F.lit(QUANT))).alias("c")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    scored = e.join(F.broadcast(cent_arr), "label").select(
        "label",
        "vec_id",
        _cosine(F.col("embedding"), F.col("cvec")).alias("cosine"),
    )
    w = W.partitionBy("label").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("label", "vec_id", "rank")
        .orderBy("label", "rank")
    )


CENTROID_SQL = f"""
WITH dims AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
cent AS (
  SELECT label, i,
         CAST(SUM(CAST(floor(x * {QUANT}) AS BIGINT)) AS DOUBLE) / (COUNT(*) * {QUANT}) AS c
  FROM dims GROUP BY label, i
),
centarr AS (
  SELECT label, list(c ORDER BY i) AS cvec FROM cent GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, ca.cvec), pr -> pr[1]::DOUBLE * pr[2]::DOUBLE))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
          * sqrt(list_sum(list_transform(ca.cvec, x -> x::DOUBLE * x::DOUBLE)))) AS cosine
  FROM embeddings e JOIN centarr ca ON e.label = ca.label
)
SELECT label, vec_id, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
ORDER BY label, rank
"""


# ---------------------------------------------------------------------------
# ANN index lifecycle: export the LSH signature table as a dump artifact
# ---------------------------------------------------------------------------

INDEX_MANIFEST = "_index_manifest.json"


def export_ann_index(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Persist the LSH signature table (vec_id, tbl, bucket) plus its
    parameters as a dump-set-style artifact — the datapump lifecycle
    applied to a similarity index. At 100 TB the signature build is one
    full corpus pass; exporting it amortizes that pass across every
    later query batch (the same argument as writing the TF-IDF inverted
    index out). The manifest pins (tables, bits, quant) so a query-time
    parameter drift fails loudly instead of silently probing the wrong
    buckets."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    lsh_signatures(spark, sf_dir).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lsh_signatures")
    )
    meta = {
        "kind": "lsh_index",
        "tables": LSH_TABLES,
        "bits": LSH_BITS,
        "quant": QUANT,
        "source": sf_dir,
        "created_by": "oracledb-datapump-spark",
    }
    tmp = os.path.join(out_dir, INDEX_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(out_dir, INDEX_MANIFEST))
    return meta


def load_ann_index(
    spark: SparkSession, index_dir: str, expected_source: str | None = None
) -> DataFrame:
    """Read an exported LSH index back, validating its parameters
    against the engine's current constants — a bits/tables/quant
    mismatch would silently compute Hamming probes in the wrong space,
    the exact class of bug the events/documents absorbers exist to
    prevent. ``expected_source`` additionally pins the CORPUS the index
    was built from: a stale or foreign index joined on vec_id against a
    different embeddings table returns plausible-but-wrong neighbors
    with no error — the manifest records `source` precisely to catch
    that drift."""
    import json
    import os

    path = os.path.join(index_dir, INDEX_MANIFEST)
    if not os.path.isfile(path):
        from ..exceptions import FileError

        raise FileError(f"No ANN index manifest at {path}")
    with open(path) as f:
        meta = json.load(f)
    expected = {"tables": LSH_TABLES, "bits": LSH_BITS, "quant": QUANT}
    got = {k: meta.get(k) for k in expected}
    if got != expected:
        from ..exceptions import UsageError

        raise UsageError(
            f"ANN index at {index_dir} was built with {got}, engine "
            f"expects {expected} — rebuild the index (export_ann_index) "
            "rather than probing the wrong bucket space"
        )
    if (
        expected_source is not None
        and meta.get("source") is not None
        and os.path.abspath(meta["source"]) != os.path.abspath(expected_source)
    ):
        from ..exceptions import UsageError

        raise UsageError(
            f"ANN index at {index_dir} was built from "
            f"{meta['source']!r}, but the query targets "
            f"{expected_source!r} — rebuild the index for this corpus "
            "rather than joining stale buckets by vec_id"
        )
    return spark.read.parquet(os.path.join(index_dir, "lsh_signatures"))


def ann_lsh_topk_from_index(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """ann_lsh_topk served from a previously exported index: identical
    results, zero signature recompute — the production query path once
    the index artifact exists. The load validates both the LSH
    parameters AND that the index was built from this corpus."""
    return ann_lsh_topk(
        spark, sf_dir, sig=load_ann_index(spark, index_dir, expected_source=sf_dir)
    )


# ---------------------------------------------------------------------------
# embedding-dimension ablation (matryoshka-style truncation eval)
# ---------------------------------------------------------------------------

ABLATION_DIMS = (64, 32, 16, 8)


def _topk_sliced(e: DataFrame, d: int) -> DataFrame:
    """Exact cosine top-{TOP_K} per query using only the first d dims."""
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.slice("embedding", 1, d).alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.slice("embedding", 1, d).alias("c_emb"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("q_emb"), F.col("c_emb")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_dim_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dims, n_queries, top1_agree, top5_overlap): retrieval quality of
    TRUNCATED embeddings (first d of {ABLATION_DIMS[0]} dims) against
    the full-dimension exact top-{TOP_K} — how many queries keep their
    top-1 neighbor, and how many of the {TOP_K}·{N_QUERIES} neighbor
    slots survive, per truncation width. The matryoshka question: how
    many dims can serving afford to drop before recall pays.

    The d={ABLATION_DIMS[0]} row is the self-check (perfect agreement
    by construction). Plan: the full-dim top-k is computed once and
    localCheckpointed; each ablation arm is one broadcast-scored pass
    over the corpus + a {TOP_K}·{N_QUERIES}-row join against it. At
    100 TB each arm reads the SAME cached candidate geometry a real
    ablation would sample, so cost scales with arms × corpus scan.

    widen=True: four broadcast-scored cosine fan-outs over the corpus
    scan — the same row-heavy first stage as ann_bruteforce_topk."""
    e = _emb(spark, sf_dir, widen=True)
    full = _topk_sliced(e, ABLATION_DIMS[0]).localCheckpoint(eager=True)
    full1 = full.filter(F.col("rank") == 1).select(
        "query_id", F.col("neighbor_id").alias("full_top1")
    )
    out = None
    for d in ABLATION_DIMS:
        t = _topk_sliced(e, d) if d != ABLATION_DIMS[0] else full
        overlap = (
            t.join(
                full.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            )
            .agg(F.count(F.lit(1)).alias("top5_overlap"))
        )
        agree = (
            t.filter(F.col("rank") == 1)
            .join(F.broadcast(full1), "query_id")
            .agg(
                F.sum(
                    F.when(F.col("neighbor_id") == F.col("full_top1"), 1)
                    .otherwise(0)
                )
                .cast("long")
                .alias("top1_agree"),
                F.count(F.lit(1)).alias("n_queries"),
            )
        )
        row = agree.crossJoin(F.broadcast(overlap)).select(
            F.lit(d).cast("long").alias("dims"),
            "n_queries",
            "top1_agree",
            "top5_overlap",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy(F.desc("dims"))


def _ablation_sql() -> str:
    full_d = ABLATION_DIMS[0]

    def topk_cte(tag: str, d: int) -> str:
        return f"""t{tag} AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY
               list_sum(list_transform(list_zip(q.embedding[1:{d}], c.embedding[1:{d}]),
                                       p -> p[1]::DOUBLE * p[2]::DOUBLE))
               / (sqrt(list_sum(list_transform(q.embedding[1:{d}], x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(c.embedding[1:{d}], x -> x::DOUBLE * x::DOUBLE))))
               DESC, c.vec_id ASC) AS rank
    FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
    WHERE c.vec_id != q.vec_id
  ) WHERE rank <= {TOP_K}
)"""

    ctes = [topk_cte("full", full_d)] + [
        topk_cte(str(d), d) for d in ABLATION_DIMS if d != full_d
    ]
    arms = []
    for d in ABLATION_DIMS:
        tag = "full" if d == full_d else str(d)
        arms.append(
            f"""
  SELECT {d} AS dims,
         (SELECT COUNT(*) FROM t{tag} a JOIN tfull f
            ON a.query_id = f.query_id AND a.rank = 1 AND f.rank = 1)
           AS n_queries,
         (SELECT COUNT(*) FROM t{tag} a JOIN tfull f
            ON a.query_id = f.query_id AND a.rank = 1 AND f.rank = 1
               AND a.neighbor_id = f.neighbor_id) AS top1_agree,
         (SELECT COUNT(*) FROM t{tag} a JOIN tfull f
            ON a.query_id = f.query_id AND a.neighbor_id = f.neighbor_id)
           AS top5_overlap"""
        )
    body = " UNION ALL ".join(arms)
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT CAST(dims AS BIGINT) AS dims, CAST(n_queries AS BIGINT) AS n_queries, "
        "CAST(top1_agree AS BIGINT) AS top1_agree, "
        "CAST(top5_overlap AS BIGINT) AS top5_overlap "
        f"FROM ({body}) ORDER BY dims DESC"
    )


EMBEDDING_DIM_ABLATION_SQL = _ablation_sql()
