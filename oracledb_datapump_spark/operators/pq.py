"""Product quantization (PQ) for embedding compression + ANN search.

IVF-PQ is the canonical 100 TB ANN architecture (Jégou et al., "Product
Quantization for Nearest Neighbor Search"): split each vector into M
subvectors, k-means each subspace to K codes, store M small code ids per
vector (here 4 bytes replacing 64 floats), and answer queries with
asymmetric distance — a per-query lookup table (LUT) of query-to-code
distances, so scoring a corpus vector is M table lookups + adds, never a
full float dot product. ``similarity.py`` holds the IVF half
(centroid_topk routing); this module is the PQ half:

- ``embedding_pq_codes``: per-vector PQ codes + reconstruction error
  (the compression-quality audit).
- ``ann_pq_topk``: asymmetric-distance top-k for the query set via a
  broadcast LUT join against the codes table.

Determinism contract (same recipe as clustering.py): embeddings
quantize to floor(x·1e7) int64; per-subspace Lloyd iterations assign by
exact integer squared-L2 with lowest-code-id tie-break and update
centroids as floor(int-sum / count) in IEEE double (sums < 2^53 —
exact-operand division); every step is bit-identical in Spark and
DuckDB, so an iterative codebook fit sits inside the cross-engine hash
gate. The DuckDB twin unrolls the fit into CTEs exactly like
``clustering._kmeans_sql``.

Plan shape: codebooks are driver model state (M·K·(D/M) = 512 ints),
memoized per (session, sf_dir) and broadcast as ONE packed row; code
assignment is row-local (zero shuffle); the update pass is one
partial-aggregated groupBy with M·K·(D/M) reduce keys regardless of
corpus size; the search LUT is |queries|·M·K rows — broadcast — so the
corpus-side cost of a query batch is one scan of the (vec_id, m, code)
table. Nothing grows with corpus size except the embarrassingly
parallel scan: the PQ promise.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_table import values_df

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace (embeddings are 64-d)
PQ_K = 8  # codes per subspace codebook
PQ_ITERS = 2
PQ_SCALE = 1e7
PQ_QUERIES = 10  # vec_id < PQ_QUERIES form the search query set
PQ_TOP_K = 5


def quantize_expr():
    """The canonical embedding→int64 quantization column (floor(x·scale))
    — shared by the batch operators AND the streaming encoder so the
    'streaming sink equals batch codes bit-for-bit' invariant cannot be
    broken by one copy drifting."""
    return F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * PQ_SCALE).cast("long")
    )


def codes_select(coded: DataFrame) -> DataFrame:
    """(vec_id, code_0..code_{M-1}, recon_err) projection over a
    ``_with_codes`` frame — the shared output shape of the batch and
    streaming encoders."""
    return coded.select(
        "vec_id",
        *[F.col(f"code_{m}") for m in range(PQ_M)],
        sum(F.col(f"dist_{m}") for m in range(PQ_M)).cast("long").alias(
            "recon_err"
        ),
    )


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .emb_source import load_embeddings

    # widen=True (guide §2.2): every consumer's first stage over this
    # frame is per-vector PQ arithmetic (M×K argmin of subspace L2 —
    # row-heavy); the r16 A/B measured 0.75× on embedding_pq_codes with
    # the widen. r17 moved the widen here from the shared absorber.
    emb = load_embeddings(spark, sf_dir, widen=True)
    return emb.select("vec_id", quantize_expr().alias("qv"))


def _packed_codebooks(
    spark: SparkSession, books: dict[tuple[int, int], list[int]]
) -> DataFrame:
    """One-row frame holding array<struct<m,cid,cv>> — broadcastable
    model state; the expression tree stays small and identical across
    iterations (inline literals re-analyze M·K·SUB constants per pass)."""
    rows = [
        (int(m), int(cid), [int(v) for v in cv])
        for (m, cid), cv in sorted(books.items())
    ]
    cent_df = values_df(spark, rows, "m long, cid long, cv array<long>")
    return cent_df.agg(F.collect_list(F.struct("m", "cid", "cv")).alias("cents"))


def _with_codes(q: DataFrame, packed: DataFrame) -> DataFrame:
    """Extend (vec_id, qv) with code_m/dist_m per subspace — row-local:
    for each m, argmin over that subspace's K centroids of exact integer
    squared-L2, ties to the lowest code id (struct array_min)."""
    out = q.crossJoin(F.broadcast(packed))
    cols = [F.col("vec_id"), F.col("qv")]
    for m in range(PQ_M):
        sub = F.slice(F.col("qv"), m * PQ_SUB + 1, PQ_SUB)
        best = F.array_min(
            F.transform(
                F.filter(F.col("cents"), lambda c: c["m"] == F.lit(m)),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(sub, c["cv"], lambda a, b: (a - b) * (a - b)),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        cols.append(best["cid"].alias(f"code_{m}"))
        cols.append(best["d"].alias(f"dist_{m}"))
    return out.select(*cols)


# Fitted-codebook memo: (applicationId, sf_dir) -> {(m, cid): centroid}.
# Plain driver data (survives bench.py's blanket RDD unpersist between
# queries, unlike a memoized checkpointed DataFrame).
_CODEBOOK_CACHE: dict[tuple[str, str], dict[tuple[int, int], list[int]]] = {}


def _fit_codebooks(
    spark: SparkSession, sf_dir: str
) -> dict[tuple[int, int], list[int]]:
    """PQ_ITERS Lloyd iterations per subspace, all M subspaces in the
    same passes: assignment is row-local; the update is ONE
    partial-aggregated groupBy over (subspace, code, dim) — M·K·SUB
    reduce keys — per iteration. Init: codebook (m, cid) = vector cid's
    m-th subvector (cid < PQ_K), the same first-rows init as
    clustering.py."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CODEBOOK_CACHE.get(key)
    if hit is not None:
        return hit
    q = _quantized(spark, sf_dir).localCheckpoint(eager=True)
    init = q.filter(F.col("vec_id") < PQ_K).collect()
    books: dict[tuple[int, int], list[int]] = {}
    for r in init:
        for m in range(PQ_M):
            books[(m, int(r.vec_id))] = list(r.qv[m * PQ_SUB : (m + 1) * PQ_SUB])
    for _ in range(PQ_ITERS):
        assigned = _with_codes(q, _packed_codebooks(spark, books))
        # (m, code, local dim i, value) stream → 512-key groupBy
        per_sub = assigned.select(
            "qv",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.col(f"code_{m}").alias("code"),
                            F.slice(F.col("qv"), m * PQ_SUB + 1, PQ_SUB).alias(
                                "sub"
                            ),
                        )
                        for m in range(PQ_M)
                    ]
                )
            ).alias("e"),
        ).select(
            F.col("e.m").alias("m"),
            F.col("e.code").alias("code"),
            F.posexplode("e.sub").alias("i", "v"),
        )
        sums = (
            per_sub.groupBy("m", "code", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in sums:
            acc.setdefault((int(r.m), int(r.code)), {})[int(r.i)] = (
                int(r.s),
                int(r.n),
            )
        # REBUILD from the assignment sums (do not update in place):
        # a code that won zero vectors this round must DROP out of the
        # book, exactly as the SQL twin's c{it+1} CTE has no row for it
        # — retaining its stale centroid would let it win vectors next
        # round in Spark but not in DuckDB, breaking the bit-identity
        # contract (clustering.py rebuilds for the same reason).
        books = {
            (m, cid): [
                # floor(int-sum / count) in IEEE double — mirrors the SQL
                # twin's CAST(... AS DOUBLE)/COUNT(*) exactly (sums < 2^53)
                int(math.floor(dims[i][0] / dims[i][1]))
                for i in range(PQ_SUB)
            ]
            for (m, cid), dims in acc.items()
        }
    _CODEBOOK_CACHE[key] = books
    return books


def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, code_0..code_{PQ_M-1}, recon_err): the PQ code word per
    vector and the total squared quantization error — 4 small ints
    replacing 64 floats, the compression artifact a 100 TB vector store
    persists next to (or instead of) the raw embeddings."""
    books = _fit_codebooks(spark, sf_dir)
    coded = _with_codes(
        _quantized(spark, sf_dir), _packed_codebooks(spark, books)
    )
    return codes_select(coded).orderBy("vec_id")


def _query_lut(queries: DataFrame, packed: DataFrame) -> DataFrame:
    """(query_id, m, code, d): the asymmetric-distance lookup table —
    every query's exact integer squared-L2 to every codeword, built
    row-locally by exploding the packed codebook row against the
    (broadcastable) query side. |queries|·M·K rows."""
    return (
        queries.crossJoin(F.broadcast(packed))
        .select("query_id", "q_qv", F.explode("cents").alias("c"))
        .select(
            "query_id",
            F.col("c.m").alias("m"),
            F.col("c.cid").alias("code"),
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("q_qv"), F.col("c.m") * PQ_SUB + 1, PQ_SUB),
                    F.col("c.cv"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
    )


def _codes_long(q: DataFrame, packed: DataFrame) -> DataFrame:
    """(vec_id, m, code): the corpus code table in long form — the
    M-codes-per-vector layout every PQ search variant joins against."""
    return (
        _with_codes(q, packed)
        .select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).cast("long").alias("m"),
                            F.col(f"code_{m}").alias("code"),
                        )
                        for m in range(PQ_M)
                    ]
                )
            ).alias("e"),
        )
        .select("vec_id", F.col("e.m").alias("m"), F.col("e.code").alias("code"))
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, match_id, rank, adist): asymmetric-distance top-k —
    the PQ search path. The LUT (query × subspace × code → exact integer
    distance) is |queries|·M·K rows, built row-locally on the broadcast
    query side; scoring joins the corpus (vec_id, m, code) stream
    against the broadcast LUT and sums M lookups per vector — one corpus
    scan, one partial-aggregated groupBy, no full-dimension math in the
    hot path."""
    books = _fit_codebooks(spark, sf_dir)
    packed = _packed_codebooks(spark, books)
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    lut = _query_lut(queries, packed)
    codes_long = _codes_long(q, packed)
    dists = (
        codes_long.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("match_id"))
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("match_id"))
    return (
        dists.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "match_id", "rank", "adist")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# DuckDB twins: the subspace fit unrolled into CTEs (clustering._kmeans_sql
# pattern, with the subspace id m = i // PQ_SUB folded into the dim index)
# ---------------------------------------------------------------------------


def _pq_fit_ctes() -> list[str]:
    ctes = [
        f"""q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {PQ_SCALE}) AS BIGINT) AS qv
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT i // {PQ_SUB} AS m, vec_id AS cid, i, qv AS cv
  FROM q WHERE vec_id < {PQ_K}
)""",
    ]
    for it in range(PQ_ITERS):
        ctes.append(
            f"""a{it} AS (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
    FROM (SELECT q.vec_id, c.m, c.cid, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
          FROM q JOIN c{it} c USING (i) GROUP BY q.vec_id, c.m, c.cid))
  WHERE rn = 1
)"""
        )
        ctes.append(
            f"""c{it + 1} AS (
  SELECT a.m, a.cid, q.i,
         CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM q JOIN a{it} a ON q.vec_id = a.vec_id AND q.i // {PQ_SUB} = a.m
  GROUP BY a.m, a.cid, q.i
)"""
        )
    final_c = f"c{PQ_ITERS}"
    ctes.append(
        f"""coded AS (
  SELECT vec_id, m, cid AS code, d FROM (
    SELECT vec_id, m, cid, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
    FROM (SELECT q.vec_id, c.m, c.cid, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
          FROM q JOIN {final_c} c USING (i) GROUP BY q.vec_id, c.m, c.cid))
  WHERE rn = 1
)"""
    )
    return ctes


def _pq_codes_sql() -> str:
    code_cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN m = {m} THEN code END) AS BIGINT) AS code_{m}"
        for m in range(PQ_M)
    )
    return (
        "WITH "
        + ",\n".join(_pq_fit_ctes())
        + f"""
SELECT vec_id,
       {code_cols},
       CAST(SUM(d) AS BIGINT) AS recon_err
FROM coded
GROUP BY vec_id
ORDER BY vec_id
"""
    )


def _pq_topk_sql() -> str:
    final_c = f"c{PQ_ITERS}"
    return (
        "WITH "
        + ",\n".join(_pq_fit_ctes())
        + f""",
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.cid AS code,
         SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
  FROM q JOIN {final_c} c USING (i)
  WHERE q.vec_id < {PQ_QUERIES}
  GROUP BY q.vec_id, c.m, c.cid
),
dists AS (
  SELECT l.query_id, co.vec_id AS match_id, CAST(SUM(l.d) AS BIGINT) AS adist
  FROM coded co JOIN lut l ON co.m = l.m AND co.code = l.code
  WHERE co.vec_id != l.query_id
  GROUP BY l.query_id, co.vec_id
),
ranked AS (
  SELECT query_id, match_id, adist,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adist ASC, match_id ASC) AS BIGINT)
           AS rank
  FROM dists
)
SELECT query_id, match_id, rank, adist
FROM ranked WHERE rank <= {PQ_TOP_K}
ORDER BY query_id, rank
"""
    )


EMBEDDING_PQ_CODES_SQL = _pq_codes_sql()
ANN_PQ_SQL = _pq_topk_sql()


# ---------------------------------------------------------------------------
# IVF-PQ composed search: coarse quantizer routing + PQ scoring
# ---------------------------------------------------------------------------

IVFPQ_NPROBE = 2  # coarse clusters probed per query


def ann_ivfpq_topk(
    spark: SparkSession, sf_dir: str, nprobe: int = IVFPQ_NPROBE
) -> DataFrame:
    """(query_id, match_id, rank, adist): the full IVF-PQ search — route
    each query to its {IVFPQ_NPROBE} nearest coarse (k-means) centroids,
    then PQ-score ONLY the vectors assigned to those clusters via the
    asymmetric-distance LUT. This is the composed architecture both
    halves exist for: at 100 TB the corpus is partitioned by coarse
    cluster, a query touches nprobe/K of the data, and each touched row
    costs M code lookups. Recall tradeoff vs ann_pq_topk (full PQ scan)
    is exactly IVF's: matches whose cluster isn't probed are missed.

    Plan: coarse centroids and PQ codebooks are both memoized driver
    model state; the probe table is |queries|·nprobe rows (broadcast);
    the candidate stream is corpus codes semi-joined on probed clusters
    — the only corpus-sized flow, pre-filtered by the broadcast join —
    then one partial-aggregated groupBy sums the M lookups."""
    from .clustering import kmeans_assign, _fit_centroids

    assign = kmeans_assign(spark, sf_dir).select("vec_id", "cluster")
    cents = _fit_centroids(spark, sf_dir)
    cent_df = values_df(spark,
        [(int(cid), [int(v) for v in cv]) for cid, cv in cents],
        "cid long, cv array<long>",
    )
    cpacked = cent_df.agg(F.collect_list(F.struct("cid", "cv")).alias("kcents"))
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cdist = (
        queries.crossJoin(F.broadcast(cpacked))
        .select("query_id", "q_qv", F.explode("kcents").alias("c"))
        .select(
            "query_id",
            F.col("c.cid").alias("cluster"),
            F.aggregate(
                F.zip_with(
                    F.col("q_qv"), F.col("c.cv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("cd"),
        )
    )
    pw = Window.partitionBy("query_id").orderBy(F.asc("cd"), F.asc("cluster"))
    probes = (
        cdist.withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "cluster")
    )
    books = _fit_codebooks(spark, sf_dir)
    packed = _packed_codebooks(spark, books)
    lut = _query_lut(queries, packed)
    codes_long = _codes_long(q, packed)
    cand = assign.join(F.broadcast(probes), "cluster").select(
        "query_id", "vec_id"
    )
    dists = (
        codes_long.join(cand, "vec_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("match_id"))
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("match_id"))
    return (
        dists.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "match_id", "rank", "adist")
        .orderBy("query_id", "rank")
    )


def _ivf_ctes(nprobe: int = IVFPQ_NPROBE, probes_name: str = "probes") -> list[str]:
    """Coarse-quantizer fit CTEs — the clustering._kmeans_sql chain
    (same init/assign/update arithmetic over the FULL 64-d vectors,
    clustering.py:KMEANS_K/KMEANS_ITERS) with kq/kc/ka names so it
    composes with the PQ fit CTEs in one WITH."""
    from .clustering import KMEANS_ITERS, KMEANS_K

    ctes = [
        f"""kc0 AS (
  SELECT vec_id AS cid, i, qv AS cv FROM q WHERE vec_id < {KMEANS_K}
)"""
    ]
    for it in range(KMEANS_ITERS):
        ctes.append(
            f"""ka{it} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM (SELECT q.vec_id, c.cid, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
          FROM q JOIN kc{it} c USING (i) GROUP BY q.vec_id, c.cid))
  WHERE rn = 1
)"""
        )
        ctes.append(
            f"""kc{it + 1} AS (
  SELECT a.cid, q.i,
         CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM q JOIN ka{it} a USING (vec_id) GROUP BY a.cid, q.i
)"""
        )
    final_kc = f"kc{KMEANS_ITERS}"
    ctes.append(
        f"""kassign AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM (SELECT q.vec_id, c.cid, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
          FROM q JOIN {final_kc} c USING (i) GROUP BY q.vec_id, c.cid))
  WHERE rn = 1
)"""
    )
    ctes.append(
        f"""{probes_name} AS (
  SELECT query_id, cluster FROM (
    SELECT q.vec_id AS query_id, c.cid AS cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY SUM((q.qv - c.cv) * (q.qv - c.cv)), c.cid)
             AS prn
    FROM q JOIN {final_kc} c USING (i)
    WHERE q.vec_id < {PQ_QUERIES}
    GROUP BY q.vec_id, c.cid)
  WHERE prn <= {nprobe}
)"""
    )
    return ctes


def _ivfpq_topk_sql() -> str:
    final_c = f"c{PQ_ITERS}"
    return (
        "WITH "
        + ",\n".join(_pq_fit_ctes() + _ivf_ctes())
        + f""",
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.cid AS code,
         SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
  FROM q JOIN {final_c} c USING (i)
  WHERE q.vec_id < {PQ_QUERIES}
  GROUP BY q.vec_id, c.m, c.cid
),
dists AS (
  SELECT l.query_id, co.vec_id AS match_id, CAST(SUM(l.d) AS BIGINT) AS adist
  FROM coded co
  JOIN kassign ka ON ka.vec_id = co.vec_id
  JOIN probes p ON p.cluster = ka.cluster
  JOIN lut l ON l.query_id = p.query_id AND co.m = l.m AND co.code = l.code
  WHERE co.vec_id != p.query_id
  GROUP BY l.query_id, co.vec_id
),
ranked AS (
  SELECT query_id, match_id, adist,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adist ASC, match_id ASC) AS BIGINT)
           AS rank
  FROM dists
)
SELECT query_id, match_id, rank, adist
FROM ranked WHERE rank <= {PQ_TOP_K}
ORDER BY query_id, rank
"""
    )


ANN_IVFPQ_SQL = _ivfpq_topk_sql()


# ---------------------------------------------------------------------------
# PQ recall evaluation against the exact integer-L2 baseline
# ---------------------------------------------------------------------------


def _exact_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer squared-L2 top-{PQ_TOP_K} over the quantized
    vectors — the ground truth for PQ recall. Verification-grade: cost
    is |queries|·N with the query side broadcast (the same bounded shape
    as similarity.ann_bruteforce_topk)."""
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    d = (
        F.broadcast(queries)
        .crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            F.aggregate(
                F.zip_with(
                    F.col("q_qv"), F.col("qv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("match_id"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "match_id")
    )


def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_hits, recall_ppm): recall@{PQ_TOP_K} of the
    asymmetric-distance PQ search against exact integer-L2 — the
    compression-loss gauge that decides M/K sizing before a 100 TB
    re-encode (the LSH path has the same gauge in
    evaluation.ann_lsh_recall). recall_ppm = hits·1e6 DIV {PQ_TOP_K},
    integer arithmetic under the hash gate."""
    exact = _exact_l2_topk(spark, sf_dir)
    # |queries|·k rows on both sides — broadcast the approx side so the
    # recall join never falls back to a sort-merge exchange
    approx = F.broadcast(
        ann_pq_topk(spark, sf_dir).select(
            "query_id", "match_id", F.lit(1).alias("hit")
        )
    )
    return (
        exact.join(approx, ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"(n_hits * 1000000) DIV {PQ_TOP_K}").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


def _pq_recall_sql() -> str:
    approx = ANN_PQ_SQL.replace("ORDER BY query_id, rank", "")
    return f"""
WITH approx_full AS ({approx}),
exact_d AS (
  SELECT qq.vec_id AS query_id, c.vec_id AS match_id,
         SUM((qq.qv - c.qv) * (qq.qv - c.qv)) AS d
  FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {PQ_SCALE}) AS BIGINT) AS qv
        FROM embeddings) qq
  JOIN (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {PQ_SCALE}) AS BIGINT) AS qv
        FROM embeddings) c USING (i)
  WHERE qq.vec_id < {PQ_QUERIES} AND c.vec_id != qq.vec_id
  GROUP BY qq.vec_id, c.vec_id
),
exact_topk AS (
  SELECT query_id, match_id FROM (
    SELECT query_id, match_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY d ASC, match_id ASC) AS rank
    FROM exact_d)
  WHERE rank <= {PQ_TOP_K}
)
SELECT e.query_id,
       CAST(SUM(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST((SUM(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // {PQ_TOP_K} AS BIGINT) AS recall_ppm
FROM exact_topk e
LEFT JOIN approx_full a
  ON a.query_id = e.query_id AND a.match_id = e.match_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


ANN_PQ_RECALL_SQL = _pq_recall_sql()


# ---------------------------------------------------------------------------
# PQ index lifecycle: export the code table + codebooks as a dump artifact
# ---------------------------------------------------------------------------

PQ_INDEX_MANIFEST = "_pq_index_manifest.json"


def export_pq_index(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Persist the PQ index — the corpus code table (vec_id, m, code)
    as parquet plus the fitted codebooks IN the manifest (M·K·SUB ints,
    driver model state) — the datapump lifecycle applied to the
    compressed vector index, sibling of similarity.export_ann_index.
    At 100 TB the encode is one corpus pass; the artifact amortizes it
    across every later query batch, and a search node needs only this
    artifact (codes + codebooks), never the raw embeddings. The
    manifest pins (m, sub, k, iters, scale, source) so parameter or
    corpus drift fails loudly at load."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    books = _fit_codebooks(spark, sf_dir)
    packed = _packed_codebooks(spark, books)
    _codes_long(_quantized(spark, sf_dir), packed).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "pq_codes"))
    meta = {
        "kind": "pq_index",
        "m": PQ_M,
        "sub": PQ_SUB,
        "k": PQ_K,
        "iters": PQ_ITERS,
        "scale": PQ_SCALE,
        "source": sf_dir,
        "codebooks": [
            {"m": m, "cid": cid, "cv": cv} for (m, cid), cv in sorted(books.items())
        ],
        "created_by": "oracledb-datapump-spark",
    }
    tmp = os.path.join(out_dir, PQ_INDEX_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(out_dir, PQ_INDEX_MANIFEST))
    return meta


def load_pq_index(
    spark: SparkSession, index_dir: str, expected_source: str | None = None
):
    """(codes_long DataFrame, packed codebooks DataFrame) from an
    exported PQ index, validating parameters and (optionally) the
    source corpus — a stale or foreign code table joined by vec_id
    returns plausible-but-wrong neighbors with no error, the same drift
    class similarity.load_ann_index guards against."""
    import json
    import os

    path = os.path.join(index_dir, PQ_INDEX_MANIFEST)
    if not os.path.isfile(path):
        from ..exceptions import FileError

        raise FileError(f"No PQ index manifest at {path}")
    with open(path) as f:
        meta = json.load(f)
    expected = {"m": PQ_M, "sub": PQ_SUB, "k": PQ_K, "iters": PQ_ITERS, "scale": PQ_SCALE}
    got = {kk: meta.get(kk) for kk in expected}
    if got != expected:
        from ..exceptions import UsageError

        raise UsageError(
            f"PQ index at {index_dir} was built with {got}, engine expects "
            f"{expected} — rebuild with export_pq_index rather than "
            "decoding against the wrong codebook geometry"
        )
    if (
        expected_source is not None
        and meta.get("source") is not None
        and os.path.abspath(meta["source"]) != os.path.abspath(expected_source)
    ):
        from ..exceptions import UsageError

        raise UsageError(
            f"PQ index at {index_dir} was built from {meta['source']!r}, "
            f"but the query targets {expected_source!r} — rebuild the "
            "index for this corpus rather than joining stale codes by vec_id"
        )
    books = {
        (int(b["m"]), int(b["cid"])): [int(v) for v in b["cv"]]
        for b in meta["codebooks"]
    }
    codes = spark.read.parquet(os.path.join(index_dir, "pq_codes"))
    return codes, _packed_codebooks(spark, books)


def ann_pq_topk_from_index(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """ann_pq_topk served from a previously exported index: identical
    results, zero corpus re-encode and zero codebook refit — the
    production search path once the artifact exists. Only the query
    side (|queries| vectors) touches raw embeddings."""
    codes_long, packed = load_pq_index(spark, index_dir, expected_source=sf_dir)
    queries = (
        _quantized(spark, sf_dir)
        .filter(F.col("vec_id") < PQ_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv"))
    )
    lut = _query_lut(queries, packed)
    dists = (
        codes_long.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("match_id"))
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("match_id"))
    return (
        dists.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "match_id", "rank", "adist")
        .orderBy("query_id", "rank")
    )


def pq_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated lifecycle query: export the PQ index to a dump artifact,
    load it back through the validating loader, and serve asymmetric
    top-k purely from the artifact. The oracle is ANN_PQ_SQL — hash
    equality proves the persisted index reproduces the in-memory search
    bit-for-bit (codes, codebooks, and tie-breaks all survive the
    round-trip). The result is eagerly materialized (it is
    |queries|·top_k rows) before the artifact directory is removed."""
    import shutil
    import tempfile

    idx = tempfile.mkdtemp(prefix="pq_idx_rt_")
    try:
        export_pq_index(spark, sf_dir, idx)
        return ann_pq_topk_from_index(spark, sf_dir, idx).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)
