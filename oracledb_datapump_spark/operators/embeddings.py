"""Embedding-column preprocessing: unit-normalization and int8
quantization — the standard stages before ANN indexing at scale (cosine
over unit vectors = dot product; int8 storage is 4× smaller than float32).

Pure array expressions (transform/aggregate); both have DuckDB oracle
twins. Determinism: norms use the sequential double fold (bit-identical
to DuckDB's list_sum, see dedup.py cosine); quantization uses floor()
(both engines floor identically — CAST rounding differs, see
operators/analytics.py delay_days note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .emb_source import load_embeddings

    return load_embeddings(spark, sf_dir)


def _norm_col():
    return F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize_expr():
    """Unit-normalized array<double> expression over ``embedding`` (library
    form; zero-norm vectors pass through as zeros rather than NaN)."""
    norm = _norm_col()
    return F.when(
        norm > 0,
        F.transform("embedding", lambda x: x.cast("double") / norm),
    ).otherwise(F.transform("embedding", lambda x: x.cast("double")))


def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, norm, unit_q): L2 norm + unit vector serialized as
    comma-joined floor(x*1e7) integers. The driver's comparator can't hash
    raw array columns, and float→string formatting differs across engines,
    so the query surface emits integer-quantized components (the underlying
    doubles are bit-identical — sequential fold, see module docstring —
    hence the floors are too). Library callers use :func:`normalize_expr`
    for the real array."""
    e = _emb(spark, sf_dir)
    norm = _norm_col()
    unit_q = F.array_join(
        F.transform(
            normalize_expr(),
            lambda x: F.floor(x * F.lit(10000000.0)).cast("long").cast("string"),
        ),
        ",",
    )
    return e.select(
        "vec_id", norm.alias("norm"), unit_q.alias("unit_q")
    ).orderBy("vec_id")


EMBEDDING_NORMALIZE_SQL = """
SELECT vec_id,
       sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS norm,
       array_to_string(list_transform(
           CASE WHEN sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) > 0
                THEN list_transform(embedding, x -> x::DOUBLE / sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE))))
                ELSE list_transform(embedding, x -> x::DOUBLE) END,
           x -> CAST(CAST(floor(x * 10000000.0) AS BIGINT) AS VARCHAR)), ',') AS unit_q
FROM embeddings
ORDER BY vec_id
"""


QUANT_SCALE = 127.0


def quantize_expr():
    """Symmetric int8-quantized array<int> expression over ``embedding``
    (library form) — scale = max|x|, q_i = floor(x_i / scale * 127). floor
    (not round) keeps both engines bit-identical."""
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return F.when(
        max_abs > 0,
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / max_abs * QUANT_SCALE).cast("int"),
        ),
    ).otherwise(F.transform("embedding", lambda x: F.lit(0)))


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, scale, q_str): int8 quantization with the codes serialized
    comma-joined (integer→string formatting is engine-identical; raw array
    columns break the driver's comparator). Library callers use
    :func:`quantize_expr` for the real array; reconstruction error ≤
    scale/127."""
    e = _emb(spark, sf_dir)
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    q_str = F.array_join(
        F.transform(quantize_expr(), lambda v: v.cast("string")), ","
    )
    return e.select(
        "vec_id", max_abs.alias("scale"), q_str.alias("q_str")
    ).orderBy("vec_id")


EMBEDDING_QUANTIZE_SQL = f"""
SELECT vec_id,
       list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale,
       array_to_string(list_transform(
           CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) > 0
                THEN list_transform(embedding,
                     x -> CAST(floor(x::DOUBLE / list_max(list_transform(embedding, y -> abs(y::DOUBLE))) * {QUANT_SCALE}) AS INT))
                ELSE list_transform(embedding, x -> 0) END,
           v -> CAST(v AS VARCHAR)), ',') AS q_str
FROM embeddings
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# distributed PCA (top principal component) — SemDeDup-style preprocessing
# ---------------------------------------------------------------------------

PCA_QUANT = 10_000_000  # floor(x*1e7) int64, the clustering.py recipe
PCA_VSCALE = 1_000_000  # eigenvector components rescaled to ~1e6 each round
PCA_ITERS = 12


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — matches DuckDB's
    ``//`` on negatives, where Python's ``//`` floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def embedding_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, pc1_q): every embedding's projection onto the corpus's
    top principal component, as an exact integer — the PCA-whitening /
    dominant-direction preprocessing step SemDeDup-style pipelines run
    before clustering, done as distributed linear algebra:

    1. quantize to int64 (floor(x*1e7)) so every later sum is exact
       integer arithmetic, order- and partitioning-independent;
    2. per-dimension means (one |dim|-row aggregate off the scan);
    3. centered covariance C = Σ (q-μ)(q-μ)ᵀ via a self-join on vec_id
       + one partial-aggregated groupBy(i,j) — shuffle output is |dim|²
       rows (4096 for dim 64) no matter the corpus size; the ×|dim|
       row expansion is map-local and pipelined;
    4. power iteration on the driver: C is |dim|²·8 bytes of MODEL
       state (like k-means centroids), v rescaled to {PCA_VSCALE} by
       truncating integer division each of {PCA_ITERS} rounds —
       Python's unbounded ints mirror DuckDB HUGEINT exactly;
    5. one row-local projection pass: pc1_q = Σ (q_k-μ_k)·v_k.

    int64 headroom: |q|≲2e7, so C entries ≲ rows·4e14 — rescale
    PCA_QUANT down when corpus rows × 4e14 approaches 2^63 (the same
    knob the docstring of clustering.py carries)."""
    import math

    e = _emb(spark, sf_dir)
    q = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * PCA_QUANT).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=True)  # reused by means, covariance, projection
    n = q.count()
    # int64 headroom guard, enforced (not just the docstring note): Spark
    # accumulates sum(ci*cj) in LongType and non-ANSI mode WRAPS on
    # overflow while the DuckDB oracle promotes to HUGEINT — past this
    # bound the engines diverge silently. |ci| ≤ 2·PCA_QUANT for
    # embeddings with |x| ≤ 1, so n·(2·PCA_QUANT)² bounds every
    # covariance cell.
    if n * (2 * PCA_QUANT) ** 2 >= 2**63:
        from ..exceptions import UsageError

        raise UsageError(
            f"embedding_pca_scores: {n} rows at PCA_QUANT={PCA_QUANT} can "
            f"overflow int64 covariance sums (n*(2*PCA_QUANT)^2 >= 2^63); "
            f"rescale PCA_QUANT down (each /10 buys 100x row headroom)."
        )
    sums = {
        r.i: r.s
        for r in q.select(F.posexplode("qv").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"))
        .collect()
    }
    dim = len(sums)
    mu = [math.floor(float(sums[i]) / n) for i in range(dim)]
    mu_lit = F.array(*[F.lit(int(m)) for m in mu])
    cv = F.transform(
        "qv", lambda x, i: x - F.element_at(mu_lit, i + F.lit(1))
    )
    centered = q.select("vec_id", cv.alias("cv"))
    s1 = centered.select("vec_id", F.posexplode("cv").alias("i", "ci"))
    s2 = centered.select("vec_id", F.posexplode("cv").alias("j", "cj"))
    cov_rows = (
        s1.join(s2, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("ci") * F.col("cj")).alias("c"))
        .collect()
    )
    C: dict = {}
    for r in cov_rows:
        C[(r.i, r.j)] = int(r.c)
    v = [PCA_VSCALE] * dim
    for _ in range(PCA_ITERS):
        w = [sum(C[(i, j)] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w) or 1
        v = [_tdiv(x * PCA_VSCALE, m) for x in w]
    v_lit = F.array(*[F.lit(int(x)) for x in v])
    proj = F.aggregate(
        F.zip_with(cv, v_lit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return q.select("vec_id", proj.alias("pc1_q")).orderBy("vec_id")


def _pca_sql() -> str:
    steps = []
    for t in range(1, PCA_ITERS + 1):
        steps.append(
            f"""w{t} AS MATERIALIZED (
  SELECT c.i, SUM(c.c * v.v) AS r FROM cov c JOIN v{t - 1} v ON c.j = v.i
  GROUP BY c.i
),
m{t} AS MATERIALIZED (
  SELECT CASE WHEN MAX(ABS(r)) = 0 THEN 1 ELSE MAX(ABS(r)) END AS m FROM w{t}
),
v{t} AS MATERIALIZED (SELECT i, (r * {PCA_VSCALE}) // (SELECT m FROM m{t}) AS v FROM w{t})"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(FLOOR(x::DOUBLE * {PCA_QUANT}) AS BIGINT)) AS qv
  FROM embeddings
),
n AS (SELECT COUNT(*) AS c FROM q),
flat AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(qv, 1) - 1 AS i, unnest(qv) AS x FROM q
),
mu AS (
  SELECT i, CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / (SELECT c FROM n)) AS BIGINT) AS m
  FROM flat GROUP BY i
),
cflat AS MATERIALIZED (SELECT f.vec_id, f.i, f.x - mu.m AS cx FROM flat f JOIN mu USING (i)),
cov AS MATERIALIZED (
  SELECT a.i, b.i AS j, SUM(CAST(a.cx AS HUGEINT) * b.cx) AS c
  FROM cflat a JOIN cflat b ON a.vec_id = b.vec_id GROUP BY 1, 2
),
v0 AS MATERIALIZED (SELECT i, CAST({PCA_VSCALE} AS HUGEINT) AS v FROM mu),
{chain}
SELECT c.vec_id, CAST(SUM(CAST(c.cx AS HUGEINT) * v.v) AS BIGINT) AS pc1_q
FROM cflat c JOIN v{PCA_ITERS} v USING (i)
GROUP BY c.vec_id
ORDER BY c.vec_id
"""


EMBEDDING_PCA_SQL = _pca_sql()
