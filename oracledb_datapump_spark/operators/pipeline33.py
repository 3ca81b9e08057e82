"""Batch 33: Hilbert-curve layout A/B and IVF probe-depth recall curve.

- ``hilbert_skip_compare`` extends the Morton-vs-linear zone-map audit
  (pipeline12.layout_skip_compare) with the space-filling curve that
  actually wins at locality: Hilbert. The curve index is the canonical
  iterative xy2d transform (bit-plane descent with quadrant rotation),
  generated ONCE in Python as engine-neutral SQL text and applied to
  both Spark (selectExpr chain) and DuckDB (chained CTEs) — the two
  engines literally execute the same arithmetic, so the skip counts sit
  under the value hash. Validated bijective + unit-locality on a 256²
  grid in tests.
- ``ann_ivf_nprobe_curve`` sweeps the IVF probe depth and measures
  recall@k against the exact scan — the tuning curve every IVF
  deployment reads before fixing nprobe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .pipeline12 import (
    LAYOUT_DATE_HI,
    LAYOUT_DATE_LO,
    LAYOUT_GROUP_ROWS,
    LAYOUT_PART_HI,
    LAYOUT_PART_LO,
    _morton2,
)
from ..functions.local_table import values_df

HILBERT_BITS = 16  # quantization levels per dimension (d in 32 bits)


def hilbert_steps(xcol: str, ycol: str, dcol: str, bits: int) -> list[dict]:
    """Engine-neutral SQL expressions for one bit-plane of the canonical
    Hilbert xy2d transform, highest plane first. Each step consumes the
    current (x, y, d) columns and emits their replacements; the quadrant
    term (3·rx)⊕ry is spelled as a CASE table so no engine-specific XOR
    operator appears. Both the Spark operator and the DuckDB oracle are
    generated from THIS function — single source of truth."""
    n = 1 << bits
    steps = []
    for p in range(bits - 1, -1, -1):
        s = 1 << p
        rx = f"(CASE WHEN ({xcol} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({ycol} & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END)"
        )
        # rot: ry=0 → (maybe flip within the full side) then swap x/y
        flip_x = f"(CASE WHEN {rx} = 1 THEN {n - 1} - {xcol} ELSE {xcol} END)"
        flip_y = f"(CASE WHEN {rx} = 1 THEN {n - 1} - {ycol} ELSE {ycol} END)"
        steps.append(
            {
                dcol: f"{dcol} + CAST({s} AS BIGINT) * {s} * {quad}",
                xcol: f"(CASE WHEN {ry} = 0 THEN {flip_y} ELSE {xcol} END)",
                ycol: f"(CASE WHEN {ry} = 0 THEN {flip_x} ELSE {ycol} END)",
            }
        )
    return steps


def hilbert_column(df: DataFrame, qx: str, qy: str, bits: int) -> DataFrame:
    """Append column ``__h`` = Hilbert index of already-quantized long
    columns (qx, qy). A chain of ``bits`` narrow projections — all
    whole-stage codegen, no UDF, no shuffle."""
    out = df.withColumn("__hx", F.col(qx)).withColumn(
        "__hy", F.col(qy)
    ).withColumn("__h", F.lit(0).cast("long"))
    for st in hilbert_steps("__hx", "__hy", "__h", bits):
        out = out.withColumns({c: F.expr(e) for c, e in st.items()})
    return out.drop("__hx", "__hy")


def _hilbert_sql_ctes(base: str, qx: str, qy: str, bits: int) -> str:
    """Chained CTEs h0..h{bits} applying the SAME steps as
    hilbert_column to a relation ``base`` that carries (qx, qy) plus
    pass-through columns ok, ln, d, p."""
    ctes = [
        f"h0 AS (SELECT ok, ln, d, p, {qx} AS hx, {qy} AS hy,"
        f" CAST(0 AS BIGINT) AS hd FROM {base})"
    ]
    for i, st in enumerate(hilbert_steps("hx", "hy", "hd", bits)):
        ctes.append(
            f"h{i + 1} AS (SELECT ok, ln, d, p, "
            f"{st['hx']} AS hx, {st['hy']} AS hy, {st['hd']} AS hd "
            f"FROM h{i})"
        )
    return ",\n".join(ctes)


def hilbert_skip_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(layout, workload, n_groups, n_groups_scanned, rows_scanned):
    zone-map skip effectiveness of the HILBERT layout vs the Morton
    Z-order over the same quantized (ship-date × part-key) plane, same
    {LAYOUT_GROUP_ROWS}-row groups and probe workloads as
    layout_skip_compare (which holds the linear baseline) — completing
    the clustering decision table: linear / Morton / Hilbert. Hilbert's
    one-step adjacency (no Morton quadrant jumps) typically buys
    tighter zone envelopes on BOTH dimensions; this op turns that
    folklore into gated numbers.

    Plan: identical to layout_skip_compare — one min/max broadcast, a
    global range sort per layout (the honest re-cluster price), zone
    maps via one groupBy, row-local overlap arithmetic. The Hilbert
    index itself is {HILBERT_BITS} narrow codegen'd projections."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("ok"),
        F.col("l_linenumber").cast("long").alias("ln"),
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01"))
        .cast("long")
        .alias("d"),
        F.col("l_partkey").cast("long").alias("p"),
    )
    stats = l.agg(
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.min("p").alias("pmin"),
        F.max("p").alias("pmax"),
    )
    lvl = (1 << HILBERT_BITS) - 1
    q = l.crossJoin(F.broadcast(stats)).select(
        "ok",
        "ln",
        "d",
        "p",
        F.expr(
            f"CASE WHEN dmax > dmin THEN (d - dmin) * {lvl} div (dmax - dmin)"
            " ELSE 0 END"
        ).alias("qd"),
        F.expr(
            f"CASE WHEN pmax > pmin THEN (p - pmin) * {lvl} div (pmax - pmin)"
            " ELSE 0 END"
        ).alias("qp"),
    )
    # r16: pin the quantized base ONCE — both layout branches (and the
    # min/max broadcast inside each) used to re-derive it from the
    # parquet scan, costing four lineitem scans per run (guide §2.4/§5).
    # Widened first: a fixture-sized lineitem scans as 1-3 partitions,
    # which ran the 16-step Hilbert chain on one core (~4.4 s of the
    # query); at production scale the scan is already wide and the
    # widen is a no-op (functions/partitioning).
    from ..functions.partitioning import widen_small_scan

    q = widen_small_scan(q).localCheckpoint(eager=True)
    date_lo = F.datediff(F.lit(LAYOUT_DATE_LO), F.lit("1992-01-01")).cast("long")
    date_hi = F.datediff(F.lit(LAYOUT_DATE_HI), F.lit("1992-01-01")).cast("long")

    from ..functions.global_order import with_global_order_stat

    def zone_rows(keyed: DataFrame, layout: str) -> DataFrame:
        ranked, _ = with_global_order_stat(
            keyed.select("sort_key", "ok", "ln", "d", "p"),
            [F.col("sort_key"), F.col("ok"), F.col("ln")],
            out="rk",
        )
        zones = (
            ranked.select(
                "d",
                "p",
                F.expr(f"(rk - 1) div {LAYOUT_GROUP_ROWS}").alias("grp"),
            )
            .groupBy("grp")
            .agg(
                F.min("d").alias("dlo"),
                F.max("d").alias("dhi"),
                F.min("p").alias("plo"),
                F.max("p").alias("phi"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            # r16: the r11 A/B that left zones lazy predates the
            # global_order refactor — since r14 each workload arm
            # re-evaluates the per-partition rank WINDOW over the full
            # checkpointed range partitioning, so the 3 arms paid the
            # 600k-row sort 3× per layout. zones is ⌈n/GROUP_ROWS⌉ rows
            # (model-scale); pinning it makes the arms trivial
            # (guide §5 — materialize exactly the reused intermediate).
            # Isolated A/B at sf0.1 in OPTIMIZATION_r16.md.
            .localCheckpoint(eager=True)
        )
        date_hit = ~((F.col("dhi") < date_lo) | (F.col("dlo") > date_hi))
        part_hit = ~(
            (F.col("phi") < F.lit(LAYOUT_PART_LO))
            | (F.col("plo") > F.lit(LAYOUT_PART_HI))
        )
        out = None
        for wl, hit in (
            ("date", date_hit),
            ("part", part_hit),
            ("both", date_hit & part_hit),
        ):
            r = zones.agg(
                F.lit(layout).alias("layout"),
                F.lit(wl).alias("workload"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias(
                    "n_groups_scanned"
                ),
                F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
                .cast("long")
                .alias("rows_scanned"),
            )
            out = r if out is None else out.unionByName(r)
        return out

    zord = zone_rows(
        q.withColumn("sort_key", _morton2("qd", "qp", HILBERT_BITS)), "zorder"
    )
    # r16: pin the Hilbert-keyed projection before the range sort. The
    # global-order helper's repartitionByRange evaluates its child TWICE
    # (range-boundary sampling pass + the shuffle map pass), and the
    # 16-step bit-plane chain is ~6 s per evaluation at sf0.1 (~10 µs/row
    # of stacked CASE projections) — the single most expensive scalar in
    # the repo. Pinning makes both passes read the 5-column checkpoint
    # instead (guide §5: materialize exactly the reused intermediate).
    # The Morton arm is NOT pinned: its one-projection key costs ~0.5 s
    # per evaluation, less than the checkpoint round-trip it would save.
    # (An arithmetic branch-free rewrite of the chain was A/B-rejected:
    # 12.6 s vs 6.0 s — the multiplied-out rx/ry subexpressions evaluate
    # more times than the CASE branches they replace.)
    hilb = zone_rows(
        hilbert_column(q, "qd", "qp", HILBERT_BITS)
        .withColumn("sort_key", F.col("__h"))
        .select("sort_key", "ok", "ln", "d", "p")
        .localCheckpoint(eager=True),
        "hilbert",
    )
    return zord.unionByName(hilb).orderBy("layout", "workload")


def _morton2_sql(q1: str, q2: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({q1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({q2} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _hilbert_skip_compare_sql() -> str:
    lvl = (1 << HILBERT_BITS) - 1
    zones_tpl = """
{name}_rk AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sort_key, ok, ln) AS rk
  FROM {src}
),
{name}_zones AS (
  SELECT (rk - 1) // {grp} AS grp,
         MIN(d) AS dlo, MAX(d) AS dhi, MIN(p) AS plo, MAX(p) AS phi,
         COUNT(*) AS n_rows
  FROM {name}_rk GROUP BY grp
),
{name}_hit AS (
  SELECT w.workload, n_rows,
         CASE w.workload
           WHEN 'date' THEN NOT (dhi < {dlo} OR dlo > {dhi})
           WHEN 'part' THEN NOT (phi < {plo} OR plo > {phi})
           ELSE NOT (dhi < {dlo} OR dlo > {dhi})
                AND NOT (phi < {plo} OR plo > {phi})
         END AS hit
  FROM {name}_zones, (SELECT unnest(['date', 'part', 'both']) AS workload) w
),
{name}_out AS (
  SELECT '{name}' AS layout, workload,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_groups_scanned,
         CAST(SUM(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT)
           AS rows_scanned
  FROM {name}_hit
  GROUP BY workload
)"""
    return (
        f"""
WITH base AS (
  SELECT CAST(l_orderkey AS BIGINT) AS ok, CAST(l_linenumber AS BIGINT) AS ln,
         CAST(datediff('day', DATE '1992-01-01', l_shipdate) AS BIGINT) AS d,
         CAST(l_partkey AS BIGINT) AS p
  FROM lineitem
), st AS (
  SELECT MIN(d) AS dmin, MAX(d) AS dmax, MIN(p) AS pmin, MAX(p) AS pmax
  FROM base
), q AS (
  SELECT ok, ln, d, p,
         CASE WHEN dmax > dmin THEN (d - dmin) * {lvl} // (dmax - dmin)
              ELSE 0 END AS qd,
         CASE WHEN pmax > pmin THEN (p - pmin) * {lvl} // (pmax - pmin)
              ELSE 0 END AS qp
  FROM base, st
),
zsrc AS (
  SELECT ok, ln, d, p,
         CAST({_morton2_sql('qd', 'qp', HILBERT_BITS)} AS BIGINT) AS sort_key
  FROM q
),
{_hilbert_sql_ctes('q', 'qd', 'qp', HILBERT_BITS)},
hsrc AS (SELECT ok, ln, d, p, hd AS sort_key FROM h{HILBERT_BITS}),
"""
        + zones_tpl.format(
            name="zorder",
            src="zsrc",
            grp=LAYOUT_GROUP_ROWS,
            dlo="(SELECT datediff('day', DATE '1992-01-01', "
            f"DATE '{LAYOUT_DATE_LO}'))",
            dhi="(SELECT datediff('day', DATE '1992-01-01', "
            f"DATE '{LAYOUT_DATE_HI}'))",
            plo=LAYOUT_PART_LO,
            phi=LAYOUT_PART_HI,
        )
        + ","
        + zones_tpl.format(
            name="hilbert",
            src="hsrc",
            grp=LAYOUT_GROUP_ROWS,
            dlo="(SELECT datediff('day', DATE '1992-01-01', "
            f"DATE '{LAYOUT_DATE_LO}'))",
            dhi="(SELECT datediff('day', DATE '1992-01-01', "
            f"DATE '{LAYOUT_DATE_HI}'))",
            plo=LAYOUT_PART_LO,
            phi=LAYOUT_PART_HI,
        )
        + """
SELECT * FROM zorder_out
UNION ALL
SELECT * FROM hilbert_out
ORDER BY layout, workload
"""
    )


HILBERT_SKIP_COMPARE_SQL = _hilbert_skip_compare_sql()


# ---------------------------------------------------------------------------
# IVF probe-depth recall curve
# ---------------------------------------------------------------------------

NPROBE_SWEEP = (1, 2, 4)


def ann_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nprobe, cand_hits, cand_recall_ppm, topk_hits, topk_recall_ppm):
    the IVF tuning curve — for each probe depth in {NPROBE_SWEEP}, how
    many of the exact top-k neighbors (a) land in the PROBED candidate
    set at all (cand_recall — monotone in nprobe by construction:
    probing a superset of clusters only adds candidates; pinned in
    tests) and (b) survive into the PQ-ranked top-k (topk_recall —
    NOT necessarily monotone: extra probed candidates with small
    APPROXIMATE distance can displace true neighbors from the final
    top-k, the classic PQ displacement effect this curve exists to
    expose). Reading both columns is how a deployment picks nprobe and
    decides whether it needs an exact re-rank stage.

    Plan: exact top-k computed ONCE (localCheckpoint); per depth, the
    candidate membership is one broadcast probe join against the
    memoized coarse assignment and the PQ ranking reuses the memoized
    codebooks — each sweep point is one probe-filtered code scan."""
    from .clustering import _fit_centroids, kmeans_assign
    from .pq import (
        PQ_QUERIES,
        PQ_TOP_K,
        _exact_l2_topk,
        _quantized,
        ann_ivfpq_topk,
    )

    exact = _exact_l2_topk(spark, sf_dir).localCheckpoint(eager=True)
    denom = exact.count()  # == PQ_QUERIES * PQ_TOP_K on every fixture

    # query→cluster distances, ranked once; per-depth probes slice it
    assign = kmeans_assign(spark, sf_dir).select("vec_id", "cluster")
    cents = _fit_centroids(spark, sf_dir)
    cent_df = values_df(spark,
        [(int(cid), [int(v) for v in cv]) for cid, cv in cents],
        "cid long, cv array<long>",
    )
    cpacked = cent_df.agg(F.collect_list(F.struct("cid", "cv")).alias("kc"))
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cdist = (
        queries.crossJoin(F.broadcast(cpacked))
        .select("query_id", "q_qv", F.explode("kc").alias("c"))
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
    ranked_probes = cdist.withColumn(
        "prn", F.row_number().over(pw)
    ).localCheckpoint(eager=True)

    rows = []
    for np_ in NPROBE_SWEEP:
        probes = ranked_probes.filter(F.col("prn") <= np_).select(
            "query_id", "cluster"
        )
        cand = assign.join(F.broadcast(probes), "cluster").select(
            "query_id", F.col("vec_id").alias("match_id")
        )
        cand_hits = exact.join(cand, ["query_id", "match_id"], "semi").count()
        approx = ann_ivfpq_topk(spark, sf_dir, nprobe=np_).select(
            "query_id", "match_id"
        )
        topk_hits = exact.join(
            F.broadcast(approx), ["query_id", "match_id"], "semi"
        ).count()
        rows.append(
            (
                np_,
                cand_hits,
                cand_hits * 1_000_000 // denom,
                topk_hits,
                topk_hits * 1_000_000 // denom,
            )
        )
    return values_df(spark,
        rows,
        "nprobe int, cand_hits long, cand_recall_ppm long, "
        "topk_hits long, topk_recall_ppm long",
    ).orderBy("nprobe")


def _nprobe_curve_sql() -> str:
    from .pq import PQ_QUERIES, PQ_TOP_K, _ivf_ctes, _pq_fit_ctes

    shared = _pq_fit_ctes() + _ivf_ctes()[:-1]
    final_c = "c2"  # PQ_ITERS == 2
    per_probe = []
    selects = []
    probes_src = _ivf_ctes(nprobe=999, probes_name="__template")[-1]
    for np_ in NPROBE_SWEEP:
        per_probe.append(
            probes_src.replace("__template", f"probes{np_}").replace(
                "WHERE prn <= 999", f"WHERE prn <= {np_}"
            )
        )
        per_probe.append(
            f"""cand{np_} AS (
  SELECT p.query_id, ka.vec_id AS match_id
  FROM kassign ka JOIN probes{np_} p ON p.cluster = ka.cluster
  WHERE ka.vec_id != p.query_id
),
dists{np_} AS (
  SELECT l.query_id, co.vec_id AS match_id, CAST(SUM(l.d) AS BIGINT) AS adist
  FROM coded co
  JOIN kassign ka ON ka.vec_id = co.vec_id
  JOIN probes{np_} p ON p.cluster = ka.cluster
  JOIN lut l ON l.query_id = p.query_id AND co.m = l.m AND co.code = l.code
  WHERE co.vec_id != p.query_id
  GROUP BY l.query_id, co.vec_id
),
topk{np_} AS (
  SELECT query_id, match_id FROM (
    SELECT query_id, match_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adist ASC, match_id ASC) AS rank
    FROM dists{np_})
  WHERE rank <= {PQ_TOP_K}
)"""
        )
        selects.append(
            f"""SELECT {np_} AS nprobe,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM exact_topk e
         JOIN cand{np_} a USING (query_id, match_id)) AS cand_hits,
       (SELECT CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM exact_topk)
               AS BIGINT) FROM exact_topk e
         JOIN cand{np_} a USING (query_id, match_id)) AS cand_recall_ppm,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM exact_topk e
         JOIN topk{np_} a USING (query_id, match_id)) AS topk_hits,
       (SELECT CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM exact_topk)
               AS BIGINT) FROM exact_topk e
         JOIN topk{np_} a USING (query_id, match_id)) AS topk_recall_ppm"""
        )
    lut_exact = f"""lut AS (
  SELECT q.vec_id AS query_id, c.m, c.cid AS code,
         SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
  FROM q JOIN {final_c} c USING (i)
  WHERE q.vec_id < {PQ_QUERIES}
  GROUP BY q.vec_id, c.m, c.cid
),
exact_d AS (
  SELECT qq.vec_id AS query_id, c.vec_id AS match_id,
         SUM((qq.qv - c.qv) * (qq.qv - c.qv)) AS d
  FROM q qq JOIN q c USING (i)
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
)"""
    return (
        "WITH "
        + ",\n".join(shared + [lut_exact] + per_probe)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY nprobe\n"
    )


ANN_IVF_NPROBE_CURVE_SQL = _nprobe_curve_sql()
