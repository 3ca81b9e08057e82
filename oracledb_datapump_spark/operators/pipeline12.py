"""Pipeline dashboards, batch 13: physical-layout A/B audit,
cross-method dedup agreement, and t-closeness (privacy triad complete).

- ``layout_skip_compare``: the planner-side question Z-order exists to
  answer — given the SAME row-group budget, how many groups does a
  2-predicate workload skip under (a) a linear sort on one column vs
  (b) a Morton interleave of two? Zone maps (per-group min/max) are
  simulated in exact integer arithmetic, so the skip counts — the
  numbers a storage team would use to decide a re-cluster — sit under
  the cross-engine value hash. Complements zonemap_skip_report (one
  layout, one predicate) with the A/B the reference's Z-order dump
  directive (our DUMP_ZORDER) implies.
- ``dedup_method_agreement``: do MinHash-verified near-dups and
  SimHash-band near-dups find the SAME pairs? The confusion matrix over
  the union of both candidate sets — the standard cross-validation
  before trusting either method at corpus scale.
- ``t_closeness_report``: with k_anonymity_report (re-identification)
  and l_diversity_report (attribute disclosure), t-closeness bounds the
  sharper skew attack: a group can be k-anonymous AND l-diverse while
  its sensitive-value DISTRIBUTION still diverges from the table's.
  Total-variation distance in exact ppm arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D

# -- layout skip compare -----------------------------------------------------

LAYOUT_GROUP_ROWS = 4096  # simulated parquet row-group size (rows)
LAYOUT_QBITS = 16  # quantization levels per interleaved dimension
# the probe workload: a date slice, a part slice, and their conjunction
LAYOUT_DATE_LO = "1995-01-01"
LAYOUT_DATE_HI = "1995-03-31"
LAYOUT_PART_LO = 1
LAYOUT_PART_HI = 50


def _morton2(q1: str, q2: str, bits: int) -> F.Column:
    """Exact integer Morton interleave of two already-quantized long
    columns (bit i of q1 → 2i, of q2 → 2i+1) — shift/mask chain, all
    whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(F.col(q1), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(F.col(q2), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def _morton2_sql(q1: str, q2: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({q1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({q2} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def layout_skip_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(layout, workload, n_groups, n_groups_scanned, rows_scanned): the
    zone-map skip effectiveness of two physical layouts of lineitem —
    ``linear`` (sorted by ship date) and ``zorder`` (Morton interleave
    of quantized ship date × part key) — under three probe predicates:
    ``date`` ({LAYOUT_DATE_LO}..{LAYOUT_DATE_HI}), ``part`` (partkey
    {LAYOUT_PART_LO}..{LAYOUT_PART_HI}), ``both``. Rows are assigned to
    {LAYOUT_GROUP_ROWS}-row groups by global rank under each layout's
    sort key (ties broken by the (orderkey, linenumber) natural key, so
    the assignment — and therefore the hash — is deterministic); a
    group is scanned when its min/max envelope overlaps the predicate,
    exactly the parquet row-group pruning rule.

    The expected story this report quantifies: linear wins on its sort
    column, is useless on the other; Z-order skips on BOTH at a modest
    per-column discount — the Delta/Iceberg OPTIMIZE ZORDER trade-off
    as a measurable table instead of folklore.

    Plan: one min/max aggregate (broadcast), two global sorts (the same
    range shuffle a real re-cluster write pays), one groupBy per layout
    for zone maps, then row-local predicate arithmetic over ≤2·⌈n/{LAYOUT_GROUP_ROWS}⌉
    zone rows. At 100 TB the sorts are the dominant cost — which is the
    honest price of re-clustering; the audit itself adds nothing."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("ok"),
        F.col("l_linenumber").cast("long").alias("ln"),
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")).cast("long").alias(
            "d"
        ),
        F.col("l_partkey").cast("long").alias("p"),
    )
    stats = l.agg(
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.min("p").alias("pmin"),
        F.max("p").alias("pmax"),
    )
    lvl = (1 << LAYOUT_QBITS) - 1
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
    # r16: pin the quantized base once — both layout branches (and the
    # min/max broadcast inside each) used to re-derive it from the
    # parquet scan (guide §2.4/§5); see pipeline33.hilbert_skip_compare
    q = q.localCheckpoint(eager=True)
    date_lo = F.datediff(F.lit(LAYOUT_DATE_LO), F.lit("1992-01-01")).cast("long")
    date_hi = F.datediff(F.lit(LAYOUT_DATE_HI), F.lit("1992-01-01")).cast("long")

    from ..functions.global_order import with_global_order_stat

    def zone_rows(keyed: DataFrame, layout: str) -> DataFrame:
        # distributed global rank (range partition + per-partition offsets;
        # functions/global_order.py) — NOT a single-partition window
        ranked, _ = with_global_order_stat(
            keyed.select("sort_key", "ok", "ln", "d", "p"),
            [F.col("sort_key"), F.col("ok"), F.col("ln")],
            out="rk",
        )
        grouped = ranked.select(
            "d",
            "p",
            F.expr(f"(rk - 1) div {LAYOUT_GROUP_ROWS}").alias("grp"),
        )
        # r16: pin the zone maps — each of the three workload arms
        # otherwise re-evaluates the per-partition rank window over the
        # full range partitioning (3 sorts per layout since the r14
        # global_order refactor); zones is ⌈n/GROUP_ROWS⌉ rows
        zones = grouped.groupBy("grp").agg(
            F.min("d").alias("dlo"),
            F.max("d").alias("dhi"),
            F.min("p").alias("plo"),
            F.max("p").alias("phi"),
            F.count(F.lit(1)).alias("n_rows"),
        ).localCheckpoint(eager=True)
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

    linear = zone_rows(q.withColumn("sort_key", F.col("d")), "linear")
    zord = zone_rows(
        q.withColumn("sort_key", _morton2("qd", "qp", LAYOUT_QBITS)), "zorder"
    )
    return linear.unionByName(zord).orderBy("layout", "workload")


LAYOUT_SKIP_COMPARE_SQL = f"""
WITH base AS (
  SELECT CAST(l_orderkey AS BIGINT) AS ok, CAST(l_linenumber AS BIGINT) AS ln,
         CAST(datediff('day', DATE '1992-01-01', l_shipdate) AS BIGINT) AS d,
         CAST(l_partkey AS BIGINT) AS p
  FROM lineitem
),
stats AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax, MIN(p) AS pmin, MAX(p) AS pmax FROM base),
q AS (
  SELECT ok, ln, d, p,
         CASE WHEN dmax > dmin THEN (d - dmin) * {(1 << LAYOUT_QBITS) - 1} // (dmax - dmin) ELSE 0 END AS qd,
         CASE WHEN pmax > pmin THEN (p - pmin) * {(1 << LAYOUT_QBITS) - 1} // (pmax - pmin) ELSE 0 END AS qp
  FROM base CROSS JOIN stats
),
lin AS (
  SELECT d, p,
         (ROW_NUMBER() OVER (ORDER BY d, ok, ln) - 1) // {LAYOUT_GROUP_ROWS} AS grp
  FROM q
),
zed AS (
  SELECT d, p,
         (ROW_NUMBER() OVER (ORDER BY ({_morton2_sql("qd", "qp", LAYOUT_QBITS)}), ok, ln) - 1)
           // {LAYOUT_GROUP_ROWS} AS grp
  FROM q
),
zones AS (
  SELECT 'linear' AS layout, grp, MIN(d) AS dlo, MAX(d) AS dhi,
         MIN(p) AS plo, MAX(p) AS phi, COUNT(*) AS n_rows
  FROM lin GROUP BY grp
  UNION ALL
  SELECT 'zorder', grp, MIN(d), MAX(d), MIN(p), MAX(p), COUNT(*)
  FROM zed GROUP BY grp
),
hits AS (
  SELECT layout, n_rows,
         NOT (dhi < datediff('day', DATE '1992-01-01', DATE '{LAYOUT_DATE_LO}')
              OR dlo > datediff('day', DATE '1992-01-01', DATE '{LAYOUT_DATE_HI}')) AS date_hit,
         NOT (phi < {LAYOUT_PART_LO} OR plo > {LAYOUT_PART_HI}) AS part_hit
  FROM zones
)
SELECT layout, workload,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_scanned,
       CAST(SUM(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
FROM (
  SELECT layout, 'date' AS workload, date_hit AS hit, n_rows FROM hits
  UNION ALL
  SELECT layout, 'part', part_hit, n_rows FROM hits
  UNION ALL
  SELECT layout, 'both', date_hit AND part_hit, n_rows FROM hits
)
GROUP BY layout, workload
ORDER BY layout, workload
"""


# -- cross-method dedup agreement --------------------------------------------

AGREE_BAND_BITS = 15  # 4 simhash bands of 15 bits (SIMHASH_BITS = 60)
AGREE_HAM_MAX = 8  # simhash pairs within this hamming distance count as dups


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs by SimHash banding: docs sharing any
    {AGREE_BAND_BITS}-bit band of their {D.SIMHASH_BITS}-bit fingerprint
    meet (the LSH trick applied to hamming space), then the exact
    hamming filter ≤{AGREE_HAM_MAX} keeps real neighbors. Same
    band-join scale story as MinHash LSH: no all-pairs product ever."""
    # r16 (guide §2.4): the fingerprint table is pinned once (the old
    # band self-join re-ran the whole tokenize→simhash lineage per join
    # side), candidates expand row-locally from per-(band, key) posting
    # lists — one groupBy exchange instead of two join exchanges + SMJ
    # sorts — and the exact hamming filter runs BEFORE the pair
    # distinct, so only real neighbors reach that exchange. Same pair
    # set: hamming is a function of the pair, so filter and distinct
    # commute.
    s = (
        D.simhash_fingerprints(spark, sf_dir)
        .select("doc_id", "simhash")
        .localCheckpoint(eager=True)
    )
    n_bands = D.SIMHASH_BITS // AGREE_BAND_BITS
    mask = (1 << AGREE_BAND_BITS) - 1
    banded = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(simhash >> {b * AGREE_BAND_BITS}) & {mask}"
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    lists = banded.groupBy("band", "key").agg(
        F.array_sort(
            F.collect_list(F.struct("doc_id", "simhash"))
        ).alias("ds")
    )
    return (
        lists.select(F.posexplode("ds").alias("i", "a"), "ds")
        .select(
            "a",
            F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("b"),
        )
        .filter(
            F.expr(f"bit_count(a.simhash ^ b.simhash) <= {AGREE_HAM_MAX}")
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(verdict, n_pairs): the confusion matrix between the two near-dup
    detectors — MinHash-LSH candidates verified by exact Jaccard
    (dedup_minhash_verified) vs SimHash band candidates within hamming
    ≤{AGREE_HAM_MAX} — over the union of both pair sets: ``both``,
    ``minhash_only``, ``simhash_only``. The cross-validation a corpus
    team runs before trusting either method's delete list: high
    ``both`` and small single-method tails mean the cheap fingerprints
    agree on what a duplicate IS; a fat tail names the method to audit.

    Plan: both candidate generators are banded (never all-pairs); the
    agreement join is a full outer on the pair key — pair-list-sized,
    tiny next to the corpus. Rides the verified-pair memo."""
    mh = D.verified_pairs_cached(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_mh")
    )
    sh = _simhash_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_sh")
    )
    j = mh.join(sh, ["doc_a", "doc_b"], "full_outer")
    verdict = (
        F.when(F.col("in_mh").isNotNull() & F.col("in_sh").isNotNull(), "both")
        .when(F.col("in_mh").isNotNull(), "minhash_only")
        .otherwise("simhash_only")
    )
    return (
        j.select(verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("verdict")
    )


def simhash_pairs_sql() -> str:
    """Standalone SELECT producing the SimHash candidate pair set
    (doc_a, doc_b) — the SQL twin of :func:`_simhash_pairs`, factored
    for reuse by the multi-method dedup audits (pipeline51)."""
    simhash = D.SIMHASH_SQL.replace("ORDER BY doc_id", "")
    n_bands = D.SIMHASH_BITS // AGREE_BAND_BITS
    mask = (1 << AGREE_BAND_BITS) - 1
    return f"""
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {AGREE_BAND_BITS})) & {mask} AS key
  FROM ({simhash}) sh_sig,
       (SELECT unnest(range({n_bands}))::INT AS band) b
) a JOIN (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {AGREE_BAND_BITS})) & {mask} AS key
  FROM ({simhash}) sh_sig,
       (SELECT unnest(range({n_bands}))::INT AS band) b
) b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {AGREE_HAM_MAX}
"""


def _dedup_method_agreement_sql() -> str:
    verified = D.DEDUP_MINHASH_VERIFIED_SQL.replace(
        "ORDER BY doc_a, doc_b", ""
    )
    simhash = D.SIMHASH_SQL.replace("ORDER BY doc_id", "")
    n_bands = D.SIMHASH_BITS // AGREE_BAND_BITS
    mask = (1 << AGREE_BAND_BITS) - 1
    return f"""
WITH mh AS (SELECT doc_a, doc_b FROM ({verified})),
sh_sig AS ({simhash}),
banded AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {AGREE_BAND_BITS})) & {mask} AS key
  FROM sh_sig, (SELECT unnest(range({n_bands}))::INT AS band) b
),
sh AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {AGREE_HAM_MAX}
),
j AS (
  SELECT COALESCE(mh.doc_a, sh.doc_a) AS doc_a,
         CASE WHEN mh.doc_a IS NOT NULL AND sh.doc_a IS NOT NULL THEN 'both'
              WHEN mh.doc_a IS NOT NULL THEN 'minhash_only'
              ELSE 'simhash_only' END AS verdict
  FROM mh FULL OUTER JOIN sh
    ON mh.doc_a = sh.doc_a AND mh.doc_b = sh.doc_b
)
SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM j GROUP BY verdict
ORDER BY verdict
"""


DEDUP_METHOD_AGREEMENT_SQL = _dedup_method_agreement_sql()


# -- t-closeness -------------------------------------------------------------

TCLOSE_BAND_CENTS = 100_000  # same QI ladder as k-anonymity / l-diversity
TCLOSE_T_PPM = 300_000  # groups farther than 0.3 TVD from global are at risk
TCLOSE_HIST_PPM = 100_000  # report bands of 0.1 TVD


def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tvd_band, n_groups, n_rows, at_risk): t-closeness of the
    customer table — for each quasi-identifier group (nation, $1000
    balance band), the total-variation distance between the group's
    market-segment distribution and the whole table's, reported as a
    {TCLOSE_HIST_PPM}-ppm-band histogram with ``at_risk`` marking
    groups beyond t={TCLOSE_T_PPM} ppm. Completes the release-audit
    triad: k-anonymity (group too small), l-diversity (too few
    sensitive values), t-closeness (sensitive DISTRIBUTION too
    skewed — a 1000-member group that is 95% one segment passes both
    k and l yet still discloses).

    Determinism: TVD = Σ|p_g − p| / 2 over the (group × segment) grid
    with both shares floored to ppm BEFORE the subtraction — exact
    int64 in both engines. Plan: one groupBy for the grid, a broadcast
    of the ≤|segments| global shares, a per-group sum — the QI
    cardinality, not the row count, sizes everything past the scan."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.expr(
            f"CAST(floor(c_acctbal * 100) AS LONG) div {TCLOSE_BAND_CENTS}"
        ).alias("bal_band"),
        "c_mktsegment",
    )
    grid = c.groupBy("nation", "bal_band", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gsize = grid.groupBy("nation", "bal_band").agg(
        F.sum("cnt").alias("n_g")
    )
    glob = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("gcnt"))
    total = c.agg(F.count(F.lit(1)).alias("n_all"))
    # full (group x segment) grid: absent segments contribute p_global
    full = (
        gsize.crossJoin(F.broadcast(glob))
        .join(grid, ["nation", "bal_band", "c_mktsegment"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "nation",
            "bal_band",
            "n_g",
            F.expr("coalesce(cnt, 0) * 1000000 div n_g").alias("p_g_ppm"),
            F.expr("gcnt * 1000000 div n_all").alias("p_ppm"),
        )
    )
    per_group = full.groupBy("nation", "bal_band", "n_g").agg(
        (F.sum(F.abs(F.col("p_g_ppm") - F.col("p_ppm"))) / 2)
        .cast("long")
        .alias("tvd_ppm")
    )
    return (
        per_group.select(
            F.expr(f"tvd_ppm div {TCLOSE_HIST_PPM}").alias("tvd_band"),
            "n_g",
        )
        .groupBy("tvd_band")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_g").cast("long").alias("n_rows"),
        )
        .select(
            "tvd_band",
            "n_groups",
            "n_rows",
            (
                F.col("tvd_band")
                >= F.lit(TCLOSE_T_PPM // TCLOSE_HIST_PPM)
            ).alias("at_risk"),
        )
        .orderBy("tvd_band")
    )


T_CLOSENESS_REPORT_SQL = f"""
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(floor(c_acctbal * 100) AS BIGINT) // {TCLOSE_BAND_CENTS} AS bal_band,
         c_mktsegment
  FROM customer
),
grid AS (
  SELECT nation, bal_band, c_mktsegment, COUNT(*) AS cnt
  FROM c GROUP BY 1, 2, 3
),
gsize AS (
  SELECT nation, bal_band, CAST(SUM(cnt) AS BIGINT) AS n_g
  FROM grid GROUP BY 1, 2
),
segs AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS gcnt FROM c GROUP BY 1),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM c),
full_grid AS (
  SELECT s.nation, s.bal_band, s.n_g,
         COALESCE(g.cnt, 0) * 1000000 // s.n_g AS p_g_ppm,
         gl.gcnt * 1000000 // t.n_all AS p_ppm
  FROM gsize s CROSS JOIN segs gl CROSS JOIN total t
  LEFT JOIN grid g ON g.nation = s.nation AND g.bal_band = s.bal_band
                  AND g.c_mktsegment = gl.c_mktsegment
),
per_group AS (
  SELECT nation, bal_band, n_g,
         CAST(SUM(ABS(p_g_ppm - p_ppm)) // 2 AS BIGINT) AS tvd_ppm
  FROM full_grid GROUP BY 1, 2, 3
)
SELECT tvd_ppm // {TCLOSE_HIST_PPM} AS tvd_band,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n_g) AS BIGINT) AS n_rows,
       tvd_ppm // {TCLOSE_HIST_PPM} >= {TCLOSE_T_PPM // TCLOSE_HIST_PPM} AS at_risk
FROM per_group GROUP BY 1
ORDER BY tvd_band
"""
