"""Invariant tests for the round-7 batch: runtime-filter/zone-map/join-
estimation planners, incremental MV maintenance, held-out LM scoring,
Markov matrix algebra, and the watermark-policy trade-off. The
cross-engine value hash is covered by test_queries_oracle; these assert
the SEMANTIC invariants the hash alone cannot state."""

from pyspark.sql import functions as F

from oracledb_datapump_spark.operators import incremental_mv as MV
from oracledb_datapump_spark.operators import lmscore as LM
from oracledb_datapump_spark.operators import runtime_filters as RF


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    """A Bloom filter may pass extra keys but must NEVER reject a true
    member: n_passed = n_true + n_false_pos exactly, and the false-pos
    count stays under the m/n/k=131072-bit design's envelope."""
    r = RF.bloom_join_prune(spark, sf_dir).first()
    assert r.n_passed == r.n_true + r.n_false_pos
    assert r.n_true <= r.n_passed <= r.n_probes
    # theoretical fp rate for m=131072, k=3 at sf0.001 (~30 keys) is
    # ~1e-9; even a 1000x envelope means zero expected fps at test scale,
    # but assert only the loose monotone bound so sf overrides still pass
    assert r.n_false_pos <= r.n_probes // 10


def test_zonemap_time_layout_skips_hash_layout_does_not(spark, sf_dir):
    """The clustered layout must let the range predicate skip files; the
    hash-scattered layout must not (every file spans ~the full range).
    Row totals must agree between layouts (same data, different bins)."""
    rows = RF.zonemap_skip_report(spark, sf_dir).collect()
    by_layout: dict = {}
    for r in rows:
        by_layout.setdefault(r.layout, []).append(r)
    t_skip = sum(1 for r in by_layout["time_range"] if r.skipped)
    h_skip = sum(1 for r in by_layout["hash"] if r.skipped)
    assert t_skip > h_skip
    assert h_skip == 0
    assert sum(r.n_rows for r in by_layout["time_range"]) == sum(
        r.n_rows for r in by_layout["hash"]
    )


def test_selfjoin_estimate_bounds(spark, sf_dir):
    r = RF.selfjoin_size_estimate(spark, sf_dir).first()
    assert r.n_sample_keys <= r.n_keys
    # sum of squares over keys is at least the row count (cnt >= 1 each)
    assert r.exact_pairs >= r.n_keys
    assert r.est_pairs >= 0


def test_mv_delta_merge_equals_full_reaggregation(spark, sf_dir):
    """The FAST-REFRESH merge of base+delta partial states must equal
    the from-scratch aggregate, and n_parts must expose the incremental
    structure: 2 only where the mid-month cutover split a cell."""
    mv = MV.mv_delta_maintain(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    full = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(25,2)")) * 100)
        .cast("long")
        .alias("rev_cents"),
    )
    mv_rows = {
        (r.ym, r.priority): (r.n_orders, r.rev_cents) for r in mv.collect()
    }
    full_rows = {
        (r.ym, r.priority): (r.n_orders, r.rev_cents) for r in full.collect()
    }
    assert mv_rows == full_rows
    cut_ym = int(MV.MV_CUTOVER[:4]) * 100 + int(MV.MV_CUTOVER[5:7])
    for r in mv.collect():
        assert r.n_parts in (1, 2)
        if r.n_parts == 2:
            assert r.ym == cut_ym


def test_lm_crossentropy_train_cheaper_than_heldout(spark, sf_dir):
    """An LM scored on its own training split must not be more surprised
    than on held-out text (add-one smoothing: every train bigram has
    c_big >= 1, unseen held-out bigrams pay bitlen(V))."""
    rows = {r.split: r for r in LM.ngram_lm_crossentropy(spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert rows["train"].bits_per_bigram_q <= rows["val"].bits_per_bigram_q
    assert rows["train"].bits_per_bigram_q <= rows["test"].bits_per_bigram_q


def test_markov_rows_normalize_and_square_is_stochastic(spark, sf_dir):
    """Each prev_type's 1-step ppm row sums to 1e6 (up to |row| floor
    truncation), and the relational M^2 rows are sub-stochastic (ppm
    products are floored, never inflated)."""
    rows = LM.markov_transition_matrix(spark, sf_dir).collect()
    by_prev: dict = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        p1 = sum(r.p_ppm for r in rs)
        assert 1_000_000 - len(rs) <= p1 <= 1_000_000
        p2 = sum(r.p2_ppm for r in rs)
        assert p2 <= 1_000_000


def test_watermark_policies_trade_latency_for_completeness(spark, sf_dir):
    """Completeness: on every window both policies emit, the long delay
    counts >= events (it accepts more late rows), and any long-only
    window sits in the late-redelivery span (all its rows were dropped
    under the short delay, so short built no state for it at all).
    Latency: the long policy's emission frontier trails the short one's
    by the delay difference (it holds back the newest windows)."""
    from oracledb_datapump_spark.streaming import watermark as WM

    rows = WM.streaming_watermark_policy(spark, sf_dir).collect()
    short = {r.hour_start: r.n_events for r in rows if r.policy == "short_30m"}
    long_ = {r.hour_start: r.n_events for r in rows if r.policy == "long_12h"}
    common = set(short) & set(long_)
    assert common
    assert all(long_[h] >= short[h] for h in common)
    # rescue evidence: strictly more counted somewhere, or a window that
    # exists only because the long delay accepted its (all-late) rows
    long_only = set(long_) - set(short)
    assert long_only or any(long_[h] > short[h] for h in common)
    # emission-latency price: short publishes windows newer than
    # anything the long policy released
    assert max(short) > max(long_)
    # long-only windows can only come from the withheld 24h-before-mid
    # span; short-only windows only from the held-back newest span
    if long_only:
        span = max(common)  # any common window is older than the frontier
        assert all(h <= span for h in long_only)


def test_bfs_layers_partition_reachable_set(spark, sf_dir):
    """Layers are disjoint by construction; layer 0 is the seed alone,
    and each later layer is nonempty until the frontier dies (in the
    bipartite co-order graph the 1-hop layer is the seed's suppliers,
    2-hop their other customers — both nonempty in any real fixture)."""
    from oracledb_datapump_spark.operators.graph import bfs_reach_layers

    rows = {r.layer: r.n_nodes for r in bfs_reach_layers(spark, sf_dir).collect()}
    assert rows[0] == 1
    assert rows.get(1, 0) > 0
    assert rows.get(2, 0) > 0


def test_hll_set_algebra_sketch_laws(spark, sf_dir):
    """Union registers are a max-merge, so the union estimate can never
    fall below either input's estimate; inclusion-exclusion holds
    exactly over the reported rows; exact columns obey set algebra."""
    from oracledb_datapump_spark.operators.sketches import hll_set_algebra

    rows = {r.set_tag: r for r in hll_set_algebra(spark, sf_dir).collect()}
    a, b = rows["click"], rows["purchase"]
    u, i = rows["union"], rows["intersection"]
    assert u.hll_estimate >= max(a.hll_estimate, b.hll_estimate)
    assert i.hll_estimate == max(
        0, a.hll_estimate + b.hll_estimate - u.hll_estimate
    )
    assert u.exact_distinct == a.exact_distinct + b.exact_distinct - i.exact_distinct
    assert max(a.exact_distinct, b.exact_distinct) <= u.exact_distinct


def test_k_anonymity_histogram_accounts_every_row(spark, sf_dir):
    """The count-of-counts must conserve row mass (sum n_rows = table
    rows), and at_risk must flag exactly the sub-k sizes."""
    from oracledb_datapump_spark.operators.privacy import (
        KANON_K,
        k_anonymity_report,
    )

    rows = k_anonymity_report(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert r.at_risk == (r.group_size < KANON_K)
        assert r.n_rows == r.group_size * r.n_groups


def test_data_quality_audit_clean_fixture(spark, sf_dir):
    """The driver fixture is referentially clean: every arm reports 0
    violations, and n_checked matches the table sizes."""
    from oracledb_datapump_spark.operators.quality_audit import (
        data_quality_audit,
    )

    rows = {r.check_name: r for r in data_quality_audit(spark, sf_dir).collect()}
    assert len(rows) == 11
    assert all(r.n_violations == 0 for r in rows.values())
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert rows["pk_unique_orders"].n_checked == n_orders
    assert rows["fk_orders_customer"].n_checked == n_orders


def test_snapshot_diff_partitions_and_mutation_count(spark, sf_dir):
    """Every order lands in exactly one class (classes partition the key
    union), and 'changed' counts exactly the simulated %97 mutations in
    the overlap window."""
    from oracledb_datapump_spark.operators.quality_audit import (
        DIFF_HI,
        DIFF_LO,
        DIFF_MUT_MOD,
        snapshot_diff,
    )
    from pyspark.sql import functions as F2

    rows = {r.change_type: r.n_rows for r in snapshot_diff(spark, sf_dir).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert sum(rows.values()) == o.count()
    expect_changed = o.filter(
        (F2.col("o_orderdate") >= F2.lit(DIFF_LO))
        & (F2.col("o_orderdate") < F2.lit(DIFF_HI))
        & (F2.col("o_orderkey") % DIFF_MUT_MOD == 0)
    ).count()
    assert rows["changed"] == expect_changed


def test_join_order_estimate_fk_joins_are_exact(spark, sf_dir):
    """On a clean FK join the System-R formula is EXACT (|A ⋈ B| =
    |child| when every child key exists in the parent and max ndv =
    parent count): err must be 0 ppm for all three star joins."""
    from oracledb_datapump_spark.operators.quality_audit import (
        join_order_estimate,
    )

    for r in join_order_estimate(spark, sf_dir).collect():
        assert r.abs_err_ppm == 0, (r.join_name, r.abs_err_ppm)
        assert r.est_rows == r.exact_rows


def test_embedding_ablation_monotone_degradation(spark, sf_dir):
    """The full-dim row is a perfect self-check; agreement/overlap can
    only degrade (weakly) as dims shrink."""
    from oracledb_datapump_spark.operators.similarity import (
        ABLATION_DIMS,
        N_QUERIES,
        TOP_K,
        embedding_dim_ablation,
    )

    rows = {r.dims: r for r in embedding_dim_ablation(spark, sf_dir).collect()}
    full = rows[ABLATION_DIMS[0]]
    assert full.top1_agree == full.n_queries == min(
        N_QUERIES,
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count(),
    )
    assert full.top5_overlap == full.n_queries * TOP_K
    for d in ABLATION_DIMS[1:]:
        assert rows[d].top1_agree <= full.top1_agree
        assert rows[d].top5_overlap <= full.top5_overlap
