"""Physical-plan contracts over EVERY queries() entry — the enforceable
form of SCALE.md's claims. PLANS.md documents the audited plans; this
test makes three invariants regression-proof:

1. No CartesianProduct anywhere. BroadcastNestedLoopJoin is tolerated
   (it appears only where a one-row/tiny frame is cross-joined by
   design — corpus totals, percentile literals — and PLANS.md lists
   each), but an un-broadcast cartesian join would be a scale-killer
   landing silently.
2. No row-at-a-time Python (BatchEvalPython) in any plan. The only
   Python on the hot path is Arrow-batched (ArrowEvalPython /
   MapInPandas / FlatMapGroupsInPandas), which is the documented
   10-100x-faster boundary.
3. No Window fed by Exchange SinglePartition — the third scale-killer
   class (the round-14 statistics batch shipped five of these with
   docstrings claiming "range-partitioned at scale"; the fix is
   functions/global_order.with_global_order_stat). A single-partition
   window sorts its WHOLE input through one task, so it is only
   acceptable over provably small frames: the exemption table below
   names every allowed instance with the frame that bounds it, and the
   count must match EXACTLY — a fix that removes one must prune its
   row, and a new global window anywhere else fails the suite until it
   either uses the helper or argues its bound here.
"""

import pytest

from tools.scan_singlepart_windows import single_partition_windows

SF = "/root/testdata/sf0.001"

# queries whose callable RUNS streaming/lifecycle machinery rather than
# returning a lazy frame with an inspectable scan plan (their returned
# frame is a localCheckpoint / post-hoc read) — plan inspection on the
# final frame is still performed, but is trivially clean; listed here
# only to document why they cannot violate contract 1/2 upstream.
_MATERIALIZED = {
    "streaming_rollup_closed",
    "streaming_sessions_closed",
    "streaming_attribution_pairs",
    "streaming_cms_cells",
    "streaming_dedup_unique",
    "streaming_pq_codes",
    "incremental_export_cycles",
    "streaming_merge_apply",
    "streaming_page_hinkley",
    "streaming_cusum_chart",
    "kaplan_meier_survival",
    "streaming_scd2_enrich",
}

# Contract-3 exemption table: query -> (allowed count of
# SinglePartition-fed Window nodes, the small frame that bounds each).
# Every frame here is calendar-, bin-, vocab- or k-bounded — NOT fact-
# or entity-sized. Audited round 15 (tools/scan_singlepart_windows.py).
_SP_WINDOW_EXEMPT = {
    "anderson_darling_drift": (
        1,
        "pooled daily-series rank window, <=|days| rows",
    ),
    "bh_fdr_nation_trend": (
        2,
        "25-row fixed nation family (BH rank ordering)",
    ),
    "cramer_von_mises_drift": (
        3,
        "daily series rank windows, <=|days| rows each",
    ),
    "crosscorr_leadlag": (14, "daily series windows, <=|days| rows each"),
    "durbin_watson_trend": (1, "daily series lag window, <=|days| rows"),
    "cumulative_gains_auc": (2, "10-row decile frame (cum gains + AUC)"),
    "embedding_dim_energy_curve": (1, "|dims| rows (<=64)"),
    "gini_gain_feature_rank": (1, "3 candidate features"),
    "gini_source_chars": (2, "|sources| rows"),
    "hash_bootstrap_ci": (1, "BOOT_B=32 resampled means"),
    "histogram_quantiles": (1, "|histogram bins| rows"),
    # second entry since r16's values_df: the literal block-size frame
    # is known-1-partition, so at test SF the (b, blk) cumsum window's
    # tiny AQE-coalesced input needs no hash exchange and the counter
    # attributes the bounds-agg SinglePartition exchange deeper in the
    # subtree to it; the window itself is over the dense day axis × 4
    # block sizes (calendar-bounded) and at scale its input arrives
    # multi-partition from the daily join, restoring the hash exchange
    "hurst_rs_report": (
        2,
        "|block sizes| rows (log-spaced); day-axis cumsum <=|days|*4 rows",
    ),
    "mase_seasonal_backtest": (1, "daily series, <=|days| rows"),
    "orders_autocorrelation": (2, "daily series, <=|days| rows"),
    "orders_backlog_timeline": (1, "calendar months (~84 rows)"),
    "page_hinkley_drift": (
        6,
        "daily-series path windows (rank/cumsum/dev-cumsum/min-prefix "
        "over <=|days| rows)",
    ),
    "repurchase_hazard_table": (1, "week buckets"),
    "slo_burn_report": (1, "daily series"),
    "sprt_conversion_monitor": (
        1,
        "accrual-day cumulative LLR, <=|days| rows",
    ),
    "spearman_rho_daily": (2, "daily series (two rank windows)"),
    "ucb_allocation_plan": (1, "|arms| rows"),
    "unigram_lm_em_step": (
        1,
        "Zipf-bounded candidate-piece vocab (top-UNI_VTOP cut)",
    ),
    "vocab_growth_curve": (1, "<=log2(n_docs) doubling steps"),
}


def test_plan_contracts_all_queries(spark):
    import __spark_entry__ as entry_mod

    # r17 (verdict item 3): the sweep cost 459 s sequentially — almost
    # all of it CONSTRUCTING the 463 frames (eager pins, model-fit
    # memos, iterative loops all run at sf0.001 during fn()) — so
    # overlap construction from a thread pool (guide §2.6). One
    # clearCache up front instead of per query: the per-query clear
    # only mattered for queries that persist shared scans
    # (curated_corpus family), whose cached plans still expose the
    # same join/window/Python nodes the three contracts inspect —
    # every cross join in the surface is either values_df-literal
    # (exact size stats) or explicitly broadcast-hinted, so cache-size
    # estimates cannot flip a strategy into CartesianProduct. Checked
    # stable across repeated runs. SPARK_GRAFT_PLAN_WORKERS=1 restores
    # the sequential sweep.
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    workers = int(_os.environ.get("SPARK_GRAFT_PLAN_WORKERS", "8"))
    spark.catalog.clearCache()

    def plan_of(item):
        name, fn = item
        try:
            df = fn(spark, SF)
            return name, df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - contract: must plan
            return name, None if exc is None else f"__ERR__{exc}"

    items = list(entry_mod.queries().items())
    if workers <= 1:
        planned = [plan_of(it) for it in items]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            planned = list(pool.map(plan_of, items))

    bad: dict[str, str] = {}
    for name, plan in planned:
        if plan is None or plan.startswith("__ERR__"):
            bad[name] = f"failed to plan: {(plan or '')[7:]}"
            continue
        if "CartesianProduct" in plan:
            bad[name] = "CartesianProduct in physical plan"
        if "BatchEvalPython" in plan:
            bad[name] = "row-at-a-time Python (BatchEvalPython) in plan"
        n_sp = single_partition_windows(plan)
        allowed = _SP_WINDOW_EXEMPT.get(name, (0, ""))[0]
        if n_sp != allowed:
            bad[name] = (
                f"{n_sp} SinglePartition-fed Window(s), exemption table "
                f"allows {allowed} — use functions/global_order."
                "with_global_order_stat or update the audited exemption"
            )
    assert not bad, bad
