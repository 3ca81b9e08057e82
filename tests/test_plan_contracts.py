"""Physical-plan contracts over EVERY queries() entry — the enforceable
form of SCALE.md's claims. PLANS.md documents the audited plans; this
test makes two invariants regression-proof:

1. No CartesianProduct anywhere. BroadcastNestedLoopJoin is tolerated
   (it appears only where a one-row/tiny frame is cross-joined by
   design — corpus totals, percentile literals — and PLANS.md lists
   each), but an un-broadcast cartesian join would be a scale-killer
   landing silently.
2. No row-at-a-time Python (BatchEvalPython) in any plan. The only
   Python on the hot path is Arrow-batched (ArrowEvalPython /
   MapInPandas / FlatMapGroupsInPandas), which is the documented
   10-100x-faster boundary.
"""

import pytest

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
    "streaming_scd2_enrich",
}


def test_no_cartesian_no_row_python_in_any_plan(spark):
    import __spark_entry__ as entry_mod

    bad: dict[str, str] = {}
    for name, fn in entry_mod.queries().items():
        spark.catalog.clearCache()
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - contract: must plan
            bad[name] = f"failed to plan: {exc}"
            continue
        if "CartesianProduct" in plan:
            bad[name] = "CartesianProduct in physical plan"
        if "BatchEvalPython" in plan:
            bad[name] = "row-at-a-time Python (BatchEvalPython) in plan"
    assert not bad, bad
