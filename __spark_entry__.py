"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()`` maps
operator names → (spark, sf_dir) → DataFrame. ``oracle_sql()`` maps the
same names → DuckDB-runnable ANSI SQL over the pre-registered views.
Column names/aliases match between the two (the driver sorts columns by
name before value-hashing). Ops whose values are not portably bit-stable
across engines (LSH bucket boundaries on float sums) omit the oracle →
rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracledb_datapump_spark.operators import analytics as A
from oracledb_datapump_spark.operators import analytics2 as A2
from oracledb_datapump_spark.operators import analytics3 as A3
from oracledb_datapump_spark.operators import analytics4 as A4
from oracledb_datapump_spark.operators import analytics5 as A5
from oracledb_datapump_spark.operators import clustering as CL
from oracledb_datapump_spark.operators import curation as CU
from oracledb_datapump_spark.operators import dedup as D
from oracledb_datapump_spark.operators import embeddings as EM
from oracledb_datapump_spark.operators import etl as E
from oracledb_datapump_spark.operators import evaluation as EV
from oracledb_datapump_spark.operators import graph as G
from oracledb_datapump_spark.operators import multimodal as M
from oracledb_datapump_spark.operators import outliers as OU
from oracledb_datapump_spark.operators import privacy as PV
from oracledb_datapump_spark.operators import pq as PQ2
from oracledb_datapump_spark.operators import profiling as PF
from oracledb_datapump_spark.operators import sampling as SP
from oracledb_datapump_spark.operators import similarity as S
from oracledb_datapump_spark.operators import sketches as SK
from oracledb_datapump_spark.operators import sparse_text as SX
from oracledb_datapump_spark.operators import temporal as TM
from oracledb_datapump_spark.operators import textprep as TP
from oracledb_datapump_spark.operators import textstats as T
from oracledb_datapump_spark.operators import pipeline as PL
from oracledb_datapump_spark.operators import pipeline2 as PL2
from oracledb_datapump_spark.operators import pipeline3 as PL3
from oracledb_datapump_spark.operators import pipeline4 as PL4
from oracledb_datapump_spark.operators import pipeline5 as PL5
from oracledb_datapump_spark.operators import pipeline6 as PL6
from oracledb_datapump_spark.operators import pipeline7 as PL7
from oracledb_datapump_spark.operators import pipeline8 as PL8
from oracledb_datapump_spark.operators import pipeline9 as PL9
from oracledb_datapump_spark.operators import incremental_mv as MV
from oracledb_datapump_spark.operators import lmscore as LM
from oracledb_datapump_spark.operators import runtime_filters as RF
from oracledb_datapump_spark.operators import quality_audit as QA
from oracledb_datapump_spark.operators import pipeline10 as PL10
from oracledb_datapump_spark.operators import pipeline11 as PL11
from oracledb_datapump_spark.operators import pipeline12 as PL12
from oracledb_datapump_spark.operators import pipeline13 as PL13
from oracledb_datapump_spark.operators import pipeline14 as PL14
from oracledb_datapump_spark.operators import pipeline15 as PL15
from oracledb_datapump_spark.operators import pipeline16 as PL16
from oracledb_datapump_spark.operators import pipeline17 as PL17
from oracledb_datapump_spark.operators import pipeline18 as PL18
from oracledb_datapump_spark.operators import pipeline19 as PL19
from oracledb_datapump_spark.operators import pipeline20 as PL20
from oracledb_datapump_spark.operators import pipeline21 as PL21
from oracledb_datapump_spark.operators import pipeline22 as PL22
from oracledb_datapump_spark.operators import pipeline23 as PL23
from oracledb_datapump_spark.operators import pipeline24 as PL24
from oracledb_datapump_spark.operators import pipeline25 as PL25
from oracledb_datapump_spark.streaming import dedup as SD
from oracledb_datapump_spark.streaming import incremental as SI
from oracledb_datapump_spark.streaming import stateful as ST
from oracledb_datapump_spark.streaming import joins as SJ
from oracledb_datapump_spark.streaming import sketch as SK2
from oracledb_datapump_spark.streaming import vectors as SV
from oracledb_datapump_spark.streaming import watermark as WM


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return A.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict order is the driver's gating order (it stops at the 50th
    entry). Rotation policy: operators without a prior green CORRECTNESS
    row, plus any operator whose code changed this round, occupy the
    gated prefix (GATED_PREFIX below — the literal dict keeps its
    historical order; the reorder at the end of this function is the
    one place rotation happens); queries proven green in an earlier
    round with unchanged code sit after the fold (their CORRECTNESS
    rows + tests/test_queries_oracle.py are the standing evidence)."""
    base = {
        # --- gated prefix (round 7): the 46 round-6 queries that have
        # never had a driver CORRECTNESS row (added past a full r6
        # prefix), then this round's new + changed-code slots — exactly
        # the r6 verdict's rotation prescription --------------------------
        "doc_embedding_coverage": PL2.doc_embedding_coverage,
        "session_length_histogram": PL2.session_length_histogram,
        "quality_vs_dup_matrix": PL2.quality_vs_dup_matrix,
        "token_share_by_lang": PL2.token_share_by_lang,
        "conversion_by_hour": PL2.conversion_by_hour,
        "shard_balance_report": PL2.shard_balance_report,
        "pq_code_histogram": PL2.pq_code_histogram,
        "events_dow_hour_profile": PL2.events_dow_hour_profile,
        "event_transition_gaps": PL3.event_transition_gaps,
        "repeat_purchase_gaps": PL3.repeat_purchase_gaps,
        "quality_length_moments": PL3.quality_length_moments,
        "prefix_collision_histogram": PL3.prefix_collision_histogram,
        "hourly_event_dups": PL3.hourly_event_dups,
        "payload_k_band_profile": PL3.payload_k_band_profile,
        "orders_backlog_timeline": PL3.orders_backlog_timeline,
        "mktsegment_yoy": PL3.mktsegment_yoy,
        "embedding_dim_profile": PL3.embedding_dim_profile,
        "pq_subspace_error": PL3.pq_subspace_error,
        "source_lang_gini": PL4.source_lang_gini,
        "pair_jaccard_histogram": PL4.pair_jaccard_histogram,
        "customer_rfm_bands": PL4.customer_rfm_bands,
        "nation_fulfillment_lag": PL4.nation_fulfillment_lag,
        "value_anomaly_days": PL4.value_anomaly_days,
        "pq_index_roundtrip": PQ2.pq_index_roundtrip,
        "peak_concurrent_sessions": PL5.peak_concurrent_sessions,
        "dup_degree_histogram": PL5.dup_degree_histogram,
        "dup_cross_lang_pairs": PL5.dup_cross_lang_pairs,
        "order_priority_mix_by_month": PL5.order_priority_mix_by_month,
        "part_brand_price_spread": PL5.part_brand_price_spread,
        "streaming_merge_apply": SI.streaming_merge_apply,
        "streaming_scd2_enrich": SJ.streaming_scd2_enrich,
        "nation_revenue_hhi": PL6.nation_revenue_hhi,
        "user_activity_hhi": PL6.user_activity_hhi,
        "value_quartiles_by_type": PL6.value_quartiles_by_type,
        "order_width_histogram": PL6.order_width_histogram,
        "pii_hit_rates": PL7.pii_hit_rates,
        "session_funnel_rates": PL7.session_funnel_rates,
        "dau_wau_stickiness": PL7.dau_wau_stickiness,
        "simhash_pair_hamming": PL7.simhash_pair_hamming,
        "rolling_retention_7d": PL8.rolling_retention_7d,
        "dedup_token_savings": PL8.dedup_token_savings,
        "ship_lag_quartiles_by_priority": PL8.ship_lag_quartiles_by_priority,
        "weekly_new_vs_returning": PL9.weekly_new_vs_returning,
        "events_interarrival_moments": PL9.events_interarrival_moments,
        "cold_start_users": PL9.cold_start_users,
        "revenue_pareto_bands": PL9.revenue_pareto_bands,
        # new this round: CDC merge-apply under schema evolution
        # (DATA_OPTIONS(ALLOW_SCHEMA_EVOLUTION) on the streaming path)
        "streaming_merge_evolve": SI.streaming_merge_evolve,
        # round-7 changed-code slots: incremental.py (commit-log batch
        # counting, Spark-side arrival split), stateful.py (un-armed
        # keep-alive placeholder), dedup.py (Arrow-backed verified-pair
        # memo — dedup_groups is the representative consumer; the rest
        # of the memo family sits first past the fold, standing evidence
        # tests/test_queries_oracle.py at sf0.001+0.01)
        "incremental_export_cycles": SI.incremental_export_cycles,
        "streaming_sessions_closed": ST.streaming_sessions_closed,
        "dedup_groups": D.dedup_groups,
        # ---------------- fold: entry 51+ below -------------------------
        # new in round 7 AFTER the 50-entry prefix filled (rotation debt
        # for round 8); standing evidence = tests/test_queries_oracle.py
        # at sf0.001 + sf0.01
        "bloom_join_prune": RF.bloom_join_prune,
        "zonemap_skip_report": RF.zonemap_skip_report,
        "selfjoin_size_estimate": RF.selfjoin_size_estimate,
        "mv_delta_maintain": MV.mv_delta_maintain,
        "ngram_lm_crossentropy": LM.ngram_lm_crossentropy,
        "markov_transition_matrix": LM.markov_transition_matrix,
        "streaming_watermark_policy": WM.streaming_watermark_policy,
        "bfs_reach_layers": G.bfs_reach_layers,
        "hll_set_algebra": SK.hll_set_algebra,
        "k_anonymity_report": PV.k_anonymity_report,
        "data_quality_audit": QA.data_quality_audit,
        "snapshot_diff": QA.snapshot_diff,
        "join_order_estimate": QA.join_order_estimate,
        "embedding_dim_ablation": S.embedding_dim_ablation,
        "datapump_roundtrip_query_columns": E.datapump_roundtrip_query_columns,
        "datapump_roundtrip_remap_data": E.datapump_roundtrip_remap_data,
        "datapump_roundtrip_compact": E.datapump_roundtrip_compact,
        "datapump_roundtrip_departition": E.datapump_roundtrip_departition,
        "datapump_roundtrip_zorder": E.datapump_roundtrip_zorder,
        "datapump_roundtrip_csv": E.datapump_roundtrip_csv,
        "dedup_containment_pairs": PL10.dedup_containment_pairs,
        "hard_negative_mining": PL10.hard_negative_mining,
        "lm_filter_report": PL10.lm_filter_report,
        "oov_rate_curve": PL10.oov_rate_curve,
        # dedup.py memo-family consumers (code changed r7) past the fold:
        # green r06 rows + this round's local oracle re-verification at
        # both scales are the documented standing evidence
        "dedup_minhash_pairs": D.dedup_minhash_pairs,
        "dedup_minhash_verified": D.dedup_minhash_verified,
        "dedup_group_size_histogram": EV.dedup_group_size_histogram,
        "contrastive_pairs": D.contrastive_pairs,
        "source_overlap_matrix": D.source_overlap_matrix,
        "minhash_estimate_accuracy": D.minhash_estimate_accuracy,
        "dedup_rate_by_source": EV.dedup_rate_by_source,
        "curated_corpus": CU.curated_corpus,
        "curated_corpus_v2": CU.curated_corpus_v2,
        "curated_corpus_v3": CU.curated_corpus_v3,
        # green r06 rows, code unchanged this round
        "dedup_keep_best": PL.dedup_keep_best,
        "minhash_band_hitrates": PL.minhash_band_hitrates,
        "host_cap_sample": PL.host_cap_sample,
        "filter_ablation_report": PL.filter_ablation_report,
        "hourly_heavy_hitters": PL.hourly_heavy_hitters,
        "events_anomaly_hours": PL.events_anomaly_hours,
        "dsir_resample_plan": PL.dsir_resample_plan,
        "user_recency_weight": PL.user_recency_weight,
        "zipf_vocab_curve": PL.zipf_vocab_curve,
        "ngram_novelty_by_source": PL.ngram_novelty_by_source,
        "contamination_by_source": PL.contamination_by_source,
        "embedding_norm_outliers": PL.embedding_norm_outliers,
        "attribution_latency_histogram": PL.attribution_latency_histogram,
        "dedup_threshold_curve": PL.dedup_threshold_curve,
        "source_lang_matrix": PL.source_lang_matrix,
        "length_decile_bands": PL.length_decile_bands,
        "events_hourly_rollup": A.events_hourly_rollup,
        "events_sessionize": A.events_sessionize,
        "funnel_conversion": A5.funnel_conversion,
        "events_json_stats": A4.events_json_stats,
        "asof_attribution": TM.asof_attribution,
        "scd2_user_value": TM.scd2_user_value,
        "range_join_nearby": TM.range_join_nearby,
        "rolling_window_activity": TM.rolling_window_activity,
        "cohort_retention": TM.cohort_retention,
        "gapfill_hourly": TM.gapfill_hourly,
        "streaming_rollup_closed": SD.streaming_rollup_closed,
        "streaming_attribution_pairs": SJ.streaming_attribution_pairs,
        "streaming_cms_cells": SK2.streaming_cms_cells_cycle,
        "streaming_dedup_unique": SD.streaming_dedup_unique,
        "dedup_exact": D.dedup_exact,
        "simhash_fingerprints": D.simhash_fingerprints,
        "q1_pricing_summary": A.q1_pricing_summary,
        "datapump_roundtrip_nation": E.datapump_roundtrip_nation,
        "datapump_roundtrip_supplier": E.datapump_roundtrip_supplier,
        "q2_min_cost_supplier": A5.q2_min_cost_supplier,
        "q8_market_share": A5.q8_market_share,
        "embedding_normalize": EM.embedding_normalize,
        "embedding_quantize": EM.embedding_quantize,
        "ann_bruteforce_topk": S.ann_bruteforce_topk,
        "ann_lsh_topk": S.ann_lsh_topk,
        "centroid_topk": S.centroid_topk,
        "q9_product_profit": A3.q9_product_profit,
        "sales_cube": A5.sales_cube,
        "skew_salted_revenue": A5.skew_salted_revenue,
        # proven green r05 with unchanged code
        "source_token_budget": EV.source_token_budget,
        "join_key_skew_profile": EV.join_key_skew_profile,
        "pack_plan": EV.pack_plan,
        "repetition_ngram_fracs": T.repetition_ngram_fracs,
        "curriculum_order": EV.curriculum_order,
        "corpus_shard_plan": EV.corpus_shard_plan,
        "span_dup_score": SX.span_dup_score,
        "tfidf_search_topk": SX.tfidf_search_topk,
        "bm25_search_topk": SX.bm25_search_topk,
        "dsir_importance": TP.dsir_importance,
        "embedding_pq_codes": PQ2.embedding_pq_codes,
        "ann_pq_topk": PQ2.ann_pq_topk,
        "retrieval_eval_mrr": EV.retrieval_eval_mrr,
        "ann_ivfpq_topk": PQ2.ann_ivfpq_topk,
        "ann_pq_recall": PQ2.ann_pq_recall,
        "bigram_surprise": T.bigram_surprise,
        "source_quality_report": EV.source_quality_report,
        "budget_mix_plan": EV.budget_mix_plan,
        "tokenizer_fertility": T.tokenizer_fertility,
        "streaming_pq_codes": SV.streaming_pq_codes,
        "pack_fill_report": EV.pack_fill_report,
        "quality_calibration": EV.quality_calibration,
        "kmeans_assign": CL.kmeans_assign,
        "kmeans_cluster_sizes": CL.cluster_sizes,
        "dedup_semantic": CL.dedup_semantic,
        "cluster_label_purity": EV.cluster_label_purity,
        "triangle_participation": G.triangle_participation,
        "dedup_ngram_jaccard": D.dedup_ngram_jaccard,
        "dedup_embedding_cosine": D.dedup_embedding_cosine,
        "datapump_roundtrip_merge": E.datapump_roundtrip_merge,
        "datapump_roundtrip_orc": E.datapump_roundtrip_orc,
        "embedding_pca_scores": EM.embedding_pca_scores,
        "pagerank_topk": G.pagerank_topk,
        "basket_lift_topk": G.basket_lift_topk,
        "q20_part_promotion": A5.q20_part_promotion,
        "q21_suppliers_kept_waiting": A5.q21_suppliers_kept_waiting,
        "q3_shipping_priority": A.q3_shipping_priority,
        "q4_order_priority": A.q4_order_priority,
        "q5_local_supplier_volume": A.q5_local_supplier_volume,
        "q6_forecast_revenue": A.q6_forecast_revenue,
        "q12_shipping_delay": A.q12_shipping_delay,
        "q14_promo_effect": A.q14_promo_effect,
        "revenue_by_nation": A.revenue_by_nation,
        "top_suppliers_window": A.top_suppliers_window,
        "customer_order_set_ops": A.customer_order_set_ops,
        "distinct_counts": A4.distinct_counts,
        "q10_returned_items": A2.q10_returned_items,
        "q11_important_stock": A2.q11_important_stock,
        "q16_supplier_part_counts": A2.q16_supplier_part_counts,
        "q17_small_quantity_revenue": A2.q17_small_quantity_revenue,
        "q18_large_orders": A2.q18_large_orders,
        "q19_disjunctive_revenue": A2.q19_disjunctive_revenue,
        "q22_global_sales_opportunity": A2.q22_global_sales_opportunity,
        "q7_nation_volume": A3.q7_nation_volume,
        "q13_customer_distribution": A3.q13_customer_distribution,
        "q15_top_supplier": A3.q15_top_supplier,
        "sales_rollup": A2.sales_rollup,
        "shipmode_pivot": A2.shipmode_pivot,
        "price_quantiles": A2.price_quantiles,
        # proven green r04, code unchanged this round
        "table_profile": PF.table_profile,
        "lang_id": T.lang_id,
        "quality_score": T.quality_score,
        "token_count": T.token_count,
        "doc_fingerprint": T.doc_fingerprint,
        "unigram_surprise": T.unigram_surprise,
        "text_normalize": TP.text_normalize,
        "quality_gopher": TP.quality_gopher,
        "contamination_ngram": TP.contamination_ngram,
        "corpus_split": TP.corpus_split,
        "vocab_ngram_counts": TP.vocab_ngram_counts,
        "stratified_sample": SP.stratified_sample,
        "mix_weights": SP.mix_weights,
        "corpus_mix": SP.corpus_mix,
        "price_outliers_by_brand": OU.price_outliers_by_brand,
        "pii_redact": PV.pii_redact,
        "hll_distinct": SK.hll_distinct,
        "cms_heavy_hitters": SK.cms_heavy_hitters,
        "histogram_quantiles": SK.histogram_quantiles,
        "media_features": M.media_features,
        "media_resize": M.media_resize,
        "frame_sample": M.frame_sample,
        "lang_id_confusion": EV.lang_id_confusion,
        "ann_lsh_recall": EV.ann_lsh_recall,
        "doc_chunks": EV.doc_chunks,
        # new in round 8
        "streaming_merge_late": SI.streaming_merge_late,
        "connected_components_sizes": PL11.connected_components_sizes,
        "l_diversity_report": PL11.l_diversity_report,
        "epoch_mix_plan": PL11.epoch_mix_plan,
        "layout_skip_compare": PL12.layout_skip_compare,
        "dedup_method_agreement": PL12.dedup_method_agreement,
        "t_closeness_report": PL12.t_closeness_report,
        "fd_violation_report": PL13.fd_violation_report,
        "benford_price_audit": PL13.benford_price_audit,
        "srm_bucket_audit": PL13.srm_bucket_audit,
        "split_leakage_pairs": PL13.split_leakage_pairs,
        "streaming_merge_delete": SI.streaming_merge_delete,
        "mv_delta_retract": MV.mv_delta_retract,
        "datapump_roundtrip_timetravel": E.datapump_roundtrip_timetravel,
        "mv_join_delta": MV.mv_join_delta,
        "streaming_merge_replay": SI.streaming_merge_replay,
        "part_price_skyline": PL14.part_price_skyline,
        "revenue_trend_ols": PL14.revenue_trend_ols,
        "user_activity_streaks": PL14.user_activity_streaks,
        "cusum_changepoint": PL14.cusum_changepoint,
        "dedup_edit_distance": PL14.dedup_edit_distance,
        "event_path_trigrams": PL14.event_path_trigrams,
        "dedup_prefix_filter_pairs": PL15.dedup_prefix_filter_pairs,
        "category_drift_report": PL15.category_drift_report,
        "clamped_backlog_stats": PL15.clamped_backlog_stats,
        "orderkey_gap_audit": PL15.orderkey_gap_audit,
        "interval_coverage_report": PL16.interval_coverage_report,
        "fifo_lot_attribution": PL16.fifo_lot_attribution,
        "source_unigram_l1_matrix": PL16.source_unigram_l1_matrix,
        "card_est_error_report": PL16.card_est_error_report,
        "join_skew_report": PL17.join_skew_report,
        "hist_est_error_report": PL17.hist_est_error_report,
        "trimmed_price_stats": PL17.trimmed_price_stats,
        "user_state_transitions": PL17.user_state_transitions,
        "k_anon_generalization_ladder": PL18.k_anon_generalization_ladder,
        "session_window_builtin": PL18.session_window_builtin,
        "process_conformance_report": PL18.process_conformance_report,
        "vocab_growth_curve": PL18.vocab_growth_curve,
        "table_checksum_report": PL19.table_checksum_report,
        "business_days_lag_by_priority": PL19.business_days_lag_by_priority,
        "degree_assortativity": PL19.degree_assortativity,
        "hash_partition_balance": PL19.hash_partition_balance,
        "daily_volume_mad_outliers": PL20.daily_volume_mad_outliers,
        "weighted_lag_median_by_priority": PL20.weighted_lag_median_by_priority,
        "cohort_ltv_curve": PL20.cohort_ltv_curve,
        "orders_autocorrelation": PL21.orders_autocorrelation,
        "fk_candidate_scan": PL21.fk_candidate_scan,
        "median_stability_check": PL21.median_stability_check,
        "event_type_venn": PL21.event_type_venn,
        "bucketed_join_rollup": PL22.bucketed_join_rollup,
        "bucket_pruned_lookup": PL22.bucket_pruned_lookup,
        "quantization_error_curve": PL23.quantization_error_curve,
        "truncation_loss_curve": PL23.truncation_loss_curve,
        "dedup_transitivity_audit": PL23.dedup_transitivity_audit,
        "streaming_session_window_native": ST.streaming_session_window_native,
        "slo_burn_report": PL24.slo_burn_report,
        "heavyhitter_turnover": PL24.heavyhitter_turnover,
        "qty_price_correlation_by_brand": PL24.qty_price_correlation_by_brand,
        "otif_by_month": PL24.otif_by_month,
        "datapump_roundtrip_sample": E.datapump_roundtrip_sample,
        "nation_share_of_region": PL25.nation_share_of_region,
        "customer_dormancy_bands": PL25.customer_dormancy_bands,
        "returns_rate_by_brand": PL25.returns_rate_by_brand,
    }
    ordered = {n: base[n] for n in GATED_PREFIX}
    ordered.update({n: f for n, f in base.items() if n not in ordered})
    return ordered


# Round-8 gated prefix (exactly 50): the 22 queries that have never had
# a driver CORRECTNESS row, this round's 4 new operators, the consumers
# of round-8-changed code (graph.py/sketches.py/quality_audit.py ADVICE
# fixes, streaming/incremental.py zero-partition guard + MERGE_ORDER,
# engine.py merge window), then backfill oldest-green-first (r03 rows).
GATED_PREFIX = [
    # never gated (round-7 additions past a full prefix)
    "bloom_join_prune",
    "zonemap_skip_report",
    "selfjoin_size_estimate",
    "mv_delta_maintain",
    "ngram_lm_crossentropy",
    "markov_transition_matrix",
    "streaming_watermark_policy",
    "bfs_reach_layers",
    "hll_set_algebra",
    "k_anonymity_report",
    "data_quality_audit",
    "snapshot_diff",
    "join_order_estimate",
    "embedding_dim_ablation",
    "datapump_roundtrip_query_columns",
    "datapump_roundtrip_departition",
    "datapump_roundtrip_zorder",
    "datapump_roundtrip_csv",
    "dedup_containment_pairs",
    "hard_negative_mining",
    "lm_filter_report",
    "oov_rate_curve",
    # new in round 8
    "streaming_merge_late",
    "connected_components_sizes",
    "l_diversity_report",
    "epoch_mix_plan",
    "layout_skip_compare",
    "dedup_method_agreement",
    "t_closeness_report",
    "fd_violation_report",
    "benford_price_audit",
    "srm_bucket_audit",
    "split_leakage_pairs",
    "streaming_merge_delete",
    "mv_delta_retract",
    "datapump_roundtrip_timetravel",
    "mv_join_delta",
    "streaming_merge_replay",
    # round-8 session-2 additions (never gated)
    "part_price_skyline",
    "revenue_trend_ols",
    "user_activity_streaks",
    "cusum_changepoint",
    "dedup_edit_distance",
    "event_path_trigrams",
    "dedup_prefix_filter_pairs",
    "category_drift_report",
    "clamped_backlog_stats",
    "orderkey_gap_audit",
    # consumers of round-8-changed files sharing the widest changed
    # surface: streaming_merge_apply re-validates the base MERGE path
    # under the MERGE_ORDER/MERGE_DELETE_COL engine rework, and
    # datapump_roundtrip_merge the etl.py merge lifecycle. The other
    # changed-file consumers (hll/cms/histogram on sketches.py,
    # pagerank/triangle on graph.py, roundtrip_supplier on etl.py,
    # merge_evolve/export_cycles on streaming/incremental.py) are
    # displaced past the fold by never-gated queries — each changed
    # code path still has a never-gated prefix query exercising it
    # directly (hll_set_algebra, bfs_reach_layers /
    # connected_components_sizes, roundtrip_timetravel,
    # streaming_merge_late/delete/replay), and the displaced consumers
    # keep tests/test_queries_oracle.py standing evidence at both
    # scales (the documented overflow policy).
    "streaming_merge_apply",
    "datapump_roundtrip_merge",
]


def oracle_sql() -> dict[str, str]:
    return {
        "incremental_export_cycles": SI.INCREMENTAL_EXPORT_CYCLES_SQL,
        "dedup_keep_best": PL.DEDUP_KEEP_BEST_SQL,
        "minhash_band_hitrates": PL.MINHASH_BAND_HITRATES_SQL,
        "host_cap_sample": PL.HOST_CAP_SAMPLE_SQL,
        "filter_ablation_report": PL.FILTER_ABLATION_SQL,
        "hourly_heavy_hitters": PL.HOURLY_HEAVY_HITTERS_SQL,
        "events_anomaly_hours": PL.EVENTS_ANOMALY_HOURS_SQL,
        "dsir_resample_plan": PL.DSIR_RESAMPLE_PLAN_SQL,
        "user_recency_weight": PL.USER_RECENCY_WEIGHT_SQL,
        "zipf_vocab_curve": PL.ZIPF_VOCAB_CURVE_SQL,
        "ngram_novelty_by_source": PL.NGRAM_NOVELTY_BY_SOURCE_SQL,
        "contamination_by_source": PL.CONTAMINATION_BY_SOURCE_SQL,
        "embedding_norm_outliers": PL.EMBEDDING_NORM_OUTLIERS_SQL,
        "attribution_latency_histogram": PL.ATTRIBUTION_LATENCY_HISTOGRAM_SQL,
        "dedup_threshold_curve": PL.DEDUP_THRESHOLD_CURVE_SQL,
        "source_lang_matrix": PL.SOURCE_LANG_MATRIX_SQL,
        "length_decile_bands": PL.LENGTH_DECILE_BANDS_SQL,
        "doc_embedding_coverage": PL2.DOC_EMBEDDING_COVERAGE_SQL,
        "session_length_histogram": PL2.SESSION_LENGTH_HISTOGRAM_SQL,
        "quality_vs_dup_matrix": PL2.QUALITY_VS_DUP_MATRIX_SQL,
        "token_share_by_lang": PL2.TOKEN_SHARE_BY_LANG_SQL,
        "conversion_by_hour": PL2.CONVERSION_BY_HOUR_SQL,
        "shard_balance_report": PL2.SHARD_BALANCE_REPORT_SQL,
        "pq_code_histogram": PL2.PQ_CODE_HISTOGRAM_SQL,
        "events_dow_hour_profile": PL2.EVENTS_DOW_HOUR_PROFILE_SQL,
        "event_transition_gaps": PL3.EVENT_TRANSITION_GAPS_SQL,
        "repeat_purchase_gaps": PL3.REPEAT_PURCHASE_GAPS_SQL,
        "quality_length_moments": PL3.QUALITY_LENGTH_MOMENTS_SQL,
        "prefix_collision_histogram": PL3.PREFIX_COLLISION_HISTOGRAM_SQL,
        "hourly_event_dups": PL3.HOURLY_EVENT_DUPS_SQL,
        "payload_k_band_profile": PL3.PAYLOAD_K_BAND_PROFILE_SQL,
        "orders_backlog_timeline": PL3.ORDERS_BACKLOG_TIMELINE_SQL,
        "mktsegment_yoy": PL3.MKTSEGMENT_YOY_SQL,
        "embedding_dim_profile": PL3.EMBEDDING_DIM_PROFILE_SQL,
        "pq_subspace_error": PL3.PQ_SUBSPACE_ERROR_SQL,
        "source_lang_gini": PL4.SOURCE_LANG_GINI_SQL,
        "pair_jaccard_histogram": PL4.PAIR_JACCARD_HISTOGRAM_SQL,
        "customer_rfm_bands": PL4.CUSTOMER_RFM_BANDS_SQL,
        "nation_fulfillment_lag": PL4.NATION_FULFILLMENT_LAG_SQL,
        "value_anomaly_days": PL4.VALUE_ANOMALY_DAYS_SQL,
        "pq_index_roundtrip": PQ2.ANN_PQ_SQL,
        "peak_concurrent_sessions": PL5.PEAK_CONCURRENT_SESSIONS_SQL,
        "dup_degree_histogram": PL5.DUP_DEGREE_HISTOGRAM_SQL,
        "dup_cross_lang_pairs": PL5.DUP_CROSS_LANG_PAIRS_SQL,
        "order_priority_mix_by_month": PL5.ORDER_PRIORITY_MIX_SQL,
        "part_brand_price_spread": PL5.PART_BRAND_PRICE_SPREAD_SQL,
        "streaming_merge_apply": SI.STREAMING_MERGE_APPLY_SQL,
        "streaming_merge_evolve": SI.STREAMING_MERGE_EVOLVE_SQL,
        "streaming_merge_late": SI.STREAMING_MERGE_LATE_SQL,
        "connected_components_sizes": PL11.CONNECTED_COMPONENTS_SIZES_SQL,
        "l_diversity_report": PL11.L_DIVERSITY_REPORT_SQL,
        "epoch_mix_plan": PL11.EPOCH_MIX_PLAN_SQL,
        "layout_skip_compare": PL12.LAYOUT_SKIP_COMPARE_SQL,
        "dedup_method_agreement": PL12.DEDUP_METHOD_AGREEMENT_SQL,
        "t_closeness_report": PL12.T_CLOSENESS_REPORT_SQL,
        "fd_violation_report": PL13.FD_VIOLATION_REPORT_SQL,
        "benford_price_audit": PL13.BENFORD_PRICE_AUDIT_SQL,
        "srm_bucket_audit": PL13.SRM_BUCKET_AUDIT_SQL,
        "split_leakage_pairs": PL13.SPLIT_LEAKAGE_PAIRS_SQL,
        "streaming_merge_delete": SI.STREAMING_MERGE_DELETE_SQL,
        "mv_delta_retract": MV.MV_DELTA_RETRACT_SQL,
        "mv_join_delta": MV.MV_JOIN_DELTA_SQL,
        "streaming_merge_replay": SI.STREAMING_MERGE_REPLAY_SQL,
        "part_price_skyline": PL14.PART_PRICE_SKYLINE_SQL,
        "revenue_trend_ols": PL14.REVENUE_TREND_OLS_SQL,
        "user_activity_streaks": PL14.USER_ACTIVITY_STREAKS_SQL,
        "cusum_changepoint": PL14.CUSUM_CHANGEPOINT_SQL,
        "dedup_edit_distance": PL14.DEDUP_EDIT_DISTANCE_SQL,
        "event_path_trigrams": PL14.EVENT_PATH_TRIGRAMS_SQL,
        "dedup_prefix_filter_pairs": PL15.DEDUP_PREFIX_FILTER_SQL,
        "category_drift_report": PL15.CATEGORY_DRIFT_REPORT_SQL,
        "clamped_backlog_stats": PL15.CLAMPED_BACKLOG_STATS_SQL,
        "orderkey_gap_audit": PL15.ORDERKEY_GAP_AUDIT_SQL,
        "interval_coverage_report": PL16.INTERVAL_COVERAGE_REPORT_SQL,
        "fifo_lot_attribution": PL16.FIFO_LOT_ATTRIBUTION_SQL,
        "source_unigram_l1_matrix": PL16.SOURCE_UNIGRAM_L1_SQL,
        "card_est_error_report": PL16.CARD_EST_ERROR_SQL,
        "join_skew_report": PL17.JOIN_SKEW_REPORT_SQL,
        "hist_est_error_report": PL17.HIST_EST_ERROR_SQL,
        "trimmed_price_stats": PL17.TRIMMED_PRICE_STATS_SQL,
        "user_state_transitions": PL17.USER_STATE_TRANSITIONS_SQL,
        "k_anon_generalization_ladder": PL18.K_ANON_LADDER_SQL,
        "session_window_builtin": PL18.SESSION_WINDOW_BUILTIN_SQL,
        "process_conformance_report": PL18.PROCESS_CONFORMANCE_SQL,
        "vocab_growth_curve": PL18.VOCAB_GROWTH_CURVE_SQL,
        "table_checksum_report": PL19.TABLE_CHECKSUM_SQL,
        "business_days_lag_by_priority": PL19.BUSINESS_DAYS_LAG_SQL,
        "degree_assortativity": PL19.DEGREE_ASSORTATIVITY_SQL,
        "hash_partition_balance": PL19.HASH_PARTITION_BALANCE_SQL,
        "daily_volume_mad_outliers": PL20.DAILY_MAD_OUTLIERS_SQL,
        "weighted_lag_median_by_priority": PL20.WEIGHTED_LAG_MEDIAN_SQL,
        "cohort_ltv_curve": PL20.COHORT_LTV_CURVE_SQL,
        "orders_autocorrelation": PL21.ORDERS_AUTOCORRELATION_SQL,
        "fk_candidate_scan": PL21.FK_CANDIDATE_SCAN_SQL,
        "median_stability_check": PL21.MEDIAN_STABILITY_SQL,
        "event_type_venn": PL21.EVENT_TYPE_VENN_SQL,
        "bucketed_join_rollup": PL22.BUCKETED_JOIN_ROLLUP_SQL,
        "bucket_pruned_lookup": PL22.BUCKET_PRUNED_LOOKUP_SQL,
        "quantization_error_curve": PL23.QUANTIZATION_ERROR_CURVE_SQL,
        "truncation_loss_curve": PL23.TRUNCATION_LOSS_CURVE_SQL,
        "dedup_transitivity_audit": PL23.DEDUP_TRANSITIVITY_SQL,
        "streaming_session_window_native": ST.STREAMING_SESSION_WINDOW_SQL,
        "slo_burn_report": PL24.SLO_BURN_REPORT_SQL,
        "heavyhitter_turnover": PL24.HEAVYHITTER_TURNOVER_SQL,
        "qty_price_correlation_by_brand": PL24.QTY_PRICE_CORRELATION_SQL,
        "otif_by_month": PL24.OTIF_BY_MONTH_SQL,
        "datapump_roundtrip_sample": E.ROUNDTRIP_SAMPLE_SQL,
        "nation_share_of_region": PL25.NATION_SHARE_OF_REGION_SQL,
        "customer_dormancy_bands": PL25.CUSTOMER_DORMANCY_SQL,
        "returns_rate_by_brand": PL25.RETURNS_RATE_BY_BRAND_SQL,
        "datapump_roundtrip_timetravel": E.ROUNDTRIP_TIMETRAVEL_SQL,
        "streaming_scd2_enrich": SJ.STREAMING_SCD2_ENRICH_SQL,
        "nation_revenue_hhi": PL6.NATION_REVENUE_HHI_SQL,
        "user_activity_hhi": PL6.USER_ACTIVITY_HHI_SQL,
        "value_quartiles_by_type": PL6.VALUE_QUARTILES_BY_TYPE_SQL,
        "order_width_histogram": PL6.ORDER_WIDTH_HISTOGRAM_SQL,
        "pii_hit_rates": PL7.PII_HIT_RATES_SQL,
        "session_funnel_rates": PL7.SESSION_FUNNEL_RATES_SQL,
        "dau_wau_stickiness": PL7.DAU_WAU_STICKINESS_SQL,
        "simhash_pair_hamming": PL7.SIMHASH_PAIR_HAMMING_SQL,
        "rolling_retention_7d": PL8.ROLLING_RETENTION_7D_SQL,
        "dedup_token_savings": PL8.DEDUP_TOKEN_SAVINGS_SQL,
        "ship_lag_quartiles_by_priority": PL8.SHIP_LAG_QUARTILES_SQL,
        "weekly_new_vs_returning": PL9.WEEKLY_NEW_VS_RETURNING_SQL,
        "events_interarrival_moments": PL9.EVENTS_INTERARRIVAL_MOMENTS_SQL,
        "cold_start_users": PL9.COLD_START_USERS_SQL,
        "revenue_pareto_bands": PL9.REVENUE_PARETO_BANDS_SQL,
        "bloom_join_prune": RF.BLOOM_JOIN_PRUNE_SQL,
        "zonemap_skip_report": RF.ZONEMAP_SKIP_REPORT_SQL,
        "selfjoin_size_estimate": RF.SELFJOIN_SIZE_ESTIMATE_SQL,
        "mv_delta_maintain": MV.MV_DELTA_MAINTAIN_SQL,
        "ngram_lm_crossentropy": LM.NGRAM_LM_CROSSENTROPY_SQL,
        "markov_transition_matrix": LM.MARKOV_TRANSITION_MATRIX_SQL,
        "streaming_watermark_policy": WM.STREAMING_WATERMARK_POLICY_SQL,
        "bfs_reach_layers": G.BFS_REACH_LAYERS_SQL,
        "hll_set_algebra": SK.HLL_SET_ALGEBRA_SQL,
        "k_anonymity_report": PV.K_ANONYMITY_REPORT_SQL,
        "data_quality_audit": QA.DATA_QUALITY_AUDIT_SQL,
        "snapshot_diff": QA.SNAPSHOT_DIFF_SQL,
        "join_order_estimate": QA.JOIN_ORDER_ESTIMATE_SQL,
        "embedding_dim_ablation": S.EMBEDDING_DIM_ABLATION_SQL,
        "datapump_roundtrip_query_columns": E.ROUNDTRIP_QUERY_COLUMNS_SQL,
        "datapump_roundtrip_remap_data": E.ROUNDTRIP_REMAP_DATA_SQL,
        "datapump_roundtrip_compact": E.ROUNDTRIP_COMPACT_SQL,
        "datapump_roundtrip_departition": E.ROUNDTRIP_DEPARTITION_SQL,
        "datapump_roundtrip_zorder": E.ROUNDTRIP_ZORDER_SQL,
        "datapump_roundtrip_csv": E.ROUNDTRIP_CSV_SQL,
        "dedup_containment_pairs": PL10.DEDUP_CONTAINMENT_PAIRS_SQL,
        "hard_negative_mining": PL10.HARD_NEGATIVE_MINING_SQL,
        "lm_filter_report": PL10.LM_FILTER_REPORT_SQL,
        "oov_rate_curve": PL10.OOV_RATE_CURVE_SQL,
        "q1_pricing_summary": A.Q1_SQL,
        "q3_shipping_priority": A.Q3_SQL,
        "q4_order_priority": A.Q4_SQL,
        "q5_local_supplier_volume": A.Q5_SQL,
        "q6_forecast_revenue": A.Q6_SQL,
        "q12_shipping_delay": A.Q12_SQL,
        "q14_promo_effect": A.Q14_SQL,
        "revenue_by_nation": A.REVENUE_BY_NATION_SQL,
        "top_suppliers_window": A.TOP_SUPPLIERS_SQL,
        "customer_order_set_ops": A.SET_OPS_SQL,
        "events_hourly_rollup": A.EVENTS_HOURLY_SQL,
        "events_sessionize": A.EVENTS_SESSIONIZE_SQL,
        "events_json_stats": A4.EVENTS_JSON_SQL,
        "distinct_counts": A4.DISTINCT_COUNTS_SQL,
        "q10_returned_items": A2.Q10_SQL,
        "q11_important_stock": A2.Q11_SQL,
        "q16_supplier_part_counts": A2.Q16_SQL,
        "q17_small_quantity_revenue": A2.Q17_SQL,
        "q18_large_orders": A2.Q18_SQL,
        "q19_disjunctive_revenue": A2.Q19_SQL,
        "q22_global_sales_opportunity": A2.Q22_SQL,
        "q7_nation_volume": A3.Q7_SQL,
        "q9_product_profit": A3.Q9_SQL,
        "q13_customer_distribution": A3.Q13_SQL,
        "q15_top_supplier": A3.Q15_SQL,
        "q2_min_cost_supplier": A5.Q2_SQL,
        "q8_market_share": A5.Q8_SQL,
        "q20_part_promotion": A5.Q20_SQL,
        "q21_suppliers_kept_waiting": A5.Q21_SQL,
        "sales_rollup": A2.SALES_ROLLUP_SQL,
        "sales_cube": A5.SALES_CUBE_SQL,
        "skew_salted_revenue": A5.SKEW_SALTED_REVENUE_SQL,
        "funnel_conversion": A5.FUNNEL_SQL,
        "shipmode_pivot": A2.SHIPMODE_PIVOT_SQL,
        "price_quantiles": A2.PRICE_QUANTILES_SQL,
        "datapump_roundtrip_nation": E.ROUNDTRIP_NATION_SQL,
        "datapump_roundtrip_supplier": E.ROUNDTRIP_SUPPLIER_SQL,
        "datapump_roundtrip_merge": E.ROUNDTRIP_MERGE_SQL,
        "datapump_roundtrip_orc": E.ROUNDTRIP_ORC_SQL,
        "lang_id_confusion": EV.LANG_ID_CONFUSION_SQL,
        "cluster_label_purity": EV.CLUSTER_LABEL_PURITY_SQL,
        "dedup_rate_by_source": EV.DEDUP_RATE_BY_SOURCE_SQL,
        "ann_lsh_recall": EV.ANN_LSH_RECALL_SQL,
        "corpus_shard_plan": EV.CORPUS_SHARD_PLAN_SQL,
        "pack_plan": EV.PACK_PLAN_SQL,
        "repetition_ngram_fracs": T.REPETITION_NGRAM_SQL,
        "curriculum_order": EV.CURRICULUM_ORDER_SQL,
        "streaming_dedup_unique": SD.STREAMING_DEDUP_UNIQUE_SQL,
        "doc_chunks": EV.DOC_CHUNKS_SQL,
        "embedding_pca_scores": EM.EMBEDDING_PCA_SQL,
        "streaming_rollup_closed": SD.STREAMING_ROLLUP_CLOSED_SQL,
        "streaming_sessions_closed": ST.STREAMING_SESSIONS_CLOSED_SQL,
        "streaming_attribution_pairs": SJ.STREAMING_ATTRIBUTION_SQL,
        "streaming_cms_cells": SK2.STREAMING_CMS_CELLS_SQL,
        "source_token_budget": EV.SOURCE_TOKEN_BUDGET_SQL,
        "dedup_group_size_histogram": EV.DEDUP_GROUP_HIST_SQL,
        "join_key_skew_profile": EV.JOIN_KEY_SKEW_SQL,
        "dedup_exact": D.DEDUP_EXACT_SQL,
        "dedup_minhash_pairs": D.DEDUP_MINHASH_SQL,
        "dedup_minhash_verified": D.DEDUP_MINHASH_VERIFIED_SQL,
        "simhash_fingerprints": D.SIMHASH_SQL,
        "dedup_ngram_jaccard": D.DEDUP_JACCARD_SQL,
        "dedup_embedding_cosine": D.DEDUP_COSINE_SQL,
        "dedup_groups": D.DEDUP_GROUPS_SQL,
        "embedding_normalize": EM.EMBEDDING_NORMALIZE_SQL,
        "embedding_quantize": EM.EMBEDDING_QUANTIZE_SQL,
        "ann_bruteforce_topk": S.ANN_BRUTEFORCE_SQL,
        "ann_lsh_topk": S.ANN_LSH_SQL,
        "centroid_topk": S.CENTROID_SQL,
        "kmeans_assign": CL.KMEANS_SQL,
        "kmeans_cluster_sizes": CL.CLUSTER_SIZES_SQL,
        "dedup_semantic": CL.DEDUP_SEMANTIC_SQL,
        "asof_attribution": TM.ASOF_ATTRIBUTION_SQL,
        "scd2_user_value": TM.SCD2_SQL,
        "cohort_retention": TM.COHORT_RETENTION_SQL,
        "gapfill_hourly": TM.GAPFILL_HOURLY_SQL,
        "table_profile": PF.TABLE_PROFILE_SQL,
        "range_join_nearby": TM.RANGE_JOIN_NEARBY_SQL,
        "rolling_window_activity": TM.ROLLING_WINDOW_SQL,
        "lang_id": T.LANG_ID_SQL,
        "quality_score": T.QUALITY_SQL,
        "token_count": T.TOKEN_COUNT_SQL,
        "doc_fingerprint": T.FINGERPRINT_SQL,
        "text_normalize": TP.TEXT_NORMALIZE_SQL,
        "quality_gopher": TP.QUALITY_GOPHER_SQL,
        "contamination_ngram": TP.CONTAMINATION_SQL,
        "corpus_split": TP.CORPUS_SPLIT_SQL,
        "vocab_ngram_counts": TP.VOCAB_NGRAM_SQL,
        "stratified_sample": SP.STRATIFIED_SAMPLE_SQL,
        "mix_weights": SP.MIX_WEIGHTS_SQL,
        "corpus_mix": SP.CORPUS_MIX_SQL,
        "price_outliers_by_brand": OU.PRICE_OUTLIERS_SQL,
        "pii_redact": PV.PII_REDACT_SQL,
        "hll_distinct": SK.HLL_DISTINCT_SQL,
        "cms_heavy_hitters": SK.CMS_HEAVY_HITTERS_SQL,
        "pagerank_topk": G.PAGERANK_SQL,
        "retrieval_eval_mrr": EV.RETRIEVAL_EVAL_MRR_SQL,
        "ann_ivfpq_topk": PQ2.ANN_IVFPQ_SQL,
        "ann_pq_recall": PQ2.ANN_PQ_RECALL_SQL,
        "bigram_surprise": T.BIGRAM_SURPRISE_SQL,
        "source_quality_report": EV.SOURCE_QUALITY_REPORT_SQL,
        "budget_mix_plan": EV.BUDGET_MIX_PLAN_SQL,
        "contrastive_pairs": D.CONTRASTIVE_PAIRS_SQL,
        "tokenizer_fertility": T.TOKENIZER_FERTILITY_SQL,
        "source_overlap_matrix": D.SOURCE_OVERLAP_MATRIX_SQL,
        "streaming_pq_codes": SV.STREAMING_PQ_CODES_SQL,
        "curated_corpus_v3": CU.CURATED_V3_SQL,
        "pack_fill_report": EV.PACK_FILL_REPORT_SQL,
        "minhash_estimate_accuracy": D.MINHASH_ESTIMATE_ACCURACY_SQL,
        "quality_calibration": EV.QUALITY_CALIBRATION_SQL,
        "span_dup_score": SX.SPAN_DUP_SQL,
        "tfidf_search_topk": SX.TFIDF_SEARCH_SQL,
        "bm25_search_topk": SX.BM25_SEARCH_SQL,
        "dsir_importance": TP.DSIR_IMPORTANCE_SQL,
        "embedding_pq_codes": PQ2.EMBEDDING_PQ_CODES_SQL,
        "ann_pq_topk": PQ2.ANN_PQ_SQL,
        "histogram_quantiles": SK.HISTOGRAM_QUANTILES_SQL,
        "triangle_participation": G.TRIANGLE_SQL,
        "basket_lift_topk": G.BASKET_LIFT_SQL,
        "unigram_surprise": T.UNIGRAM_SURPRISE_SQL,
        "media_features": M.MEDIA_FEATURES_SQL,
        "media_resize": M.MEDIA_RESIZE_SQL,
        "frame_sample": M.FRAME_SAMPLE_SQL,
        "curated_corpus": CU.CURATED_SQL,
        "curated_corpus_v2": CU.CURATED_V2_SQL,
    }
