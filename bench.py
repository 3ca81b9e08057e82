#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", ..., "queries": {...}}

Execution model: ONE JVM (the historical contract), with per-query
cache-clear + RDD-unpersist + full GC between queries. A round-6
controlled experiment (same code, same data, back-to-back) compared
this against SPARK_GRAFT_BENCH_BATCHES=4 fresh JVMs (round-robin
slices): batching was 1.14x SLOWER overall (each child pays cold-JIT
warm-up; the inter-query GC already prevents accumulation), so the
single-JVM contract stands. The batching machinery is kept for future
diagnosis via SPARK_GRAFT_BENCH_BATCHES=N.

The full result (per-query medians, spread, GC-time deltas, JVM heap,
per-query ratio vs BASELINE-QUERIES.md) is also written to
BENCH_FULL.json next to this file; the stdout JSON line keeps the
"queries" dict LAST so a tail-truncated capture still retains it.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Queries deliberately NOT benchmarked (must still exist in queries()).
# tests/test_bench_contract.py enforces: every queries() entry is either
# in HEADLINE or listed here with a reason.
EXCLUDED = {
    # availableNow streaming: per-run micro-batch startup cost (~5-10s of
    # fixed overhead per cycle) would swamp the batch-throughput signal
    "streaming_rollup_closed": "streaming availableNow startup dominates",
    "streaming_sessions_closed": "streaming availableNow startup dominates",
    "streaming_session_window_native": "three availableNow cycles whose fixed streaming startup dominates (streaming_sessions_closed excluded for the same reason; the per-batch work is one user-keyed session_window aggregate)",
    "streaming_attribution_pairs": "streaming availableNow startup dominates",
    "streaming_cms_cells": "streaming availableNow startup dominates",
    "streaming_dedup_unique": "streaming availableNow startup dominates",
    "streaming_pq_codes": "streaming availableNow startup dominates",
    "incremental_export_cycles": "two streaming export cycles + filesystem checkpointing",
    "streaming_merge_evolve": "same EXPORT->IMPORT(MERGE) cycle harness as streaming_merge_apply (benched), plus one widened batch",
    "streaming_watermark_policy": "four streaming availableNow cycles (2 policies x 2 arrival files); startup dominates",
    # r7 shape-dedup of the new batch
    "selfjoin_size_estimate": "same groupBy(key)->global-agg shape as join_key_skew_profile (benched)",
    "ngram_lm_crossentropy": "same tokenize+bigram-count dominant shape as bigram_surprise (benched); adds only broadcast scoring joins",
    "markov_transition_matrix": "same user-keyed lag-window dominant shape as event_transition_gaps (benched); matmul stage is over a <=|types|^2 matrix",
    "hll_set_algebra": "same register-table HLL shape as hll_distinct (benched); merge arms are <=2*512 rows",
    "k_anonymity_report": "same count-of-counts histogram shape as order_width_histogram (excluded for session_length_histogram, benched)",
    "join_order_estimate": "exact arms are the same FK-join-count shape as the TPC-H joins (benched); estimate arms are per-table stats",
    "datapump_roundtrip_query_columns": "same single-table export->DuckDB-import lifecycle as supplier roundtrip (benched); QUERY/COLUMNS add a filter+project to the same plan",
    # r8 additions riding benched shapes
    "t_closeness_report": "same QI-grid + count-of-counts shape as k_anonymity_report / l_diversity_report (family excluded; session_length_histogram benched)",
    "fd_violation_report": "per-rule groupBy+countDistinct profiling sweep; same distinct-agg-per-table shape as table_profile (benched)",
    "benford_price_audit": "row-local digit extract + <=9-row agg over the orders scan; same scan-bound micro-agg family as distinct_counts (excluded, subsumed by hll_distinct benched)",
    "srm_bucket_audit": "distinct-users + 2-row agg; subsumed by hll_distinct (benched) scan shape",
    "split_leakage_pairs": "rides the verified-pair memo + row-local split hash; same broadcast-pair-join shape as simhash_pair_hamming (benched)",
    "streaming_merge_delete": "same EXPORT->IMPORT(MERGE) cycle harness as streaming_merge_apply (benched), plus a tombstone filter",
    "mv_delta_retract": "same partial-state union+re-agg shape as mv_delta_maintain (benched), with negated delta states",
    "datapump_roundtrip_timetravel": "same export->DuckDB-import lifecycle as supplier roundtrip (benched) plus a second incremental cycle; the AS_OF read is a file-list narrowing",
    "datapump_roundtrip_merge_pruned": "same export->import(MERGE) lifecycle as datapump_roundtrip_merge (benched) plus an 8-file range-clustered base write; the prune makes the merge strictly cheaper than the benched full rewrite",
    "datapump_roundtrip_encrypted": "same export->import lifecycle as datapump_roundtrip_supplier (benched) plus AES-GCM encrypt/decrypt and two deliberately-failing negative imports; timing is dominated by the 3 job lifecycles, not a query plan",
    "datapump_roundtrip_encrypted_columns": "same 2-job lifecycle as datapump_roundtrip_encrypted (EXCLUDED) with column-subset keys; timing is job machinery + driver-side DuckDB keyless probes, not a query plan",
    "datapump_roundtrip_merge_pruned_ordered": "same lifecycle shape as datapump_roundtrip_merge_pruned (EXCLUDED for the same reason): an 8-file range-clustered base write dominates; the composed MERGE is strictly the benched merge path plus a window order",
    "mv_topk_delta": "two keyed aggregates and a 10-row window — same incremental-MV shape as mv_delta_maintain (benched) with strictly less work",
    "fellegi_sunter_weights": "rides the verified-pair memo (model-scale) + four histogram aggregates over documents; same memo-join family as split_leakage_pairs (EXCLUDED), dominant cost is dedup_minhash_verified, exercised via benched consumers",
    "blocking_quality_report": "three partial-aggregated groupBys over documents reduced to one row — same shape as table_profile/shard_balance_report (benched)",
    "scd2_build_intervals": "two same-partitioning windows over events — strictly less work than the benched peak_concurrent_sessions window stack",
    "golden_record_fusion": "one groupBy over the memoized verified-pair groups (model-scale input); the dominant cost is dedup_groups, already exercised via benched consumers",
    "label_centroid_similarity": "explode + K-dim centroid groupBy + K^2 pair join over a 500-row embeddings fixture — model-scale; embedding_pca_scores (benched) covers the explode-heavy shape",
    "bpe_merge_candidates": "row-local char-pair explode + one count groupBy — same shape as vocab_ngram_counts (benched)",
    "bpe_encode_curve": "k tiny rounds over the Zipf-bounded word-count table; the dominant cost is the initial word-count groupBy — same shape as vocab_ngram_counts (benched) / bpe_merge_candidates (EXCLUDED)",
    "unigram_encode_fertility": "two Viterbi training passes over the Zipf-bounded word table (24 localCheckpoint barriers dominate); same iterative model-fit family as unigram_lm_em_step (EXCLUDED)",
    "unigram_lm_em_step": "12-round iterative Viterbi loop over the Zipf-bounded word table (localCheckpoint barriers dominate, not a query plan); same iterative model-fit family as bpe_encode_curve (EXCLUDED)",
    "skipgram_negative_table": "one token-count groupBy + a 100-row rank window — same shape as vocab_ngram_counts/zipf_vocab_curve (benched)",
    "churn_training_set": "single user-keyed conditional aggregate over events — strictly less work than the benched dau_wau_stickiness",
    "ann_ivf_nprobe_curve": "three probe-filtered IVF-PQ scans + one exact baseline — each arm is the benched ann_ivfpq_topk shape; the sweep adds no new physical pattern",
    "datapump_roundtrip_views_as_tables": "source-engine view materialization + the benched export/import lifecycle shape (datapump_roundtrip_supplier); the view body runs in DuckDB, not Spark",
    "datapump_roundtrip_reimport_skip": "one import + one deliberate no-op re-import — strictly less work than the benched datapump_roundtrip_merge",
    "image_decode_features": "same synth-generate + mapInPandas decode shape as audio_decode_features (benched), smaller payloads",
    "image_decode_features_png": "same synth-generate + mapInPandas decode shape as audio_decode_features (benched); adds per-row zlib inflate over <200-byte payloads",
    "image_decode_features_jpeg": "same synth-generate + mapInPandas decode shape as audio_decode_features (benched); the pure-Python entropy decode is per-row bounded (<=12 DC-only blocks/doc) but slower per byte than the benched WAV path",
    "video_decode_features": "same synth-generate + mapInPandas decode shape as audio_decode_features (benched); per-row cost is <=6 MJPEG frames of DC-only blocks",
    "ab_test_report": "one events scan to a per-user flag then 2-row arm aggregates; same scan-bound micro-agg family as srm_bucket_audit (excluded, hll_distinct benched)",
    "events_changepoint_scan": "same per-type daily-count aggregate + tiny-window shape as events_anomaly_hours (benched); the CUSUM windows run over a <=|types x days| frame",
    "events_runs_test": "same per-type daily rollup + lag-window shape as events_changepoint_scan (EXCLUDED; family anchor events_anomaly_hours benched); the runs reduce is over a <=|types| frame",
    "kendall_tau_daily": "day-level rollup then an O(days^2) join over the tiny aggregate — same rollup-dominated family as events_changepoint_scan (EXCLUDED); the orders scan shape is q1_pricing_summary (benched)",
    "spearman_rho_daily": "same day-level rollup family as kendall_tau_daily (EXCLUDED); two windows over the <=|days| aggregate",
    "dow_seasonality_chi2": "same per-type small-bucket rollup family as events_anomaly_hours (benched); the chi-square reduce is over <=|types x 7| rows",
    "gini_source_chars": "per-source rollup (<=20 rows) + one tiny window — same source-aggregate family as source_quality_report (benched)",
    "cross_source_dup_matrix": "two doc_id->source joins over the memoized verified-pair table + a <=|sources|^2 groupBy; the dominant cost (LSH verify) is benched via dedup_minhash_verified",
    "user_type_entropy_bands": "two user-keyed partial-aggregated groupBys + a tiny histogram — same shape as dau_wau_stickiness (benched)",
    "dedup_pair_degree_histogram": "rides the memoized verified-pair table like dedup_group_size_histogram; one union + two tiny groupBys — the dominant cost (LSH verify) is benched via dedup_minhash_verified",
    "dedup_savings_report": "one groupBy over the memoized dedup_groups labels (dominant cost benched via connected_components_sizes); the ROI reduce is over |groups| rows",
    "template_prefix_histogram": "row-local prefix extract + count-of-counts — same shape as session_length_histogram (benched) / k_anonymity_report (EXCLUDED)",
    "span_corruption_plan": "row-local integer arithmetic over the token count — same scan-bound projection shape as token_count (benched)",
    "training_shuffle_plan": "row-local epoch-salted hash + two partial-aggregated groupBys over a 3x-broadcast-exploded documents scan — same shape as source_lang_matrix (benched)",
    "embedding_dim_energy_curve": "posexplode + 64-row per-dimension aggregate — same shape as sq8_quant_error / pq_subspace_error (family benched); the cumulative window runs over 64 rows",
    "events_value_trend": "same per-type daily aggregate + tiny reduction shape as events_changepoint_scan (EXCLUDED; family anchor events_anomaly_hours benched)",
    "streaming_dedup_compacted": "same two availableNow drains as streaming_dedup_incremental (benched) plus a coalesce compaction of the band index between them; the added cost is streaming restart machinery, not a new query shape",
    "datapump_roundtrip_dedup_export": "two export lifecycles + one import over a 9/8-size staged orders copy; the added keep-best window is one key shuffle, same family as the benched datapump_roundtrip_merge",
    "datapump_roundtrip_policy_stack": "same staged-export lifecycle as datapump_roundtrip_dedup_export (EXCLUDED); the composed SAMPLE/DEDUP/REMAP stack adds row-local filters to the same plan",
    "datapump_roundtrip_checksum": "three job lifecycles (one deliberately failing) + two distributed digest passes over a 4-file dump; same lifecycle-dominated family as datapump_roundtrip_encrypted (EXCLUDED)",
    "datapump_roundtrip_sqlite": "same export->import lifecycle shape as datapump_roundtrip_supplier (benched) with a driver-side SQLite seed; the partitioned rowid-range read is the plan of interest and is pinned by sentinel, not timing",
    "datapump_roundtrip_stop_restart": "five job lifecycles (two deliberately stopped) + digest recheck passes over 3 tiny tables; lifecycle machinery dominates, same family as datapump_roundtrip_checksum (EXCLUDED)",
    "datapump_roundtrip_transfer_restart": "four transfer lifecycles (two deliberately stopped) + target fingerprint rechecks over 3 tiny tables; same lifecycle-machinery family as datapump_roundtrip_stop_restart (EXCLUDED)",
    "datapump_roundtrip_import_restart": "five job lifecycles (two deliberately stopped) + target fingerprint rechecks over 3 tiny tables; same lifecycle-machinery family as datapump_roundtrip_stop_restart (EXCLUDED)",
    "datapump_roundtrip_filesize": "same export->verify->import lifecycle as datapump_roundtrip_checksum (EXCLUDED); the maxRecordsPerFile cap adds no plan shape, it splits the write",
    "datapump_roundtrip_network_link": "three job lifecycles (dump path + link path) plus a two-way exceptAll identity check; lifecycle machinery dominates, same family as datapump_roundtrip_checksum (EXCLUDED)",
    "datapump_roundtrip_partition_scoped": "a partitionBy staging write + two job lifecycles; the scoped scan itself reads ONE hive leaf (pinned by sentinel, not timing) — same lifecycle family as datapump_roundtrip_checksum (EXCLUDED)",
    "markov_top1_accuracy": "same user-keyed lag-window dominant shape as event_transition_gaps (benched); the argmax/accuracy stage runs over a <=|types|^2 aggregate",
    "bigram_lift_topk": "same tokenize+bigram-count dominant shape as bigram_surprise (benched); adds only marginal joins over the Zipf-bounded aggregate",
    "sq8_quant_error": "same posexplode + per-dim aggregate shape as pq_subspace_error (benched), with row-local integer arithmetic instead of codebook joins",
    "repurchase_hazard_table": "same customer-keyed lag-window shape as repeat_purchase_gaps (benched); the hazard window runs over a <=|weeks| aggregate",
    "fd_discovery_scan": "six independent 2-column distinct+groupBy scans — same shape as the benched table_profile/fk_candidate_scan family",
    "source_percentile_bands": "one source-partitioned NTILE window + a groupBy — strictly less work than the benched length_decile_bands",
    "rrf_fusion_topk": "builds BOTH benched inverted indexes (tfidf_search_topk + bm25_search_topk) then fuses two tiny topk lists — the fusion layer adds a |q|x2k union+window",
    "dedup_bcubed_eval": "rides the benched dedup_groups label propagation + one md5 groupBy and three small joins",
    "attribution_u_shaped": "two user-keyed window passes over events — same shape as the benched asof_attribution/event_transition_gaps",
    "stratified_kfold_plan": "single hash-mod groupBy over orders plus a 5-row broadcast — lighter than the benched stratified_sample",
    "mv_distinct_delta": "two groupBy passes over orders (refcount state + recompute) — same keyed-agg shape as the benched mv_delta_maintain family",
    "neyman_allocation_plan": "single integer-moment groupBy over orders plus a 5-row normalization; strictly lighter than the benched trimmed_price_stats",
    "purge_impact_report": "two semi-join levels (orders on custkey, lineitem on orderkey) — same shape as the benched bloom_join_prune/snapshot_diff joins",
    "streaming_merge_late_delete": "same EXPORT->IMPORT(MERGE) cycle harness as streaming_merge_apply (benched), reversed arrivals plus a tombstone filter (the late+delete composition)",
    "streaming_merge_late": "same EXPORT->IMPORT(MERGE) cycle harness as streaming_merge_apply (benched), reversed arrival order",
    "streaming_merge_replay": "same EXPORT->IMPORT(MERGE) cycle harness as streaming_merge_apply (benched), plus one checkpoint-loss replay cycle",
    "revenue_trend_ols": "same broadcast-dim join + month groupBy shape as mktsegment_yoy / order_priority_mix_by_month (benched); the OLS moment algebra runs over <=|nation x month| aggregated rows",
    "user_activity_streaks": "same user-keyed ordered-window shuffle as events_sessionize (benched); the islands arithmetic and streak histogram are over per-user day counts",
    "cusum_changepoint": "same per-key cumulative-window shape as orders_backlog_timeline (benched); the argmax rank runs over <=|nation x day| aggregated rows",
    "event_path_trigrams": "same sessionizer shuffle + lead windows as session_funnel_rates / event_transition_gaps (benched); trigram agg collapses to <=|event_types|^3 rows",
    "category_drift_report": "one events scan + <=|event_types|x2 groupBy + broadcast totals; subsumed by conversion_by_hour (benched) scan shape",
    "clamped_backlog_stats": "same per-key cumulative-window shape as orders_backlog_timeline (benched) with one extra running-min window over the same aggregated rows",
    "orderkey_gap_audit": "same range-partition global-rank machinery as corpus_shard_plan (benched); the gap arithmetic is one narrow rank-keyed self-join",
    "interval_coverage_report": "same per-key boundary-event cumsum windows as orders_backlog_timeline (benched) after the lineitem groupBy+join that fifo_lot_attribution (benched) also pays",
    "source_unigram_l1_matrix": "same token-explode + groupBy(source, tok) shuffle as ngram_novelty_by_source / source_lang_matrix (benched); the V x S share grid and pair matrix are broadcast-sized",
    "card_est_error_report": "one conditional-aggregation scan of orders; strictly cheaper than table_profile's distinct-agg sweep (benched)",
    "l_diversity_report": "same QI-groupBy + count-of-counts shape as k_anonymity_report (excluded for order_width_histogram's family; session_length_histogram benched)",
    "epoch_mix_plan": "same per-source token-sum + broadcast-total shape as source_token_budget (benched); mixture arithmetic is over <=|sources| rows",
    # pipeline10 (r7 buzzer-beater batch, classified r8)
    "hard_negative_mining": "rides the verified-pair memo + same tokenize/BM25-score shape as bm25_search_topk (benched)",
    "lm_filter_report": "same tokenize+bigram-count dominant shape as bigram_surprise (benched); adds only a broadcast per-doc perplexity band",
    "oov_rate_curve": "one token-frequency table, same vocab-count shape as zipf_vocab_curve (benched); size arms are cheap re-aggregations",
    "datapump_roundtrip_csv": "same single-table export->DuckDB-import lifecycle as supplier roundtrip (benched) through the CSV interchange format over 25-row nation",
    "datapump_roundtrip_remap_data": "same single-table export->DuckDB-import lifecycle as supplier roundtrip (benched); the REMAP_DATA rewrites are two row-local projections in the same export plan",
    "join_skew_report": "two |keys|-sized groupBy counts + one-row reduces; same key-count shape as hourly_heavy_hitters / distinct_counts (benched)",
    "hist_est_error_report": "two narrow scans of orders.o_totalprice + broadcast bucket arithmetic; same single-column orders scan family as price_quantiles (benched)",
    "user_state_transitions": "distinct (user, week) + user-keyed self-join; same first-seen-cohort shuffle family as weekly_new_vs_returning (benched)",
    "k_anon_generalization_ladder": "ONE rollup aggregate over 3 customer QI columns + a <=|groups| reduce; strictly lighter than fd_violation_report's per-rule sweep (its anchor table_profile is benched)",
    "process_conformance_report": "same user-keyed sessionizer shuffle + per-session windows as session_funnel_rates (benched); the three rule arms are conditional sums over the sessionized frame",
    "vocab_growth_curve": "same token-explode + groupBy(tok) shuffle as zipf_vocab_curve (benched); the rank join and doubling-step curve run over vocabulary-sized frames",
    "business_days_lag_by_priority": "same orders x lineitem join + <=|priorities| groupBy as ship_lag_quartiles_by_priority (benched); the weekday arithmetic is row-local",
    "degree_assortativity": "same distinct-edge groupBy + degree-join shape as basket_lift_topk / connected_components (benched/gated); the moment reduce is one row",
    "hash_partition_balance": "two distinct-key groupBys + md5 bucketing, strictly lighter than table_checksum_report (benched) which hashes FULL rows of three tables",
    "datapump_roundtrip_compact": "same single-table export->DuckDB-import lifecycle as supplier roundtrip (benched) plus one coalesce rewrite of a 4-file supplier dump",
    "daily_volume_mad_outliers": "one events scan to a <=|types x days| groupBy; the median/MAD rank windows run over those aggregated rows (same family as value_quartiles_by_type, benched)",
    "weighted_lag_median_by_priority": "same orders x lineitem join + <=|priority x lag| aggregation as ship_lag_quartiles_by_priority (benched); the weighted-median windows run over aggregated rows",
    "cohort_ltv_curve": "same first-seen cohort shuffle as cohort_retention / weekly_new_vs_returning (benched); the curve windows run over <=|cohorts x ages| rows",
    "orders_autocorrelation": "one orders scan to a <=|days| groupBy; the dense-axis explode, lag windows and moment reduces run over calendar-sized frames (same scan family as orders_backlog_timeline, benched)",
    "fk_candidate_scan": "four distinct-key groupBys + |keys|-sized left joins; same distinct-agg sweep family as table_profile / fd_violation_report (table_profile benched)",
    "median_stability_check": "one orders scan unioned into three parity arms; the cumulative-count median windows run over (arm, distinct-price) aggregated rows (same family as price_quantiles, benched)",
    "event_type_venn": "one events scan -> per-user bool_or groupBy -> 8-row mask groupBy; strictly lighter than dau_wau_stickiness (benched) on the same user-keyed shuffle",
    "bucket_pruned_lookup": "one bucketed catalog write + a 1-of-8-buckets pruned point read; the write rides bucketed_join_rollup's (benched) identical bucketBy path",
    "quantization_error_curve": "two passes over the exploded embedding coordinates (max + one conditional agg for all bit widths); same explode shape as embedding_dim_profile / embedding_quantize (benched)",
    "truncation_loss_curve": "one row-local size(tokens) scan of documents with conditional sums; strictly lighter than token_count (benched)",
    "dedup_transitivity_audit": "rides the verified-pair memo (dedup_minhash_verified benched); wedge enumeration is an edge-list self-join over the sparse near-dup graph",
    "slo_burn_report": "same orders x lineitem join + <=|months| groupBy as otif_by_month / ship_lag_quartiles_by_priority (benched); the budget windows run over month rows",
    "heavyhitter_turnover": "one lineitem scan to a (part, era) groupBy + two 50-row TakeOrdered leaderboards; same scan family as top_suppliers_window (benched)",
    "qty_price_correlation_by_brand": "same lineitem x part broadcast join + |brands| groupBy as part_brand_price_spread (benched); the moment arithmetic is row-local",
    "otif_by_month": "same orders x lineitem join as ship_lag_quartiles_by_priority (benched) with one extra per-order ALL groupBy",
    "datapump_roundtrip_incremental_compact": "same export->DuckDB-import lifecycle as the benched supplier roundtrip plus 3 incremental cycles and one coalesce rewrite; the compact rewrite shape is benched via datapump_roundtrip_compact's reasoning and the roundtrip shape via datapump_roundtrip_supplier",
    "datapump_roundtrip_sample": "same single-table export->DuckDB-import lifecycle as supplier roundtrip (benched); SAMPLE adds one row-local md5 filter to the same plan",
    "nation_share_of_region": "same broadcast-dim orders rollup as revenue_by_nation (benched); share/rank windows run over 25 aggregated rows",
    "customer_dormancy_bands": "one |customers| groupBy of orders + broadcast max + LEFT dim join; same shape as customer_rfm_bands (benched)",
    "returns_rate_by_brand": "same lineitem x part broadcast join + |brands| groupBy as part_brand_price_spread / qty_price_correlation_by_brand family (part_brand_price_spread benched)",
    "embedding_dim_ablation": "four arms of the ann_bruteforce_topk crossJoin-scored shape (benched) at decreasing dims",
    # r7 shape-dedup (verdict ask): same plan shape as a benched sibling —
    # groupBy + one-row broadcast total repeated with different literals;
    # benching both would double-count one code path while the headline
    # suite's single-JVM wall time grows linearly with query count
    "user_activity_hhi": "same HHI share-of-squares shape as nation_revenue_hhi (benched)",
    "ship_lag_quartiles_by_priority": "same discrete-quartile shape as value_quartiles_by_type (benched)",
    "order_width_histogram": "same count-of-counts histogram shape as session_length_histogram (benched)",
    "cold_start_users": "same first-seen-cohort shape as weekly_new_vs_returning (benched)",
    "revenue_pareto_bands": "same share-band-vs-total shape as nation_revenue_hhi (benched)",
    "dau_wau_stickiness": "same distinct-active-day shape as rolling_retention_7d (benched)",
    # O(n^2) verification baselines: runtime-guarded pedagogical references
    # (refuse >100k rows); the scale path is the MinHash/LSH family (benched)
    "dedup_ngram_jaccard": "O(n^2) guarded baseline; scale path is minhash (benched)",
    "dedup_embedding_cosine": "O(n^2) guarded baseline; scale path is ann_lsh (benched)",
    # trivially-subsumed variants of benched queries (same plan shape,
    # different literal) — benching both would double-count one code path
    "q4_order_priority": "same semi-join shape as q21 (benched)",
    "q7_nation_volume": "same multi-join shape as q5 (benched)",
    "q8_market_share": "same multi-join shape as q5 (benched)",
    "q9_product_profit": "same multi-join shape as q5 (benched)",
    "q11_important_stock": "same agg-over-join shape as q2 (benched)",
    "q12_shipping_delay": "same filtered-agg shape as q6 (benched)",
    "q13_customer_distribution": "same outer-join-agg shape as q10 (benched)",
    "q14_promo_effect": "same filtered-agg shape as q6 (benched)",
    "q15_top_supplier": "same agg+argmax shape as top_suppliers_window (benched)",
    "q16_supplier_part_counts": "same distinct-agg shape as distinct_counts family",
    "q17_small_quantity_revenue": "same scalar-subquery shape as q2 (benched)",
    "q19_disjunctive_revenue": "same filtered-agg shape as q6 (benched)",
    "q20_part_promotion": "same semi-join shape as q21 (benched)",
    "q22_global_sales_opportunity": "same anti-join-agg shape as q21 (benched)",
    "datapump_roundtrip_nation": "same export/import path as supplier roundtrip (benched)",
    "sales_cube": "same rollup path as sales_rollup (benched)",
    "shipmode_pivot": "same pivot path as sales_rollup family",
    "skew_salted_revenue": "salting demo of revenue_by_nation (benched)",
    "customer_order_set_ops": "set-op micro-query, subsumed by TPC-H joins",
    "distinct_counts": "micro-agg, subsumed by hll_distinct (benched)",
    "embedding_normalize": "projection-only micro-op, subsumed by ANN family",
    "embedding_quantize": "projection-only micro-op, subsumed by ANN family",
    "doc_fingerprint": "projection-only micro-op, subsumed by simhash (benched)",
    "text_normalize": "projection-only micro-op, subsumed by lang_id (benched)",
    "quality_score": "subsumed by quality_gopher (benched)",
    "corpus_split": "subsumed by stratified_sample (benched)",
    "mix_weights": "one-row agg, subsumed by corpus_mix family",
    "corpus_mix": "subsumed by curated_corpus (benched)",
    "price_outliers_by_brand": "same window-agg shape as top_suppliers_window",
    "media_resize": "stubbed codec path, same plumbing as media_features (benched)",
    "frame_sample": "stubbed codec path, same plumbing as media_features (benched)",
    "scd2_user_value": "same window shape as rolling_window_activity (benched)",
    "basket_lift_topk": "same self-join shape as triangle_participation family",
    "funnel_conversion": "one-row agg over events, subsumed by sessionize (benched)",
    "events_json_stats": "same events-scan shape as hourly rollup (benched)",
    "kmeans_cluster_sizes": "rides kmeans_assign's memoized fit (benched)",
    "triangle_participation": "same self-join family as pagerank (benched)",
    "lang_id_confusion": "same scan as lang_id (benched) + tiny agg",
    "dedup_rate_by_source": "rides dedup_exact (benched) + tiny agg",
    "doc_chunks": "explode-only micro-op, subsumed by span_dup_score",
    "datapump_roundtrip_stop_restart_encrypted": "six job lifecycles (one stopped, two refused, two rejected imports) + ciphertext digest rechecks over 3 tiny tables; same lifecycle-machinery family as datapump_roundtrip_stop_restart (EXCLUDED)",
    "datapump_roundtrip_json": "same single-table export->DuckDB-import lifecycle as supplier roundtrip (benched) through the JSON-lines interchange format over orders",
    "theil_sen_trend": "same month-level rollup + O(months^2) pair join family as kendall_tau_daily (EXCLUDED; scan shape benched via q1_pricing_summary); pairs/windows run on the tiny rollup",
    "good_turing_unseen_mass": "tokenize+explode then two partial-aggregated groupBys — same unigram-aggregate shape as unigram_surprise (benched) and source_token_entropy (EXCLUDED)",
    "readability_report": "three row-local regexp counts + one tiny groupBy(source) — same scan-bound projection family as token_count (benched)",
    "burstiness_report": "tokenize+explode, (tok, doc) count, tok-level moments, top-30 — same unigram-aggregate shape as unigram_surprise (benched)",
    "retrieval_eval_ndcg": "rides the benched bm25_search_topk index + two broadcast literal maps over |queries|x5 rows — same eval-layer shape as retrieval_eval_mrr (EXCLUDED family)",
    "cuped_adjusted_ab": "one per-user conditional aggregate + 2-row arm rollup + 1-row broadcasts — same user-keyed shape as ab_test_report (EXCLUDED; family anchor dau_wau_stickiness benched)",
    "duplicated_span_mask_plan": "same gram explode + doc-frequency shuffle as the benched duplicated_spans_report, MINUS its pair join; the K-way coverage explode runs on duplicated positions only",
    "streaming_bottomk_distinct": "one availableNow cycle (2 micro-batches) whose fixed streaming startup dominates; the per-batch work is a distinct + a 64-row merge (streaming family EXCLUDED by policy)",
    "datapump_roundtrip_orc_checksum": "four job lifecycles (two exports, one verified import, one rejected import) + digest passes over a 25-row ORC dump; same lifecycle family as datapump_roundtrip_checksum (EXCLUDED)",
    "winnow_param_planner": "one pinned gram pass + three window/pair arms, each the production winnowing shape at a different W; the W=8 arm IS the benched-family winnowing_fingerprint_pairs plan",
    "vocab_richness_report": "same (source, tok) -> source two-stage unigram aggregate as source_token_entropy (EXCLUDED; unigram_surprise benched)",
    "kish_design_effect": "row-local weights + one tiny groupBy(source) — same scan-bound family as gini_source_chars (EXCLUDED; source_quality_report benched)",
    "dedup_method_recall_report": "five pair-list-sized semi-joins against the exact-Jaccard truth; every candidate generator is the banded machinery its own gate exercises (dedup_minhash_pairs/dedup_ngram_jaccard benched)",
    "dedup_rater_kappa": "three banded pair sets full-outer-merged + a 1-row reduce; dominant cost (LSH verify, simhash banding) benched via dedup_minhash_verified/simhash_fingerprints",
    "ranker_agreement_report": "inner join of the two |queries|x5 ranker outputs — rides BOTH benched inverted indexes (bm25_search_topk, tfidf_search_topk); the agreement layer is tiny-frame",
    "datapump_roundtrip_estimate_only": "one plan + three COUNT scans, zero data movement by construction; lifecycle family datapump_roundtrip_supplier (benched)",
    "datapump_sqlfile_script": "two job lifecycles + a manifest-only DDL render executed in a fresh DuckDB catalog; O(tables) by construction, same lifecycle family as datapump_roundtrip_supplier (benched)",
    "naive_forecast_backtest": "same month-level broadcast-dim rollup + lag-window family as theil_sen_trend (EXCLUDED; scan shape benched via q1_pricing_summary)",
    "minhash_perm_quality": "rides the benched dedup_minhash_pairs signature aggregate + a 16-row audit reduce",
    "ab_power_plan": "one (event_type, user) rollup + per-type moments x 4 literal MDE rows — same keyed-agg shape as value_quartiles_by_type (EXCLUDED family; events scan benched via events_hourly_rollup)",
    "weighted_sample_report": "row-local priorities + TakeOrderedAndProject top-K + one broadcast join onto a per-source rollup — same scan-bound sampling family as stratified_sample (benched)",
    "dp_release_counts": "one partial-aggregated (source, lang) groupBy with row-local integer noise on the tiny aggregate — same shape as source_lang_matrix (benched via its family)",
    "leakage_quarantine_plan": "rides the memoized verified-pair table like split_leakage_pairs (EXCLUDED family); dominant cost (LSH verify) is benched via dedup_minhash_verified",
    "source_token_entropy": "tokenize+explode then two partial-aggregated groupBys — same unigram-aggregate shape as unigram_surprise (benched)",
    "context_fill_curve": "row-local token counts exploded x4 window sizes + one small groupBy — same scan-bound projection family as token_count (benched)",
    "ucb_allocation_plan": "one scan + one <=|types| groupBy + broadcast total — same keyed-agg shape as value_quartiles_by_type (EXCLUDED family; events scan benched via events_hourly_rollup)",
    "quantile_treatment_effect": "one (user) groupBy + one range-partitioned global-order rank over users (functions/global_order) — same per-user rollup + exact-rank family as exact_percentile_two_pass (EXCLUDED; events scan benched via events_hourly_rollup)",
    "tukey_fence_outliers": "same (user) groupBy + range-partitioned global rank as trimmed_mean_report (BENCHED family anchor); the fence pass is one conditional aggregate",
    "mcnemar_dedup_agreement": "dominant cost is the shared-shingle pair join, exercised via dedup_minhash_verified (benched); the flag joins and 1-row chi2 reduce are pair-list-sized",
    "page_hinkley_drift": "orders scan + day groupBy dominate — same family as orders_backlog_timeline (benched); the PH windows run over the <=|days| aggregate",
    "ab_sequential_looks": "one events scan + (user) groupBy — same per-user rollup family as user_recency_weight (benched); the look/z arithmetic is an 8-row frame",
    "sign_test_paired": "same events scan + (user) pre/post groupBy as wilcoxon_signed_rank (BENCHED family anchor); the sign reduce is 1 row",
    "image_dhash_hamming_curve": "same mapInPandas decode pass as image_dhash_groups (BENCHED family anchor); the consecutive-pair join and <=31-row histogram are hash-frame-sized",
    "streaming_page_hinkley": "two availableNow streaming cycles with staging/checkpoint setup dominate — lifecycle machinery, not a query plan; same posture as streaming_merge_apply (EXCLUDED)",
    # round 16 (batches 74/75 + dHash near-dup + streaming CUSUM)
    "page_trend_hour_bins": "same events scan + complete-block rank-window shape as friedman_event_type_ranks (BENCHED family anchor); only the treatment expression and the 1-row z reduce differ",
    "cochran_armitage_priority": "one orders scan + a 5-row (priority) aggregate + 1-row z reduce — same scan-bound single-aggregate family as q6_forecast_revenue (benched)",
    "mood_median_priority": "same distinct-value range-partitioned global-rank shape as kruskal_wallis_price (benched); the 2x5 chi-square runs on a 5-row frame",
    "durbin_watson_trend": "orders scan + day groupBy dominate — same family as page_hinkley_drift (EXCLUDED; benched anchor orders_backlog_timeline); the residual/lag windows run over the <=|days| aggregate",
    "cramer_von_mises_drift": "orders scan + day groupBy dominate — same daily-frame family as page_hinkley_drift (EXCLUDED; benched anchor orders_backlog_timeline); the three rank windows run over <=|days| rows",
    "cochran_q_detectors": "dominant cost is the shared-shingle pair join, exercised via dedup_minhash_verified (benched) — same posture as mcnemar_dedup_agreement (EXCLUDED); adds one md5-prefix groupBy",
    "image_dhash_near_pairs": "same mapInPandas decode pass as image_dhash_groups (BENCHED family anchor); the band explode, capped bucket join and popcount verify run on the 3n-row 2-column hash frame",
    "sprt_conversion_monitor": "one events scan + per-user groupBy — same per-user rollup family as user_recency_weight (benched); the accrual cumsum and crossing reduce run over <=|days| rows",
    "kaplan_meier_survival": "same customer-keyed lag-window shape as repeat_purchase_gaps (benched) and repurchase_hazard_table (EXCLUDED); the KM fold runs on the <=|weeks| aggregate",
    "anderson_darling_drift": "orders scan + day groupBy dominate — same daily-frame family as cramer_von_mises_drift (EXCLUDED; benched anchor orders_backlog_timeline); the pooled rank window runs over <=|days| rows",
    "streaming_cusum_chart": "two availableNow streaming cycles with staging/checkpoint setup dominate — lifecycle machinery, not a query plan; same posture as streaming_page_hinkley (EXCLUDED)",
    "hash_bootstrap_ci": "one (day) groupBy then a bounded days x 32 explode + 32-row window — same day-rollup family as daily_volume_mad_outliers (EXCLUDED; scan benched via events_hourly_rollup)",
    "wilson_ci_by_arm": "one (user) groupBy + 2-row arm aggregate + 2x2 verdict join — same keyed-agg shape as dau_wau_stickiness family (events scan benched via events_hourly_rollup)",
    "simpsons_reversal_scan": "one lineitem scan + <=|returnflags| groupBy + broadcast pooled moments — same scan-bound moments family as q1_pricing_summary (benched)",
    "cmh_pooled_odds": "one lineitem scan + <=|returnflags| groupBy + <=K-row pooled reduce — same scan-bound 2x2 family as simpsons_reversal_scan (EXCLUDED; scan benched via q1_pricing_summary)",
    "did_estimate": "one scan + one 2-row conditional groupBy + 2x2 self-join — same keyed-agg shape as cuped_adjusted_ab (EXCLUDED family; events scan benched via events_hourly_rollup)",
    "quantile_normalize_report": "per-source rank windows + (source, decile) groupBy + <=10-row reference join — same partitioned-rank family as source_percentile_bands (EXCLUDED; scan shape benched via length_decile_bands family)",
    "max_drawdown_report": "one orders scan -> |days| dense axis + two windows over calendar-bounded rows — same day-rollup family as orders_backlog_timeline (benched)",
    "crosscorr_leadlag": "one scan -> |days| dense frame + 7 lag-window moment reduces over calendar-bounded rows — same dense-axis lag family as orders_autocorrelation (EXCLUDED; scan benched via events_hourly_rollup)",
    "mase_seasonal_backtest": "one scan -> |days| dense axis + two lag windows + a 1-row reduce — same dense-axis lag family as naive_forecast_backtest (EXCLUDED; scan benched via events_hourly_rollup)",
}

HEADLINE = [
    # batches 74/75/76 (round 16)
    "friedman_event_type_ranks",
    "bh_fdr_nation_trend",
    "permutation_test_arm_diff",
    # multimodal 6 (round 15)
    "image_dhash_groups",
    # batch 73 (round 15)
    "cliffs_delta_arms",
    "wilcoxon_signed_rank",
    "hodges_lehmann_shift",
    "embedding_centroid_drift",
    # batch 72 (round 15)
    "trimmed_mean_report",
    "mann_kendall_trend",
    "theil_sen_slope",
    "anova_price_by_type",
    "levene_variance_check",
    "kruskal_wallis_price",
    "rich_club_curve",
    "rbo_ranker_overlap",
    "burrows_delta_matrix",
    "hubness_report",
    "dedup_medoid_select",
    "jl_distortion_report",
    "naive_bayes_source_eval",
    "mahalanobis_outliers",
    "weighted_jaccard_pairs",
    "kcenter_select",
    "nation_modularity",
    "cumulative_gains_auc",
    "consistent_hash_movement",
    "abc_xyz_matrix",
    "dedup_capture_recapture",
    "hurst_rs_report",
    "fs_em_iteration",
    "shapley_attribution",
    "gini_gain_feature_rank",
    "snm_candidate_pairs",
    "ks_two_sample_drift",
    "embedding_isotropy_report",
    "greedy_coverage_select",
    "psi_drift_report",
    "conformal_calibration_report",
    "ewma_control_bands",
    "clustering_coefficient_topk",
    "kneser_ney_bigram_ppm",
    "adamic_adar_linkpred",
    "randomized_response_debias",
    "mmr_rerank_topk",
    "rake_keywords",
    "ctfidf_source_terms",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "revenue_by_nation",
    "top_suppliers_window",
    "events_hourly_rollup",
    "events_sessionize",
    "q10_returned_items",
    "q18_large_orders",
    "sales_rollup",
    "price_quantiles",
    "datapump_roundtrip_supplier",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_minhash_verified",
    "duplicated_spans_report",
    "semantic_dedup_report",
    "lsh_band_planner",
    "hits_topk",
    "textrank_keywords",
    "simhash_fingerprints",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "centroid_topk",
    "lang_id",
    "token_count",
    "media_features",
    "curated_corpus",
    "q2_min_cost_supplier",
    "q21_suppliers_kept_waiting",
    "quality_gopher",
    "contamination_ngram",
    "vocab_ngram_counts",
    "kmeans_assign",
    "dedup_semantic",
    "asof_attribution",
    "dedup_groups",
    "stratified_sample",
    "pii_redact",
    "hll_distinct",
    "range_join_nearby",
    "rolling_window_activity",
    "cms_heavy_hitters",
    "pagerank_topk",
    "span_dup_score",
    "tfidf_search_topk",
    "unigram_surprise",
    "histogram_quantiles",
    "curated_corpus_v2",
    "cohort_retention",
    "gapfill_hourly",
    "table_profile",
    # new in r4 (no r02 baseline; totals compare on the common set)
    "datapump_roundtrip_merge",
    "lang_id_confusion",
    "cluster_label_purity",
    "dedup_rate_by_source",
    "ann_lsh_recall",
    "corpus_shard_plan",
    "doc_chunks",
    "embedding_pca_scores",
    # new in r5
    "source_token_budget",
    "dedup_group_size_histogram",
    "join_key_skew_profile",
    "pack_plan",
    "repetition_ngram_fracs",
    "curriculum_order",
    "datapump_roundtrip_orc",
    "bm25_search_topk",
    "dsir_importance",
    "embedding_pq_codes",
    "ann_pq_topk",
    "retrieval_eval_mrr",
    "ann_ivfpq_topk",
    "ann_pq_recall",
    "bigram_surprise",
    "source_quality_report",
    "budget_mix_plan",
    "contrastive_pairs",
    "tokenizer_fertility",
    "source_overlap_matrix",
    "curated_corpus_v3",
    "pack_fill_report",
    "minhash_estimate_accuracy",
    "quality_calibration",
    # new in r6 (pipeline.py dashboards; no prior baseline)
    "dedup_keep_best",
    "minhash_band_hitrates",
    "host_cap_sample",
    "filter_ablation_report",
    "hourly_heavy_hitters",
    "events_anomaly_hours",
    "dsir_resample_plan",
    "user_recency_weight",
    "zipf_vocab_curve",
    "ngram_novelty_by_source",
    "contamination_by_source",
    "embedding_norm_outliers",
    "attribution_latency_histogram",
    "dedup_threshold_curve",
    "source_lang_matrix",
    "length_decile_bands",
    "doc_embedding_coverage",
    "session_length_histogram",
    "quality_vs_dup_matrix",
    "token_share_by_lang",
    "conversion_by_hour",
    "shard_balance_report",
    "pq_code_histogram",
    "events_dow_hour_profile",
    "event_transition_gaps",
    "repeat_purchase_gaps",
    "quality_length_moments",
    "prefix_collision_histogram",
    "hourly_event_dups",
    "payload_k_band_profile",
    "orders_backlog_timeline",
    "mktsegment_yoy",
    "embedding_dim_profile",
    "pq_subspace_error",
    "source_lang_gini",
    "pair_jaccard_histogram",
    "customer_rfm_bands",
    "nation_fulfillment_lag",
    "value_anomaly_days",
    "pq_index_roundtrip",
    "peak_concurrent_sessions",
    "dup_degree_histogram",
    "dup_cross_lang_pairs",
    "order_priority_mix_by_month",
    "part_brand_price_spread",
    "streaming_merge_apply",
    "streaming_scd2_enrich",
    "nation_revenue_hhi",
    "value_quartiles_by_type",
    "pii_hit_rates",
    "session_funnel_rates",
    "simhash_pair_hamming",
    "rolling_retention_7d",
    "dedup_token_savings",
    "weekly_new_vs_returning",
    "events_interarrival_moments",
    # new in r7: genuinely new plan shapes (runtime filter probe,
    # zone-map layout simulation, partial-state MV merge)
    "bloom_join_prune",
    "zonemap_skip_report",
    "mv_delta_maintain",
    "bfs_reach_layers",
    "data_quality_audit",
    "snapshot_diff",
    "datapump_roundtrip_departition",
    "datapump_roundtrip_zorder",
    # new in r8: containment scoring is a genuinely new shape (asymmetric
    # |A∩B|/|A| over the LSH candidate set, not plain Jaccard); connected
    # components is the repo's first iterate-to-fixpoint graph operator
    # (per-round join + groupBy-min, data-dependent round count)
    "dedup_containment_pairs",
    "connected_components_sizes",
    # layout A/B: two distributed global ranks + zone-map reduce —
    # no benched sibling has the double-rank shape
    "layout_skip_compare",
    # simhash band self-join (hamming-space LSH) is a new candidate path;
    # the minhash side rides the memo
    "dedup_method_agreement",
    # join-MV delta algebra: four quadrant joins + partial-state merge —
    # no benched sibling runs multiple date-pruned joins of one fact pair
    "mv_join_delta",
    # skyline: range-partitioned strict-prefix max + domination filter —
    # no benched sibling computes a distributed prefix aggregate on part
    "part_price_skyline",
    # per-pair Levenshtein DP over the LSH candidate set: a quadratic-
    # per-row JVM hot loop no other benched dedup query exercises
    "dedup_edit_distance",
    # prefix filtering is a THIRD candidate-generation path (df-ordered
    # prefix self-join + exact-Jaccard verify) with its own join profile
    "dedup_prefix_filter_pairs",
    # winnowing is a FOURTH candidate path (char-gram explode →
    # window-min fingerprints → capped fp self-join): positional-
    # locality guarantee, unlike the set-similarity paths above
    "winnowing_fingerprint_pairs",
    # banded coordinate-block interval join (the equi-join rewrite of an
    # inequality interval intersection) — no other benched query has an
    # explode-to-blocks join profile
    "fifo_lot_attribution",
    # the heaviest global_order user: range-partition order statistics
    # over the full lineitem x part join (corpus_shard_plan ranks the
    # much smaller documents table)
    "trimmed_price_stats",
    # Spark's NATIVE session_window aggregate (SessionWindowExec) — a
    # physical operator no other benched query exercises; the manual
    # lag/cumsum twin events_sessionize stays benched for comparison
    "session_window_builtin",
    # full-row md5 fold over three tables — the reconciliation
    # primitive's hashing throughput has no other benched proxy
    "table_checksum_report",
    # the bucketed-write + co-located-join lifecycle: bucketBy catalog
    # writes and a zero-Exchange fact-fact join — a physical path
    # (bucketed scan join) nothing else benches
    "bucketed_join_rollup",
    # production incremental dedup: new-batch x stored-index band join +
    # candidate-restricted verification — the only benched op exercising
    # the asymmetric (small x large) LSH join shape
    "dedup_minhash_incremental",
    # fixed-round k-core peel: per-round double semi-join + degree agg —
    # the iterative-graph shape with per-round localCheckpoint pinning
    "kcore_peel_curve",
    # basket self-join pair explosion + per-item rank window — the
    # item-item CF shape (bounded by basket width) nothing else benches
    "item_cf_topk",
    # chained earliest-after joins (MATCH_RECOGNIZE-lite funnel) — the
    # sequential-pattern shape: three keyed join+agg rounds on user_id
    "funnel_ordered_within_gap",
    # gaps-and-islands window + double groupBy on one user_id shuffle —
    # the canonical islands plan
    "user_longest_streak",
    # two global range sorts + 16-step codegen'd Hilbert transform —
    # the space-filling-curve re-cluster price nothing else benches
    "hilbert_skip_compare",
    "chi2_independence_matrix",
    "exact_percentile_two_pass",
    "mw_u_segments",
    "coherent_sample_counts",
    "matryoshka_recall_curve",
    # three-micro-batch ingestion dedup: per-batch band join against a
    # growing parquet index + candidate-verify — the streaming LSH shape
    "streaming_dedup_incremental",
    # Arrow-batched REAL WAV decode over mapInPandas — the binary-codec
    # Python path (sanctioned slow path) nothing else benches
    "audio_decode_features",
]

# lang_id_confusion / dedup_rate_by_source / doc_chunks joined HEADLINE in
# r4 before the exclusion ledger existed; keep them (continuity with the
# r04/r05 tails) and drop the duplicate-reason entries from EXCLUDED.
for _k in ("lang_id_confusion", "dedup_rate_by_source", "doc_chunks"):
    EXCLUDED.pop(_k, None)


def load_baseline() -> dict[str, tuple[float, str]]:
    """Parse BASELINE-QUERIES.md (query -> (best median sec, round tag))."""
    path = os.path.join(REPO, "BASELINE-QUERIES.md")
    out: dict[str, tuple[float, str]] = {}
    if not os.path.exists(path):
        return out
    for line in open(path):
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*(\S+)\s*\|", line)
        if m:
            out[m.group(1)] = (float(m.group(2)), m.group(3))
    return out


def _jvm_gc_heap(spark) -> tuple[float, float]:
    """(cumulative JVM GC time ms, current heap-used MB)."""
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    it = beans.iterator()
    gc_ms = 0
    while it.hasNext():
        gc_ms += it.next().getCollectionTime()
    rt = jvm.java.lang.Runtime.getRuntime()
    heap_mb = (rt.totalMemory() - rt.freeMemory()) / 1048576.0
    return float(gc_ms), heap_mb


def run_slice(names: list[str], runs: int, sentinel: bool = False) -> dict:
    from oracledb_datapump_spark.session import get_spark
    import __spark_entry__ as entry_mod

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(
        app_name="datapump-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    # absorb JVM/codegen/FS-cache warm-up outside the timings: touch every
    # table once (footer + first pages) so timings measure execution
    spark.range(1000).count()
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    # events: type-sniffing reader (ts may be ns-as-long OR timestamp[us])
    from oracledb_datapump_spark.events_source import load_events

    load_events(spark, SF_DIR).count()

    qs = entry_mod.queries()
    # r10 verdict "What's wrong #1": the first timed headline eats JVM/JIT/
    # whole-stage-codegen warm-up that the footer touches above don't cover
    # (q1_pricing_summary's committed 2.77x was refuted by the same run's
    # end-of-JVM sentinel at 0.52x). One UNTIMED execution of the first
    # headline absorbs that cost outside the timing window.
    if names:
        try:
            qs[names[0]](spark, SF_DIR).count()
        except Exception:
            pass  # the timed loop will surface the error with context
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    errors: dict[str, str] = {}
    gc_delta: dict[str, float] = {}
    heap_mb: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        samples: list[float] = []
        # cache isolation: curated_corpus_* persist a shared documents
        # frame; without clearing, every later documents query would
        # silently read InMemoryRelation and its median would not be
        # comparable to baselines measured against parquet
        spark.catalog.clearCache()
        # localCheckpoint blocks (iterative ops) are NOT in the SQL cache;
        # left alone they accumulate across the whole run and the block-
        # manager pressure inflates later queries' timings
        import gc

        gc.collect()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        # codegen classes + freed block refs accumulate within a batch;
        # an explicit full GC between queries keeps tail-query timings
        # comparable to head-query timings within the batch
        spark.sparkContext._jvm.System.gc()
        gc0, _ = _jvm_gc_heap(spark)
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                # count() forces full execution, no driver-side row transfer
                n = fn(spark, SF_DIR).count()
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # one sick query must not kill the run
            errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            # an errored query contributes NO timing even if some samples
            # succeeded — a partial-run median would inflate the headline
            # total and make clean and errored runs incomparable
            continue
        gc1, hmb = _jvm_gc_heap(spark)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)  # median
        spread[name] = round(samples[-1] - samples[0], 3)
        gc_delta[name] = round(gc1 - gc0, 1)
        heap_mb[name] = round(hmb, 1)
        print(
            f"# {name}: {timings[name]:.3f}s median of {len(samples)}"
            f" (spread {spread[name]:.3f}s, {n} rows,"
            f" gc {gc_delta[name]:.0f}ms, heap {heap_mb[name]:.0f}MB)",
            file=sys.stderr,
        )
    out = {
        "queries": timings,
        "spread": spread,
        "errors": errors,
        "gc_ms": gc_delta,
        "heap_mb": heap_mb,
    }
    # contamination sentinel (r7 verdict ask): re-time the FIRST headline
    # query at the END of the run. Co-running load (pytest, a driver gate,
    # another bench) inflates medians suite-wide; the first query's start-
    # vs-end divergence is a cheap machine-quietness witness. A >1.5x
    # divergence means the record is untrustworthy and must not overwrite
    # the committed BENCH_FULL.json (the r7 closing record shipped 2-6x
    # phantom regressions exactly this way).
    if sentinel and names and names[0] in timings:
        first = names[0]
        fn = __import__("__spark_entry__").queries()[first]
        from oracledb_datapump_spark.session import get_spark

        spark = get_spark(app_name="datapump-bench")
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        recheck = samples[len(samples) // 2]
        base = timings[first]
        # divergence > 1 only when the END re-check is SLOWER — the
        # contamination signature (co-running load arrived mid-run).
        # A faster end re-check is benign JIT/page-cache warm-up (first
        # measured r8: q1 0.457s start vs 0.246s end on a quiet machine)
        # and must not poison the record.
        ratio = round(recheck / base, 3) if base > 0 else 1.0
        out["sentinel"] = {
            "query": first,
            "start_median": base,
            "end_median": round(recheck, 3),
            "divergence": ratio,
        }
        print(
            f"# sentinel {first}: start {base:.3f}s vs end {recheck:.3f}s"
            f" (divergence {ratio:.2f}x)",
            file=sys.stderr,
        )
    return out


def main() -> None:
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    batches = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "1"))
    slice_spec = os.environ.get("SPARK_GRAFT_BENCH_SLICE")

    if slice_spec:
        # child mode: run my round-robin slice in this (fresh) JVM and emit
        # the partial result as one JSON line on stdout
        i, n = (int(x) for x in slice_spec.split("/"))
        part = run_slice(HEADLINE[i::n], runs)
        print(json.dumps(part))
        return

    merged: dict[str, dict] = {
        "queries": {},
        "spread": {},
        "errors": {},
        "gc_ms": {},
        "heap_mb": {},
    }
    sentinel_info = None
    if batches <= 1:
        part = run_slice(HEADLINE, runs, sentinel=True)
        sentinel_info = part.pop("sentinel", None)
        for k in merged:
            merged[k].update(part[k])
    else:
        for i in range(batches):
            env = dict(os.environ)
            env["SPARK_GRAFT_BENCH_SLICE"] = f"{i}/{batches}"
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                text=True,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
            try:
                part = json.loads(line)
            except json.JSONDecodeError:
                part = {}
            for k in merged:
                merged[k].update(part.get(k, {}))
            if proc.returncode != 0 and not part:
                merged["errors"][f"batch_{i}"] = f"child rc={proc.returncode}"

    timings = merged["queries"]
    # order the merged dicts by HEADLINE position, not child arrival
    for k in merged:
        merged[k] = {q: merged[k][q] for q in HEADLINE if q in merged[k]} | {
            q: v for q, v in merged[k].items() if q not in HEADLINE
        }
    timings = merged["queries"]

    baseline = load_baseline()
    ratios: dict[str, float] = {}
    base_sum = cur_sum = 0.0
    for q, t in timings.items():
        if q in baseline and baseline[q][0] > 0:
            ratios[q] = round(t / baseline[q][0], 2)
            base_sum += baseline[q][0]
            cur_sum += t
            if ratios[q] >= 2.0:
                print(
                    f"# BASELINE-REGRESSION {q}: {t:.3f}s vs best"
                    f" {baseline[q][0]:.3f}s ({baseline[q][1]}) = {ratios[q]:.2f}x",
                    file=sys.stderr,
                )
    vs_baseline = round(cur_sum / base_sum, 3) if base_sum else None

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # "queries" LAST: the driver records a tail-truncated capture of this
    # line, so the most important dict must sit at the end
    contaminated = bool(sentinel_info and sentinel_info["divergence"] > 1.5)
    # Second capture-quality guard (round 15): the start-vs-end sentinel
    # measures ONE query and misses drag that arrives mid-run — the r15b
    # attempt read sentinel-benign while TEN unrelated anchored queries
    # sat >=2x of their anchors (user_longest_streak 6.9x on untouched
    # code). A broad >=2x fan-out with no code change is either host
    # drag or a shared-helper regression; either way the capture must
    # NOT silently replace the committed clean record — park it for
    # investigation.
    n_regressed = sum(1 for r in ratios.values() if r >= 2.0)
    if n_regressed >= 5:
        contaminated = True
        print(
            f"# CAPTURE-QUALITY: {n_regressed} anchored queries >=2x in one"
            " run — drag or shared regression; parking the record",
            file=sys.stderr,
        )
    out = {
        "metric": "headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "runs_per_query": runs,
        "batches": batches,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "errors": merged["errors"],
        "vs_baseline_best": vs_baseline,
        "sentinel": sentinel_info,
        "contaminated": contaminated,
        "spread": merged["spread"],
        "queries": timings,
    }
    full = dict(out)
    full["gc_ms"] = merged["gc_ms"]
    full["heap_mb"] = merged["heap_mb"]
    full["vs_baseline_per_query"] = ratios
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, "BENCH_FULL.json")
    )
    if contaminated:
        # refuse to overwrite the committed record with a poisoned capture;
        # park it next door for diagnosis instead
        out_path = out_path.replace(".json", ".CONTAMINATED.json")
        if sentinel_info is not None and sentinel_info["divergence"] > 1.5:
            reason = (
                f"sentinel divergence {sentinel_info['divergence']:.2f}x"
                " > 1.5x"
            )
        else:
            reason = f"{n_regressed} anchored queries >=2x in one run"
        print(
            f"# CONTAMINATED RUN ({reason}) — record written to"
            f" {os.path.basename(out_path)}, committed BENCH_FULL.json untouched",
            file=sys.stderr,
        )
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=False)
    print(json.dumps(out))
    if merged["errors"]:
        # nonzero exit signals breakage to the driver; the JSON line above
        # still carries every healthy query's median
        sys.exit(2)


if __name__ == "__main__":
    main()
