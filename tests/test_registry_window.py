"""Pins for the driver-facing correctness window and its local canary.

Round 3 lesson: environment drift (regenerated events.parquet) reached the
driver's gate before any repo-local check saw it. The canary
(``tools/check_oracles.py --window``) reproduces the driver's exact gate —
first CHECK_WINDOW registry entries, vanilla session. These tests pin the
window's structural invariants so a refactor can't silently shrink coverage
or push a never-certified operator out of the gate.
"""

import os
import subprocess
import sys

from distributed_graph_database_simulation_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def window_names():
    return list(registry.queries())[: registry.CHECK_WINDOW]


def test_window_is_exactly_check_window_entries():
    assert len(window_names()) == registry.CHECK_WINDOW == 50


def test_window_covers_every_family():
    prefixes = {n.split("_")[0] for n in window_names()}
    assert {"g", "dedup", "sim", "text", "mm", "rel", "stream"} <= prefixes


R06_NEW_ENTRIES = (
    "g_core_numbers", "g_modularity_scale", "g_landmark_distances_scale",
    "g_temporal_reach_scale", "dedup_containment", "dedup_dup_spans",
    "text_tfidf", "text_pmi", "pipe_winsorize", "pipe_split",
    "rel_funnel", "rel_scd2", "rel_resample_ffill", "rel_rolling_zscore",
    "mm_png_decode",
)

R06_ROTATED_OUT = (
    "g_connected_components_scale", "g_kcore_scale", "g_triangles_scale",
    "g_sssp_scale", "g_pagerank_scale", "g_label_propagation_scale",
    "dedup_embedding_cosine_tiled", "sim_topk_lsh", "sim_topk_ivf",
    "text_shard_assign", "mm_wav_decode", "mm_bmp_decode",
    "stream_events_sliding", "stream_user_sessions",
    "stream_static_enrichment",
)


R07_NEW_ENTRIES = (
    "g_graph_summary", "g_clustering_coefficient_scale", "g_eccentricity",
    "g_scc_scale", "g_wl_labels", "g_keyed_store_upsert",
    "g_pagerank_weighted_scale", "g_harmonic_sampled_scale",
    "g_diameter_double_sweep_scale", "g_edge_diff_scale",
    "g_cc_contraction_scale", "g_wl_fingerprint", "g_ktruss_scale",
    "g_sssp_tree_scale", "g_edge_jaccard", "g_mis", "g_coloring",
    "g_betweenness_sampled_scale", "rel_interval_overlap",
    "pipe_cap_per_source", "pipe_token_budget", "pipe_select_quality",
    "pipe_pack_sequences", "text_unigram_lm", "dedup_scrub_spans",
)

R07_ROTATED_OUT = (
    "g_common_neighbors_scale", "g_common_neighbors_capped_scale",
    "g_adamic_adar_capped_scale", "g_bfs_scale", "g_store_roundtrip",
    "g_text_scan", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_clusters", "dedup_simhash", "dedup_embedding_cosine",
    "text_language_id", "text_quality_score", "text_contamination",
    "text_pii_scrub", "text_chunk_windows", "text_sample_stratified",
    "mm_frame_sample", "mm_audio_features", "rel_udaf_weighted_discount",
    "rel_udtf_heavy_tokens", "rel_events_hourly", "rel_asof_join",
    "rel_salted_heavy_hitters", "stream_events_hourly",
)


R08_NEW_ENTRIES = (
    "g_pagerank_personalized_scale", "g_matching", "g_matching_scale",
    "g_densest_scale", "sim_kmeans", "text_gopher_rules", "text_bigram_lm",
    "pipe_cdc_chunks", "stream_hourly_file_sink",
    "stream_outer_click_purchase",
)

# r08 re-audit slots (r07 ADVICE: "nothing schedules veterans for periodic
# re-gating"): one long-rotated-out veteran per family returns to the gate
# for a fresh driver row. Each already has 1-5 green CORRECTNESS rows.
R08_REAUDIT = (
    "g_connected_components_scale", "g_triangles_scale", "dedup_minhash_lsh",
    "text_language_id", "mm_wav_decode", "rel_asof_join",
)

R08_ROTATED_OUT = (
    "g_core_numbers", "g_modularity_scale", "g_landmark_distances_scale",
    "g_temporal_reach_scale", "dedup_containment", "dedup_dup_spans",
    "text_tfidf", "text_pmi", "pipe_winsorize", "rel_funnel", "rel_scd2",
    "rel_rolling_zscore", "mm_png_decode", "sim_topk_bruteforce",
    "stream_stateful_user_totals", "stream_stream_click_purchase",
)

# r09 first-timers (r08 verdict "missing" #1): the ANN top-k pair gained
# exact md5-portable oracles in the r08 LSH rewrite but had only
# `err: no_oracle` driver rows (r02-r05); both pre-verified hash-exact at
# sf0.001 + sf0.01 this session, then rotated straight into the gate.
R09_NEW_ENTRIES = (
    "sim_topk_lsh", "sim_topk_ivf",
    # r09-continuation first-timers: five operators built this round, each
    # pre-verified hash-exact at sf0.001 + sf0.01, rotated straight in
    # since the r09 gate had not yet run.
    "rel_skyline", "rel_retention_cohorts", "pipe_mixture_balance",
    "mm_image_resize", "sim_topk_pq",
)

# r09 re-audit slots (r08 verdict #6): sixteen veterans last driver-green
# in r01-r04 return for a fresh row, all re-verified hash-exact at
# sf0.001 + sf0.01 before the swap. g_triangles was rejected: 0 rows at
# both gate sfs = vacuous hash match (the r04 lesson pinned below).
R09_REAUDIT = (
    "g_bfs_levels_kernel", "g_degrees", "g_pagerank", "g_label_propagation",
    "g_reachable", "g_connected_components", "g_degrees_scale",
    "text_token_count", "text_fingerprint", "text_repetition",
    "rel_pricing_summary", "rel_topk_orders", "rel_rollup_shipping",
    "rel_pivot_returnflag", "rel_quantiles", "rel_outer_join",
)

R09_ROTATED_OUT = (
    # the six r08 re-audit returnees, freshly re-certified in r08
    "g_connected_components_scale", "g_triangles_scale", "dedup_minhash_lsh",
    "text_language_id", "mm_wav_decode", "rel_asof_join",
    # twelve r07-wave entries with 2 green rows each (r07 + r08)
    "g_graph_summary", "g_clustering_coefficient_scale", "g_eccentricity",
    "g_scc_scale", "g_wl_labels", "g_keyed_store_upsert",
    "g_pagerank_weighted_scale", "g_harmonic_sampled_scale",
    "g_diameter_double_sweep_scale", "g_edge_diff_scale", "g_wl_fingerprint",
    "g_edge_jaccard",
    # five 6-7x-certified entries traded for the r09-continuation
    # first-timers; each family stays represented in the window
    "dedup_exact", "mm_image_features", "stream_dedup_events",
    "rel_scalar_events", "rel_event_sessions",
)

# r10 first-timers (r09 verdict #1): the sixteen entries staged in r09 —
# the only registry entries with zero driver history — rotate in for their
# first rows; all re-verified hash-exact at sf0.001 + sf0.01 before the
# swap.
R10_NEW_ENTRIES = (
    "g_random_walks", "g_random_walks_scale", "g_node2vec_walks",
    "g_node2vec_walks_scale", "g_neighbor_agg_scale", "g_simrank",
    "g_simrank_scale", "g_hits", "g_hits_scale", "g_articulation",
    "g_bridges", "dedup_semdedup", "sim_topk_ivfpq", "sim_recall_lsh",
    "mm_image_phash_dedup", "pipe_dataset_card",
)

# r10 re-audit (r09 verdict #2): g_triangles returns REDEFINED — the old
# fixture-graph total hash-matched an empty set (G1-G7 are triangle-free);
# it is now the per-vertex triangle table over the scale graph, 101 rows of
# sf-tracking mass, pre-verified hash-exact at sf0.001 + sf0.01.
R10_REAUDIT = ("g_triangles",)

R10_ROTATED_OUT = (
    # the sixteen r09 re-audit veterans, freshly re-certified in r09 on top
    # of their r01-r04 history
    "g_bfs_levels_kernel", "g_degrees", "g_pagerank", "g_label_propagation",
    "g_reachable", "g_connected_components", "g_degrees_scale",
    "text_token_count", "text_fingerprint", "text_repetition",
    "rel_pricing_summary", "rel_topk_orders", "rel_rollup_shipping",
    "rel_pivot_returnflag", "rel_quantiles", "rel_outer_join",
    # one r07-wave iterative entry with 3 green rows (r07/r08/r09)
    "g_mis",
)

# r11 first-timers (r10 verdict #3): the seventeen entries staged in r10
# rotate in for their first driver rows. The two formerly rows-only
# entries (g_hyperball_harmonic_scale, sim_random_project) were converted
# to checked exact-value + envelope-flag form first (r10 verdict #5), so
# all seventeen gate with exact oracles; all re-verified hash-exact at
# sf0.001 + sf0.01 before the swap.
R11_NEW_ENTRIES = (
    "dedup_embedding_cosine_prefiltered", "g_hyperball_scale",
    "g_hyperball_harmonic_scale", "pipe_hll_store_merge",
    "stream_sketch_ingest", "stream_dedup_ingest", "stream_user_state_ingest",
    "pipe_theta_overlap", "pipe_zorder_layout", "sim_random_project",
    "sim_topk_ivf_index", "g_effective_diameter_scale",
    "g_triangles_sampled_scale", "pipe_temperature_mix",
    "g_four_cliques_scale", "text_novelty", "rel_approx_distinct_checked",
)

# r11 re-gate (r10 verdict #1): pipe_dataset_card's r10 red row was an
# oracle typing bug (un-cast SUM -> HUGEINT -> float64 under the driver's
# hasher); the CAST fix landed this round and the entry stays in the
# window until it earns a green row.
R11_REGATE = ("pipe_dataset_card",)

R11_ROTATED_OUT = (
    # the five r07-wave iterative-loop veterans, 4 green rows each (r07-r10)
    "g_cc_contraction_scale", "g_ktruss_scale", "g_sssp_tree_scale",
    "g_coloring", "g_betweenness_sampled_scale",
    # the ten r08-wave entries, 3 green rows each (r08-r10)
    "g_pagerank_personalized_scale", "g_matching", "g_matching_scale",
    "g_densest_scale", "sim_kmeans", "text_gopher_rules", "text_bigram_lm",
    "pipe_cdc_chunks", "stream_hourly_file_sink",
    "stream_outer_click_purchase",
    # two LLM-pipeline veterans, 4 green rows each (r07-r10)
    "dedup_scrub_spans", "text_unigram_lm",
)

# r12 first-timers (r11 verdict #2): the twenty-two entries staged in r11
# rotate in for their first driver rows — the staleness guard requires a
# driver row within two rounds of staging. All 22 were pre-verified
# hash-exact at sf0.001 + sf0.01 when staged; the five touched by
# r11-ADVICE fixes (rel_unpivot, pipe_curriculum_buckets,
# pipe_cms_heavy_hitters, stream_cms_ingest, pipe_epoch_shuffle) were
# re-verified at both sfs after the fixes, before this swap.
R12_NEW_ENTRIES = (
    "rel_grouping_sets", "sim_range_search", "g_bipartite_project",
    "pipe_cms_heavy_hitters", "stream_cms_ingest", "g_walk_skipgram_pairs",
    "rel_unpivot", "rel_rank_family", "rel_approx_quantile_checked",
    "pipe_end_to_end", "sim_ivf_index_append", "g_butterflies",
    "pipe_epoch_shuffle", "pipe_curriculum_buckets", "pipe_weighted_sample",
    "mm_image_patches", "mm_audio_windows", "pipe_compact_files",
    "stream_scd2_ingest", "g_bipartite_clustering", "text_hashed_features",
    "g_assortativity",
    # r12-built operators rotated straight in (the r12 gate had not yet
    # run — the same move as the r09-continuation five): deterministic
    # BPE tokenizer, exact-substring dedup, BPE-counted packing, each
    # pre-verified hash-exact at sf0.001 + sf0.01 + sf0.1.
    "text_bpe_encode", "dedup_exact_substring", "pipe_pack_bpe",
)

R12_ROTATED_OUT = (
    # the fifteen r10-wave first-timers, 2 green rows each (r10 + r11)
    "g_random_walks", "g_random_walks_scale", "g_node2vec_walks",
    "g_node2vec_walks_scale", "g_neighbor_agg_scale", "g_simrank",
    "g_simrank_scale", "g_hits", "g_hits_scale", "g_articulation",
    "g_bridges", "dedup_semdedup", "sim_topk_ivfpq", "sim_recall_lsh",
    "mm_image_phash_dedup",
    # the redefined per-vertex triangles entry, 2 green rows (r10 + r11)
    "g_triangles",
    # ANN top-k pair (3 rows: r09-r11) and two more 3-row r09 entries
    "sim_topk_lsh", "sim_topk_ivf", "rel_skyline", "sim_topk_pq",
    # five 5-row LLM-pipeline veterans (r07-r11)
    "pipe_split", "pipe_cap_per_source", "pipe_token_budget",
    "pipe_select_quality", "pipe_pack_sequences",
)

# r13 rotation (r12 verdict #2 + #8): the eleven r12-staged entries rotate
# in for their first driver rows (the three BPE-dependent ones re-verified
# hash-exact at all three shipped sfs AFTER the r13 tokenizer rewrite —
# 1,024-merge table, word-local pair-merge kernel, golden-table oracle —
# the other eight re-swept unchanged), PLUS the 34 oldest tail entries
# (21 r1-vintage, 10 r5-vintage, 3 r6-vintage picks) to arm the
# registry-wide MAX_GATE_STALENESS bound. Out: everything else — this
# round trades the "second rows" convention for retiring an 11-round
# staleness debt in one pass.
R13_NEW_ENTRIES = (
    # r12-staged, first driver rows
    "dedup_scrub_substring", "pipe_token_budget_bpe", "text_bpe_vocab",
    "mm_image_channel_stats", "pipe_interleave_sources",
    "pipe_pack_segments", "sim_recall_ivf", "mm_audio_level_stats",
    "stream_token_count_ingest", "rel_mad", "g_katz_scale",
    # staleness re-gates: r1 vintage (last gated round 1)
    "g_bfs_levels_alt", "g_dfs_leaves_scale", "rel_approx_distinct",
    "rel_array_map_funcs", "rel_bucketed_join", "rel_correlated_exists",
    "rel_correlated_scalar", "rel_cube_order_priority",
    "rel_customers_without_orders", "rel_distinct_parts_per_flag",
    "rel_multiformat_sources", "rel_range_frame_window", "rel_range_join",
    "rel_region_revenue", "rel_running_supplier_qty", "rel_scalar_orders",
    "rel_segment_stats", "rel_setops_customers", "rel_sql_forecast_revenue",
    "rel_top_parts_per_brand", "rel_top_revenue_orders",
    # staleness re-gates: r5 vintage
    "dedup_embedding_cosine_tiled", "g_kcore_scale",
    "g_label_propagation_scale", "g_pagerank_scale", "g_sssp_scale",
    "mm_bmp_decode", "stream_events_sliding", "stream_static_enrichment",
    "stream_user_sessions", "text_shard_assign",
    # staleness re-gates: r6 vintage picks (reference store/scan ops +
    # the prefix-filtered n-gram Jaccard)
    "g_store_roundtrip", "g_text_scan", "dedup_ngram_jaccard",
)

R13_ROTATED_OUT = (
    # r11 first-timers leaving with 2-3 green rows each
    "pipe_dataset_card", "dedup_embedding_cosine_prefiltered",
    "g_hyperball_scale", "g_hyperball_harmonic_scale",
    "pipe_hll_store_merge", "stream_sketch_ingest", "stream_dedup_ingest",
    "stream_user_state_ingest", "pipe_theta_overlap", "pipe_zorder_layout",
    "sim_random_project", "sim_topk_ivf_index",
    "g_effective_diameter_scale", "g_triangles_sampled_scale",
    "pipe_temperature_mix", "g_four_cliques_scale", "text_novelty",
    "rel_approx_distinct_checked",
    # r12 first-timers leaving with 1 green row each (r12) — their return
    # is now guaranteed by the staleness bound, not by convention
    "rel_grouping_sets", "sim_range_search", "g_bipartite_project",
    "pipe_cms_heavy_hitters", "stream_cms_ingest", "g_walk_skipgram_pairs",
    "rel_unpivot", "rel_rank_family", "rel_approx_quantile_checked",
    "pipe_end_to_end", "sim_ivf_index_append", "g_butterflies",
    "pipe_epoch_shuffle", "pipe_curriculum_buckets", "pipe_weighted_sample",
    "mm_image_patches", "mm_audio_windows", "pipe_compact_files",
    "stream_scd2_ingest", "g_bipartite_clustering", "text_hashed_features",
    "g_assortativity",
    # multi-round veterans (7 / 6 / 4 / 4 / 4 green rows)
    "rel_resample_ffill", "rel_interval_overlap", "rel_retention_cohorts",
    "pipe_mixture_balance", "mm_image_resize",
)

# r14 rotation (r13 verdict #1): the fifteen r13-staged entries rotate in
# for their first driver rows, the nineteen round-6-vintage entries the
# armed staleness bound names re-enter, and fourteen of the sixteen
# round-7-vintage entries (due r15) pre-gate one round early to smooth the
# rotation budget. Out: the 48 non-essential r13 window members, all
# freshly green in CORRECTNESS_r13.
R14_NEW_ENTRIES = (
    # r13-staged, first driver rows (15)
    "pipe_interleave_pack", "dedup_cluster_representatives",
    "text_bpe_compression", "sim_topk_mips", "rel_sliding_distinct_users",
    "pipe_snapshot_diff", "stream_crawl_diff_ingest", "stream_wau_ingest",
    "mm_frame_deltas", "text_keywords", "pipe_incremental_quality",
    "rel_mode", "dedup_boilerplate_sentences", "mm_audio_downsample",
    "rel_attribution_last_touch",
    # staleness-due re-gates: round-6 vintage (19)
    "dedup_clusters", "dedup_embedding_cosine", "dedup_simhash",
    "g_adamic_adar_capped_scale", "g_bfs_scale",
    "g_common_neighbors_capped_scale", "g_common_neighbors_scale",
    "mm_audio_features", "mm_frame_sample", "rel_events_hourly",
    "rel_salted_heavy_hitters", "rel_udaf_weighted_discount",
    "rel_udtf_heavy_tokens", "stream_events_hourly", "text_chunk_windows",
    "text_contamination", "text_pii_scrub", "text_quality_score",
    "text_sample_stratified",
    # pre-gates: round-7 vintage, due r15, gated one round early (14)
    "dedup_containment", "dedup_dup_spans", "g_core_numbers",
    "g_landmark_distances_scale", "g_modularity_scale",
    "g_temporal_reach_scale", "mm_png_decode", "pipe_winsorize",
    "rel_funnel", "rel_rolling_zscore", "rel_scd2", "sim_topk_bruteforce",
    "stream_stateful_user_totals", "stream_stream_click_purchase",
)

R14_ROTATED_OUT = (
    # r12-built BPE/substring trio, re-certified green in r13 after the
    # tokenizer rewrite
    "text_bpe_encode", "dedup_exact_substring", "pipe_pack_bpe",
    # the eleven r12-staged entries, first green rows in r13
    "dedup_scrub_substring", "pipe_token_budget_bpe", "text_bpe_vocab",
    "mm_image_channel_stats", "pipe_interleave_sources",
    "pipe_pack_segments", "sim_recall_ivf", "mm_audio_level_stats",
    "stream_token_count_ingest", "rel_mad", "g_katz_scale",
    # the 34 r13 staleness re-gates, all freshly green in r13
    "g_bfs_levels_alt", "g_dfs_leaves_scale", "rel_approx_distinct",
    "rel_array_map_funcs", "rel_bucketed_join", "rel_correlated_exists",
    "rel_correlated_scalar", "rel_cube_order_priority",
    "rel_customers_without_orders", "rel_distinct_parts_per_flag",
    "rel_multiformat_sources", "rel_range_frame_window", "rel_range_join",
    "rel_region_revenue", "rel_running_supplier_qty", "rel_scalar_orders",
    "rel_segment_stats", "rel_setops_customers", "rel_sql_forecast_revenue",
    "rel_top_parts_per_brand", "rel_top_revenue_orders",
    "dedup_embedding_cosine_tiled", "g_kcore_scale",
    "g_label_propagation_scale", "g_pagerank_scale", "g_sssp_scale",
    "mm_bmp_decode", "stream_events_sliding", "stream_static_enrichment",
    "stream_user_sessions", "text_shard_assign",
    "g_store_roundtrip", "g_text_scan", "dedup_ngram_jaccard",
)

# r15 rotation (r14 verdict #1): the six r14-staged entries rotate in for
# their first driver rows, the two deliberately-carried must-includes
# (text_pmi, text_tfidf — due r15) take their re-gate rows, and ALL
# remaining upcoming staleness debt pre-gates early: the 23 round-8-vintage
# entries (due r16) plus the 17 round-9-vintage entries (due r17) fill the
# window to exactly 50. Out: the 48 non-essential r14 members, all freshly
# green in CORRECTNESS_r14.
R15_NEW_ENTRIES = (
    # r14-staged, first driver rows (6)
    "sim_recall_mips", "pipe_corpus_clean_pack", "stream_compact_ingest",
    "mm_jpeg_decode", "sim_knn_graph", "rel_analyze_stats",
    # carried must-includes: round-7 vintage, due r15 (2)
    "text_pmi", "text_tfidf",
    # pre-gates: round-8 vintage, due r16 (23)
    "dedup_exact", "dedup_minhash_lsh", "g_clustering_coefficient_scale",
    "g_connected_components_scale", "g_diameter_double_sweep_scale",
    "g_eccentricity", "g_edge_diff_scale", "g_edge_jaccard",
    "g_graph_summary", "g_harmonic_sampled_scale", "g_keyed_store_upsert",
    "g_pagerank_weighted_scale", "g_scc_scale", "g_triangles_scale",
    "g_wl_fingerprint", "g_wl_labels", "mm_image_features", "mm_wav_decode",
    "rel_asof_join", "rel_event_sessions", "rel_scalar_events",
    "stream_dedup_events", "text_language_id",
    # pre-gates: round-9 vintage, due r17 (17)
    "g_bfs_levels_kernel", "g_connected_components", "g_degrees",
    "g_degrees_scale", "g_label_propagation", "g_mis", "g_pagerank",
    "g_reachable", "rel_outer_join", "rel_pivot_returnflag",
    "rel_pricing_summary", "rel_quantiles", "rel_rollup_shipping",
    "rel_topk_orders", "text_fingerprint", "text_repetition",
    "text_token_count",
)

R15_ROTATED_OUT = (
    # the fifteen r13-staged first-timers, green rows in r14
    "pipe_interleave_pack", "dedup_cluster_representatives",
    "text_bpe_compression", "sim_topk_mips", "rel_sliding_distinct_users",
    "pipe_snapshot_diff", "stream_crawl_diff_ingest", "stream_wau_ingest",
    "mm_frame_deltas", "text_keywords", "pipe_incremental_quality",
    "rel_mode", "dedup_boilerplate_sentences", "mm_audio_downsample",
    "rel_attribution_last_touch",
    # the nineteen round-6-vintage re-gates, freshly green in r14
    "dedup_clusters", "dedup_embedding_cosine", "dedup_simhash",
    "g_adamic_adar_capped_scale", "g_bfs_scale",
    "g_common_neighbors_capped_scale", "g_common_neighbors_scale",
    "mm_audio_features", "mm_frame_sample", "rel_events_hourly",
    "rel_salted_heavy_hitters", "rel_udaf_weighted_discount",
    "rel_udtf_heavy_tokens", "stream_events_hourly", "text_chunk_windows",
    "text_contamination", "text_pii_scrub", "text_quality_score",
    "text_sample_stratified",
    # the fourteen round-7-vintage pre-gates, freshly green in r14
    "dedup_containment", "dedup_dup_spans", "g_core_numbers",
    "g_landmark_distances_scale", "g_modularity_scale",
    "g_temporal_reach_scale", "mm_png_decode", "pipe_winsorize",
    "rel_funnel", "rel_rolling_zscore", "rel_scd2", "sim_topk_bruteforce",
    "stream_stateful_user_totals", "stream_stream_click_purchase",
)

# Entries deliberately carried for the NEXT rotation's must-include list
# (alongside whatever STAGED_DECLARED_ROUND accumulates this round). The
# r15 rotation pre-gated both upcoming staleness waves (r8 + r9 vintage),
# so nothing is carried due for r16 — the r16 window owes only the
# entries staged this round. Checked by
# test_next_rotation_obligation_is_satisfiable.
NEXT_MUST_INCLUDE = ()

# Rotation ledger, newest first: (round, rotated-in, rotated-out). Window
# membership for any name touched by a rotation is decided by the LATEST
# rotation that mentions it — replaying this ledger replaces the
# conditional chains the per-round tests used to carry.
ROTATIONS = (
    (15, R15_NEW_ENTRIES, R15_ROTATED_OUT),
    (14, R14_NEW_ENTRIES, R14_ROTATED_OUT),
    (13, R13_NEW_ENTRIES, R13_ROTATED_OUT),
    (12, R12_NEW_ENTRIES, R12_ROTATED_OUT),
    (11, R11_NEW_ENTRIES + R11_REGATE, R11_ROTATED_OUT),
    (10, R10_NEW_ENTRIES + R10_REAUDIT, R10_ROTATED_OUT),
    (9, R09_NEW_ENTRIES + R09_REAUDIT, R09_ROTATED_OUT),
    (8, R08_NEW_ENTRIES + R08_REAUDIT, R08_ROTATED_OUT),
    (7, R07_NEW_ENTRIES, R07_ROTATED_OUT),
    (6, R06_NEW_ENTRIES, R06_ROTATED_OUT),
)


def expected_in_window(name):
    """True/False per the latest rotation mentioning `name`; None if no
    rotation ever touched it (an original window member or original tail
    entry, pinned elsewhere)."""
    for _, ins, outs in ROTATIONS:
        if name in ins:
            return True
        if name in outs:
            return False
    return None


def test_rotation_ledger_is_consistent():
    """Each rotation's in/out sets must be disjoint and every name
    registered; every ledger-touched name's membership must match the
    actual window — one replayed invariant instead of per-round
    conditionals."""
    w = set(window_names())
    q = registry.queries()
    for rnd, ins, outs in ROTATIONS:
        assert not set(ins) & set(outs), rnd
    touched = {n for _, ins, outs in ROTATIONS for n in (*ins, *outs)}
    for name in touched:
        assert name in q, name
        assert (name in w) == expected_in_window(name), name


def test_r15_rotation_swaps_balance():
    """r15 swaps the 6 r14-staged entries + 2 carried must-includes +
    23 r8-vintage pre-gates + 17 r9-vintage pre-gates in for the 48
    non-essential r14 members (all freshly green in CORRECTNESS_r14); the
    two graph essentials stay; window stays CHECK_WINDOW."""
    assert len(R15_NEW_ENTRIES) == len(R15_ROTATED_OUT) == 48
    w = set(window_names())
    assert set(R15_NEW_ENTRIES) <= w
    assert not set(R15_ROTATED_OUT) & w
    assert {"g_bfs_levels", "g_dfs_leaves"} <= w


# The registry-wide rotation cadence guarantee (r12 verdict #8; documented
# in COVERAGE.md §rotation-cadence): after each round's gate runs, every
# registry entry has a green driver row within the last MAX_GATE_STALENESS
# rounds. Never-gated entries are covered by the staged-entry guard
# (test_staged_entries_gate_within_two_rounds).
#
# r14 restructure (r13 verdict "What's wrong #1"): the guard asserts the
# committed window against registry.GATE_ROUND — the round this window was
# rotated FOR — not against max(CORRECTNESS_r*)+1. The old form went
# structurally red the instant the round's own driver row landed (it
# started demanding the NEXT round's rotation), training everyone to ignore
# a red suite. Now: staleness is computed over driver rows from rounds
# BEFORE GATE_ROUND, so the assertion is stable whether or not this round's
# CORRECTNESS file exists; the forward obligation (rotate before the next
# gate) is enforced by test_gate_round_is_current, which only trips when a
# NEW round's driver row lands without a rotation commit.
MAX_GATE_STALENESS = 8


def _last_green_before(round_limit):
    """name -> most recent green driver round, over CORRECTNESS files from
    rounds strictly before `round_limit`."""
    import glob
    import json
    import re

    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        if rnd >= round_limit:
            continue
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") or row.get("err") == "no_oracle":
                    last[name] = max(last.get(name, 0), rnd)
    return last


def _correctness_rounds():
    import glob
    import re

    return [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]


def test_registry_wide_staleness_bound():
    """Every entry whose last green row (before this window's round) is
    MAX_GATE_STALENESS or more rounds old by GATE_ROUND must be IN the
    committed window. Stable at every instant of the round."""
    last = _last_green_before(registry.GATE_ROUND)
    w = set(window_names())
    must_gate = {
        name
        for name in registry.queries()
        if name in last
        and last[name] <= registry.GATE_ROUND - MAX_GATE_STALENESS
    }
    missing = must_gate - w
    assert not missing, (
        f"entries whose staleness exceeds {MAX_GATE_STALENESS} rounds at "
        f"round {registry.GATE_ROUND}'s gate, yet absent from the window: "
        f"{sorted(missing)}"
    )


def test_gate_round_is_current():
    """The rotation-forcing tripwire, restructured to trip only on actual
    dereliction: the committed window must be for the round currently in
    flight — either awaiting its gate (max CORRECTNESS round ==
    GATE_ROUND - 1) or just gated (== GATE_ROUND). A NEWER driver row with
    no rotation commit means a round started without rotating the window;
    that, and only that, goes red."""
    latest = max(_correctness_rounds(), default=0)
    assert registry.GATE_ROUND in (latest, latest + 1), (
        f"GATE_ROUND={registry.GATE_ROUND} but latest CORRECTNESS round is "
        f"{latest}: rotate _WINDOW_ORDER and bump GATE_ROUND for round "
        f"{latest + 1}"
    )


def test_next_rotation_obligation_is_satisfiable():
    """Forward-looking budget check for the NEXT rotation: the entries due
    at round GATE_ROUND+1 (staleness-due given this window gates green,
    plus NEXT_MUST_INCLUDE carried deliberately, plus currently-staged
    entries) must fit the window alongside the 2 essentials."""
    last = _last_green_before(registry.GATE_ROUND)
    w = set(window_names())
    due_next = {
        name
        for name in registry.queries()
        if name in last
        and last[name] <= registry.GATE_ROUND + 1 - MAX_GATE_STALENESS
        and name not in w  # gated this round -> fresh row
    }
    assert set(NEXT_MUST_INCLUDE) <= due_next, (
        "deliberately-carried entries must actually be "
        f"due next round: {sorted(set(NEXT_MUST_INCLUDE) - due_next)}"
    )
    assert due_next <= set(NEXT_MUST_INCLUDE), (
        "entries due next round that are neither in this window nor "
        f"deliberately carried: {sorted(due_next - set(NEXT_MUST_INCLUDE))}"
    )
    demand = len(due_next | set(NEXT_MUST_INCLUDE)) + len(
        registry.STAGED_DECLARED_ROUND
    ) + 2
    assert demand <= registry.CHECK_WINDOW, (
        f"round {registry.GATE_ROUND + 1} rotation is over-committed: "
        f"{demand} obligatory slots > {registry.CHECK_WINDOW}"
    )


def _green_history():
    """Names with >=1 hash-green (or rows-only-by-design) driver row across
    all committed CORRECTNESS_r*.json files."""
    import glob
    import json

    green = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") or row.get("err") == "no_oracle":
                    green.add(name)
    return green


def test_rotated_out_entries_were_driver_certified():
    """Rotation guard: nothing may be pushed out of the gate window without
    at least one green historical driver row — otherwise a never-certified
    query could silently live in the tail forever. Entries that have never
    gated may sit in the tail ONLY if explicitly declared as staged stock
    for the next rotation (registry.STAGED_NEXT_ROTATION), which the
    playbook requires to be locally pre-verified before declaration."""
    green = _green_history()
    tail = set(registry.queries()) - set(window_names())
    uncertified = tail - green - set(registry.STAGED_NEXT_ROTATION)
    assert not uncertified, (
        f"tail entries with neither green CORRECTNESS history nor a staged "
        f"declaration: {sorted(uncertified)}"
    )
    # staged means staged: a staged name must not already be gating
    assert not set(registry.STAGED_NEXT_ROTATION) & set(window_names())


def test_staged_entries_gate_within_two_rounds():
    """Staleness guard (r05 verdict #8, armed in r07 now that declaration
    rounds are recorded): an entry declared staged in round R must have a
    green driver row by the time round R+2's CORRECTNESS file exists —
    staging is a queue for the next rotation, not a place to park a query
    away from the gate indefinitely."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    latest = max(rounds, default=0)
    green = _green_history()
    assert set(registry.STAGED_DECLARED_ROUND) == set(
        registry.STAGED_NEXT_ROTATION
    )
    stale = {
        name
        for name, declared in registry.STAGED_DECLARED_ROUND.items()
        if latest >= declared + 2 and name not in green
    }
    assert not stale, (
        f"staged entries older than 2 rounds with no driver row: {sorted(stale)}"
    )


def test_window_entries_without_history_are_this_rounds_rotation():
    """Forward guard (r05 verdict #8): a window entry with no green driver
    history must be one of the entries deliberately rotated IN this round —
    anything else is a query that slipped into the gate without the
    pre-verification step the rotation playbook requires."""
    green = _green_history()
    awaiting = set(window_names()) - green
    allowed = set(R15_NEW_ENTRIES)
    assert awaiting <= allowed, (
        f"window entries with no driver history outside this round's "
        f"rotation: {sorted(awaiting - allowed)}"
    )


def test_capped_link_prediction_is_non_vacuous_at_gate_sf(spark):
    """The r04 verdict found the fixed CN_DEGREE_CAP=32 certified vacuously
    (0 rows vs 0 rows at sf0.01). The derived cap must keep the gate-sf
    result non-empty so a driver hash match is real evidence."""
    import pytest

    from distributed_graph_database_simulation_spark.operators.graph_queries import (
        adamic_adar_capped_scale,
        common_neighbors_capped_scale,
    )

    gate_sf = "/root/testdata/sf0.01"
    if not os.path.isdir(gate_sf):  # driver gate sf must exist to be probed
        pytest.skip("gate-sf testdata not present")
    assert common_neighbors_capped_scale(spark, gate_sf).limit(1).count() == 1
    assert adamic_adar_capped_scale(spark, gate_sf).limit(1).count() == 1


def test_every_window_entry_has_oracle_or_documented_rows_only():
    oracles = registry.oracle_sql()
    # r14: fully oracle-backed again (the registry's one rows-only-by-design
    # entry, rel_approx_distinct — raw HLL estimate, envelope-pinned, value-
    # certified via its _checked sibling — earned its fresh row in r13 and
    # sits in the tail).
    rows_only = {n for n in window_names() if n not in oracles}
    assert not rows_only


def test_canary_smoke_representative_window_queries():
    """End-to-end drift canary inside the suite: run one entry per
    drift-prone family through the REAL vanilla-session gate at sf0.001.
    Round 3's regression (regenerated events.parquet -> TIMESTAMP_NTZ) broke
    exactly these query shapes while every repo check stayed green; this
    test makes `pytest tests/` fail the moment the testdata moves again.

    r10: the --window flag is gone — rotations had quietly moved five of
    the eight canaries to the tail, where --window intersected them away to
    nothing. The canaries are drift probes for testdata SHAPES, not window
    members; they must run every time regardless of gate membership."""
    names = [
        "rel_scalar_events",       # ts scalar arithmetic (unix_micros)
        "rel_event_sessions",      # ts lag-window sessionization
        "stream_dedup_events",     # withWatermark requires TIMESTAMP
        "dedup_exact",             # documents table shape
        "g_bfs_levels",            # fixture graph path
        "mm_image_features",       # binary payload plumbing
        "rel_resample_ffill",      # r06 wave: epoch bucketing + grid gen
        "pipe_split",              # r06 wave: md5 bucket arithmetic
    ]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"),
         "--sf", "/root/testdata/sf0.001", "--keep-going", *names],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "0 fail" in out.stdout
    assert out.stdout.count("PASS") == len(names)


def test_canary_window_flag_selects_gate_prefix():
    # --window + explicit names intersects, preserving gate membership: a
    # tail-only name under --window selects nothing (exit fast, no Spark job
    # beyond session startup is fine to pay once here). Pick the probe from
    # the CURRENT rotated-out set so it is tail-only by construction.
    tail_name = R15_ROTATED_OUT[0]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"),
         "--window", tail_name],
        capture_output=True, text=True, timeout=180, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "0 fail" in out.stdout
    assert tail_name not in out.stdout
