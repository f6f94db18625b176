"""Query catalog: every implemented operator from SURVEY.md §2 as a
(spark_query, duckdb_oracle_sql) pair.

``QUERIES[name](spark, sf_dir) -> DataFrame`` runs the Spark-side
implementation; ``ORACLES[name]`` is the equivalent ANSI SQL DuckDB
runs on the same parquet tables. Names are prefixed with the
SURVEY.md §2 inventory id they cover (p3=filter, j2=inner join,
w8=interpolation, ...) so coverage is auditable line-by-line.

Float-determinism contract (SURVEY.md §7.4): money sums use the
exact integer-cents trick (order-independent, bit-identical on any
partitioning and in any engine); O(1)-scale ratios are rounded to 6
decimals; regression/average outputs to 2-6. Both sides compute the
same expression shapes so values hash-match exactly.
"""

from trisk_datawrangle_spark.catalog.relational import (
    ORACLES as _REL_ORACLES,
    QUERIES as _REL_QUERIES,
)
from trisk_datawrangle_spark.catalog.llm import (
    ORACLES as _LLM_ORACLES,
    QUERIES as _LLM_QUERIES,
)
from trisk_datawrangle_spark.catalog.extended import (
    ORACLES as _EXT_ORACLES,
    QUERIES as _EXT_QUERIES,
)
from trisk_datawrangle_spark.catalog.scenarios import (
    ORACLES as _SCN_ORACLES,
    QUERIES as _SCN_QUERIES,
)

_ALL_QUERIES = {**_REL_QUERIES, **_LLM_QUERIES, **_EXT_QUERIES, **_SCN_QUERIES}
_ALL_ORACLES = {**_REL_ORACLES, **_LLM_ORACLES, **_EXT_ORACLES, **_SCN_ORACLES}

# Registration-order priority. The per-round correctness driver samples
# the FIRST N catalog entries (N=50), so ordering decides which entries
# get driver-verified each round. Round-7 window (per the r6 verdict's
# rotation ask #1): (1) the 27 entries whose latest driver proof was
# round 3 (pr5/pr6, lc1-lc3, d1/d2/d5/d6/d7, g3, q7, s7_seed,
# s1/s3/s4 similarity, e1/e2/e5, x1-x8); (2) new/changed entries this
# round are inserted right after them as they land; (3) 23 of the
# stalest round-4-proof entries (flagship/w0/a1/a4/j2/w7-w9/r1/t2/
# d3/d4/e3/e4/csv-excel-glob sources/a6_a7/f2_f9/f13/t4/t6). The
# displaced entries keep builder full-catalog emulation coverage and
# the remaining r4/r5/r6-proof cohort rotates forward in r8: next-up
# are the rest of the r4 cohort (fin_layered, q1_q4, q8, g1/g2, m3,
# c1-c3, e6, k1, q3/q5 TPC-H, cf5, r7_explode, x9, s2_lsh, w2, e7,
# e8, d8, x10, w1_assets, j3, w4_curation, s9_jsonl, a13, d9, d10),
# listed immediately after position 50 below in stalest-first order.
_PRIORITY = [
    "pr5_ipr_baseline_prices",
    "pr6_automotive_prices",
    "lc1_mp_steel_lc_prices",
    "lc2_ipr_lcoe_prices",
    "lc3_oxford_lcoe_ngfs_prices",
    "d1_exact_dedup",
    "d2_ngram_jaccard",
    "d5_embedding_dups",
    "d6_contamination",
    "d7_dedup_clusters",
    "g3_standardize_names",
    "q7_row_diff_report",
    "s7_seed_datasets",
    "s1_cosine_topk",
    "s3_cosine_topk_vectorized",
    "s4_ivf_topk",
    "e1_tumbling_window",
    "e2_json_extract",
    "e5_rollup_range",
    "x1_lang_id",
    "x2_token_stats",
    "x3_quality_score",
    "x4_fingerprint",
    "x5_deterministic_split",
    "x6_stratified_take",
    "x7_repetition_score",
    "x8_sequence_pack",
    # new in r7 (per the rotation plan above: new/changed entries
    # insert here): probe-only index-serving entries, same hard
    # oracles as d13/s7 but measuring the pruned probe path alone
    "d13_probe_serving",
    "s7_probe_serving",
    "x30_kmeans_clusters",
    "x31_semdedup_clustered",
    "d15_dedup_clusters_scale",
    "x32_source_vocab_overlap",
    "x33_length_profile",
    # new in r7, second batch (curation/decomposition/ANN additions —
    # never driver-proofed, so they outrank re-proof rotation): the
    # displaced r4-proof cohort (w7 onward) rotates into r8's window
    "d16_prefix_filter_jaccard",
    "v3_embedding_covariance",
    "s8_pca_ivf_recall",
    "s9_sq8_recall",
    "x34_gopher_rules",
    "x35_dsir_weights",
    "x36_duplicate_spans",
    "x37_bpe_encode",
    "x38_dsir_resample",
    "x39_scrub_spans",
    "x40_ewma",
    "x41_zipf_spectrum",
    "x42_novelty_rate",
    "x43_source_copy_matrix",
    "x44_psi_drift",
    "x45_maximal_spans",
    "flagship_market_share",
    "w0_run_workflow_e2e",
    "a1_pricing_summary",
    "a4_median",
    "j2_inner_join_revenue",
    "w7_locf_fill",
    "w8_interpolate_keep_edges",
    "w9_lm_extrapolate",
    "r1_melt",
    "t2_complete_cross",
    "d3_minhash_lsh",
    "d4_simhash",
    "e3_asof_join",
    "e4_interval_join",
    "s1_s6_csv_roundtrip",
    "s2_semicolon_csv",
    "s3_excel_roundtrip",
    "s8_glob_union",
    "a6_a7_wide_year_sums",
    "f2_f9_scalar_bundle",
    "f13_row_sum",
    "t4_extend_years_constant",
    "t6_backfill_from_year",
    "w4_curation_e2e",
    "x15_cluster_safe_split",
    "x16_source_cap",
    "x17_lm_score",
    "e10_stream_static_join",
    "s10_orc_roundtrip",
    "x18_quantile_bins",
    "x19_group_zscore",
    "m4_frame_sample",
    "d11_incremental_dedup",
    "v1_label_centroids",
    "v2_nearest_centroid",
    "x20_tfidf_keywords",
    "e11_stream_dedup",
    "x21_rolling_stats",
    "k2_salted_join",
    "d12_edit_distance_verify",
    "e12_late_data_report",
    "x23_winsorize",
    "cp1_ngfs_carbon_price",
    "w3_datalake_e2e",
    "s5_ivf_pq_topk",
    "s6_pq_recall",
    "e9_sliding_window",
    "st1_stateful_running_totals",
    "x11_token_topk",
    "x12_cms_freq_gate",
    "x13_doc_chunking",
    "x14_bm25",
    "d9_bloom_decontamination",
    "d10_block_dedup",
    "a13_approx_median_gate",
    "p1_project_rename",
    "p3_filter_isin",
    "p4_filter_regex",
    "p6_filter_any_null",
    "p7_distinct",
    "p8_distinct_keep_first",
    "p9_first_year_positive",
    "j1_left_join",
    "j4_anti_join",
    "j5_semi_join",
    "j6_right_join",
    "j7_cross_join",
    "j8_global_share",
    "j9_closest_parent",
    "j10_majority_pick",
    "a2_sum_or_null",
    "a3_mean",
    "s9_jsonl_roundtrip",
    "fin_layered_median_cascade",
    "q1_q4_assert_summary",
    "q8_incomplete_groups",
    "g1_containment_pairs",
    "g2_regroup_rename",
    "m3_multimodal_features",
    "c1_curate_exact",
    "c2_curate_near_dedup",
    "c3_cluster_canonical",
    "e6_hll_distinct_rollup",
    "k1_salted_count_distinct",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "cf5_oxford_capacity_factors",
    "r7_explode_words",
    "x9_normalize_text",
    "s2_lsh_bucket_topk",
    "w2_asset_country_filters",
    "e7_asof_forward",
    "e8_session_window",
    "d8_normalized_dedup",
    "x10_weighted_take",
    "w1_assets_e2e",
    "j3_full_outer_natural",
    "q9_fk_integrity",
    "d13_persisted_index_dedup",
    "s7_ivf_pq_persisted",
    "m1_multimodal_decode",
    "m2_multimodal_resize",
    "x22_mixture_sample",
    "x24_pii_scrub",
    "x25_curriculum_order",
    "x26_bpe_pair_stats",
    "x27_temperature_mixture",
    "d14_semantic_dedup",
    "x28_global_sample",
    "x29_cdc_chunks",
    "u1_union_by_name",
    "u2_clone_recode",
    "u3_union_precedence",
    "f1_recode",
    "f10_unit_convert",
    "f11_f12_null_gates",
    "f14_safe_div",
    "a5_a12_counts",
    "a8_minmax",
    "a9_bool_reduce",
    "a10_collect_sorted",
    "a11_first_by_order",
    "r3_pivot_wider",
    "r4_r5_strings",
    "r6_one_hot",
    "r8_fan_out",
    "t3_missing_combinations",
    "t5_zero_after_last",
    "q5_missings_report",
    "q6_duplicates_report",
    "w1_baseline_index",
    "w4_row_number",
    "w6_group_max_ratio",
    "sc1_weo_geco_wrangle",
    "sc2_weo23_wrangle",
    "sc3_ngfs_wrangle",
    "sc4_ipr_wrangle",
    "sc5_oxford_wrangle",
    "sc6_steel_wrangle",
    "cf1_ngfs_capacity_factors",
    "cf2_ipr_capacity_factors",
    "cf3_weo2023_capacity_factors",
    "cf4_gem_steel_capacity_factors",
    "pr1_weo2021_prices",
    "pr2_ngfs_prices",
    "pr3_ipr_prices",
    "pr4_oxford_prices",
]

_ordered = [n for n in _PRIORITY if n in _ALL_QUERIES]
_ordered += [n for n in _ALL_QUERIES if n not in set(_ordered)]
QUERIES = {n: _ALL_QUERIES[n] for n in _ordered}
ORACLES = {n: _ALL_ORACLES[n] for n in _ordered if n in _ALL_ORACLES}

assert set(ORACLES) <= set(QUERIES), "oracle without query"
