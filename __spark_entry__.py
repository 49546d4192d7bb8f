"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``data_engineer_capstone_spark`` package; this
module only adapts its query registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_capstone_spark.plans import get_oracles, get_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    return get_queries()["q30_tpch_q1_agg"](spark, "/root/testdata/sf0.001")


# Queries the driver already hash-verified in earlier rounds (the driver
# takes the head of this dict's iteration order). Rotating them to the back
# puts 50 not-yet-driver-checked queries at the head, so each round broadens
# driver verification; the local gate (tests/test_queries.py) still verifies
# the full registry either way.
_DRIVER_VERIFIED_R1_R2 = (
    "q01_full_scan", "q02_projection_arithmetic", "q03_predicates",
    "q04_compound_gate", "q20_broadcast_code_lookup", "q21_star_join_revenue",
    "q22_left_outer_null_probe", "q23_full_outer", "q24_left_semi",
    "q25_left_anti", "q26_range_join", "q27_cross_join",
    "q50_multi_col_sort_nulls", "q51_topk_limit", "q52_expr_sort",
    "q53_union_all_vs_distinct", "q54_intersect_except", "q55_select_distinct",
    "q56_union_alignment", "q57_pivot", "q58_unpivot", "q118_scalar_subquery",
    "q121_antijoin_scalar_avg", "q122_banded_range_join", "q128_table_diff",
    "q131_fuzzy_levenshtein_join", "q132_null_safe_join",
    "q133_recursive_hierarchy", "q134_date_spine", "q157_tuple_semi_join",
    "q158_bag_set_ops", "q159_lateral_aggregate", "q172_pareto_frontier",
    "q30_tpch_q1_agg", "q31_having", "q32_rollup", "q33_cube",
    "q34_grouping_sets", "q35_distinct_count_per_group",
    "q36_minmax_strings_dates", "q107_approx_sketches", "q119_corr_cov",
    "q125_histogram", "q127_argmax_per_group", "q130_mode_per_group",
    "q137_exact_percentiles", "q141_share_of_total", "q142_count_distribution",
    "q143_sorted_string_agg", "q151_group_by_all",
)


# Round-3 driver-green additions (the CORRECTNESS_r03.json sample minus the
# rows that changed this round — those re-front via _RECHECK_THIS_ROUND).
_DRIVER_VERIFIED_R3 = (
    "q224_semantic_dedup_lsh", "q225_simhash_pairs", "q226_pii_redaction",
    "q227_domain_mix_sample", "q228_ann_ivf_pq", "q229_salted_hot_key_join",
    "q230_asof_tolerance", "q232_fim_transform", "q233_udf_map_in_arrow",
    "q234_entity_resolution", "q235_ivm_delta_aggregate",
    "q236_spatial_grid_join", "q237_doc_chunking", "q238_cluster_keep_best",
    "q239_weighted_sample", "q240_rolling_median", "q241_bigram_novelty",
    "q242_common_neighbors", "q243_jaccard_prefix_filter",
    "q244_vocab_coverage", "q245_embedding_quantize", "q246_column_profile",
    "q247_winsorize", "q248_bpe_merge_step", "q249_winsorize_approx",
    "q250_kmeans_update_step", "q251_grouped_weighted_sample", "q252_exact_auc",
    "q152_weighted_avg", "q163_chi_square", "q164_regression_slope",
    "q169_median_abs_deviation", "q170_lag1_autocorr", "q171_entropy",
    "q40_row_number_topk", "q41_rank_dense_rank", "q42_lag_lead",
    "q43_running_sum", "q44_sliding_frame_ntile", "q117_sessionize",
    "q120_time_range_window", "q129_window_kit2", "q173_locf",
    "q174_contribution", "q60_string_kit", "q61_split_index",
    "q62_sas_epoch_date",
)


# Queries the driver actually flagged red in r3 (HUGEINT oracle typing,
# fixed by CAST AS BIGINT) — fronted so the fixes get driver rows
# immediately. The 8 latent-fixed oracles from the DESCRIBE sweep (q110,
# q116, q140, q153, q154, q177, q192, q217) were never driver-red; they
# are covered by the no-HUGEINT guard test + local hash gate and stay in
# the regular never-checked rotation, keeping sample slots free so every
# NEW query gets a first-time driver row this round (the ~50-row sample
# cannot hold rechecks + 45 new + latents at once).
_RECHECK_THIS_ROUND = (
    "q160_boolean_aggregates", "q175_new_vs_returning",
    "q231_hashed_linear_classifier",
)


# Queries registered this round: right after the rechecks so brand-new
# operators get driver rows in their first round out.
_NEW_THIS_ROUND: tuple[str, ...] = (
    "q253_ann_ivf_exhaustive", "q254_ann_ivf_pq_exhaustive",
    "q255_winsorize_sketch_exhaustive", "q256_ngram_containment",
    "q257_vocab_oov_rate", "q258_pmi_collocations",
    "q259_shard_manifest", "q260_mom_revenue_growth",
    "q261_kcore_peel", "q262_ewma_sequential_state",
    "q263_stream_rollup_maintenance", "q264_merge_matrix",
    "q265_conversion_attribution", "q266_langid_confusion",
    "q267_table_checksum", "q268_leakage_safe_split",
    "q269_session_depth_bounce", "q270_arrival_log2_histogram",
    "q271_weighted_median", "q272_linear_interpolation",
    "q273_benford_check", "q274_percentile_normalize",
    "q275_cohort_ltv_curve", "q276_interval_overlap_join",
    "q277_ohlc_bars", "q278_domain_token_overlap",
    "q279_embedding_gram_matrix", "q280_boilerplate_strip",
    "q281_negative_sampling", "q282_power_iteration",
    "q283_tfidf_topk", "q285_referential_integrity",
    "q287_calibration_table", "q288_stream_ohlc",
    "q289_key_skew_report", "q290_domain_minhash_overlap",
    "q291_grouped_ols", "q292_grouped_auc",
    "q293_minhash_merge_invariance", "q294_sampled_estimate",
    "q295_cascade_purge_audit", "q296_time_travel_consistency",
    "q297_pandas_api_tier", "q298_cusum_changepoint",
    "q299_ann_lsh_exhaustive", "q300_clamped_balance",
    "q301_point_in_time_features", "q302_late_dimension_replay",
    "q303_target_encoding_loo", "q304_subtree_rollup",
    "q305_matryoshka_overlap", "q306_slo_burn_rate",
    "q307_abc_classification", "q308_neyman_allocation",
    "q309_ks_two_sample", "q310_gini_coefficient",
    "q311_sequence_pattern", "q312_position_attribution",
    "q313_halfsample_ci", "q314_seasonal_index",
    "q315_decayed_popularity", "q316_sorted_neighborhood_pairs",
    "q317_silhouette_score", "q318_reshard_plan",
    "q319_bloom_segment_index", "q320_trailing_leaderboard",
    "q321_blocking_recall_report", "q322_count_min_sketch",
    "q323_fd_discovery", "q324_bfs_shortest_path", "q325_rrf_fusion",
    "q326_spearman_drift", "q327_expanding_cv_splits",
    "q328_mutual_information", "q329_stream_incremental_dedup",
    "q330_cogroup_pandas", "q331_hll_registers_deterministic",
    "q332_frequent_itemset_pairs", "q333_stream_stream_left_outer",
    "q334_skyline_pareto", "q335_triangle_count",
    "q336_clustering_coefficient", "q337_mad_outliers",
    "q338_nearest_centroid_confusion", "q339_dbscan_grid",
    "q340_hll_by_group", "q341_zipf_slope",
    "q342_personalized_pagerank", "q343_golden_record_survivorship",
    "q344_dedup_signal_agreement", "q345_ktruss_peel",
    "q346_kaplan_meier", "q347_readability",
    "q348_cuped_variance_reduction", "q349_caliper_matching",
    "q350_difference_in_differences", "q351_dedup_savings_report",
    "q352_apply_in_arrow", "q353_uplift_deciles",
    "q354_dynamic_gap_sessions", "q355_stream_dynamic_sessions",
    "q356_windowed_stream_join", "q357_inclusion_dependencies",
    "q358_set_overlap_upset", "q359_wasserstein_drift",
    "q360_cohens_kappa", "q361_theil_sen_slope",
    "q362_average_precision", "q363_ndcg_popularity",
    "q364_fifo_allocation", "q365_systematic_pps_sample",
    "q366_k_anonymity_audit", "q367_dag_longest_path",
    "q368_event_runs_rle", "q369_raking_ipf",
    "q370_rank_biased_overlap", "q371_forecast_backtest",
    "q372_label_noise_knn", "q373_peak_concurrency",
    "q374_boruvka_round", "q375_apportionment",
    "q376_merkle_range_diff", "q377_constrained_funnel",
    "q378_kendall_tau", "q379_market_concentration",
    "q380_kmv_theta_anotb", "q381_mutual_nn_pairs",
    "q382_cm_join_size", "q383_zorder_locality_audit",
    "q384_hellinger_drift", "q385_lead_lag_xcorr",
    "q386_cell_suppression", "q387_sql_udf_kit",
    "q388_hits_hubs_authorities", "q389_bellman_ford_sssp",
    "q390_binary_segmentation", "q391_shapley_attribution",
    "q392_watermark_lag_audit", "q393_bom_explosion",
    "q394_profile_diff_contract", "q395_isotonic_calibration",
    "q396_woe_information_value", "q397_winnowing_pairs",
    "q398_consistent_hashing", "q399_harmonic_centrality",
    "q400_phrase_search", "q401_srm_check",
    "q402_dwell_time_transitions", "q403_lorenz_curve",
    "q404_quantile_treatment_effects", "q405_bitemporal_asof",
    "q406_backfill_plan", "q407_price_volume_mix",
    "q408_ljung_box_portmanteau", "q409_covariate_shift_ess",
    "q410_nested_percentiles", "q411_expected_calibration_error",
    "q412_seasonal_strength",
)


def _rotate(reg: dict) -> dict:
    """Changed-oracle rechecks first, then this round's new queries, then
    never-driver-checked queries (registration order — scalar kits,
    reference pipeline, streaming, and the dedup/curation core lead), the
    already-verified 97 last; optional SPARK_GRAFT_QUERY_SUBSET
    (comma-separated names) narrows to an explicit subset."""
    subset = os.environ.get("SPARK_GRAFT_QUERY_SUBSET")
    if subset:
        want = [s.strip() for s in subset.split(",") if s.strip()]
        return {k: reg[k] for k in want if k in reg}
    verified = _DRIVER_VERIFIED_R1_R2 + _DRIVER_VERIFIED_R3
    front = _RECHECK_THIS_ROUND + _NEW_THIS_ROUND
    seen = set(verified) | set(front)
    out = {k: reg[k] for k in front if k in reg}
    out.update({k: v for k, v in reg.items() if k not in seen})
    out.update({k: reg[k] for k in verified if k in reg})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotate(get_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return _rotate(get_oracles())
