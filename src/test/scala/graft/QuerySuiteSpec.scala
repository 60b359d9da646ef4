package graft

import org.scalatest.funsuite.AnyFunSuite

/** One check per declared operator: row count at sf0.001 equals the
  * DuckDB-oracle-measured golden value (the full value-level diff runs
  * via Verify + scripts/diff_oracle.py, driver t2, and did ALL PASS at
  * sf0.001/0.01/0.1 — this spec pins each operator against regression
  * in-repo). */
class QuerySuiteSpec extends AnyFunSuite {
  import SharedSpark._

  val golden: Map[String, Long] = Map(
    "scan_project" -> 590L, "filter_complex" -> 83L, "scan_prune_minmax" -> 1L,
    "join_inner_multi" -> 25L, "join_broadcast_dim" -> 25L, "join_left_outer" -> 25L,
    "join_full_outer" -> 25L, "join_semi" -> 130L, "join_anti" -> 3L,
    "join_range_theta" -> 5L, "join_asof" -> 178L, "agg_hash_q1" -> 6L,
    "agg_count_distinct" -> 5L, "agg_rollup" -> 31L, "agg_cube" -> 24L,
    "agg_grouping_sets" -> 105L, "agg_stats" -> 5L, "agg_having" -> 10L,
    "win_rank_topn" -> 60L, "win_lag_lead" -> 1000L, "win_moving_frame" -> 1000L,
    "win_running_total" -> 1500L, "win_ntile_dist" -> 150L, "topk_per_group" -> 75L,
    "win_first_last" -> 1500L, "win_range_1h" -> 1000L, "set_ops_all" -> 3L,
    "fn_string2" -> 200L, "agg_median_quantile" -> 3L, "agg_string_agg" -> 25L,
    "funnel_click_purchase" -> 15L, "fn_date2" -> 301L, "agg_stats2" -> 3L,
    "latest_per_key" -> 15L, "retention_daily" -> 30L, "fn_format" -> 401L,
    "pivot_dynamic" -> 5L, "unpivot_long" -> 9L, "fn_regex" -> 200L,
    "fn_array2" -> 300L, "win_ratio" -> 1000L, "fn_nulls" -> 1500L,
    "join_lateral_topn" -> 50L, "tpch_q3_shape" -> 20L, "tpch_q5_shape" -> 1L,
    "sort_multi_limit" -> 100L, "set_union" -> 107L, "set_intersect" -> 143L,
    "set_except" -> 7L, "fn_string" -> 200L, "fn_date" -> 501L,
    "fn_datediff_join" -> 4015L, "fn_math" -> 4015L, "fn_conditional" -> 1500L,
    "fn_array" -> 500L, "fn_explode_unnest" -> 500L, "fn_json" -> 5L,
    "text_wordcount" -> 20L, "text_stats" -> 5L, "text_bigrams" -> 20L,
    "dedup_exact" -> 200L, "dedup_near_jaccard" -> 69L, "sim_cosine_topk" -> 50L,
    "sim_knn_label" -> 10L, "multimodal_join" -> 10L,
    "pipeline_token_count" -> 72L, "pipeline_quality_score" -> 72L,
    "pipeline_lang_id" -> 25L, "pipeline_fingerprint" -> 100L,
    "dedup_simhash" -> 7L, "dedup_minhash_lsh" -> 8L, "dedup_clusters" -> 8L,
    "sim_cosine_neardup" -> 61L,
    "sample_deterministic" -> 161L, "sample_stratified" -> 3L,
    "sample_hash_split" -> 2L, "ts_resample_gapfill" -> 150L,
    "ann_ivf_topk" -> 50L, "graph_degree" -> 50L, "graph_2hop" -> 199L,
    "graph_triangles" -> 1L, "graph_cc_labelprop" -> 1L, "graph_bfs_3hop" -> 200L,
    "graph_pagerank3" -> 30L, "stream_tumbling_1h" -> 868L,
    "stream_sliding_1h_30m" -> 1065L, "stream_sessionize" -> 15L,
    "subq_correlated" -> 75L, "subq_scalar_uncorrelated" -> 380L,
    "cte_chain_top_supplier" -> 1L, "pivot_manual" -> 30L,
    // round-3 additions (§2.12)
    "agg_mode" -> 3L, "agg_histogram" -> 10L, "join_salted" -> 3L,
    "win_percent_rank_cume" -> 150L, "fn_bitwise" -> 116L, "fn_hash" -> 46L,
    "cdc_scd2" -> 53L, "graph_jaccard_neighbors" -> 71L,
    // round-3 widening: TPC-H Q2/Q18 shapes, arg-extremes, trailing
    // z-score anomaly, try_cast hygiene
    "tpch_q2_shape" -> 18L, "tpch_q18_shape" -> 20L, "agg_argminmax" -> 3L,
    "ts_anomaly_zscore" -> 130L, "fn_try_cast" -> 150L,
    // round-4 widening: bilateral region volume, market share,
    // returned-item revenue
    "tpch_q7_shape" -> 14L, "tpch_q8_shape" -> 7L, "tpch_q10_shape" -> 20L,
    // true recursive CTEs (WITH RECURSIVE on BOTH engines)
    "graph_reach_rcte" -> 200L, "rcte_month_spine" -> 84L,
    // running count-distinct window, exact-moment corr/regression,
    // bitmap-exact distinct
    "win_distinct_running" -> 1000L, "agg_corr_regr" -> 3L,
    "agg_bitmap_distinct" -> 5L,
    // non-parquet sources proven end-to-end (oracle reads the parquet)
    "src_csv_roundtrip" -> 10L, "src_json_roundtrip" -> 5L,
    "src_orc_roundtrip" -> 3L,
    // gaps-and-islands consecutive-day streaks, moving exact median
    "win_gaps_islands" -> 15L, "win_moving_median" -> 1000L,
    // benchmark decontamination + domain-mixture reweighting
    "pipeline_contamination" -> 22L, "pipeline_domain_mix" -> 20L,
    // tf-idf top terms, binned interval-overlap join
    "pipeline_tfidf_topterms" -> 138L, "join_interval_overlap" -> 2L,
    // promo revenue share, OR-of-ANDs pushdown
    "tpch_q14_shape" -> 83L, "tpch_q19_shape" -> 1L,
    // repetition quality signals, exact weighted median
    "pipeline_repetition_score" -> 167L, "agg_weighted_median" -> 3L,
    // one-shuffle 3-step funnel, per-user event-type entropy
    "funnel_three_step" -> 15L, "agg_entropy" -> 15L,
    // fixed-size per-stratum sample
    "sample_k_per_group" -> 25L,
    // blocked Levenshtein fuzzy match
    "fn_fuzzy_match" -> 2L,
    // iterative-deletion 3-core, exact rank-formula Gini
    "graph_kcore3" -> 200L, "agg_gini" -> 3L,
    // hourly OHLC downsampling
    "ts_ohlc" -> 531L,
    // Pareto concentration, containment near-dup
    "pareto_revenue" -> 3L, "dedup_containment" -> 8L,
    // null-safe equi-join, symmetric difference
    "join_null_safe" -> 15L, "set_symmetric_diff" -> 58L,
    // point-in-time (AS OF) dimension lookup against the SCD2 build
    "join_point_in_time" -> 9L,
    // vocab-driven subword tokenization (1/13 doc sample)
    "pipeline_subword_count" -> 39L,
    // round-6 additions: higher moments, resetting running total,
    // clustering coefficient, normalized dedup, length histogram
    "agg_higher_moments" -> 3L, "win_reset_running_total" -> 60L,
    "graph_clustering_coeff" -> 200L, "dedup_exact_normalized" -> 200L,
    "pipeline_len_histogram" -> 44L,
    // round-6 widening: FILTER-clause aggregates, tolerance as-of,
    // calendar heatmap, base64 roundtrip
    "agg_filtered" -> 3L, "join_asof_tolerance" -> 202L,
    "ts_calendar_heatmap" -> 167L, "fn_base64_roundtrip" -> 10L,
    // round-6 TPC-H completion: all 22 query shapes now present
    // (q1 = agg_hash_q1, q15 = cte_chain_top_supplier)
    "tpch_q4_shape" -> 5L, "tpch_q6_shape" -> 1L, "tpch_q9_shape" -> 70L,
    "tpch_q11_shape" -> 14L, "tpch_q12_shape" -> 3L, "tpch_q13_shape" -> 14L,
    "tpch_q16_shape" -> 34L, "tpch_q17_shape" -> 1L, "tpch_q20_shape" -> 5L,
    "tpch_q21_shape" -> 10L, "tpch_q22_shape" -> 1L,
    // round-6 widening: rolling correlation, inter-arrival quantiles,
    // daily cohort retention, dedup-rate + vocab-growth telemetry
    "ts_rolling_corr" -> 531L, "ts_interarrival_quantiles" -> 15L,
    "ts_cohort_retention" -> 30L, "pipeline_dedup_rate_by_source" -> 20L,
    "pipeline_vocab_growth" -> 20L,
    // round-6 widening: degree assortativity, per-label embedding cohesion
    "graph_assortativity" -> 1L, "sim_label_cohesion" -> 10L,
    // round-6 widening: BM25 retrieval, boilerplate n-grams, robust MAD
    "text_bm25_score" -> 483L, "pipeline_boilerplate_ngrams" -> 20L,
    "agg_mad" -> 3L,
    // round-6 widening: Q15 top supplier, unigram-LM scoring, Zipf
    // fit, trailing EWMA
    "tpch_q15_shape" -> 1L, "pipeline_unigram_logprob" -> 500L,
    "pipeline_zipf_fit" -> 1L, "ts_ewma" -> 1000L,
    // round-6 widening: attribution, Markov transitions, Adamic-Adar
    "ts_attribution_last_touch" -> 66L, "ts_markov_transitions" -> 25L,
    "graph_adamic_adar" -> 100L,
    // round-6 widening: n-gram novelty, centroid drift, Theil index
    "pipeline_ngram_novelty" -> 500L, "sim_label_centroid_drift" -> 10L,
    "agg_theil_index" -> 3L,
    // round-6 widening: multi-measure pivot, per-user trend slope
    "pivot_multi_measure" -> 30L, "ts_trend_slope" -> 15L,
    // round-7 widening: Benford audit, degree octaves, sweep-line
    // concurrency, 10-min bursts, bigram LM, adjacent-cosine QA
    "agg_benford_first_digit" -> 9L, "graph_degree_distribution" -> 4L,
    "ts_peak_concurrency" -> 30L, "ts_burst_10min" -> 15L,
    "pipeline_bigram_logprob" -> 500L, "sim_adjacent_cosine" -> 10L,
    // round-7 widening: HHI concentration, char entropy, lang margin
    "agg_hhi" -> 25L, "text_char_entropy" -> 46L,
    "pipeline_lang_margin" -> 167L,
    // round-7 widening: DAU/WAU stickiness, revenue growth, edge weights
    "ts_active_users_rolling" -> 30L, "ts_daily_revenue_growth" -> 30L,
    "graph_edge_weight_distribution" -> 4L,
    // round-7 widening: IQR outliers, length percentiles, norm audit,
    // session durations
    "agg_iqr_outliers" -> 3L, "pipeline_length_percentiles" -> 20L,
    "sim_norm_audit" -> 1L, "ts_session_duration_stats" -> 30L,
    // round-7 widening: partitioned roundtrip, error-rate monitor,
    // time-to-purchase, vocab overlap — contract lands on 200
    "src_partitioned_roundtrip" -> 30L, "ts_error_rate_hourly" -> 531L,
    "ts_time_to_purchase" -> 210L, "pipeline_vocab_overlap" -> 10L,
    // round-7 widening: decile report, cross-source dup flow
    "agg_decile_table" -> 10L, "pipeline_dedup_cross_source" -> 8L,
    // round-8 widening (§2.18): seasonality/engagement/robust-anomaly
    // telemetry, data-quality audits, forward as-of, rolling band,
    // text diversity/entropy/PMI, triangle participation, fn families
    "ts_dow_profile" -> 7L, "ts_day_hour_heatmap" -> 167L,
    "ts_mau_stickiness" -> 1L, "ts_autocorr_lag1" -> 1L,
    "ts_anomaly_mad" -> 30L, "ts_user_lifecycle" -> 15L,
    "agg_top1pct_share" -> 1L, "agg_hist2d" -> 30L,
    "agg_null_profile" -> 3L, "agg_dup_key_audit" -> 1L,
    "agg_weighted_avg" -> 3L, "agg_bool_logic" -> 5L,
    "join_asof_forward" -> 194L, "win_rolling_band" -> 30L,
    "pipeline_ttr" -> 9L, "pipeline_bigram_cond_entropy" -> 1L,
    "pipeline_dup_degree_distribution" -> 1L, "pipeline_pmi_top" -> 465L,
    "text_word_len_histogram" -> 6L, "graph_triangle_participation" -> 103L,
    "fn_array_setops" -> 400L, "fn_math2" -> 3201L,
    // round-8 second batch (§2.18b): sequence audit, rollup share,
    // new-vs-returning, rank variants, group cum-share, hapax, strings
    "agg_sequence_gaps" -> 1L, "agg_share_of_parent" -> 25L,
    "ts_new_vs_returning" -> 30L, "win_rank_variants" -> 1204L,
    "win_group_cumshare" -> 1500L, "pipeline_hapax_ratio" -> 20L,
    "fn_string3" -> 200L,
    // round-8 third batch (§2.18c): streaks, robust trend, MoM growth,
    // chi-squared, basket pairs, RFM, nearest as-of, drawdown, WITH
    // TIES, JSD, coverage curve, calendar-boundary dates
    "ts_streak_longest" -> 15L, "ts_theil_sen" -> 1L,
    "ts_mom_growth" -> 386L, "agg_chi2_dow" -> 1L,
    "agg_basket_pairs" -> 300L, "agg_rfm_segments" -> 64L,
    "join_asof_nearest" -> 210L, "win_drawdown" -> 1094L,
    "win_top_with_ties" -> 11L, "pipeline_js_divergence" -> 190L,
    "pipeline_top_token_coverage" -> 5L, "fn_date3" -> 301L,
    // round-8 fourth batch (§2.18d): activity entropy, runs test,
    // group quantiles, winsorized mean, Lorenz points, array family,
    // neighbor-degree curve
    "ts_activity_entropy" -> 15L, "ts_runs_test" -> 1L,
    "agg_group_quantiles" -> 5L, "agg_winsorized_mean" -> 1L,
    "agg_lorenz_points" -> 10L, "fn_array3" -> 72L,
    "graph_avg_neighbor_degree" -> 40L,
    // round-8 fifth batch (§2.18e): two-sample tests, MI, covariance
    // matrix, ANOVA, CUSUM, lag/dormancy profiles, minhash
    // calibration, burstiness, rich club, sequence generators
    "agg_ks_test" -> 1L, "agg_mann_whitney" -> 1L,
    "agg_mutual_information" -> 1L, "agg_cov_matrix" -> 6L,
    "agg_anova_f" -> 1L, "ts_cusum" -> 1094L,
    "ts_order_to_ship_lag" -> 338L, "ts_dormancy_buckets" -> 3L,
    "pipeline_minhash_calibration" -> 2L, "pipeline_burstiness" -> 20L,
    "graph_rich_club" -> 4L, "fn_sequence" -> 16L,
    // round-8 sixth batch (§2.18f): map functions, elasticity, order
    // backlog, weekday ANOVA, token positions, cosine histogram,
    // core decomposition
    "fn_map" -> 15L, "agg_discount_elasticity" -> 11L,
    "ts_order_backlog" -> 1631L, "ts_weekday_anova" -> 1L,
    "pipeline_token_positions" -> 10L, "sim_cosine_histogram" -> 11L,
    "graph_core_decomposition" -> 4L,
    // round-8 seventh batch (§2.18g): discrete quantiles, magnitude
    // histogram, transitivity, rebalancing sample, char trigrams,
    // weekend effect
    "agg_quantiles_disc" -> 7L, "agg_magnitude_histogram" -> 3L,
    "graph_transitivity" -> 1L, "sample_rebalance" -> 20L,
    "pipeline_char_trigrams" -> 15L, "ts_weekend_effect" -> 2L,
    // round-8 eighth batch (§2.18h): mix-shift monitor, brand
    // homophily, length-vocab correlation, anchor separation
    "ts_priority_mix_shift" -> 80L, "graph_brand_homophily" -> 1L,
    "pipeline_len_vocab_corr" -> 1L, "sim_anchor_separation" -> 45L,
    // round-8 ninth batch (§2.18i): skyline, prefiltered semi join
    "join_skyline" -> 4L, "join_semi_prefilter" -> 539L,
    // round-8 tenth batch (§2.18j): cohort LTV, revenue bridge
    "ts_cohort_ltv" -> 5L, "ts_revenue_bridge" -> 5L,
    // round-8 eleventh batch (§2.18k): Kaplan-Meier survival
    "ts_survival_km" -> 1144L,
    // §2.19 (round 9)
    "agg_spearman_corr" -> 1L, "agg_order_total_audit" -> 3L,
    "ts_changepoint" -> 1L, "ts_seasonal_decompose" -> 1088L,
    "ts_fano_factor" -> 5L, "sim_dim_variance" -> 64L,
    "sim_quantization_error" -> 1L, "graph_weighted_pagerank3" -> 30L,
    "pipeline_dup_length_bias" -> 2L,
    // §2.20 (round 9, second batch)
    "win_pattern_match" -> 4L, "win_session_path_topk" -> 10L,
    "sample_weighted_bernoulli" -> 20L, "pipeline_simhash_bit_balance" -> 32L,
    "graph_closeness_3hop" -> 30L, "graph_weighted_sssp" -> 200L,
    // §2.20 ANN-quality pair
    "sim_ann_recall" -> 10L, "sim_kmeans_inertia" -> 8L,
    // §2.21 (round 9, third batch)
    "sim_kmeans_reassign" -> 8L, "pipeline_dup_ngram_coverage" -> 115L,
    "pipeline_dedup_keep_policy" -> 20L, "pipeline_shard_balance" -> 1L,
    "pipeline_chunk_packing" -> 1L, "ts_forecast_wape" -> 79L,
    // §2.22 (round 9, fourth batch)
    "set_division" -> 25L, "graph_ego_density" -> 10L,
    "dedup_semantic_clusters" -> 39L, "win_interval_merge" -> 14L,
    "ts_did_lift" -> 1L, "ts_seasonal_index" -> 12L,
    // §2.23 (round 9, fifth batch)
    "sim_mmr_topk" -> 50L, "sim_knn_accuracy" -> 10L,
    "sim_centroid_outliers" -> 21L, "dedup_idf_jaccard" -> 8L,
    // §2.24 (round 9, sixth batch)
    "geo_nearest_anchor" -> 5L, "agg_jackknife_loo" -> 1L,
    "agg_kendall_tau" -> 1L, "win_time_weighted_avg" -> 8L,
    "sim_silhouette_simplified" -> 10L, "cdc_merge_apply" -> 3L,
    // §2.25 (round 9, seventh batch)
    "agg_hodges_lehmann" -> 1L, "agg_recency_decay" -> 25L,
    "agg_best_split_gini" -> 10L, "ts_efficiency_ratio" -> 80L,
    "sample_neyman_allocation" -> 20L, "dedup_winnowing" -> 28L,
    // §2.26 (round 9, eighth batch)
    "fn_nested_collect" -> 15L, "agg_ab_proportions_ztest" -> 1L,
    "agg_calibration_error" -> 11L, "agg_fk_violations" -> 1L,
    "src_schema_evolution" -> 3L, "text_collocation_llr" -> 20L,
    // §2.27 (round 9, ninth batch)
    "sample_ht_estimate" -> 20L, "agg_table_checksum" -> 3L,
    "agg_bitmap_overlap" -> 10L, "pipeline_heldout_nll" -> 5L,
    "ts_extreme_value_moments" -> 1L, "sim_metric_agreement" -> 30L,
    // §2.28 (round 10, declaration batch)
    "ts_mann_kendall" -> 1L, "agg_price_index" -> 1L,
    "sim_hubness_skew" -> 1L,
    // §2.29 (round 10, data-selection / drift / ranking-eval batch)
    "pipeline_gopher_quality" -> 20L, "pipeline_dsir_selection" -> 5L,
    "sim_ndcg_at10" -> 30L, "agg_cramers_v" -> 3L,
    "agg_psi_drift" -> 10L, "sample_systematic" -> 30L,
    // §2.30 (round 10, experiment & sequence analytics batch)
    "agg_welch_ttest" -> 1L, "agg_mcnemar_paired" -> 1L,
    "agg_power_mde" -> 1L, "funnel_seq2_support" -> 25L,
    "text_log_odds" -> 20L, "graph_katz_3" -> 20L,
    // §2.31 (round 10, scale-infrastructure & advanced eval batch)
    "join_bloom_prefilter" -> 1L, "src_corrupt_tolerant_scan" -> 1L,
    "sample_bootstrap_ci" -> 1L, "sim_triplet_violations" -> 30L,
    "ts_holt_linear" -> 1L, "graph_ppr_seed" -> 20L,
    // §2.32 (round 10, growth & engagement accounting batch)
    "agg_growth_accounting" -> 80L, "agg_distinct_growth_curve" -> 126L,
    "agg_inter_purchase_gap" -> 1L, "ts_bounce_rate_daily" -> 30L,
    "ts_abandoned_cart_daily" -> 30L, "win_streak_current" -> 15L,
    // §2.33 (round 10, forensics & ranking-eval batch)
    "agg_duplicate_payment_audit" -> 1L, "agg_round_number_bias" -> 1L,
    "agg_split_transaction_detect" -> 1L, "win_order_gap_outliers" -> 20L,
    "sim_rbo_rankings" -> 30L, "sim_dim_ablation_overlap" -> 30L,
    // §2.34 (round 10, distribution-diagnostics batch)
    "agg_qq_price_segments" -> 10L, "agg_equi_depth_histogram" -> 10L,
    "agg_trimmed_mean" -> 1L, "ts_acf_weekly" -> 4L,
    "pipeline_doclen_gini" -> 20L, "sample_allocation_compare" -> 1L,
    // §2.35 (round 11, sequential-inference batch)
    "agg_sprt_decision" -> 15L, "agg_eprocess_summary" -> 1L,
    "sample_conformal_interval" -> 4L, "sample_conformal_coverage" -> 4L,
    "pipeline_bpe_fertility" -> 5L, "ts_cusum_top" -> 20L,
    // §2.36 (round 11, experimentation & sequence batch)
    "agg_cuped_adjust" -> 2L, "agg_srm_check" -> 1L,
    "agg_auc_reorder" -> 1L, "agg_ratio_delta_ci" -> 2L,
    "ts_retention_half_life" -> 1L, "ts_conditional_entropy" -> 5L,
    // §2.37 (round 11, forecasting & guardrails batch)
    "ts_holt_winters" -> 7L, "agg_poisson_rate_test" -> 1L,
    "agg_covariate_balance" -> 1L, "sample_class_balance" -> 5L,
    "agg_capture_recapture" -> 1L, "agg_hhi_concentration" -> 1L,
    // §2.38 (round 11, targeting & corpus-shape batch)
    "agg_decile_lift" -> 10L, "agg_repeat_purchase_rate" -> 4L,
    "pipeline_vocab_coverage_points" -> 3L, "dedup_prefix_cluster" -> 20L,
    "win_revenue_dominance" -> 10L, "sample_kfold_assign" -> 5L,
    // §2.39 (round 12, substring-dedup & retrieval batch)
    "dedup_substring_spans" -> 27L, "pipeline_dup_span_coverage" -> 20L,
    "sim_rrf_fusion" -> 20L,
    // §2.40 (round 12, eval & aggregation-bias batch)
    "agg_cohens_kappa" -> 1L, "agg_simpson_slope_flip" -> 3L,
    "agg_tail_index_hill" -> 1L,
    // §2.41 (round 12, retrieval-eval, LM & factorial batch)
    "sim_mrr_at10" -> 30L, "sim_map_at10" -> 30L,
    "pipeline_kneser_ney_nll" -> 5L, "pipeline_token_budget_mix" -> 20L,
    "agg_anova_two_way" -> 1L, "ts_xcorr_lags" -> 15L,
    // §2.42 (round 12, periodicity, sampling-design & structure batch)
    "ts_dominant_period" -> 29L, "ts_hot_streak_kadane" -> 1L,
    "sample_pps_systematic" -> 5L, "agg_quantile_treatment_effect" -> 9L,
    "graph_hits_bipartite" -> 10L, "src_text_roundtrip" -> 20L,
    // §2.43 (round 12, survival, reliability & structure batch)
    "ts_logrank_segments" -> 1L, "agg_icc_intraclass" -> 1L,
    "agg_partial_corr" -> 1L, "text_burrows_delta" -> 10L,
    "graph_local_bridges" -> 10L, "dedup_threshold_sweep" -> 10L,
    // §2.44 (round 12, long-memory, robust-inference & wire-format batch)
    "ts_hurst_exponent" -> 5L, "ts_chow_break" -> 1L,
    "ts_newey_west" -> 8L, "win_leaderboard_churn" -> 82L,
    "pipeline_cronbach_alpha" -> 1L, "src_gzip_roundtrip" -> 5L,
    // §2.45 (round 12, distributional distance, matching & layout batch)
    "agg_wasserstein_1d" -> 1L, "agg_mahalanobis_outliers" -> 20L,
    "dedup_span_templates" -> 20L, "ts_pacf_lag2" -> 1L,
    "sample_cem_matching" -> 51L, "src_bucketed_roundtrip" -> 5L,
    // round 13 (§2.46)
    "pipeline_pii_profile" -> 20L, "pipeline_pii_redact" -> 56L,
    "pipeline_span_excised_tokens" -> 20L,
    // round 13 (§2.47)
    "graph_bipartite_degree_profile" -> 12L,
    "graph_bipartite_assortativity" -> 1L,
    "graph_cosupply_supplier_sim" -> 20L,
    // round 13 (§2.48)
    "ts_permutation_entropy" -> 6L, "ts_sample_entropy" -> 1L,
    "ts_variance_ratio" -> 3L, "text_yule_k" -> 5L,
    "pipeline_mattr" -> 5L,
    // round 13 (§2.49)
    "agg_mood_median_test" -> 1L, "ts_ljung_box" -> 7L,
    "pipeline_url_profile" -> 20L, "pipeline_chunk_windows" -> 20L,
    // round 13 (§2.50)
    "agg_k_anonymity" -> 6L, "agg_wilcoxon_signed_rank" -> 1L,
    "ts_seasonal_naive_skill" -> 1L,
    // round 14 (§2.51–§2.52)
    "pipeline_html_extract" -> 20L, "pipeline_unicode_census" -> 20L,
    "pipeline_encoding_repair" -> 20L, "pipeline_url_dedup" -> 20L,
    "pipeline_boilerplate_lines" -> 20L,
    // round 14 (§2.53)
    "agg_brown_forsythe" -> 1L, "ts_turning_points" -> 1L,
    "pipeline_char_class_profile" -> 20L,
    // round 14 (§2.54)
    "ts_friedman_test" -> 1L, "ts_page_trend" -> 1L,
    // round 15 (§2.55)
    "pipeline_nfkc_census" -> 20L, "pipeline_export_manifest" -> 14L,
    // round 15 (§2.56)
    "agg_quantile_skew" -> 1L, "agg_grubbs_max" -> 1L,
    "agg_kruskal_wallis" -> 1L, "agg_g_test_dow" -> 1L,
    "ts_kendall_w" -> 1L, "pipeline_boilerplate_removal" -> 20L,
    // round 15 (§2.57–§2.58)
    "agg_bartlett" -> 1L, "agg_jonckheere" -> 1L, "ts_cochran_q" -> 1L,
    "pipeline_sentence_profile" -> 20L, "pipeline_readability" -> 20L,
    "pipeline_export_balance" -> 1L,
    // round 16 (§2.59–§2.60)
    "pipeline_export_tokenized" -> 23L,
    "pipeline_mix_manifest" -> 20L,
    "pipeline_mix_census" -> 20L,
    "dedup_sentence_spans" -> 30L,
    "pipeline_sentence_excision" -> 20L,
    "pipeline_ppl_tier_mix" -> 60L,
    "agg_cvm_test" -> 1L)

  test("queries and oracleSql cover the same operator set") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.keySet == golden.keySet)
  }

  /** Guard against the round-9 drift (3 queries shipped in
    * SparkEntry.queries but never declared in SURVEY §2): parse the
    * backticked names out of SURVEY.md's §2 and assert set-equality
    * with the registry. Query names are recognized by their family
    * prefix, which filters out the SQL function names §2's prose also
    * backticks. */
  test("SURVEY.md §2 declares exactly the registered query set") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val start = survey.indexOf("## 2. Operator inventory")
    val end = survey.indexOf("\n## 3.", start)
    assert(start >= 0 && end > start, "SURVEY.md §2 boundaries not found")
    val sect = survey.substring(start, end)
    val prefixes = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    val declared = "`([a-z][a-z0-9_]+)`".r.findAllMatchIn(sect)
      .map(_.group(1))
      .filter(n => n.contains('_') && prefixes.contains(n.takeWhile(_ != '_')))
      .toSet
    val undeclared = SparkEntry.queries.keySet -- declared
    val stale = declared -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"registered but not in SURVEY §2: $undeclared")
    assert(stale.isEmpty, s"in SURVEY §2 but not registered: $stale")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Guard against the round-10 drift (the contract grew 374 → 380
    * after the binding BASELINE row was derived, leaving the budget
    * priced for fewer queries than shipped): the BASELINE.md header's
    * BINDING row must state exactly the registered query count. */
  test("BASELINE.md binding row prices the full contract") {
    val base = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BASELINE.md")), "UTF-8")
    val m = """BINDING row: "[^"]*", (\d+) queries""".r.findFirstMatchIn(base)
    assert(m.isDefined, "BASELINE.md header lost its BINDING row marker")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"BASELINE binding row prices ${m.get.group(1)} queries but the " +
        s"contract ships ${SparkEntry.queries.size} — re-derive BASELINE " +
        "(scripts/baseline_oracle.py, 3 sessions, min wins)")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name row count @ sf0.001") {
      val df = fn(spark, sf0001)
      // SURVEY §5.3 rule 8: no bare DECIMAL in oracle-checked output —
      // the driver's decimal hash canonicalization diverged between
      // engines on value-identical data (round 10). Output money as
      // BIGINT cents or rounded DOUBLE instead.
      val decCols = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
      }
      assert(decCols.isEmpty,
        s"$name emits DecimalType columns ${decCols.mkString(",")} (hash-unsafe, §5.3 rule 8)")
      assert(df.count() == golden(name))
    }
  }
}
