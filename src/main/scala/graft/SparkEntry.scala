package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every declared operator of SURVEY.md §2 appears in `queries` with a
  * matching DuckDB oracle in `oracleSql` (rendered for the sf0.01 dir
  * the driver verifies on).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinInnerMulti(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // §2.1 scans
    "scan_project" -> Relational.scanProject,
    "filter_complex" -> Relational.filterComplex,
    "scan_prune_minmax" -> Relational.scanPruneMinmax,
    // §2.2 joins
    "join_inner_multi" -> Relational.joinInnerMulti,
    "join_broadcast_dim" -> Relational.joinBroadcastDim,
    "join_left_outer" -> Relational.joinLeftOuter,
    "join_full_outer" -> Relational.joinFullOuter,
    "join_semi" -> Relational.joinSemi,
    "join_anti" -> Relational.joinAnti,
    "join_range_theta" -> Relational.joinRangeTheta,
    "join_asof" -> Relational.joinAsof,
    "join_interval_overlap" -> Relational.joinIntervalOverlap,
    "join_null_safe" -> Relational.joinNullSafe,
    "join_lateral_topn" -> Relational.joinLateralTopn,
    "tpch_q3_shape" -> Relational.tpchQ3Shape,
    "tpch_q5_shape" -> Relational.tpchQ5Shape,
    "tpch_q2_shape" -> Relational.tpchQ2Shape,
    "tpch_q18_shape" -> Relational.tpchQ18Shape,
    "tpch_q7_shape" -> Relational.tpchQ7Shape,
    "tpch_q8_shape" -> Relational.tpchQ8Shape,
    "tpch_q10_shape" -> Relational.tpchQ10Shape,
    "tpch_q14_shape" -> Relational.tpchQ14Shape,
    "tpch_q19_shape" -> Relational.tpchQ19Shape,
    "graph_reach_rcte" -> Recursive.graphReachRcte,
    "rcte_month_spine" -> Recursive.rcteMonthSpine,
    "win_distinct_running" -> Windows.winDistinctRunning,
    "win_gaps_islands" -> Windows.winGapsIslands,
    "win_moving_median" -> Windows.winMovingMedian,
    "agg_corr_regr" -> Relational.aggCorrRegr,
    "agg_weighted_median" -> Relational.aggWeightedMedian,
    "agg_gini" -> Relational.aggGini,
    "pareto_revenue" -> Relational.paretoRevenue,
    "agg_bitmap_distinct" -> Relational.aggBitmapDistinct,
    "src_csv_roundtrip" -> Relational.srcCsvRoundtrip,
    "src_json_roundtrip" -> Relational.srcJsonRoundtrip,
    "src_orc_roundtrip" -> Relational.srcOrcRoundtrip,
    "join_salted" -> Relational.joinSalted,
    // §2.3 aggregations
    "agg_hash_q1" -> Relational.aggHashQ1,
    "agg_count_distinct" -> Relational.aggCountDistinct,
    "agg_rollup" -> Relational.aggRollup,
    "agg_cube" -> Relational.aggCube,
    "agg_grouping_sets" -> Relational.aggGroupingSets,
    "agg_stats" -> Relational.aggStats,
    "agg_having" -> Relational.aggHaving,
    "agg_median_quantile" -> Relational.aggMedianQuantile,
    "agg_string_agg" -> Relational.aggStringAgg,
    "agg_stats2" -> Relational.aggStats2,
    "agg_mode" -> Relational.aggMode,
    "agg_histogram" -> Relational.aggHistogram,
    "agg_argminmax" -> Relational.aggArgminmax,
    "funnel_click_purchase" -> Relational.funnelClickPurchase,
    "funnel_three_step" -> Relational.funnelThreeStep,
    "agg_entropy" -> Relational.aggEntropy,
    "latest_per_key" -> Relational.latestPerKey,
    "retention_daily" -> Relational.retentionDaily,
    // §2.4 windows
    "win_rank_topn" -> Windows.winRankTopn,
    "win_lag_lead" -> Windows.winLagLead,
    "win_moving_frame" -> Windows.winMovingFrame,
    "win_running_total" -> Windows.winRunningTotal,
    "win_ntile_dist" -> Windows.winNtileDist,
    "win_first_last" -> Windows.winFirstLast,
    "win_range_1h" -> Windows.winRange1h,
    "win_ratio" -> Windows.winRatio,
    "win_percent_rank_cume" -> Windows.winPercentRankCume,
    "topk_per_group" -> Windows.topkPerGroup,
    // §2.5 sorts / sets
    "sort_multi_limit" -> Relational.sortMultiLimit,
    "set_union" -> Relational.setUnion,
    "set_intersect" -> Relational.setIntersect,
    "set_except" -> Relational.setExcept,
    "set_ops_all" -> Relational.setOpsAll,
    "set_symmetric_diff" -> Relational.setSymmetricDiff,
    // §2.6 scalar families
    "fn_string" -> Funcs.fnString,
    "fn_string2" -> Funcs.fnString2,
    "fn_date" -> Funcs.fnDate,
    "fn_date2" -> Funcs.fnDate2,
    "fn_format" -> Funcs.fnFormat,
    "fn_datediff_join" -> Funcs.fnDatediffJoin,
    "fn_math" -> Funcs.fnMath,
    "fn_conditional" -> Funcs.fnConditional,
    "fn_array" -> Funcs.fnArray,
    "fn_explode_unnest" -> Funcs.fnExplodeUnnest,
    "fn_json" -> Funcs.fnJson,
    "fn_regex" -> Funcs.fnRegex,
    "fn_nulls" -> Funcs.fnNulls,
    "fn_array2" -> Funcs.fnArray2,
    "fn_bitwise" -> Funcs.fnBitwise,
    "fn_hash" -> Funcs.fnHash,
    "fn_try_cast" -> Funcs.fnTryCast,
    "fn_fuzzy_match" -> Funcs.fnFuzzyMatch,
    // §2.7 text / LLM pipeline
    "text_wordcount" -> TextSim.textWordcount,
    "text_stats" -> TextSim.textStats,
    "text_bigrams" -> TextSim.textBigrams,
    "dedup_exact" -> TextSim.dedupExact,
    "dedup_near_jaccard" -> TextSim.dedupNearJaccard,
    "sim_cosine_topk" -> TextSim.simCosineTopk,
    "sim_knn_label" -> TextSim.simKnnLabel,
    "multimodal_join" -> TextSim.multimodalJoin,
    // §2.11 training-data pipeline extensions
    "pipeline_token_count" -> Pipelines.pipelineTokenCount,
    "pipeline_subword_count" -> Pipelines.pipelineSubwordCount,
    "pipeline_quality_score" -> Pipelines.pipelineQualityScore,
    "pipeline_lang_id" -> Pipelines.pipelineLangId,
    "pipeline_fingerprint" -> Pipelines.pipelineFingerprint,
    "pipeline_contamination" -> Pipelines.pipelineContamination,
    "pipeline_domain_mix" -> Pipelines.pipelineDomainMix,
    "pipeline_repetition_score" -> Pipelines.pipelineRepetitionScore,
    "pipeline_tfidf_topterms" -> Pipelines.pipelineTfidfTopterms,
    "dedup_simhash" -> Pipelines.dedupSimhash,
    "dedup_minhash_lsh" -> Pipelines.dedupMinhashLsh,
    "dedup_clusters" -> Pipelines.dedupClusters,
    "dedup_containment" -> Pipelines.dedupContainment,
    "sim_cosine_neardup" -> Pipelines.simCosineNeardup,
    "ann_ivf_topk" -> Pipelines.annIvfTopk,
    "sample_deterministic" -> Sampling.sampleDeterministic,
    "sample_stratified" -> Sampling.sampleStratified,
    "sample_hash_split" -> Sampling.sampleHashSplit,
    "sample_k_per_group" -> Sampling.sampleKPerGroup,
    "ts_resample_gapfill" -> TimeSeries.tsResampleGapfill,
    "cdc_scd2" -> TimeSeries.cdcScd2,
    "join_point_in_time" -> TimeSeries.joinPointInTime,
    "ts_anomaly_zscore" -> TimeSeries.tsAnomalyZscore,
    "ts_ohlc" -> TimeSeries.tsOhlc,
    // §2.8 graph
    "graph_degree" -> GraphOps.graphDegree,
    "graph_2hop" -> GraphOps.graph2hop,
    "graph_triangles" -> GraphOps.graphTriangles,
    "graph_cc_labelprop" -> GraphOps.graphCcLabelprop,
    "graph_bfs_3hop" -> GraphOps.graphBfs3hop,
    "graph_pagerank3" -> GraphOps.graphPagerank3,
    "graph_jaccard_neighbors" -> GraphOps.graphJaccardNeighbors,
    "graph_kcore3" -> GraphOps.graphKcore3,
    // §2.9 streaming-on-batch
    "stream_tumbling_1h" -> StreamOps.streamTumbling1h,
    "stream_sliding_1h_30m" -> StreamOps.streamSliding1h30m,
    "stream_sessionize" -> StreamOps.streamSessionize,
    // §2.10 subqueries / CTE / pivot
    "subq_correlated" -> Relational.subqCorrelated,
    "subq_scalar_uncorrelated" -> Relational.subqScalarUncorrelated,
    "cte_chain_top_supplier" -> Relational.cteChainTopSupplier,
    "pivot_manual" -> Relational.pivotManual,
    "pivot_dynamic" -> Relational.pivotDynamic,
    "unpivot_long" -> Relational.unpivotLong,
    // round-6 contract additions (§2.14)
    "agg_higher_moments" -> Relational.aggHigherMoments,
    "win_reset_running_total" -> Windows.winResetRunningTotal,
    "graph_clustering_coeff" -> GraphOps.graphClusteringCoeff,
    "dedup_exact_normalized" -> TextSim.dedupExactNormalized,
    "pipeline_len_histogram" -> Pipelines.pipelineLenHistogram,
    "agg_filtered" -> Relational.aggFiltered,
    "join_asof_tolerance" -> Relational.joinAsofTolerance,
    "ts_calendar_heatmap" -> TimeSeries.tsCalendarHeatmap,
    "fn_base64_roundtrip" -> Funcs.fnBase64Roundtrip
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (driver verifies on sf0.01). */
  def oracleSql: Map[String, String] = Oracle.forDir("/root/testdata/sf0.01")
}
