package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here: a
  * `queries` entry (Spark implementation) and, where DuckDB can express
  * the same semantics, an `oracleSql` entry with IDENTICAL output
  * column names (the driver's compare hashes on name-sorted columns).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Olap.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_etl_json_route" -> (Etl.qEtlJsonRoute _),
    "q_new_user_fix" -> (Etl.qNewUserFix _),
    "q_unique_visitors_daily" -> (Sessions.qUniqueVisitorsDaily _),
    "q_user_jump" -> (Sessions.qUserJump _),
    "q_visitor_stats" -> (Stats.qVisitorStats _),
    "q_product_stats" -> (Stats.qProductStats _),
    "q_province_stats" -> (Stats.qProvinceStats _),
    // rows-only: HLL sketch values have no DuckDB oracle (SURVEY §5)
    "q_province_stats_approx" -> (Stats.qProvinceStatsApprox _),
    "q_keyword_stats" -> (Stats.qKeywordStats _),
    "q_config_route" -> (Etl.qConfigRoute _),
    "q_sessionize" -> (Sessions.qSessionize _),
    "q_event_funnel" -> (Sessions.qEventFunnel _),
    "q_order_wide" -> (Joins.qOrderWide _),
    "q_event_interval_join" -> (Joins.qEventIntervalJoin _),
    "q_payment_wide" -> (Joins.qPaymentWide _),
    "q_order_enriched" -> (Joins.qOrderEnriched _),
    "q1_pricing_summary" -> (Olap.q1PricingSummary _),
    "q3_shipping_priority" -> (Olap.q3ShippingPriority _),
    "q5_local_supplier" -> (Olap.q5LocalSupplier _),
    "q_topn_per_group" -> (Olap.qTopnPerGroup _),
    "q_text_langid" -> (Text.qTextLangid _),
    "q_text_quality" -> (Text.qTextQuality _),
    "q_token_count" -> (Text.qTokenCount _),
    "q_doc_fingerprint" -> (Text.qDocFingerprint _),
    "q_dedup_exact" -> (Dedup.qDedupExact _),
    "q_dedup_ngram_jaccard" -> (Dedup.qDedupNgramJaccard _),
    "q_dedup_minhash_lsh" -> (Dedup.qDedupMinhashLsh _),
    "q_dedup_simhash" -> (Dedup.qDedupSimhash _),
    "q_dedup_embedding" -> (Similarity.qDedupEmbedding _),
    "q_ann_cosine_topk" -> (Similarity.qAnnCosineTopk _),
    "q_ann_ivf" -> (Similarity.qAnnIvf _),
    "q_multimodal_meta" -> (Multimodal.qMultimodalMeta _),
    "q_multimodal_frames" -> (Multimodal.qMultimodalFrames _),
    "q_sample_stratified" -> (Corpus.qSampleStratified _),
    "q_ngram_stats" -> (Corpus.qNgramStats _),
    "q_asof_join" -> (Temporal.qAsofJoin _),
    "q_dedup_ngram_jaccard_capped" -> (Dedup.qDedupNgramJaccardCapped _),
    "q_dedup_incremental" -> (Dedup.qDedupIncremental _),
    "q_dedup_exact_incremental" -> (Dedup.qDedupExactIncremental _),
    "q_range_join" -> (Temporal.qRangeJoin _),
    "q_province_rollup" -> (Stats.qProvinceRollup _),
    "q_dup_clusters" -> (Dedup.qDupClusters _),
    "q_dup_rate_by_source" -> (Corpus.qDupRateBySource _),
    "q_length_histogram" -> (Corpus.qLengthHistogram _),
    "q_keyword_stats_cjk" -> (Stats.qKeywordStatsCjk _),
    "q_cdc_route" -> (Etl.qCdcRoute _),
    "q_sample_hash" -> (Corpus.qSampleHash _),
    "q_token_quantiles" -> (Corpus.qTokenQuantiles _),
    "q_token_quantiles_approx" -> (Corpus.qTokenQuantilesApprox _),
    "q_contamination" -> (Corpus.qContamination _),
    "q_pii_scrub" -> (Text.qPiiScrub _),
    "q_dup_clusters_incremental" -> (Dedup.qDupClustersIncremental _),
    "q_intradoc_repetition" -> (Text.qIntradocRepetition _),
    "q_curation_funnel" -> (Corpus.qCurationFunnel _),
    "q_retention_cohorts" -> (Sessions.qRetentionCohorts _),
    "q_sliding_window" -> (Stats.qSlidingWindow _),
    "q_cube_stats" -> (Stats.qCubeStats _),
    "q_pivot_revenue" -> (Olap.qPivotRevenue _),
    "q_customers_inactive" -> (Olap.qCustomersInactive _),
    "q4_order_priority" -> (Olap.q4OrderPriority _),
    "q13_cust_distribution" -> (Olap.q13CustDistribution _),
    "q17_small_qty_revenue" -> (Olap.q17SmallQtyRevenue _),
    "q18_large_orders" -> (Olap.q18LargeOrders _),
    "q7_nation_volume" -> (Olap.q7NationVolume _),
    "q_vocab_coverage" -> (Corpus.qVocabCoverage _),
    "q_sample_weighted" -> (Corpus.qSampleWeighted _),
    "q_shard_assign" -> (Corpus.qShardAssign _),
    "q2_min_cost_supplier" -> (Olap.q2MinCostSupplier _),
    "q_profile_orders" -> (Profile.qProfileOrders _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_etl_json_route" -> Etl.qEtlJsonRouteSql,
    "q_new_user_fix" -> Etl.qNewUserFixSql,
    "q_unique_visitors_daily" -> Sessions.qUniqueVisitorsDailySql,
    "q_user_jump" -> Sessions.qUserJumpSql,
    "q_visitor_stats" -> Stats.qVisitorStatsSql,
    "q_product_stats" -> Stats.qProductStatsSql,
    "q_province_stats" -> Stats.qProvinceStatsSql,
    "q_keyword_stats" -> Stats.qKeywordStatsSql,
    "q_config_route" -> Etl.qConfigRouteSql,
    "q_sessionize" -> Sessions.qSessionizeSql,
    "q_event_funnel" -> Sessions.qEventFunnelSql,
    "q_order_wide" -> Joins.qOrderWideSql,
    "q_event_interval_join" -> Joins.qEventIntervalJoinSql,
    "q_payment_wide" -> Joins.qPaymentWideSql,
    "q_order_enriched" -> Joins.qOrderEnrichedSql,
    "q1_pricing_summary" -> Olap.q1Sql,
    "q3_shipping_priority" -> Olap.q3Sql,
    "q5_local_supplier" -> Olap.q5Sql,
    "q_topn_per_group" -> Olap.qTopnPerGroupSql,
    "q_text_langid" -> Text.qTextLangidSql,
    "q_text_quality" -> Text.qTextQualitySql,
    "q_token_count" -> Text.qTokenCountSql,
    "q_doc_fingerprint" -> Text.qDocFingerprintSql,
    "q_dedup_exact" -> Dedup.qDedupExactSql,
    "q_dedup_ngram_jaccard" -> Dedup.qDedupNgramJaccardSql,
    // q_dedup_minhash_lsh / q_dedup_simhash: rows-only (seeded xxhash64
    // signatures have no DuckDB equivalent — SURVEY.md §2.3).
    "q_dedup_embedding" -> Similarity.qDedupEmbeddingSql,
    "q_ann_cosine_topk" -> Similarity.qAnnCosineTopkSql,
    // q_ann_ivf: rows-only (SURVEY.md §2.3 #31); recall vs the exact
    // baseline is asserted in AnnSpec instead.
    "q_multimodal_meta" -> Multimodal.qMultimodalMetaSql,
    "q_multimodal_frames" -> Multimodal.qMultimodalFramesSql,
    "q_sample_stratified" -> Corpus.qSampleStratifiedSql,
    "q_ngram_stats" -> Corpus.qNgramStatsSql,
    "q_asof_join" -> Temporal.qAsofJoinSql,
    "q_dedup_ngram_jaccard_capped" -> Dedup.qDedupNgramJaccardCappedSql,
    "q_dedup_incremental" -> Dedup.qDedupIncrementalSql,
    "q_dedup_exact_incremental" -> Dedup.qDedupExactIncrementalSql,
    "q_range_join" -> Temporal.qRangeJoinSql,
    "q_province_rollup" -> Stats.qProvinceRollupSql,
    "q_dup_clusters" -> Dedup.qDupClustersSql,
    "q_dup_rate_by_source" -> Corpus.qDupRateBySourceSql,
    "q_length_histogram" -> Corpus.qLengthHistogramSql,
    "q_keyword_stats_cjk" -> Stats.qKeywordStatsCjkSql,
    "q_cdc_route" -> Etl.qCdcRouteSql,
    "q_sample_hash" -> Corpus.qSampleHashSql,
    "q_token_quantiles" -> Corpus.qTokenQuantilesSql,
    "q_contamination" -> Corpus.qContaminationSql,
    "q_pii_scrub" -> Text.qPiiScrubSql,
    "q_dup_clusters_incremental" -> Dedup.qDupClustersIncrementalSql,
    "q_intradoc_repetition" -> Text.qIntradocRepetitionSql,
    "q_curation_funnel" -> Corpus.qCurationFunnelSql,
    "q_retention_cohorts" -> Sessions.qRetentionCohortsSql,
    "q_sliding_window" -> Stats.qSlidingWindowSql,
    "q_cube_stats" -> Stats.qCubeStatsSql,
    "q_pivot_revenue" -> Olap.qPivotRevenueSql,
    "q_customers_inactive" -> Olap.qCustomersInactiveSql,
    "q4_order_priority" -> Olap.q4Sql,
    "q13_cust_distribution" -> Olap.q13Sql,
    "q17_small_qty_revenue" -> Olap.q17Sql,
    "q18_large_orders" -> Olap.q18Sql,
    "q7_nation_volume" -> Olap.q7Sql,
    "q_vocab_coverage" -> Corpus.qVocabCoverageSql,
    "q_sample_weighted" -> Corpus.qSampleWeightedSql,
    "q_shard_assign" -> Corpus.qShardAssignSql,
    "q2_min_cost_supplier" -> Olap.q2Sql,
    "q_profile_orders" -> Profile.qProfileOrdersSql
  )
}
