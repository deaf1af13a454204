package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2B relational surface
    "q1_agg"             -> (Relational.q1Agg _),
    "q2_filter_project"  -> (Relational.q2FilterProject _),
    "q3_join_agg"        -> (Relational.q3JoinAgg _),
    "q4_semi_join"       -> (Relational.q4SemiJoin _),
    "q5_multi_join"      -> (Relational.q5MultiJoin _),
    "q6_filter_agg"      -> (Relational.q6FilterAgg _),
    "q7_anti_join"       -> (Relational.q7AntiJoin _),
    "q8_outer_join"      -> (Relational.q8OuterJoin _),
    "q8b_full_outer"     -> (Relational.q8bFullOuter _),
    "q12_topk"           -> (Relational.q12TopK _),
    "q13_setops"         -> (Relational.q13SetOps _),
    "q14_distinct_agg"   -> (Relational.q14DistinctAgg _),
    "q18_scalar_funcs"   -> (Relational.q18ScalarFuncs _),
    "q19_case_when"      -> (Relational.q19CaseWhen _),
    "q20_theta_join"     -> (Relational.q20ThetaJoin _),
    "q21_cross_join"     -> (Relational.q21CrossJoin _),
    // §2B window functions
    "q9_window_rank"     -> (Windows.q9WindowRank _),
    "q10_window_running" -> (Windows.q10WindowRunning _),
    "q11_window_lag"     -> (Windows.q11WindowLag _),
    "q15_rollup"         -> (Windows.q15Rollup _),
    "q16_cube"           -> (Windows.q16Cube _),
    // SQL surface (parser + subqueries + grouping sets)
    "q17_grouping_sets"  -> (SqlSurface.q17GroupingSets _),
    "q27_exists"         -> (SqlSurface.q27Exists _),
    "q28_scalar_subquery" -> (SqlSurface.q28ScalarSubquery _),
    "q29_in_subquery"    -> (SqlSurface.q29InSubquery _),
    // event-time / semi-structured
    "q22_json"           -> (EventTime.q22Json _),
    "q23_tumbling"       -> (EventTime.q23Tumbling _),
    "q24_sliding"        -> (EventTime.q24Sliding _),
    "q25_sessionize"     -> (EventTime.q25Sessionize _),
    "q26_asof_join"      -> (EventTime.q26AsofJoin _),
    "q26b_asof_tolerance" -> (EventTime.q26bAsofTolerance _),
    "q26c_asof_forward"  -> (EventTime.q26cAsofForward _),
    // [EXT] dedup
    "q31_dedup_exact"    -> (Dedup.q31DedupExact _),
    "q32_minhash_lsh"    -> (Dedup.q32MinhashLsh _),
    "q32b_minhash_recall" -> (Dedup.q32bMinhashRecall _),
    "q33_ngram_jaccard"  -> (Dedup.q33NgramJaccard _),
    "q34_simhash"        -> (Dedup.q34Simhash _),
    "q34b_simhash_recall" -> (Dedup.q34bSimhashRecall _),
    "q35_embed_neardup"  -> (Dedup.q35EmbedNearDup _),
    "q35b_embed_recall"  -> (Dedup.q35bEmbedRecall _),
    "q66_dedup_clusters" -> (Components.q66DedupClusters _),
    // [EXT] similarity search
    "q36_cosine_topk"    -> (Similarity.q36CosineTopK _),
    "q36b_topk_agg"      -> (Similarity.q36bTopKAgg _),
    "q37_ann_ivf"        -> (Similarity.q37AnnIvf _),
    "q37b_ann_exhaustive" -> (Similarity.q37bAnnExhaustive _),
    "q39_embedding_stats" -> (Similarity.q39EmbeddingStats _),
    // [EXT] corpus curation
    "q62_decontaminate"  -> (Curation.q62Decontaminate _),
    "q63_hash_split"     -> (Curation.q63HashSplit _),
    "q64_repetition"     -> (Curation.q64Repetition _),
    "q65_stratified_sample" -> (Curation.q65StratifiedSample _),
    "q67_pack_sequences" -> (Curation.q67PackSequences _),
    // [EXT] text analysis + multimodal
    "q40_text_stats"     -> (TextAnalysis.q40TextStats _),
    "q41_quality_score"  -> (TextAnalysis.q41QualityScore _),
    "q42_lang_id"        -> (TextAnalysis.q42LangId _),
    "q43_fingerprint"    -> (TextAnalysis.q43Fingerprint _),
    "q38_multimodal"     -> (Multimodal.q38Multimodal _),
    // ingest path (reference storage contract end-to-end)
    "q50_tsv_roundtrip"  -> (Ingest.q50TsvRoundtrip _),
    "q51_canonicalize"   -> (Ingest.q51Canonicalize _),
    // statistics / misc scalar surface
    "q44_stats_moments"  -> (Stats.q44StatsMoments _),
    "q45_percentile"     -> (Stats.q45Percentile _),
    "q54_approx_distinct" -> (Stats.q54ApproxDistinct _),
    "q46_array_funcs"    -> (Misc.q46ArrayFuncs _),
    "q47_date_funcs"     -> (Misc.q47DateFuncs _),
    "q48_null_semantics" -> (Misc.q48NullSemantics _),
    "q49_pivot"          -> (Misc.q49Pivot _),
    "q52_tokenize"       -> (Misc.q52Tokenize _),
    "q53_winnowing"      -> (TextAnalysis.q53Winnowing _),
    "q53b_winnow_relational" -> (TextAnalysis.q53bWinnowRelational _),
    "q55_range_join"     -> (RangeJoin.q55RangeJoin _),
    "q56_weighted_mean"  -> (Stats.q56WeightedMean _),
    "q57_unpivot"        -> (Misc.q57Unpivot _),
    "q58_regex"          -> (Misc.q58Regex _),
    "q59_map_hof"        -> (Misc.q59MapHof _),
    "q60_range_frame"    -> (Windows.q60RangeFrame _),
    "q61_hybrid_search"  -> (Similarity.q61HybridSearch _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"             -> Relational.q1AggSql,
    "q2_filter_project"  -> Relational.q2FilterProjectSql,
    "q3_join_agg"        -> Relational.q3JoinAggSql,
    "q4_semi_join"       -> Relational.q4SemiJoinSql,
    "q5_multi_join"      -> Relational.q5MultiJoinSql,
    "q6_filter_agg"      -> Relational.q6FilterAggSql,
    "q7_anti_join"       -> Relational.q7AntiJoinSql,
    "q8_outer_join"      -> Relational.q8OuterJoinSql,
    "q8b_full_outer"     -> Relational.q8bFullOuterSql,
    "q12_topk"           -> Relational.q12TopKSql,
    "q13_setops"         -> Relational.q13SetOpsSql,
    "q14_distinct_agg"   -> Relational.q14DistinctAggSql,
    "q18_scalar_funcs"   -> Relational.q18ScalarFuncsSql,
    "q19_case_when"      -> Relational.q19CaseWhenSql,
    "q20_theta_join"     -> Relational.q20ThetaJoinSql,
    "q21_cross_join"     -> Relational.q21CrossJoinSql,
    "q9_window_rank"     -> Windows.q9WindowRankSql,
    "q10_window_running" -> Windows.q10WindowRunningSql,
    "q11_window_lag"     -> Windows.q11WindowLagSql,
    "q15_rollup"         -> Windows.q15RollupSql,
    "q16_cube"           -> Windows.q16CubeSql,
    "q17_grouping_sets"  -> SqlSurface.q17GroupingSetsSql,
    "q27_exists"         -> SqlSurface.q27ExistsSql,
    "q28_scalar_subquery" -> SqlSurface.q28ScalarSubquerySql,
    "q29_in_subquery"    -> SqlSurface.q29InSubquerySql,
    "q22_json"           -> EventTime.q22JsonSql,
    "q23_tumbling"       -> EventTime.q23TumblingSql,
    "q24_sliding"        -> EventTime.q24SlidingSql,
    "q25_sessionize"     -> EventTime.q25SessionizeSql,
    "q26_asof_join"      -> EventTime.q26AsofJoinSql,
    "q26b_asof_tolerance" -> EventTime.q26bAsofToleranceSql,
    "q26c_asof_forward"  -> EventTime.q26cAsofForwardSql,
    // [EXT] — q32/q34/q35/q37/q53 are hash-function-specific (xxhash64 /
    // LSH / rolling hash), not SQL-expressible in DuckDB → rows-only
    // driver check; their semantics are spec-tested against exact
    // counterparts (q33/q36) AND gate-checked through derived oracles:
    // q32b/q34b (exact pairs ∩ banding candidates ≡ exact pairs at recall
    // 1.0), q35b (structurally-guaranteed planted pairs ≡ the DuckDB-
    // predicted set), and q37b (full-probe IVF ≡ exact brute force).
    "q31_dedup_exact"    -> Dedup.q31DedupExactSql,
    "q32b_minhash_recall" -> Dedup.q34bSimhashRecallSql,
    "q33_ngram_jaccard"  -> Dedup.q33NgramJaccardSql,
    "q34b_simhash_recall" -> Dedup.q34bSimhashRecallSql,
    "q35b_embed_recall"  -> Dedup.q35bEmbedRecallSql,
    "q66_dedup_clusters" -> Components.q66DedupClustersSql,
    "q36_cosine_topk"    -> Similarity.q36CosineTopKSql,
    "q36b_topk_agg"      -> Similarity.q36CosineTopKSql,
    "q37b_ann_exhaustive" -> Similarity.q36CosineTopKSql,
    "q39_embedding_stats" -> Similarity.q39EmbeddingStatsSql,
    "q62_decontaminate"  -> Curation.q62DecontaminateSql,
    "q63_hash_split"     -> Curation.q63HashSplitSql,
    "q64_repetition"     -> Curation.q64RepetitionSql,
    "q65_stratified_sample" -> Curation.q65StratifiedSampleSql,
    "q67_pack_sequences" -> Curation.q67PackSequencesSql,
    "q40_text_stats"     -> TextAnalysis.q40TextStatsSql,
    "q41_quality_score"  -> TextAnalysis.q41QualityScoreSql,
    "q42_lang_id"        -> TextAnalysis.q42LangIdSql,
    "q43_fingerprint"    -> TextAnalysis.q43FingerprintSql,
    "q38_multimodal"     -> Multimodal.q38MultimodalSql,
    "q50_tsv_roundtrip"  -> Ingest.q50TsvRoundtripSql,
    "q51_canonicalize"   -> Ingest.q51CanonicalizeSql,
    "q54_approx_distinct" -> Stats.q54ApproxDistinctSql,
    "q44_stats_moments"  -> Stats.q44StatsMomentsSql,
    "q45_percentile"     -> Stats.q45PercentileSql,
    "q46_array_funcs"    -> Misc.q46ArrayFuncsSql,
    "q47_date_funcs"     -> Misc.q47DateFuncsSql,
    "q48_null_semantics" -> Misc.q48NullSemanticsSql,
    "q49_pivot"          -> Misc.q49PivotSql,
    "q52_tokenize"       -> Misc.q52TokenizeSql,
    "q53b_winnow_relational" -> TextAnalysis.q53bWinnowRelationalSql,
    "q55_range_join"     -> RangeJoin.q55RangeJoinSql,
    "q56_weighted_mean"  -> Stats.q56WeightedMeanSql,
    "q57_unpivot"        -> Misc.q57UnpivotSql,
    "q58_regex"          -> Misc.q58RegexSql,
    "q59_map_hof"        -> Misc.q59MapHofSql,
    "q60_range_frame"    -> Windows.q60RangeFrameSql,
    "q61_hybrid_search"  -> Similarity.q61HybridSearchSql,
  )
}
