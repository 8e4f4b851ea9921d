package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ScalarQueries.queries ++
      MlQueries.queries ++ LlmQueries.queries ++ TimeSeriesQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ ScalarQueries.oracleSql ++
      MlQueries.oracleSql ++ LlmQueries.oracleSql ++
      TimeSeriesQueries.oracleSql

  /** Headline subset timed by Bench (sf0.1). Keep this representative —
    * scans, joins, windows, ML pipelines, and the LLM-pipeline operators —
    * not every micro-coverage query. */
  def benchQueries: Seq[String] = Seq(
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q11_window_top_orders",
    "q21_events_hourly",
    "q23_asof_join",
    "q28_range_join",
    "q31_token_stats",
    "q34_exact_dedup",
    "q35_minhash_dedup",
    "q43_multimodal_decode",
    "q38_ann_brute_force",
    "q39_ann_lsh",
    "q44_lsh_sim_join",
    "q45_ann_ivf",
    "q46_vocab_stats",
    "q50_sst2_pipeline",
    "q51_qqp_pipeline",
    "q52_qnli_pipeline",
    "q66_tfidf_keywords",
    "q67_decontamination",
    "q70_curation_funnel",
    "q76_incremental_minhash",
    "q78_ann_int8",
    "q79_line_dedup",
    "q81_dataset_card",
    "q82_funnel_lineage",
    "q85_keep_best_dedup",
    "q87_contamination_spans",
    "q91_surgical_decon",
    "q83_lm_perplexity",
    "q88_semantic_dedup",
    "q89_shared_substrings",
    "q93_ccnet_buckets",
    "q96_mixture_budget",
    "q97_cluster_split",
    "q98_cms_heavy_hitters",
    "q99_corpus_stats",
    "q100_zorder_curve",
    "q101_bpe_tokens",
    "q102_corpus_digest",
    "q103_gram_novelty",
    "q104_dup_graph_rank",
    "q105_apply_changelog",
    "q106_event_funnel",
    "q107_retention_cohorts",
    "q108_quality_psi",
    "q109_moving_avg",
    "q110_event_transitions",
    "q111_ab_test",
    "q112_quality_ks",
    "q113_mixture_budget_approx",
    "q114_audio_decode",
    "q115_doc_chunks",
    "q116_source_similarity",
    "q117_temperature_mix",
    "q118_hard_negatives",
    "q119_mixed_language",
    "q120_gopher_yield",
    // q121/q122/q162/q177/q187 are excluded deliberately: they run a
    // streaming query to completion and memoize the sink output, so a
    // timed pass would measure a parquet re-read, not the operator
    "q123_windowed_counts",
    "q132_domain_cap",
    "q133_blocklist_ratio",
    "q134_jsonl_roundtrip",
    "q135_line_quality",
    "q136_span_corrupt",
    "q137_length_batching",
    "q138_tokenizer_fertility",
    "q139_script_anomalies",
    "q140_ann_recall",
    "q141_epoch_expand",
    "q142_knn_eval",
    "q143_bm25_indexed",
    "q144_index_merge",
    "q145_funnel_v2",
    "q146_cluster_stats",
    "q147_bm25_roll",
    "q148_ann_recall_multi",
    "q149_release_build",
    "q150_union_split",
    "q151_minhash_roll",
    "q152_ivf_roll",
    "q153_lsh_roll",
    "q154_semantic_decon",
    "q155_weighted_sample",
    "q156_cell_sample",
    "q157_decon_matrix",
    "q158_cluster_decon",
    "q159_cell_purity",
    "q160_semantic_decon_ivf",
    "q161_substring_scrub",
    "q163_quality_distill",
    "q164_image_dedup",
    // q165 is the fitted-vocab load (trivial); q166 times the real
    // apply path against the loaded vocabulary
    "q166_unigram_segment",
    "q167_domain_reweight",
    "q168_pq_ann",
    "q169_pq_roll",
    "q170_tokenizer_compare",
    "q171_bitext_mining",
    "q172_vector_quarantine",
    "q173_compression_gate",
    "q174_ivf_pq_ann",
    "q175_shard_diff",
    "q176_contrastive_triplets",
    "q178_selective_rescore",
    "q179_rendezvous_reshard",
    "q180_stats_roll",
    "q181_phrase_search",
    "q182_positional_roll",
    "q183_proximity_search",
    "q184_vocab_coverage",
    "q185_skew_join",
    "q186_padding_waste",
    "q188_index_manifest",
    "q189_hll_distinct",
    "q190_manifest_verify",
    "q191_indexed_hybrid",
    "q192_selective_reindex",
    "q193_changelog_bm25",
    "q194_length_quantiles",
    "q195_curriculum_order",
    "q196_gif_frames",
    "q197_sketch_roll",
    "q198_cdc_dedup",
    "q199_cluster_roll",
    "q200_daily_roll",
    "q201_chat_assembly",
    "q202_loss_mask",
    "q203_preference_pairs",
    "q204_prefix_cache",
    "q205_group_advantage",
    "q206_dedup_savings",
    "q207_compaction_plan",
    "q208_binary_ann",
    "q209_streaming_chat",
    "q210_mrl_recall",
    "q211_packed_examples",
    "q212_props_schema_gate",
    "q213_vector_daily_roll",
    "q214_pseudonymize",
    "q215_k_anonymity",
    "q216_sketch_prune",
    "q217_dp_histogram",
    "q218_gate_ablation",
    "q219_kmv_roll",
    "q220_threshold_sweep",
    "q221_centroid_drift",
    "q222_canon_levels",
    "q223_retrieval_eval"
  )
  // (q192 recomputes the changelog-driven roll each run — the timed
  // cost is the maintenance job itself, not a memoized read)
}
