package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for representative queries and grep
  * for the properties that matter at scale: PushedFilters reaching the
  * parquet scan, pruned ReadSchema, broadcast joins for small dims,
  * TakeOrderedAndProject for feed pages, WholeStageCodegen spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("q01_where_algebra", "q03_feed_page",
      "q07_semi_join", "q09_left_join", "q10_children_count",
      "v01_ann_cosine", "q11_leaderboard", "d10_corpus_filter",
      "v04_batch_ann", "d09_neardup_clusters",
      "d11_chunking", "d12_stratified_sample", "d13_pii_redact",
      "d14_decontaminate", "d15_repetition", "d16_top_tfidf_term",
      "d17_sessionize", "d18_percentiles", "d19_asof_join",
      "d20_dup_ngrams", "d21_nfc_normalize", "v05_quantized_rerank",
      "q24_skew_salted_join", "v07_semdedup", "v08_centroid_outliers",
      "m03_corpus_overlap", "d28_unigram_nll",
      "q31_hybrid_rrf", "q32_incremental_agg", "q33_snapshot_diff",
      "d34_markup_strip", "v11_matryoshka",
      "d38_gopher_rules", "q35_rolling_metrics", "q36_pivot",
      "d39_fuzzy_blocked_pairs",
      "d40_weighted_sample", "v12_ivf_recall", "q40_grouping_sets",
      "q41_decay_topk", "q42_funnel", "d41_prefix_join_pairs",
      "d44_incremental_neardup", "d45_segment_dedup",
      "q46_phrase_search", "q47_khop", "v14_knn_label",
      "q48_asof_custom", "q52_asof_nearest", "d51_kmv_intersect",
      "d52_nb_classifier", "d53_pmi_collocations",
      "v15_margin_mining", "d54_semantic_decontam",
      "d55_char_entropy", "d56_kn_bigram_nll", "q53_ohlc_downsample",
      "mm08_frame_sample", "q54_hopping_window",
      "d57_golden_record", "mm09_audio_chunks")) {
      println(s"\n######## $name ########")
      val df = graft.SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
