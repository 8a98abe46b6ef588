package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for EVERY registered
  * query (so the PLANS audit's "0 cartesians" claim is corpus-wide,
  * not headline-only) so shuffle/pushdown/broadcast/codegen
  * regressions are visible.
  * Usage: runMain graft.Explain [sfDir] [query ...|all|headline]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq match {
      case Seq() | Seq("all") => SparkEntry.queries.keys.toSeq.sorted
      case Seq("headline")    => Headline
      case qs                 => qs
    }
    run(sfDir, names)
  }

  /** The pre-r12 curated list, kept addressable for quick audits of
    * the queries whose plan shapes carry documented guarantees. */
  private val Headline =
      Seq("rel_filter_project", "rel_revenue_by_nation", "ohlcv_1m",
        "sim_topk_bruteforce", "dedup_minhash_lsh", "text_wordcount_topk",
        "rel_asof_join", "skew_salted_agg", "profile_events",
        "text_repetition", "pack_sequences", "sim_topk_ivf_kmeans",
        "rel_asof_join_native", "src_gen_trades_ohlcv", "decontam_overlap",
        "sketch_hll_distinct", "text_bm25_topk", "graph_pagerank",
        "src_kv_copartition_join", "text_tfidf_topk", "text_chunk_stride",
        "layout_zorder_tiles", "emb_covariance", "evt_pattern_within",
        "text_classifier_quality", "dedup_incremental", "rel_asof_nearest",
        "dedup_span_frac", "dedup_containment", "evt_transitions",
        "sketch_kmv_setops", "text_quality_norm", "text_head_coverage",
        "sim_topk_ivfpq_rerank", "sim_hard_negatives",
        "curation_token_budget", "emb_pca_project", "layout_compaction_plan",
        "emb_outliers", "evt_paths3", "mm_audio_vad", "qa_mad_outliers",
        "text_rrf_fusion", "qa_split_leakage", "sample_splits_by_cluster",
        "dedup_span_removal", "dedup_span_scrub", "mm_video_frames",
        "curation_source_filter", "profile_corpus_card",
        "curation_shard_order", "text_ngram_novelty", "graph_label_prop",
        "layout_hilbert_tiles", "text_prf_expansion", "text_blocklist",
        "text_blocklist_scrub", "evt_seasonal_hourly",
        "text_novelty_incremental", "text_ql_topk", "text_mmr_rerank",
        "ohlcv_1m_anomalies", "text_html_extract", "text_html_gopher",
        "dedup_incremental_persisted", "dedup_span_incremental_persisted",
        "text_ndcg_eval", "emb_matryoshka", "graph_modularity", "evt_rfm",
        "sim_topk_ivfpq_persisted", "sim_topk_ivfpq_rerank_persisted",
        "sim_ingest_gate", "dedup_semdedup", "dedup_semdedup_cells",
        "pipeline_crawl", "pipeline_ingest_gate", "text_bm25_topk_persisted",
        "text_mrr_map_eval", "curation_ppl_filter",
        "text_char_lm_persisted", "text_bpe_train_persisted",
        "text_bpe_apply_persisted", "text_classifier_quality_persisted",
        "text_classifier_calibration_persisted",
        "curation_ppl_filter_persisted",
        "curation_dsir_weights", "curation_dsir_weights_persisted",
        "curation_dsir_resample", "sim_prototype_prune", "sim_d4_prune",
        "pipeline_model_gate", "pipeline_gate_overlap",
        "sim_decontam_semantic", "sim_kcenter_seeds",
        "curation_dsir_resample_persisted", "sim_kcenter_assign",
        "pipeline_gate_cuts", "text_char_entropy")

  private def run(sfDir: String, names: Seq[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // EXECUTE before explaining: a pre-execution AQE plan carries no
      // codegen annotations at all (every operator is still outside a
      // WholeStageCodegenExec until stages materialize), so the audit's
      // "codegen spans" column read 0 for every query in every round —
      // blind to a native expression silently falling out of codegen.
      // The final plan also shows AQE's runtime choices (BHJ
      // conversions, coalesced reads), which are the plans that
      // actually ran. A query that fails at runtime fails the sweep
      // (the EXPLAIN_TOTAL marker stays unprinted). queryExecution
      // .toRdd, NOT collect() or Dataset.foreach: collect hauls every
      // full-text result into the driver 237 times per sweep, and
      // Dataset.foreach executes a DIFFERENT QueryExecution (the
      // deserialized rddQueryExecution), leaving THIS one's AQE plan
      // unfinalized — measured: every codegen annotation vanished.
      // toRdd executes this QueryExecution's own executed plan and
      // discards rows on the executors.
      df.queryExecution.toRdd.foreach(_ => ())
      df.explain("formatted")
    }
    // completeness marker: the plan-table generator asserts it parsed
    // exactly this many blocks, so a mid-sweep crash can't pass as a
    // clean "0 cartesians" audit
    println(s"EXPLAIN_TOTAL ${names.size}")
    spark.stop()
  }
}
