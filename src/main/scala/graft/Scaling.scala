package graft

import org.apache.spark.sql.SparkSession

/** Empirical scaling audit: run one representative query per operator
  * family at every provided scale factor and print a TSV of medians —
  * the measurement behind SCALING.md's per-decade scaling exponents
  * (does a plan that is green at sf0.01 stay linear through sf0.1, or
  * is something quietly quadratic?).
  *
  * Dir-MAJOR order on purpose: the session memos (Tables.registerAll,
  * Dedup's pair/cluster frames) key on (session, dir), so finishing one
  * scale factor before moving to the next measures each query against a
  * warm memo exactly like Bench does — switching dirs per query would
  * charge every query a memo rebuild that no real run pays.
  *
  * Usage: runMain graft.Scaling <dir1,dir2,...> [q1,q2,...]
  */
object Scaling {

  /** One representative per family — the plan shapes whose growth rate
    * at 100 TB the family's other queries share. */
  val Representatives: Seq[String] = Seq(
    "ohlcv_1m",              // windowed aggregation (flagship)
    "rel_revenue_by_nation", // multi-join + agg
    "rel_window_rank",       // per-key window
    "rel_asof_join_native",  // custom whole-operator plan
    "rel_interval_join",     // bucketized non-equi join
    "dedup_exact",           // digest groupBy
    "dedup_minhash_lsh",     // banded LSH bucket join
    "dedup_prefix_join",     // exact prefix-filtered pair join
    "dedup_span_removal",    // positional span postings
    "dedup_clusters",        // iterative connected components
    "sim_topk_bruteforce",   // full-scan ANN baseline
    "sim_topk_ivfpq",        // quantized ANN path
    "text_wordcount_topk",   // token explode + agg
    "text_tfidf_topk",       // doc×term frame + join
    "text_char_lm",          // char-bigram model train+score
    "text_bpe_apply",        // vocab-bounded train + apply
    "sketch_hll_distinct",   // mergeable-register sketch
    "sketch_quantile_hist",  // histogram sketch
    "emb_covariance",        // one-pass moment buffer
    "graph_pagerank",        // iterative message passing
    "win_user_sessions",     // sessionization window
    "skew_salted_join",      // salted hot-key join
    "profile_stats_sketch",  // per-column profiling
    "pipeline_clean_corpus", // fused multi-stage pipeline
    "curation_shard_order",  // per-shard rank write shape
    "mm_decode_meta",        // binary-column codec UDF
    "text_ngram_novelty",    // postings agg + join-back
    "graph_label_prop",      // iterative mode-label rounds
    "layout_hilbert_tiles",  // curve-key scan + tile agg
    "text_blocklist",        // automaton scan, zero shuffles
    "evt_seasonal_hourly",   // calendar-grid seasonal profile
    "text_ql_topk",          // language-model ranking, docs×terms frame
    "text_html_extract",     // block segmentation scan, zero shuffles
    "dedup_incremental_persisted", // bucketed on-disk index probe
    "src_warc_roundtrip",    // archive framing roundtrip, task-per-file
    "pipeline_crawl",        // WARC → extract → gate, one plan
    "text_ndcg_eval",        // ranking eval over bounded top-k
    "evt_rfm",               // user-grain aggregate + banding
    "pipeline_ingest_gate",  // composed extract→quality→index probe
    "text_bm25_topk_persisted",   // postings probe, query-token pruned
    "text_char_lm_scan",     // un-memoized persisted-model scoring pass
    "curation_ppl_filter_persisted", // persisted-LM filter
    "text_classifier_quality_persisted", // persisted-weights scoring
    "rich_trade_ohlcv",      // JSON wire roundtrip (memoized feed)
    "graph_triangles",       // degree-oriented wedge join, O(E^1.5)
    "rel_recursive_chains",  // bounded recursive expansion
    "curation_dsir_weights", // fused unigram+bigram model + score
    "sim_prototype_prune",   // centroid-cosine rank, per-cell window
    "sim_d4_prune",          // dedup verdict + survivor rank composed
    "pipeline_model_gate",   // persisted-models quality stage + probe
    "pipeline_gate_cuts",    // gate-cut derivation: train + score + hist
    "sim_kcenter_assign",    // greedy K seeds + broadcast assignment
    "layout_zorder3_tiles",  // 3-D curve-key scan + tile agg
    "layout_zorder3_files",  // aligned clustered WRITE + per-file stats
    "ohlcv_5m_from_1m",      // stacked windowed aggregation (cascade fold)
    "layout_dpp_join",       // partitioned fact + runtime-pruned scan
    "layout_bloom_prune_join", // injected runtime bloom filter on the fact scan
    "pipeline_shard_build",  // quality→dedup→decontam→sample→pack→shard, one plan
    "dedup_winnow_pairs",    // winnowed-fingerprint pair join (~2/(w+1) postings)
    "profile_ks_drift",      // per-group ECDF window over collapsed distinct values
    "curation_fim",          // fill-in-middle transform, zero-shuffle scan
    "curation_source_kl",    // per-source KL to the corpus mix, vocab-bounded join
    "mix_unimax_alloc",      // per-source aggregate + bounded water-fill algebra
    "text_bpe_fertility",    // corpus scan + vocab-bounded join, per-source sums
    "evt_ab_cuped",          // user-grain sufficient statistics, 1-row reduce
    "sketch_bitmap_distinct",// chunked-bitmap exact distinct, one aggregation
    "emb_rp_project",        // narrow literal-matrix projection scan
    "sim_topk_rp",           // dual brute-force recall audit (orig + RP space)
    "dedup_cdc_chunks",      // CDC chunk rows + one chash shuffle + join-back
    "evt_pattern_negation",  // banded per-user join behind the matched pairs
    "layout_skipping_report",// three key-projection scans, 3-row algebra
    "rollover_monitor_tick") // monitor poll under a corpus-scaled log

  /** Non-query probes: operational paths whose growth matters but
    * which return no DataFrame. The setup closure (UNTIMED — it is the
    * deployment's standing state, not the tick) runs once per dir and
    * returns the timed steady-state body. */
  val Probes: Map[String, (SparkSession, String) => (() => Unit)] = Map(
    "rollover_monitor_tick" -> ((spark: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      import graft.operators.{AdmissionLog, IndexStore, Rollover}
      // load: an admission log holding ~5% of the corpus, built once
      // (check-then-append under the suffix lock, the gate's own
      // discipline) — so the tick is measured against log AND corpus
      // counts that both grow with the scale factor
      val sfx = IndexStore.suffix(dir, "scaletick", lit(true))
      IndexStore.lock(AdmissionLog.lockKey(AdmissionLog.DocKind, sfx)).synchronized {
        if (!spark.catalog.tableExists(
            AdmissionLog.tableName(AdmissionLog.DocKind, sfx))) {
          AdmissionLog.append(spark, AdmissionLog.DocKind, sfx,
            graft.Tables.documents(spark, dir)
              .filter(pmod(col("doc_id"), lit(20L)) === 0L)
              .select(col("doc_id"), col("text")))
        }
      }
      // the timed body is RotationMonitor.poll's idle path: the locked
      // log count minus the trained mark, plus one corpus count
      () => { Rollover.admissionPressure(spark, dir, "scaletick"); () }
    }))

  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val names = if (args.length > 1) args(1).split(",").toSeq else Representatives
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(("query" +: dirs).mkString("\t"))
    val times = scala.collection.mutable.Map[(String, String), Double]()
    for (dir <- dirs) {
      Tables.lineitem(spark, dir).limit(1).collect() // warm footers
      for (name <- names) {
        val body: () => Unit = SparkEntry.queries.get(name) match {
          case Some(fn) =>
            () => fn(spark, dir).write.format("noop").mode("overwrite").save()
          case None => Probes(name)(spark, dir) // setup untimed
        }
        val ts = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          body()
          (System.nanoTime() - t0) / 1e9
        }
        times((name, dir)) = ts.sorted.apply(ts.size / 2)
      }
    }
    for (name <- names)
      println((name +: dirs.map(d => f"${times((name, d))}%.3f")).mkString("\t"))
    spark.stop()
  }
}
