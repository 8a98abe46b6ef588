package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Ohlcv, Similarity}

/** Plan-shape regression guards: the round-2 physical-plan wins, locked
  * in as assertions so a refactor cannot silently reintroduce the
  * scale-killers (global windows, lost pushdown, extra shuffles). */
class PlanShapeSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("top-k per query plans with no Window operator") {
    // the bounded Aggregator replaced a row_number window whose single
    // reducer partition per query was the 100 TB funnel — it must never
    // come back
    val p = physical(Similarity.topKBruteForce(spark, sf0001))
    assert(!p.contains("Window"),
      s"top-k must stay a partial/merge aggregate, found a window:\n$p")
    assert(p.contains("Aggregate"), s"expected an aggregate-based top-k:\n$p")
  }

  test("round-4 joins plan with no cartesian or nested-loop operator") {
    // interval join, fuzzy join, phash dedup: the equi-key reformulation
    // is the whole point — a refactor that loses the bucket/block key
    // falls back to BroadcastNestedLoopJoin and dies at scale
    Seq("rel_interval_join", "rel_interval_overlap", "rel_fuzzy_join",
        "mm_phash_neardups", "sim_knn_join").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoop"), s"$q plans a nested loop:\n$p")
    }
  }

  test("KMV distinct plans the bounded aggregator, never a distinct+window") {
    val p = physical(SparkEntry.queries("sketch_kmv_distinct")(spark, sf0001))
    assert(!p.contains("Window"), s"KMV must stay an aggregate:\n$p")
    // two-level aggregate: partial BottomKDistinct then merge
    assert(p.contains("Aggregate"), s"expected aggregate-based sketch:\n$p")
  }

  test("rel_filter_project pushes its predicates into the parquet scan") {
    // toString truncates the FileScan line, so don't require the closing
    // bracket — a non-']' right after '[' means at least one pushed filter
    val p = physical(SparkEntry.queries("rel_filter_project")(spark, sf0001))
    val pushed = "PushedFilters: \\[\\s*[^\\]\\s]".r.findFirstIn(p)
    assert(pushed.nonEmpty, s"expected non-empty PushedFilters in the scan:\n$p")
  }

  test("rel_revenue_by_nation broadcasts its fixed-size dimensions") {
    // nation/region are 25/5 rows at ANY scale factor — if they ever
    // stop broadcasting, the fact table starts shuffling for no reason
    val p = physical(SparkEntry.queries("rel_revenue_by_nation")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      s"expected a broadcast join for the nation dim:\n$p")
  }

  test("text_quality reads only the projected document columns") {
    val p = physical(SparkEntry.queries("text_quality")(spark, sf0001))
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.isDefined, s"no ReadSchema in:\n$p")
    // doc_id + text only — lang/source/n_chars must be pruned from the scan
    assert(!read.get.contains("source") && !read.get.contains("n_chars"),
      s"scan reads unprojected columns: ${read.get}")
  }

  test("Ohlcv.bars aggregates through exactly one shuffle") {
    val ev = Tables.events(spark, sf0001)
    val df = Ohlcv.bars(ev, col("ts"), col("value"), lit(1L),
      Seq("event_type" -> col("event_type")), "1 minute", col("event_id"))
    val exchanges = "Exchange".r.findAllIn(physical(df)).size
    assert(exchanges == 1,
      s"bars must be partial-agg + ONE hash exchange, found $exchanges:\n${physical(df)}")
  }

  test("Ohlcv.bars with an integral tiebreak plans HashAggregate, never Sort") {
    // the packed atomic ordering key is the default for the whole
    // flagship family — a struct key would demote every ohlcv_* query
    // to SortAggregate (a sort per partial group on every map task)
    val ev = Tables.events(spark, sf0001)
    val p = physical(Ohlcv.bars(ev, col("ts"), col("value"), lit(1L),
      Seq("event_type" -> col("event_type")), "1 minute", col("event_id")))
    assert(!p.contains("SortAggregate"), s"packed bars lost HashAggregate:\n$p")
    assert(p.contains("HashAggregate"), s"expected hash aggregation:\n$p")
    // the SQL surface must carry the same plan shape
    val sqlP = physical(Ohlcv.bars1mSql(spark, sf0001))
    assert(!sqlP.contains("SortAggregate"),
      s"ohlcv_1m_sql lost HashAggregate:\n$sqlP")
  }

  test("streaming windowedBars keeps the struct key even for integral tiebreaks") {
    import spark.implicits._
    import graft.streaming.StreamingOhlcv
    // the DELIBERATE inversion of bars()'s packed default, pinned so a
    // refactor cannot silently flip it: packing the streaming ordering
    // key would change the min_by state buffer type (restart from an
    // existing checkpoint fails StateSchemaCompatibility), turn
    // packedOrd's out-of-range raise into a replay-crash-loop poison
    // pill, and let a NULL tiebreak silently drop its row from
    // open/close — see the windowedBars doc
    val trades = (0 until 200).map { i =>
      graft.model.Trade(i * 997L, s"i$i", s"P${i % 3}", (i % 50).toDouble, 1L)
    }.toDF()
    val ts = StreamingOhlcv.withEventTime(trades.as[graft.model.Trade])
    val p = physical(StreamingOhlcv.windowedBars(ts, "1 minute", col("timestamp")))
    assert(p.contains("SortAggregate") && !p.contains("min_by(price, (cast"),
      s"streaming bars must keep the checkpoint-stable struct key:\n$p")
    // and the struct path's results equal batch bars' packed selection
    // on the same frame (unique ts per key -> orderings agree)
    val a = StreamingOhlcv.windowedBars(ts, "1 minute", col("timestamp"))
      .orderBy("window_start", "product").collect().toSeq
    val b = Ohlcv.bars(ts, col("ts"), col("price"), col("qty"),
      Seq("product" -> col("product")), "1 minute", col("timestamp"))
      .orderBy("window_start", "product").collect().toSeq
    assert(a == b, "streaming struct and batch packed selections diverged")
  }

  test("Ohlcv.bars with a non-packable tiebreak falls back to the struct key") {
    val ev = Tables.events(spark, sf0001)
    val p = physical(Ohlcv.bars(ev, col("ts"), col("value"), lit(1L),
      Seq("event_type" -> col("event_type")), "1 minute",
      col("event_id").cast("string")))
    assert(p.contains("SortAggregate"),
      s"string tiebreak should take the documented struct path:\n$p")
  }

  test("flagship plan shapes hold at sf0.1, not only the unit-test scale") {
    // AQE and broadcast thresholds see different sizes/stats at sf0.1
    // than at sf0.001 — the scale claims are only as good as the plan
    // at the graded scale factor. (SPJ zero-Exchange is covered in
    // SourcesSpec against the generator source, which has no sf.)
    Seq(sf0001, sf01).foreach { d =>
      val topk = physical(Similarity.topKBruteForce(spark, d))
      assert(!topk.contains("Window"), s"top-k windows at $d:\n$topk")
      val dec = physical(SparkEntry.queries("decontam_overlap")(spark, d))
      assert(dec.contains("BroadcastHashJoin") && !dec.contains("SortMergeJoin"),
        s"decontam must broadcast the eval set at $d:\n$dec")
      Seq("rel_interval_join", "rel_interval_overlap").foreach { q =>
        val p = physical(SparkEntry.queries(q)(spark, d))
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
          s"$q loses its equi-key at $d:\n$p")
      }
      val fp = physical(SparkEntry.queries("rel_filter_project")(spark, d))
      assert("PushedFilters: \\[\\s*[^\\]\\s]".r.findFirstIn(fp).nonEmpty,
        s"pushdown lost at $d:\n$fp")
      // late round-5 operators hold their shapes at the graded sf too
      val tfidf = physical(SparkEntry.queries("text_tfidf_topk")(spark, d))
      assert(!tfidf.contains("Window"),
        s"tfidf per-doc ranking windows at $d:\n$tfidf")
      Seq("emb_covariance", "layout_zorder_tiles").foreach { q =>
        val p = physical(SparkEntry.queries(q)(spark, d))
        val n = "Exchange".r.findAllIn(p).size - "BroadcastExchange".r.findAllIn(p).size
        assert(n <= 1, s"$q must be a single-exchange aggregate at $d ($n):\n$p")
      }
      Seq("evt_pattern_within", "rel_asof_nearest", "dedup_incremental").foreach { q =>
        val p = physical(SparkEntry.queries(q)(spark, d))
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
          s"$q loses its equi-key at $d:\n$p")
      }
    }
  }

  test("per-document outputs plan no global sort (round-5: presentation sorts removed)") {
    // the round-4 audit found ~15 corpus-size outputs ending in a
    // verification-only .orderBy — a full range-partition sort per query
    // that the canonical comparator makes redundant. Gone; stay gone.
    Seq("text_gopher_filters", "text_lang_id", "sample_hash",
        "text_token_stats", "text_normalize", "mm_decode_meta",
        "dedup_exact", "dedup_clusters_star").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(!p.contains("rangepartitioning") && !p.contains("RangePartitioning"),
        s"$q plans a global sort (range partitioning):\n$p")
    }
  }

  test("blocklist scan and scrub are pure projections: zero exchanges") {
    // the automaton is a codegen reference object and the scrub a
    // replace chain — any Exchange here means the per-row scan grew a
    // shuffle it must never have
    Seq("text_blocklist", "text_blocklist_scrub").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(!p.contains("Exchange"), s"$q plans a shuffle:\n$p")
    }
  }

  test("round-5 session ops keep their shapes: no cartesian, no corpus window") {
    // span-frac / containment are inverted-index passes; transitions'
    // only window is per-user; quality_norm's only window runs over the
    // bounded (lang, bin) frame and rejoins by broadcast. (kmv_setops
    // is exempt from the nested-loop ban: its type_a < type_b pair join
    // over the G-row sketch frame is a deliberate bounded non-equi
    // join, same as kmvJaccard.)
    Seq("dedup_span_frac", "dedup_containment", "evt_transitions",
        "text_quality_norm").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoop"), s"$q plans a nested loop:\n$p")
    }
    Seq("dedup_span_frac", "dedup_containment").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(!p.contains("Window"), s"$q must stay window-free:\n$p")
    }
    val qn = physical(SparkEntry.queries("text_quality_norm")(spark, sf0001))
    assert(qn.contains("BroadcastHashJoin"),
      s"quality_norm must broadcast the bin frame back to the corpus:\n$qn")
    // the re-rank's exact stage must broadcast its tiny shortlist into
    // the corpus join, never shuffle the embeddings for 80 rows
    val rr = physical(SparkEntry.queries("sim_topk_ivfpq_rerank")(spark, sf0001))
    assert(rr.contains("BroadcastHashJoin"),
      s"rerank must broadcast the shortlist into the corpus join:\n$rr")
    assert(!rr.contains("CartesianProduct"), s"rerank plans a cartesian:\n$rr")
  }

  test("qa/profile/chi2 ops keep their shapes: heap top-k, broadcast bucket prune, no cartesian") {
    // chi2/pmi rankings must stay TakeOrdered (per-partition heaps),
    // never a global range-partitioned sort over the vocab frame
    Seq("text_chi2_terms", "text_pmi_bigrams").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(p.contains("TakeOrderedAndProject"),
        s"$q must rank via TakeOrdered, not a global sort:\n$p")
      assert(!p.contains("Window"), s"$q must stay window-free:\n$p")
    }
    // the table diff's row-level pass must reach rows via the broadcast
    // dirty-bucket semi-join — re-shuffling both snapshots for a few
    // dirty buckets is exactly the anti-pattern the design avoids
    val td = physical(operators.Warehouse.tableDiff(spark, sf0001))
    assert(td.contains("BroadcastHashJoin") && td.contains("LeftSemi"),
      s"table diff must broadcast-semi-join the dirty bucket list:\n$td")
    assert(!td.contains("CartesianProduct"), s"table diff plans a cartesian:\n$td")
    // audit + linreg: scan aggregates and key joins only
    Seq("qa_constraint_audit", "profile_linreg").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("Window"), s"$q must stay window-free:\n$p")
    }
  }

  test("sketch_bloom_join prunes the fact scan before any exchange") {
    // the whole point of the runtime-filter pattern: the 4-probe bloom
    // test must sit in a Filter on the lineitem side BELOW the join's
    // exchange, so the unmatched fact fraction never shuffles
    val p = physical(SparkEntry.queries("sketch_bloom_join")(spark, sf0001))
    assert(p.contains("bloom_might_contain"),
      s"fused bloom probe filter missing from the physical plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"bloom join plans a cartesian:\n$p")
  }

  test("decontam_overlap broadcasts the eval shingle set, never sort-merges") {
    // the eval suite is KBs against a 100 TB corpus: the corpus posting
    // explode must be filtered by a broadcast semi-join map-side — a
    // sort-merge here would shuffle the whole corpus posting list
    val p = physical(SparkEntry.queries("decontam_overlap")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast semi-join against the eval set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus postings must not shuffle into a sort-merge join:\n$p")
  }

  test("round-6 ops keep their shapes: scan-only outlier fold, bounded top-k, no corpus window") {
    // emb_outliers: the (μ, σ) stats ride as literals, so the scoring
    // pass is scan + TakeOrdered — any Exchange before the top-k means
    // the corpus started shuffling for a per-row projection
    val po = physical(SparkEntry.queries("emb_outliers")(spark, sf0001))
    assert(po.contains("TakeOrderedAndProject"),
      s"emb_outliers top-k must be TakeOrdered, not a global sort:\n$po")
    assert(!po.contains("Exchange"),
      s"emb_outliers scoring must not shuffle the corpus:\n$po")

    // evt_paths3: the journey window partitions by user — an empty
    // partition spec would funnel the whole corpus through one task
    val pp = physical(SparkEntry.queries("evt_paths3")(spark, sf0001))
    assert(!pp.contains("Window [")
      || pp.contains("windowspecdefinition(user_id"),
      s"evt_paths3 window must partition by user_id:\n$pp")
    assert(pp.contains("TakeOrderedAndProject"),
      s"evt_paths3 top-k must be TakeOrdered, not a global sort:\n$pp")

    // qa_mad_outliers: the median/MAD frames are calendar-bounded and
    // must broadcast back onto the daily grid, never sort-merge it
    val pm = physical(SparkEntry.queries("qa_mad_outliers")(spark, sf0001))
    assert(!pm.contains("SortMergeJoin"),
      s"qa_mad_outliers must broadcast its bounded stats frames:\n$pm")
    assert(!pm.contains("CartesianProduct"), s"qa_mad_outliers cartesian:\n$pm")
  }

  test("round-7 span/video ops keep their shapes: per-doc windows only, no cartesian") {
    // span family: the interval merge is the ONLY window and it must
    // partition on doc_id — an empty partition spec would funnel every
    // removal interval in the corpus through one task
    Seq("dedup_span_removal", "dedup_span_scrub", "dedup_span_savings",
        "dedup_span_incremental").foreach { q =>
      val p = physical(SparkEntry.queries(q)(spark, sf0001))
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoop"), s"$q plans a nested loop:\n$p")
      if (p.contains("Window ["))
        assert(p.contains("windowspecdefinition(doc_id"),
          s"$q window must partition by doc_id:\n$p")
    }
    // per-frame video decode is a per-partition flatMap over the media
    // frame. Exactly ONE exchange is allowed: mediaTable's deliberate
    // doc_id hash spread (the demo corpus is a single parquet split;
    // without the spread every codec runs on one core). Decode itself
    // must not add any further shuffle.
    val pv = physical(SparkEntry.queries("mm_video_frames")(spark, sf0001))
    assert("Exchange".r.findAllIn(pv).size == 1 &&
      pv.contains("hashpartitioning(doc_id"),
      s"video decode must carry only the media-frame spread exchange:\n$pv")
    // semantic keep-best: selection stays a map-side argmax aggregate
    // (the CC subplan may sort-merge its own edges; no per-cluster
    // window may appear anywhere)
    val pk = physical(SparkEntry.queries("dedup_embedding_keep_best")(spark, sf0001))
    assert(!pk.contains("Window"), s"keep-best must stay window-free:\n$pk")
    assert(!pk.contains("CartesianProduct"), s"keep-best cartesian:\n$pk")
  }
}
