package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Sketch-tier guarantees: estimator accuracy, CMS one-sidedness, and
  * the avalanche mixer's arithmetic (the oracle replays the same ops —
  * these specs pin the Spark side independently of parity). */
class SketchesSpec extends SparkSpec {

  test("avalanche32 matches the reference integer recipe and stays in [0, 2^32)") {
    import spark.implicits._
    def ref(h0: Long): Long = {
      def r(x: Long): Long = ((x ^ (x >>> 16)) * 73244475L) % 4294967296L
      val m = r(r(h0))
      m ^ (m >>> 16)
    }
    val ins = Seq(0L, 1L, 97L, 2147483646L, 123456789L)
    val got = ins.toDF("h").select(Sketches.avalanche32(col("h")).as("x"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ins.map(ref))
    assert(got.forall(x => x >= 0 && x < 4294967296L))
    // avalanche: consecutive inputs land far apart (no structure left)
    val a = ref(1000); val b = ref(1001)
    assert(java.lang.Long.bitCount(a ^ b) >= 8)
  }

  test("HLL estimates land within 4 standard errors of exact, both branches") {
    val rows = Sketches.hllDistinct(spark, sf001).collect()
    assert(rows.length == 10) // 5 event types × 2 columns
    // m=256 → σ ≈ 6.5%; 4σ = 26%
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact"); val est = r.getAs[Long]("hll_est")
      assert(math.abs(est - exact).toDouble / exact < 0.26,
        s"${r.getString(0)}/${r.getString(1)}: est=$est exact=$exact")
    }
    // both estimator branches are exercised by the fixture: user_id
    // (~150 distinct) takes linear counting, event_id (~2000) raw HLL
    val byCol = rows.groupBy(_.getAs[String]("column_name"))
    assert(byCol("user_id").forall(_.getAs[Long]("n_zero_buckets") > 0))
    assert(byCol("event_id").forall(r =>
      r.getAs[Long]("n_exact") > 640)) // > 2.5m ⇒ raw branch regardless of v
  }

  test("CMS estimates are one-sided (est >= exact) and collide at w=16") {
    val rows = Sketches.cmsTopK(spark, sf001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n_exact"))
    }
    // w=16 over a 31-token vocabulary must actually collide somewhere —
    // otherwise the min-over-rows estimator is never exercised
    assert(rows.exists(r => r.getAs[Long]("cms_est") > r.getAs[Long]("n_exact")))
    // ...and the 4 independent rows rescue at least one token exactly
    assert(rows.exists(r => r.getAs[Long]("cms_est") == r.getAs[Long]("n_exact")))
  }

  test("histogram quantile estimate brackets the exact rank statistic within one bin") {
    val est = Sketches.quantileHist(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Long]("est_cents")).toMap
    assert(est.size == 15) // 5 event types × 3 percentiles
    // the sketch's contract: est is the lower edge of the bin holding
    // the ⌈p·n/100⌉-th smallest value — so est ≤ that order statistic
    // < est + bin width. (NOT interpolated percentile: in a sparse tail
    // the interpolated value can sit far from any bin edge.)
    val byType = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("event_type", "CAST(round(value*100,0) AS BIGINT) AS cents")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    byType.foreach { case (t, sorted) =>
      val bw = (sorted.last - sorted.head + 1000) / 1000
      Seq(50, 90, 99).foreach { p =>
        val kth = sorted(((p.toLong * sorted.length + 99) / 100).toInt - 1)
        val e = est((t, p))
        assert(e <= kth && kth < e + bw,
          s"$t p$p: est=$e kth=$kth bw=$bw")
      }
    }
  }

  test("HLL registers merge associatively: any partition of the input gives identical state") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the property partial aggregation relies on: registers built from
    // any split/merge of the rows equal registers built from all rows
    val gen = for {
      n <- Gen.chooseNum(0, 400)
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 5000).map(i => s"u$i"))
      cut <- Gen.chooseNum(0, n)
    } yield (vals, cut)
    (1 to 50).foreach { i =>
      val (vals, cut) = gen(org.scalacheck.Gen.Parameters.default, Seed(i.toLong)).get
      val whole = new Array[Byte](graft.operators.Sketches.HllM)
      vals.foreach(v => Sketches.hllUpdate(whole, v))
      val (a, b) = vals.splitAt(cut)
      val ra = new Array[Byte](graft.operators.Sketches.HllM)
      val rb = new Array[Byte](graft.operators.Sketches.HllM)
      a.foreach(v => Sketches.hllUpdate(ra, v))
      b.foreach(v => Sketches.hllUpdate(rb, v))
      val merged = ra.zip(rb).map { case (x, y) => math.max(x, y).toByte }
      assert(merged.toSeq == whole.toSeq, s"seed $i: split-merge diverged")
      assert(Sketches.hllEstimate(merged) == Sketches.hllEstimate(whole))
    }
  }

  test("native bottom_k_distinct aggregate equals the typed udaf form") {
    import spark.implicits._
    // dense domain → duplicates, groups straddling the k boundary
    val rnd = new scala.util.Random(31)
    val rows = (1 to 5000).map(_ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(300).toLong))
    val df = rows.toDF("g", "h")
    val nativeAgg = graft.functions.TextFunctions.bottomKDistinctAgg(16)
    val native = df.groupBy("g").agg(nativeAgg(col("h")).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    val udafAgg = udaf(new graft.functions.BottomKDistinct(16))
    val typed = df.groupBy("g").agg(udafAgg(col("h")).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(native == typed)
    // and both match the semantic definition
    rows.groupBy(_._1).foreach { case (g, vs) =>
      assert(native(g) == vs.map(_._2).distinct.sorted.take(16).toList, g)
    }
  }

  test("BottomKDistinct is a bounded distinct bottom-k under any split/merge") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val k = 16
    val agg = new graft.functions.BottomKDistinct(k)
    val gen = for {
      n <- Gen.chooseNum(0, 300)
      vals <- Gen.listOfN(n, Gen.chooseNum(0L, 200L)) // dense: many duplicates
      cut <- Gen.chooseNum(0, n)
    } yield (vals, cut)
    (1 to 50).foreach { i =>
      val (vals, cut) = gen(org.scalacheck.Gen.Parameters.default, Seed(i.toLong)).get
      val whole = vals.foldLeft(agg.zero)(agg.reduce)
      // semantic definition through finish(): sorted distinct values,
      // first k (the buffer itself is descending since r16)
      assert(agg.finish(whole) == vals.distinct.sorted.take(k), s"seed $i")
      val (a, b) = vals.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == whole, s"seed $i: split-merge diverged")
    }
  }

  test("BitmapDistinct is an exact distinct count under any split/merge, across chunk edges") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val agg = new graft.functions.BitmapDistinct()
    def cnt(vals: Seq[Long]): Long = agg.finish(vals.foldLeft(agg.zero)(agg.reduce))
    // chunk/word boundary ids, far-apart chunks included
    val edges = Seq(0L, 1L, 63L, 64L, 65535L, 65536L, 65537L,
      131071L, 131072L, (1L << 31) - 1, 1L << 31, 1L << 40)
    assert(cnt(edges ++ edges.reverse ++ edges) == edges.length.toLong)
    val gen = for {
      n <- Gen.chooseNum(0, 400)
      // mix of one dense region and scattered far chunks
      vals <- Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(0L, 300L), Gen.chooseNum(0L, 1L << 42)))
      cut <- Gen.chooseNum(0, n)
    } yield (vals, cut)
    (1 to 50).foreach { i =>
      val (vals, cut) = gen(Gen.Parameters.default, Seed(i.toLong)).get
      assert(cnt(vals) == vals.distinct.length.toLong, s"seed $i")
      val (a, b) = vals.splitAt(cut)
      val mAB = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      val mBA = agg.merge(b.foldLeft(agg.zero)(agg.reduce),
        a.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(mAB) == vals.distinct.length.toLong,
        s"seed $i: split-merge diverged")
      assert(agg.finish(mBA) == agg.finish(mAB), s"seed $i: merge not commutative")
    }
    // end-to-end: the udaf column equals the built-in exact count
    val rows = graft.operators.Sketches.bitmapDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_users") == r.getAs[Long]("n_exact")))
  }

  test("KMV distinct estimates land within sketch error of exact") {
    val rows = Sketches.kmvDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact"); val est = r.getAs[Long]("kmv_est")
      val nSketch = r.getAs[Long]("n_sketch")
      if (nSketch < Sketches.KmvK) assert(est == exact) // small sets are exact
      // k=64 → σ ≈ 13%; allow 4σ
      else assert(math.abs(est - exact).toDouble / exact < 0.52,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("KMV Jaccard estimates track exact set similarity") {
    val rows = Sketches.kmvJaccard(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("jaccard_exact_milli")
      val est = r.getAs[Long]("jaccard_est_milli")
      assert(est >= 0 && est <= 1000 && exact >= 0 && exact <= 1000)
      // k=64 union sample → generous band; the point is the estimator
      // is live, not degenerate (all-0 or all-1000)
      assert(math.abs(est - exact) <= 350, s"${r.getString(0)}/${r.getString(1)}: est=$est exact=$exact")
    }
  }

  test("KMV set ops track exact union/intersection and respect identities") {
    val rows = Sketches.kmvSetOps(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (uEx, uEst) = (r.getAs[Long]("n_union_exact"), r.getAs[Long]("union_est"))
      val (iEx, iEst) = (r.getAs[Long]("n_inter_exact"), r.getAs[Long]("inter_est"))
      val (dAb, dBa) = (r.getAs[Long]("diff_ab_est"), r.getAs[Long]("diff_ba_est"))
      // structural identities of the estimator, scale-independent
      assert(iEst >= 0 && iEst <= uEst, "intersection within union")
      assert(dAb >= 0 && dBa >= 0, "differences clamped at zero")
      // union sketch error: k=64 → σ ≈ 13%; allow 4σ
      assert(math.abs(uEst - uEx).toDouble / uEx < 0.52,
        s"${r.getString(0)}/${r.getString(1)}: union est=$uEst exact=$uEx")
      // intersection carries union + shared-fraction error; generous band
      assert(math.abs(iEst - iEx).toDouble / uEx < 0.52,
        s"${r.getString(0)}/${r.getString(1)}: inter est=$iEst exact=$iEx")
    }
  }

  test("bloom membership has no false negatives and a small live FP tail") {
    val r = Sketches.bloomReport(spark, sf001).head()
    val (pass, truth, fp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // no false negatives: every true key passes, so pass = true + fp
    assert(pass == truth + fp)
    assert(truth > 0)
    // sized so the FP path is exercised but the filter stays selective
    assert(fp > 0, "geometry must produce real false positives at sf0.01")
    assert(fp.toDouble / (pass + 1) < 0.1, s"filter saturated: $fp FPs of $pass passes")
  }

  test("windowed streaming HLL closes windows with batch-identical estimates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // two 1-minute windows with distinct user populations + repeats
    val w1 = (1 to 120).map(i => graft.streaming.TimedValue(t(10 + i % 50), s"u${i % 57}"))
    val w2 = (1 to 80).map(i => graft.streaming.TimedValue(t(70 + i % 40), s"v${i % 23}"))
    val input = MemoryStream[graft.streaming.TimedValue]
    val q = graft.streaming.StreamingSketch
      .windowedDistinct(input.toDS(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("whll").outputMode("append").start()
    try {
      input.addData(w1)
      q.processAllAvailable()
      input.addData(w2)
      q.processAllAvailable()
      // advance the watermark far past both windows to close them
      input.addData(graft.streaming.TimedValue(t(1000), "sentinel"))
      q.processAllAvailable()
      val streamed = spark.table("whll")
        .collect().map(r => r.getTimestamp(0).getTime / 1000 -> r.getAs[Long]("hll_est")).toMap
      assert(streamed.keySet == Set(0L, 60L))
      // batch twin over the same rows, grouped by the same window
      val batch = Sketches.hllEstimateBy(
          (w1 ++ w2).toDF("ts", "value")
            .withColumn("ws", expr("unix_seconds(ts) div 60 * 60")),
          Seq("ws"), col("value"))
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("hll_est")).toMap
      assert(streamed == batch,
        s"windowed streaming and batch sketches diverged: $streamed vs $batch")
      // sanity: populations are ~57 and ~23 distinct
      assert(math.abs(streamed(0L) - 57L) <= 15 && math.abs(streamed(60L) - 23L) <= 10)
    } finally q.stop()
  }

  test("HLL union: register-max merge equals the direct sketch exactly") {
    val rows = Sketches.hllUnion(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 7)
    // mergeability: rolling up per-type registers IS the full-scan sketch
    assert(rows("union(types)") == rows("direct(all)"),
      s"union-of-registers must equal the direct sketch: $rows")
    // register-max dominance: the union estimate covers every part
    val parts = rows.view.filterKeys(k => !k.contains("(")).values.map(_._2)
    assert(rows("union(types)")._2 >= parts.max)
    // and the merged estimate agrees with the generic estimator
    val direct = Sketches.hllEstimateBy(
        Tables.events(spark, sf001).select(col("user_id")), Nil, col("user_id"))
      .collect().head.getAs[Long]("hll_est")
    assert(rows("direct(all)")._2 == direct)
  }

  test("windowed streaming CMS closes windows with reference-identical estimates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // window 1: 'hot' dominates; window 2: 'warm' dominates, 'hot' absent
    val w1 = (1 to 60).map(i =>
      graft.streaming.TimedValue(t(5 + i % 50), if (i % 3 == 0) s"x$i" else "hot"))
    val w2 = (1 to 40).map(i =>
      graft.streaming.TimedValue(t(65 + i % 40), if (i % 4 == 0) s"y$i" else "warm"))
    val probes = Seq("hot", "warm", "absent")
    val input = MemoryStream[graft.streaming.TimedValue]
    val q = graft.streaming.StreamingSketch
      .windowedCms(input.toDS(), "1 minute", "10 seconds", probes)
      .writeStream.format("memory").queryName("wcms").outputMode("append").start()
    try {
      input.addData(w1)
      q.processAllAvailable()
      input.addData(w2)
      q.processAllAvailable()
      input.addData(graft.streaming.TimedValue(t(1000), "sentinel"))
      q.processAllAvailable()
      val streamed = spark.table("wcms").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1)) -> r.getAs[Long]("cms_est"))
        .toMap
      assert(streamed.keySet.map(_._1) == Set(0L, 60L))
      // scalar CMS reference over each window's rows
      def ref(rows: Seq[graft.streaming.TimedValue], probe: String): Long = {
        val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
        rows.foreach { r =>
          graft.operators.Sketches.cmsSlotsScalar(r.value).zipWithIndex.foreach {
            case (s, ri) => cells((ri, s)) = cells.getOrElse((ri, s), 0L) + 1
          }
        }
        graft.operators.Sketches.cmsSlotsScalar(probe).zipWithIndex
          .map { case (s, ri) => cells.getOrElse((ri, s), 0L) }.min
      }
      probes.foreach { p =>
        assert(streamed((0L, p)) == ref(w1, p), s"window 0 probe $p")
        assert(streamed((60L, p)) == ref(w2, p), s"window 1 probe $p")
      }
      // CMS is an overestimate: est >= exact occurrence count
      assert(streamed((0L, "hot")) >= w1.count(_.value == "hot"))
      assert(streamed((60L, "warm")) >= w2.count(_.value == "warm"))
    } finally q.stop()
  }

  test("streaming mix-drift monitor: calm on the baseline mix, fires on a collapsed mix, absent mass charged") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1723459200000L
    // baseline mix: a 40%, b 40%, c 20%
    val baseline = Map("a" -> 400L, "b" -> 400L, "c" -> 200L)
    def tv(offMs: Long, cat: String) =
      graft.streaming.TimedValue(new java.sql.Timestamp(t0 + offMs), cat)
    val input = MemoryStream[graft.streaming.TimedValue]
    val q = graft.streaming.StreamingSketch
      .windowedMixDrift(input.toDS(), "1 minute", "0 seconds", baseline)
      .writeStream.format("memory").queryName("mixdrift").outputMode("append")
      .start()
    try {
      // window 1: exactly the baseline mix (4 a, 4 b, 2 c)
      input.addData((0 until 4).map(i => tv(i * 100L, "a")) ++
        (0 until 4).map(i => tv(1000L + i * 100L, "b")) ++
        (0 until 2).map(i => tv(2000L + i * 100L, "c")): _*)
      // window 2: everything collapses into 'a' (plus a category the
      // baseline never saw) — b and c are ABSENT but still charge mass
      input.addData((0 until 9).map(i => tv(60000L + i * 100L, "a")) :+
        tv(61000L, "zz"))
      // close both windows
      input.addData(tv(600000L, "a"))
      q.processAllAvailable()
      val rows = spark.table("mixdrift").orderBy("window_start").collect()
      assert(rows.length == 2, s"expected two closed windows: ${rows.toSeq}")
      assert(rows(0).getAs[Long]("mix_l1_milli") == 0L,
        s"baseline-mix window read ${rows(0)}")
      // window 2: a |900−400| + zz |100−0| + absent b 400 + absent c 200
      assert(rows(1).getAs[Long]("mix_l1_milli") == 1200L,
        s"collapsed mix read ${rows(1)}")
      assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(10L, 10L))
    } finally q.stop()
  }

  test("streaming drift monitor reads calm on baseline-like windows and fires on shifted ones") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1723459200000L
    // baseline: uniform over [0, 100) in 20 bins of width 5, milli = 50/bin
    val lo = 0L; val bw = 5L
    val baseline = (0L until 20L).map(b => b -> 50L).toMap
    def tv(offMs: Long, v: Long) =
      graft.streaming.TimedValue(new java.sql.Timestamp(t0 + offMs), v.toString)
    val input = MemoryStream[graft.streaming.TimedValue]
    val q = graft.streaming.StreamingSketch
      .windowedDrift(input.toDS(), "1 minute", "0 seconds", lo, bw, baseline)
      .writeStream.format("memory").queryName("drift").outputMode("append")
      .start()
    try {
      // window 1: matches the baseline exactly (values 0..99, 5 per bin)
      input.addData((0 until 100).map(i => tv(i * 100L, i.toLong)): _*)
      // window 2: all mass shifted into bins the baseline barely holds
      input.addData((0 until 100).map(i => tv(60000L + i * 100L, 95L)): _*)
      // close both windows
      input.addData(tv(600000L, 1L))
      q.processAllAvailable()
      val rows = spark.table("drift").orderBy("window_start").collect()
      assert(rows.length == 2, s"expected two closed windows: ${rows.toSeq}")
      val calm = rows(0).getAs[Long]("l1_milli")
      val fired = rows(1).getAs[Long]("l1_milli")
      assert(calm == 0L, s"identical distribution read $calm")
      // all 1000 milli in one bin vs 50 there: |1000-50| + (1000-50) = 1900
      assert(fired == 1900L, s"shifted window read $fired")
      assert(rows.forall(_.getAs[Long]("n") == 100L))
    } finally q.stop()
  }

  test("streaming KMV state emits bit-identical estimates to the batch aggregator form") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // k0/k1 exceed the sketch (estimator branch), k2 stays under (exact)
    val rows = (1 to 400).map(i => graft.streaming.KeyedValue(s"k${i % 2}", s"u${i % 157}")) ++
      (1 to 40).map(i => graft.streaming.KeyedValue("k2", s"u$i"))
    val input = MemoryStream[graft.streaming.KeyedValue]
    input.addData(rows.take(200))
    val lastEst = scala.collection.concurrent.TrieMap[String, (Long, (Long, Long))]()
    val q = graft.streaming.StreamingSketch.kmvByKey(input.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.KmvEstimate], id: Long) =>
        df.collect().foreach { e =>
          if (!lastEst.get(e.key).exists(_._1 > id))
            lastEst(e.key) = (id, (e.n_sketch, e.kmv_est))
        }
      }.start()
    try {
      q.processAllAvailable()
      input.addData(rows.drop(200))
      q.processAllAvailable()
      val streamed = lastEst.map { case (k, (_, v)) => k -> v }.toMap
      // batch form: the same rows through the bounded Aggregator + the
      // shared estimator projection
      val bottomK = udaf(new graft.functions.BottomKDistinct(Sketches.KmvK))
      val batch = Sketches.withKmvEstimate(
          rows.toDF("key", "value")
            .select(col("key"), Sketches.hash32(col("value")).as("h"))
            .groupBy("key").agg(bottomK(col("h")).as("sketch")))
        .collect()
        .map(r => r.getAs[String]("key") ->
          (r.getAs[Long]("n_sketch"), r.getAs[Long]("kmv_est"))).toMap
      assert(streamed == batch,
        s"streaming and batch KMV diverged: $streamed vs $batch")
      // small set is exact; large sets near truth
      assert(streamed("k2") == (40L, 40L))
      assert(math.abs(streamed("k0")._2 - 157L) <= 80)
    } finally q.stop()
  }

  test("streaming HLL state emits bit-identical estimates to the batch column form") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1 to 400).map(i => graft.streaming.KeyedValue(s"k${i % 2}", s"u${i % 157}")) ++
      (1 to 50).map(i => graft.streaming.KeyedValue("k2", s"u$i"))
    val input = MemoryStream[graft.streaming.KeyedValue]
    // two batches: state must carry registers across triggers
    input.addData(rows.take(200))
    // keep the LAST emission per key by batch id — the raw estimate is
    // NOT monotone across the linear-counting→raw branch switch (LC at
    // v=1 exceeds the 2.5m cutoff the raw branch resumes under), so a
    // max over all emissions could exceed the final state's estimate
    val lastEst = scala.collection.concurrent.TrieMap[String, (Long, Long)]()
    val q = graft.streaming.StreamingSketch.distinctByKey(input.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.DistinctEstimate], id: Long) =>
        df.collect().foreach { e =>
          if (!lastEst.get(e.key).exists(_._1 > id)) lastEst(e.key) = (id, e.n_estimate)
        }
      }.start()
    try {
      q.processAllAvailable()
      input.addData(rows.drop(200))
      q.processAllAvailable()
      val streamed = lastEst.map { case (k, (_, est)) => k -> est }.toMap
      val batch = Sketches.hllEstimateBy(
          rows.toDF("key", "value"), Seq("key"), col("value"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("hll_est")).toMap
      assert(streamed == batch,
        s"streaming and batch sketches diverged: $streamed vs $batch")
      // sanity: k0/k1 see ~157 distinct users, k2 sees 50
      assert(math.abs(streamed("k2") - 50L) <= 15)
    } finally q.stop()
  }

  test("join-cardinality estimate tracks exact F2 within sketch error") {
    val r = graft.operators.Sketches.joinCardEstimate(spark, sf001).collect().head
    val (dEst, dExact) = (r.getAs[Long]("d_est"), r.getAs[Long]("d_exact"))
    val (f2Est, f2Exact) = (r.getAs[Long]("f2_est"), r.getAs[Long]("f2_exact"))
    // k=64 → σ ≈ 13% on D; F2 compounds the sample variance — 4σ band
    assert(math.abs(dEst - dExact).toDouble / dExact < 0.52, s"d: $dEst vs $dExact")
    assert(math.abs(f2Est - f2Exact).toDouble / f2Exact < 0.60, s"F2: $f2Est vs $f2Exact")
    // the sample the estimator touched is bounded by k (+hash ties)
    assert(r.getAs[Long]("m") <= graft.operators.Sketches.KmvK + 2)
  }

  test("bloom-pruned join equals the plain unpruned join exactly") {
    import org.apache.spark.sql.functions._
    val pruned = graft.operators.Sketches.bloomJoin(spark, sf0001)
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val li = graft.Tables.lineitem(spark, sf0001)
    val urgent = graft.Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg((sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))) / 10000.0)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(pruned == plain,
      s"bloom false positives must die in the equi-join: $pruned vs $plain")
    assert(pruned.nonEmpty)
  }
}
