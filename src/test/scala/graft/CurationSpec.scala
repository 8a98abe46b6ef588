package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("gopher filter verdict recomputes from its reported statistics and splits the corpus") {
    val rows = Curation.gopherFilters(spark, sf001).collect()
    assert(rows.nonEmpty)
    val keeps = rows.map(_.getAs[Boolean]("keep"))
    // thresholds are calibrated to genuinely split the demo corpus
    assert(keeps.contains(true) && keeps.contains(false))
    rows.foreach { r =>
      val expected = r.getAs[Long]("n_words") >= 30 &&
        r.getAs[Long]("n_words") <= 100000 &&
        r.getAs[Long]("mean_len_milli") >= 3000 &&
        r.getAs[Long]("mean_len_milli") <= 10000 &&
        r.getAs[Long]("diversity_milli") >= 350 &&
        r.getAs[Long]("stop_hits") >= 2 &&
        r.getAs[Long]("alpha_frac_milli") >= 800
      assert(r.getAs[Boolean]("keep") == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("DSIR weights: total, selected=sign, and the target slice scores higher") {
    val rows = Curation.dsirWeights(spark, sf001).collect()
    // one row per tokenizable document
    val nDocs = Tables.documents(spark, sf001)
      .filter(size(graft.functions.TextFunctions.tokens(col("text"))) > 0)
      .count()
    assert(rows.length == nDocs, s"${rows.length} rows for $nDocs tokenized docs")
    // selected is exactly the zero-threshold cut
    rows.foreach { r =>
      assert(r.getAs[Boolean]("selected") == (r.getAs[Long]("weight_micro") > 0L))
    }
    // the model must actually separate: the slice the target model was
    // fit on scores higher ON AVERAGE than the rest (the expected
    // log-ratio under the target distribution exceeds it under raw —
    // the KL gap DSIR selection relies on)
    val (en, other) = rows.partition(_.getAs[String]("lang") == "en")
    assert(en.nonEmpty && other.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("weight_micro").toDouble).sum / rs.length
    assert(mean(en) > mean(other),
      f"target slice mean ${mean(en)}%.0f not above raw-rest mean ${mean(other)}%.0f")
  }

  test("DSIR resample: exact Gumbel top-k of the full frame, no Window") {
    val K = Curation.DsirResampleK
    val got = Curation.dsirResample(spark, sf001).collect()
    // recompute every doc's key independently and take the true top-K
    val all = Curation.dsirWeights(spark, sf001).collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString // 8 hex digits, 32-bit uniform
      val u = (java.lang.Long.parseLong(h, 16) + 1) / 4294967297.0
      val key = r.getAs[Long]("weight_micro") +
        math.round(-math.log(-math.log(u)) * 1e6)
      (id, key)
    }
    val want = all.sortBy { case (id, key) => (-key, id) }.take(K)
    assert(got.length == math.min(K, all.length))
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("key_micro")))
      .sortBy { case (id, key) => (-key, id) }.toSeq == want.toSeq,
      "resample is not the exact Gumbel top-k")
    // plan: a bounded TakeOrdered, never a global sort or Window funnel
    val plan = Curation.dsirResample(spark, sf001).queryExecution.executedPlan
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"resample should plan as TakeOrderedAndProject:\n$plan")
    assert(!plan.toString.contains("Window"),
      s"resample must not funnel through a Window:\n$plan")
  }

  test("bounded reservoir equals the global hash-order sort and is stable") {
    import graft.operators.Sketches
    val got = Curation.sampleReservoir(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1) // rank order — presentation sort removed from query
    assert(got.length == 32)
    // the banned global-sort formulation, at test scale only
    val naive = Tables.documents(spark, sf001)
      .select(col("doc_id"), Sketches.hash32(col("doc_id")).as("h"))
      .orderBy("h", "doc_id").limit(32).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(t => (t._2, t._3)).toSeq == naive.toSeq)
    // rank is 1..k in hash order
    assert(got.map(_._1).toSeq == (1L to 32L))
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    // stable across runs
    val again = Curation.sampleReservoir(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == again.toSeq)
  }

  test("priority sample equals the global priority sort and favors heavy docs") {
    import graft.operators.Sketches
    val got = Curation.samplePriority(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1) // rank order — presentation sort removed from query
    assert(got.length == 16)
    val naive = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("n_chars"), Sketches.hash32(col("doc_id")).as("h"))
      .select(col("doc_id"), col("n_chars"),
        expr("n_chars * 4294967296L div (h + 1L)").as("p"))
      .orderBy(col("p").desc, col("doc_id")).limit(16).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(t => (t._2, t._4)).toSeq == naive.toSeq)
    // weighted: mean sampled length must exceed the corpus mean
    val corpusMean = Tables.documents(spark, sf001)
      .agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"weighting inert: sample $sampleMean <= corpus $corpusMean")
  }

  test("token-budget selection is maximal, within budget, and quality-monotone") {
    val rows = Curation.tokenBudgetSelect(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val budget = rows.map(_._3).sum / Curation.BudgetDenom
    val selected = rows.filter(_._4)
    assert(selected.nonEmpty, "the cut must select something at sf0.001")
    assert(selected.map(_._3).sum <= budget, "selected tokens fit the budget")
    // monotone: every doc in a bin above any selected bin is selected
    val minSelBin = selected.map(_._2).min
    rows.filter(_._2 > minSelBin).foreach(r =>
      assert(r._4, s"doc ${r._1} in bin ${r._2} above the cut must be selected"))
    // maximal at bin granularity: adding the best unselected bin overflows
    val unselBins = rows.filter(!_._4).map(_._2)
    if (unselBins.nonEmpty) {
      val nextBin = unselBins.max
      val withNext = selected.map(_._3).sum +
        rows.filter(r => r._2 == nextBin).map(_._3).sum
      assert(withNext > budget,
        s"bin $nextBin would still fit — the cut is not maximal")
    }
  }

  test("temperature mix flattens the language distribution without reordering it") {
    val rows = Curation.temperatureMix(spark, sf001)
      .select("lang", "n_docs", "weight_micro", "expected_docs")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length >= 2)
    // weights form a distribution (micro units; rounding slack ±|langs|)
    val wsum = rows.map(_._3).sum
    assert(math.abs(wsum - 1000000L) <= rows.length,
      s"weights sum to $wsum micro")
    val budget = rows.map(_._4).sum
    assert(math.abs(budget - Curation.MixBudget) <= rows.length)
    // order-preserving: more docs never means a smaller weight
    rows.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"weight order inverted: $a vs $b")
    }
    // flattening: the head/tail weight ratio is strictly tamer than the
    // head/tail count ratio (that is what α < 1 is FOR)
    val byN = rows.sortBy(_._2)
    val (tail, head) = (byN.head, byN.last)
    assert(head._2 > tail._2, "fixture should have imbalanced languages")
    val countRatio = head._2.toDouble / tail._2
    val weightRatio = head._3.toDouble / tail._3
    assert(weightRatio < countRatio,
      s"weights not flattened: $weightRatio vs counts $countRatio")
    // α = 1/2 exactly: weight ratio ≈ sqrt(count ratio)
    assert(math.abs(weightRatio - math.sqrt(countRatio)) < 0.01 * weightRatio)
  }

  test("repetition fractions are in [0,1] and the flag matches the thresholds") {
    val rows = Curation.repetitionStats(spark, sf0001)
      .select("top2gram_frac", "dup3gram_frac", "repetitive").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t2, d3) = (r.getDouble(0), r.getDouble(1))
      assert(t2 >= 0 && t2 <= 1 && d3 >= 0 && d3 <= 1)
      assert(r.getBoolean(2) == (t2 > 0.18 || d3 > 0.30))
    }
  }

  test("a doc made of one repeated 2-gram maxes the repetition fractions") {
    // "x y x y x y x y": 2-grams = [x y, y x, x y, y x, x y, y x, x y]
    // → top "x y" 4/7; 3-grams all recur → dup3 = 1.0
    import spark.implicits._
    val toks = Seq("x", "y", "x", "y", "x", "y", "x", "y")
    val one = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    // replay the public query's algebra through a temp view of one doc
    val g2 = one.select(explode(expr(
      "transform(sequence(0, size(split(text, ' ')) - 2), " +
        "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1]))")).as("g"))
      .groupBy("g").count().agg(max("count").as("mx"), sum("count").as("n"))
      .head()
    assert(g2.getLong(0) == 4 && g2.getLong(1) == 7)
    // and the QUERY path (fused native counts) produces the same
    // fractions and trips both repetition gates on that doc
    val q = Curation.repetitionStatsOn(one).head()
    assert(math.abs(q.getDouble(1) - 4.0 / 7.0) < 1e-12)
    assert(q.getDouble(2) == 1.0)
    assert(q.getBoolean(3))
  }

  test("scrubbed text carries no live email, url, or phone") {
    val rows = Curation.scrubPii(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[String]("scrubbed")
      assert(!s.contains("@") && !s.contains("http://") &&
        !s.matches(".*[0-9]{3}-[0-9]{4}.*"), s"unscrubbed: $s")
      assert(r.getAs[Long]("n_emails") >= 1 && r.getAs[Long]("n_urls") >= 1 &&
        r.getAs[Long]("n_phones") >= 1)
      assert(s.contains("<EMAIL>") && s.contains("<URL>") && s.contains("<PHONE>"))
    }
  }

  test("hash sampling is deterministic and keeps only the '0' nibble") {
    val a = Curation.sampleHash(spark, sf0001).collect()
    val b = Curation.sampleHash(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq, "hash sample must be replay-stable")
    a.foreach(r => assert(r.getAs[String]("bucket").startsWith("0")))
  }

  test("stratified sampling respects each language's acceptance rate") {
    val docs = Tables.documents(spark, sf0001)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.sampleStratified(spark, sf0001).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, rate) <- Curation.strataRates if total.contains(lang)) {
      val frac = kept.getOrElse(lang, 0L).toDouble / total(lang)
      if (rate == 1.0) assert(frac == 1.0, s"$lang: rate-1.0 stratum must keep all")
      // u is uniform-ish; at sf0.001 strata are small, so bound loosely
      else assert(math.abs(frac - rate) < 0.25, s"$lang: kept $frac, rate $rate")
    }
  }

  test("hash splits are deterministic, exhaustive, and near 80/10/10") {
    val a = Curation.assignSplits(spark, sf001).collect()
    val b = Curation.assignSplits(spark, sf001).collect()
    assert(a.toSeq == b.toSeq, "split assignment must be replay-stable")
    val n = a.length.toDouble
    val frac = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length / n).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(math.abs(frac("train") - 0.8) < 0.06, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.04 && math.abs(frac("test") - 0.1) < 0.04)
  }

  test("stride chunking covers every token, overlaps by W-S, and rebuilds the document") {
    val rows = Curation.chunkStride(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    val (w, s) = (Curation.ChunkTokens, Curation.ChunkStride)
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // starts advance by exactly the stride from zero
      assert(sorted.map(_._3).toSeq == sorted.indices.map(_.toLong * s))
      // every chunk is exactly min(W, n - start) tokens: full-width in
      // the interior, tapering once a start lands within W of the end —
      // and never empty (a start is only emitted while start < n)
      val ns = sorted.map(_._4)
      val n = sorted.last._3 + ns.last
      sorted.foreach { c => assert(c._4 == math.min(w.toLong, n - c._3) && c._4 >= 1) }
      assert(sorted.forall(c => c._5.split(" ").count(_.nonEmpty) == c._4))
      // consecutive chunks agree on their W-S token overlap
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val at = a._5.split(" ").filter(_.nonEmpty)
        val bt = b._5.split(" ").filter(_.nonEmpty)
        assert(at.drop(s).sameElements(bt.take(at.length - s)))
      }
      // stitching chunks at stride offsets reproduces the document's
      // token stream: chunk i contributes its first S tokens, the last
      // chunk contributes everything
      val stitched = sorted.init.flatMap(_._5.split(" ").filter(_.nonEmpty).take(s)) ++
        sorted.last._5.split(" ").filter(_.nonEmpty)
      assert(stitched.length == n, "chunk union must cover every token exactly")
    }
  }

  test("hashed classifier separates disjoint-vocabulary quality classes") {
    import spark.implicits._
    // hq docs: diverse vocabulary (all-distinct tokens); lq docs: one
    // token repeated. Vocabularies are disjoint, so bucket weights
    // learned from the labels must rank every hq doc above every lq doc.
    val hq = (0L until 6L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i"))
    val lq = (6L until 12L).map(i => (i, Seq.fill(8)(s"spam$i").mkString(" ")))
    val out = Curation.classifierQualityOn((hq ++ lq).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
    assert(out.length == 12)
    // labels recompute from the rule
    out.foreach { case (id, _, _, lab) => assert(lab == (id < 6L)) }
    val hqScores = out.filter(_._1 < 6L).map(_._2)
    val lqScores = out.filter(_._1 >= 6L).map(_._2)
    assert(hqScores.min > lqScores.max,
      s"classifier must separate the classes: hq=$hqScores lq=$lqScores")
    // prediction agrees with the label on this separable corpus
    out.foreach { case (_, _, pred, lab) => assert(pred == lab) }
  }

  test("classifier weights broadcast; the only corpus shuffle keys on doc_id") {
    val plan = Curation.classifierQuality(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the 64-row weight table must broadcast, not shuffle the tokens:\n$plan")
    assert(!plan.contains("Window"))
  }

  test("FIM transform: cuts in bounds, PSM reassembles the original, passthrough untouched") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Curation.fimTransform(spark, sf0001).collect()
    assert(rows.length == docs.size)
    var applied = 0
    rows.foreach { r =>
      val (id, fim) = (r.getAs[Long]("doc_id"), r.getAs[Boolean]("fim_applied"))
      val (a, b) = (r.getAs[Long]("cut_a"), r.getAs[Long]("cut_b"))
      val out = r.getAs[String]("fim_text")
      val text = docs(id)
      if (!fim) {
        assert(out == text && a == 0 && b == 0)
      } else {
        applied += 1
        assert(1 <= a && a < b && b <= text.length, s"doc $id cuts ($a,$b) vs len ${text.length}")
        val (pre, mid, suf) =
          (text.substring(0, a.toInt), text.substring(a.toInt, b.toInt), text.substring(b.toInt))
        assert(out == s"<|pre|>$pre<|suf|>$suf<|mid|>$mid", s"doc $id PSM mismatch")
        assert(mid.nonEmpty && pre.nonEmpty)
      }
    }
    // hash gate targets 50%; a 3σ binomial band on this corpus size
    val n = rows.length
    assert(math.abs(applied - n / 2.0) <= 3 * math.sqrt(n * 0.25), s"$applied of $n gated")
    // pure scan projection: no shuffle anywhere in the plan
    val plan = Curation.fimTransform(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"FIM must stay a zero-shuffle scan:\n$plan")
  }

  test("source KL: nonnegative, equal on identical-mix sources, large on a disjoint vocabulary") {
    import spark.implicits._
    val rows = Curation.sourceKl(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("kl_nats") >= 0.0))
    // n_tokens partitions the corpus token count
    val corpusToks = Tables.documents(spark, sf0001)
      .select(sum(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == corpusToks)
    // synthetic: two identical-mix sources read KL 0; a disjoint-vocab
    // source dominates every on-mix source
    val synth = Seq(
      ("a", "x y z x y z"), ("b", "x y z x y z"),
      ("c", "q q r r s s")).toDF("source", "text")
    val klOf = Curation.sourceKlOn(synth).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_nats")).toMap
    assert(klOf("a") == klOf("b"))
    assert(klOf("c") > klOf("a"))
    assert(klOf("c") > 0.5, s"disjoint vocab must read large: ${klOf("c")}")
  }

  test("sorted packing: same docs and buckets, bins fill longest-first, efficiency adds up") {
    val base = Curation.packSequences(spark, sf0001).collect()
    val sorted = Curation.packSequencesSorted(spark, sf0001).collect()
    // same universe: identical (doc_id, bucket, n_tokens) multiset
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1).toSeq
    assert(key(base) == key(sorted))
    // longest-first: within a bucket, seq_id is monotone over
    // (n_tokens desc, doc_id) fill order
    sorted.groupBy(_.getAs[Int]("bucket")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(r => (-r.getAs[Long]("n_tokens"), r.getAs[Long]("doc_id")))
        .map(_.getAs[Long]("seq_id"))
      assert(inOrder.sameElements(inOrder.sorted), "seq_id must be monotone in fill order")
    }
    val eff = Curation.packEfficiency(spark, sf0001).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    assert(eff.keySet == Set("doc_order", "length_sorted"))
    val totalTokens = base.map(_.getAs[Long]("n_tokens")).sum
    eff.values.foreach { r =>
      // used + overflow = total tokens, where used = n_seqs*cap - padding
      val used = r.getAs[Long]("n_seqs") * Curation.PackCapacity -
        r.getAs[Long]("padding_tokens")
      assert(used + r.getAs[Long]("overflow_tokens") == totalTokens)
      val u = r.getAs[Long]("utilization_milli")
      assert(u > 0 && u <= 1000)
    }
  }

  test("budget water-filling: hand-computed cut, max-min fairness, budget never exceeded") {
    import spark.implicits._
    // avails 1,2,100,100; B = 203*3 div 5 = 121; rows 1,2 saturate
    // (121-0-1*4 >= 0; 121-1-2*3 >= 0), row 3 does not (121-3-100*2 < 0);
    // level L = (121-3) div 2 = 59
    val synth = Seq(("s1", 1L), ("s2", 2L), ("s3", 100L), ("s4", 100L))
      .toDF("source", "avail")
    val got = Curation.mixBudgetAllocOn(synth).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("allocated"), r.getAs[Boolean]("saturated"))).toMap
    assert(got == Map("s1" -> (1L, true), "s2" -> (2L, true),
      "s3" -> (59L, false), "s4" -> (59L, false)))

    val rows = Curation.mixBudgetAlloc(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("avail_tokens")).sum
    val b = total * Curation.MixBudgetNum / Curation.MixBudgetDen
    val allocs = rows.map(_.getAs[Long]("allocated"))
    assert(allocs.sum <= b, "allocation must respect the budget")
    val unsat = rows.filter(!_.getAs[Boolean]("saturated"))
    rows.foreach { r =>
      assert(r.getAs[Long]("allocated") <= r.getAs[Long]("avail_tokens"))
      if (r.getAs[Boolean]("saturated"))
        assert(r.getAs[Long]("allocated") == r.getAs[Long]("avail_tokens"))
    }
    // max-min fairness: every unsaturated source sits at one level,
    // and the slack is smaller than one more token per unsaturated source
    assert(unsat.map(_.getAs[Long]("allocated")).distinct.length <= 1)
    if (unsat.nonEmpty) assert(b - allocs.sum < unsat.length)
  }

  test("unimax: epoch cap binds on small sources, level on big ones, budget exhausted") {
    import spark.implicits._
    // avails 10,10,100,100; caps 20,20,200,200; B = 220*17 div 10 = 374;
    // rows 1,2 saturate (374-0-20*4 >= 0; 374-20-20*3 >= 0), row 3 does
    // not (374-40-200*2 < 0); L = (374-40) div 2 = 167 — and
    // 20+20+167+167 = 374 exhausts the budget exactly
    val synth = Seq(("s1", 10L), ("s2", 10L), ("s3", 100L), ("s4", 100L))
      .toDF("source", "avail")
    val got = Curation.mixUnimaxAllocOn(synth).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("allocated"), r.getAs[Double]("epochs"),
          r.getAs[Boolean]("saturated")))).toMap
    assert(got == Map(
      "s1" -> ((20L, 2.0, true)), "s2" -> ((20L, 2.0, true)),
      "s3" -> ((167L, 1.67, false)), "s4" -> ((167L, 1.67, false))))
    assert(got.values.map(_._1).sum == (220L * 17 / 10))

    val rows = Curation.mixUnimaxAlloc(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("avail_tokens")).sum
    val b = total * Curation.UnimaxBudgetNum / Curation.UnimaxBudgetDen
    val allocs = rows.map(_.getAs[Long]("allocated"))
    assert(allocs.sum <= b)
    val unsat = rows.filter(!_.getAs[Boolean]("saturated"))
    rows.foreach { r =>
      assert(r.getAs[Long]("cap_tokens") ==
        r.getAs[Long]("avail_tokens") * Curation.UnimaxEpochs)
      assert(r.getAs[Long]("allocated") <= r.getAs[Long]("cap_tokens"))
      assert(r.getAs[Double]("epochs") <= Curation.UnimaxEpochs.toDouble)
      if (r.getAs[Boolean]("saturated"))
        assert(r.getAs[Long]("allocated") == r.getAs[Long]("cap_tokens"))
    }
    assert(unsat.map(_.getAs[Long]("allocated")).distinct.length <= 1)
    if (unsat.nonEmpty) assert(b - allocs.sum < unsat.length)
  }

  test("mixing weights and corpus shares each sum to 1") {
    val rows = Curation.mixWeights(spark, sf0001).collect()
    assert(math.abs(rows.map(_.getAs[Double]("p")).sum - 1.0) < 1e-6)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-6)
    // sqrt temperature flattens: every share moves toward uniform
    rows.foreach { r =>
      val (p, w) = (r.getAs[Double]("p"), r.getAs[Double]("weight"))
      if (p > 1.0 / rows.length) assert(w < p)
      if (p < 1.0 / rows.length) assert(w > p)
    }
  }
}
