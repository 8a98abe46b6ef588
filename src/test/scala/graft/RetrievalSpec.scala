package graft

import graft.operators.Retrieval

/** Integer-BM25 retrieval: ranking semantics + the scale-shape guards
  * (broadcast query side, bounded top-k — no window, no SMJ on the
  * tiny side). */
class RetrievalSpec extends SparkSpec {

  test("bm25 returns k ranked docs per query with positive ordered scores") {
    val rows = Retrieval.bm25TopK(spark, sf001).collect()
    val byQuery = rows.groupBy(_.getString(0))
    assert(byQuery.keySet ==
      Retrieval.QueryTerms.map(_._1).toSet)
    byQuery.values.foreach { rs =>
      assert(rs.length == 5)
      assert(rs.map(_.getInt(1)).toSeq == (1 to 5))
      val scores = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(scores.forall(_ > 0))
      // rank order is score order (descending)
      assert(scores.toSeq == scores.sortBy(-_).toSeq)
    }
  }

  test("bm25 ranking is tf-monotone and length-normalized on a constructed corpus") {
    import spark.implicits._
    val q = Seq("q" -> "cat")
    // equal length, different tf: doc 1 mentions cat twice, doc 2 once
    val tf = Seq(
      (1L, "cat cat dog bird fish"),
      (2L, "cat dog dog bird fish"),
      (3L, "dog dog dog bird fish")).toDF("doc_id", "text")
    val tfRanked = Retrieval.bm25On(tf, q, 3).collect()
    assert(tfRanked.map(_.getLong(2)).toSeq == Seq(1L, 2L),
      "higher tf at equal length must rank first; tf=0 must not appear")
    // equal tf, different length: the shorter doc must rank first
    val len = Seq(
      (1L, "cat dog"),
      (2L, "cat dog bird fish mouse horse cow hen owl fox")).toDF("doc_id", "text")
    val lenRanked = Retrieval.bm25On(len, q, 2).collect()
    assert(lenRanked.map(_.getLong(2)).toSeq == Seq(1L, 2L),
      "equal tf must rank the shorter document first")
  }

  test("tfidf top terms: rare terms outrank common ones, ties break on term") {
    import spark.implicits._
    // "zebra" appears once in the corpus (df=1), "dog" in every doc
    // (df=3); in doc 1 both have tf=1 so the rare term must rank first.
    // "ant" and "bee" tie exactly (tf=1, df=1) and must order lexically.
    val docs = Seq(
      (1L, "zebra dog ant bee"),
      (2L, "dog dog cat"),
      (3L, "dog cat cat")).toDF("doc_id", "text")
    val top = Retrieval.tfidfOn(docs, 4).collect()
      .filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(top.map(_.getString(2)).toSeq == Seq("ant", "bee", "zebra", "dog"),
      "df=1 terms first (alphabetical among equal scores), df=3 last")
    val scores = top.map(_.getLong(3))
    assert(scores.init.zip(scores.tail).forall { case (a, b) => a >= b })
    // tf raises the score at equal df: doc 2's "dog" (tf=2) must beat
    // doc 3's "cat"-free ranking of dog (tf=1)
    val all = Retrieval.tfidfOn(docs, 4).collect()
    def sc(doc: Long, term: String) =
      all.find(r => r.getLong(0) == doc && r.getString(2) == term).get.getLong(3)
    assert(sc(2L, "dog") == 2 * sc(3L, "dog"),
      "linear tf: doubled term frequency doubles the exact score")
  }

  test("tfidf top-k is bounded at k and window-free") {
    val df = Retrieval.tfidfTopK(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-doc ranking must stay a partial/merge aggregate:\n$plan")
    val counts = df.groupBy("doc_id").count().collect()
    assert(counts.forall(_.getLong(1) <= 5))
  }

  test("prf expansion recalls a synonym-only doc the plain query misses") {
    import spark.implicits._
    // query: "engine". The corpus correlates "engine" with "motor"
    // in the feedback docs; doc 10 says only "motor" — plain BM25
    // can never return it, PRF must (the recall-repair the operator
    // exists for). Filler docs keep the correlated term's df honest.
    val docs = (Seq(
      (1L, "engine motor piston crank shaft"),
      (2L, "engine motor valve cam gear"),
      (3L, "engine motor bolt nut washer"),
      (10L, "motor motor motor coil wire"),
      (11L, "bread butter jam tea scone"),
      (12L, "river stone moss fern bank"),
      (13L, "cloud rain wind storm sky")) ++
      (20L to 40L).map(i => (i, s"filler$i word$i item$i thing$i part$i")))
      .toDF("doc_id", "text")
    val q = Seq("q" -> "engine")
    val plain = Retrieval.bm25On(docs, q, 5).collect().map(_.getLong(2)).toSet
    assert(!plain.contains(10L), "plain BM25 cannot see the synonym-only doc")
    val prf = Retrieval.prfOn(docs, q, fbK = 3, exK = 2, k = 5)
      .collect().map(_.getLong(2)).toSet
    assert(prf.contains(10L),
      s"expansion must recall the motor-only doc; got $prf")
    // original terms outweigh expansions: the engine+motor docs still
    // rank above the motor-only doc
    val ranked = Retrieval.prfOn(docs, q, 3, 2, 5).collect()
      .sortBy(_.getInt(1)).map(_.getLong(2))
    assert(ranked.indexOf(10L) > ranked.indexOf(1L))
  }

  test("bm25 plan is window-free with the query side broadcast") {
    // the memoized standard-query score frame (r17) hides the scoring
    // joins behind a checkpointed LogicalRDD in bm25TopK's own plan, so
    // the broadcast assertion probes the scoring CORE the memo build
    // runs — same arithmetic, un-memoized path
    val scoringPlan = Retrieval.bm25On(
        graft.Tables.documents(spark, sf001), Retrieval.QueryTerms, 5)
      .queryExecution.executedPlan.toString
    assert(!scoringPlan.contains("Window"),
      s"bm25 top-k must stay a partial/merge aggregate:\n$scoringPlan")
    assert(scoringPlan.contains("BroadcastHashJoin") ||
        scoringPlan.contains("BroadcastNestedLoopJoin"),
      s"query terms / stats must broadcast, not shuffle the index:\n$scoringPlan")
    // and the served query stays window-free over the memoized frame
    val plan = Retrieval.bm25TopK(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bm25 top-k must stay a partial/merge aggregate:\n$plan")
  }

  test("mmr greedy drops a near-duplicate of the leader for a diverse lower-relevance doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A leads; B is A's near-duplicate (sim 1000) with close relevance;
    // C is diverse with lower relevance. λ=0.7: B's mmr = 7·900 − 3·1000
    // = 3300 < C's 7·500 = 3500 → selection order A, C, B — pure
    // relevance would have taken B second.
    val p = Seq(("q", 1L, 1000L), ("q", 2L, 900L), ("q", 3L, 500L))
      .toDF("query_id", "doc_id", "rel_milli")
    val sims = Seq(("q", 1L, 2L, 1000L), ("q", 2L, 1L, 1000L),
      ("q", 1L, 3L, 0L), ("q", 3L, 1L, 0L),
      ("q", 2L, 3L, 0L), ("q", 3L, 2L, 0L))
      .toDF("query_id", "di", "dj", "sim_milli")
    val got = Retrieval.mmrSelect(p, sims)
      .select("rnk", "doc_id", "mmr_deci")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 7000L), (2L, 3L, 3500L), (3L, 2L, 3300L)))
    // and on real data: rank-1 equals the plain BM25 winner per query
    val mmr1 = Retrieval.mmrRerank(spark, sf001)
      .filter(col("rnk") === 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val bm1 = Retrieval.bm25TopK(spark, sf001)
      .filter(col("rnk") === 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mmr1 == bm1)
  }

  test("query likelihood prefers term coverage and scores every doc (smoothed absence)") {
    import spark.implicits._
    // d1 hammers one query term, d2 covers both once, d3 has neither —
    // the language model's coverage preference (absence pays the
    // smoothed-prior penalty on EVERY term) must rank d2 > d1 > d3,
    // where BM25's tf-only sum would happily rank d1 first
    val docs = Seq(
      (1L, "a a a a"),
      (2L, "a b"),
      (3L, "c c c c")).toDF("doc_id", "text")
    val got = Retrieval.qlOn(docs, Seq("q1" -> "a", "q1" -> "b"),
        mu = 2000L, k = 3)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 3L), got.mkString(", "))
    // all three docs scored — tf=0 never drops a doc from the ranking
    assert(got.length == 3)
    // scores strictly ordered (the fixture avoids 6-decimal ties)
    assert(got.sliding(2).forall { case Array(x, y) => x._2 > y._2 })
  }

  test("mrr/map: metric invariants hold and the phrase oracle discriminates") {
    val rows = graft.operators.Retrieval.mrrMapEval(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (first, rr, ap) = (
        Option(r.get(3)).map(_.asInstanceOf[Number].longValue),
        r.getLong(4), r.getLong(5))
      first match {
        case Some(f) => assert(rr == 1000000L / f, s"rr inconsistent: $r")
        case None => assert(rr == 0L, s"rr nonzero with no hit: $r")
      }
      assert(ap >= 0L && ap <= 1000000L, s"ap out of range: $r")
      // a hit implies nonzero AP; no hit implies zero
      assert((rr > 0) == (ap > 0), s"rr/ap hit disagreement: $r")
    }
    // adjacency relevance must actually discriminate — a saturated
    // all-1.0 eval means the oracle is vacuous for this ranker
    assert(rows.exists(_.getLong(5) < 1000000L),
      "MAP saturated at 1.0 — relevance cut not discriminating")
  }

  test("proximity search: window edges inclusive, unordered, pair counting exact") {
    import spark.implicits._
    // x_hash_join = (hash, join), W = 5
    val docs = Seq(
      (1L, "hash a b c d join"),        // distance 5: inclusive edge counts
      (2L, "hash a b c d e join"),      // distance 6: outside
      (3L, "join x hash"),              // unordered: distance 2 counts
      (4L, "hash join hash"),           // pairs: (0,1) and (2,1) -> 2
      (5L, "hash only here"))           // missing partner: no row
      .toDF("doc_id", "text")
    val got = Retrieval.proximitySearchOn(spark, docs).collect()
      .filter(_.getString(0) == "x_hash_join")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_near")).toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 2L), s"got $got")
  }

  test("phrase search: ordered matching, overlapping occurrences, count-then-id ranking") {
    import spark.implicits._
    // p_table_value = "table value"; p_slow_fast_table = "slow fast table"
    val docs = Seq(
      (1L, "table value x table value y value table"), // 2 ordered occurrences; reverse not counted
      (2L, "table table value"),                       // 1 (overlap-safe: starts 0 fails, 1 hits)
      (3L, "value table value"),                       // 1 at pos 1
      (4L, "table x value"),                           // gap: no match
      (5L, "slow fast table value"),                   // 3-gram + a 2-gram occurrence
      (6L, "fast table slow"))                         // pieces out of order: no 3-gram
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearchOn(spark, docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Int]("rnk"), r.getAs[Long]("n_occurrences")))).toMap
    assert(got(("p_table_value", 1L)) == ((1, 2L)), "two ordered occurrences rank first")
    assert(got(("p_table_value", 2L))._2 == 1L)
    assert(got(("p_table_value", 3L))._2 == 1L)
    assert(!got.contains(("p_table_value", 4L)), "a gapped pair must not match")
    assert(got(("p_slow_fast_table", 5L)) == ((1, 1L)))
    assert(!got.contains(("p_slow_fast_table", 6L)), "order matters")
    // tie-break: equal counts rank by doc_id ascending
    val ties = got.toSeq.filter(e => e._1._1 == "p_table_value" && e._2._2 == 1L)
      .sortBy(_._2._1).map(_._1._2)
    assert(ties == ties.sorted, "equal-count docs must rank by doc_id")
  }
}
