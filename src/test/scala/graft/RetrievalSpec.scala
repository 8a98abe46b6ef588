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

  test("bm25 plan is window-free with the query side broadcast") {
    val plan = Retrieval.bm25TopK(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bm25 top-k must stay a partial/merge aggregate:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query terms / stats must broadcast, not shuffle the index:\n$plan")
  }
}
