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

  test("bm25 favors higher tf at equal length: ranking is tf-monotone") {
    // within one query, the rank-1 doc's summed contributions must be
    // >= every other returned doc's (already implied), and the plan
    // must be window-free with the query side broadcast
    val plan = Retrieval.bm25TopK(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bm25 top-k must stay a partial/merge aggregate:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query terms / stats must broadcast, not shuffle the index:\n$plan")
  }
}
