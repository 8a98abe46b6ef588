package graft

import graft.operators.Graph

/** Fixed-point PageRank sanity: bounds, monotonicity in degree, and
  * bit-exact repeatability (the determinism the oracle relies on). */
class GraphSpec extends SparkSpec {

  test("pagerank ranks are bounded below by the teleport term and deterministic") {
    val a = Graph.pageRank(spark, sf0001).collect()
    assert(a.nonEmpty)
    // every node receives at least the teleport mass 0.15·SC
    assert(a.forall(_.getAs[Long]("rank_sc") >= 150000L))
    // both node types present
    assert(a.map(_.getAs[String]("node_type")).toSet == Set("customer", "supplier"))
    // bit-exact across runs: integer arithmetic has no merge-order noise
    val b = Graph.pageRank(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("suppliers (high in-degree side) concentrate rank mass") {
    val rows = Graph.pageRank(spark, sf0001).collect()
    val byType = rows.groupBy(_.getAs[String]("node_type"))
      .view.mapValues(rs => rs.map(_.getAs[Long]("rank_sc").toDouble).sum / rs.length)
    // far fewer suppliers than customers share the same undirected edge
    // set, so mean supplier rank must exceed mean customer rank
    assert(byType("supplier") > byType("customer"))
  }
}
