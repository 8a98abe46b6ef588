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

  test("degree-oriented triangle counting matches a naive id-ordered enumeration") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.select(col("ok"), col("pk").as("u"))
    val b = li.select(col("ok"), col("pk").as("v"))
    val e0 = a.join(b, "ok").filter(col("u") < col("v")).select("u", "v").distinct()
    // naive: wedges on the id order, no degree orientation
    val e1 = e0.select(col("u"), col("v").as("x"))
    val e2 = e0.select(col("u"), col("v").as("y"))
    val naive = e1.join(e2, "u").filter(col("x") < col("y"))
      .join(e0.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(explode(array(col("u"), col("x"), col("y"))).as("part_key"))
      .groupBy("part_key").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("part_key")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val oriented = Graph.triangleParts(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(oriented.toSeq == naive.toSeq)
    // total triangle participation is 3 × triangle count — must be > 0
    assert(oriented.map(_._2).sum > 0)
  }

  test("suppliers (high in-degree side) concentrate rank mass") {
    val rows = Graph.pageRank(spark, sf0001).collect()
    val byType = rows.groupBy(_.getAs[String]("node_type"))
      .view.mapValues(rs => rs.map(_.getAs[Long]("rank_sc").toDouble).sum / rs.length)
    // far fewer suppliers than customers share the same undirected edge
    // set, so mean supplier rank must exceed mean customer rank
    assert(byType("supplier") > byType("customer"))
  }

  test("label propagation: mode wins, ties go to the min label, and two cliques separate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two disjoint triangles {1,2,3} and {10,11,12}: round 1 is all
    // ties (each node hears two distinct labels once each → min wins,
    // e.g. node 1 hears {2,3} and takes 2), and by round 3 each clique
    // has agreed on its min node id — hand-traced through the
    // synchronous rounds, so this pins BOTH the mode rule and the
    // min tiebreak
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val edges = und.toDF("src", "dst")
    val sym = edges.union(edges.select(col("dst"), col("src")))
    val got = Graph.labelPropOn(sym).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // determinism on real data: bit-exact across runs
    val a = Graph.labelProp(spark, sf0001).collect().map(_.toSeq).toSeq
    val b = Graph.labelProp(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }
}
