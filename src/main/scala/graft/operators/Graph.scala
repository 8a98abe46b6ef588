package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics beyond connected components — PageRank
  * centrality in fixed-point integer arithmetic.
  *
  * The dedup tier already walks graphs (label propagation and
  * large-star/small-star CC in Dedup.scala); PageRank adds the other
  * canonical iterative-join workload: rank flows along edges until a
  * fixed iteration budget. Floats would make the per-node sums
  * order-sensitive, so ranks are milli-scaled BIGINTs (SC = 10^6) with
  * integer division at every step — three deterministic iterations any
  * engine replays exactly.
  *
  * Graph: the bipartite customer↔supplier purchase graph — an edge per
  * distinct (customer, supplier) pair that co-occurs in an order
  * (orders ⋈ lineitem). Node ids are disambiguated by parity
  * (customer → 2k, supplier → 2k+1).
  *
  * Scale shape: per iteration, ONE join of the rank vector with the
  * edge list on src (both sides hash-partitioned on the same key — a
  * cluster deploy pre-partitions the static edge list once and every
  * iteration reuses that exchange) and ONE map-side-combined groupBy
  * on dst. State per round is |V| rank rows, never materialized on the
  * driver. Three iterations keep the demo plan small; a production run
  * loops with per-round localCheckpoint exactly like
  * Dedup.minLabelClustersOn.
  */
object Graph {

  private val SC = 1000000L
  private val Iters = 3

  /** Undirected edge list with degrees, and the rank seed. */
  private def purchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Three fixed-point PageRank iterations (damping 0.85):
    * r'(v) = 0.15·SC + 0.85·Σ_{u→v} (r(u) div deg(u)), all BIGINT. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    // materialize the static edge list once — every iteration (and the
    // degree count) would otherwise re-run the orders⋈lineitem distinct
    // from scratch; localCheckpoint also truncates the growing lineage,
    // the same pattern as Dedup.minLabelClustersOn
    val edges = purchaseEdges(spark, dir).localCheckpoint()
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = deg.withColumn("r", lit(SC))
    for (_ <- 1 to Iters) {
      val in = edges
        .join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("share"))
        .groupBy("dst").agg(sum("share").as("m"))
      ranks = deg.join(in, deg("node") === in("dst"), "left")
        .select(col("node"), col("deg"),
          (lit(150000L) + expr("(85 * coalesce(m, 0L)) div 100")).as("r"))
    }
    ranks.select(col("node").as("node_id"),
        when(col("node") % 2 === 0, "customer").otherwise("supplier")
          .as("node_type"),
        col("r").as("rank_sc"))
      .orderBy(col("node_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, d) => pageRank(s, d)))

  /** One PageRank round as SQL, reading ranks from CTE `$prev`. */
  private def roundSql(prev: String): String =
    s"(SELECT d.node, d.deg, 150000 + (85 * coalesce(s.m, 0)) // 100 AS r " +
      s"FROM d LEFT JOIN (SELECT e.dst AS node, sum(p.r // p.deg)::BIGINT AS m " +
      s"FROM e JOIN $prev p ON e.src = p.node GROUP BY 1) s USING (node))"

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         |d AS (SELECT src AS node, count(*)::BIGINT AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT node, deg, 1000000::BIGINT AS r FROM d),
         |r1 AS ${roundSql("r0")},
         |r2 AS ${roundSql("r1")},
         |r3 AS ${roundSql("r2")}
         |SELECT node AS node_id,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |  r AS rank_sc
         |FROM r3 ORDER BY node_id""".stripMargin)
}
