package graft

import org.apache.spark.sql.functions._
import graft.operators.Warehouse

/** Warehouse-maintenance invariants. The IVM test is the important
  * one: the algebraic base+delta refresh must equal a full recompute
  * over the patched table — the correctness contract that lets a
  * deployment skip rescanning the fact table. */
class WarehouseSpec extends SparkSpec {

  test("IVM refresh equals a full recompute over the patched table") {
    val refreshed = Warehouse.ivmRefresh(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val orders = Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val isDel = col("o_orderkey") % 101 === 0
    val isUpd = col("o_orderkey") % 97 === 0 && col("o_orderkey") % 101 =!= 0
    val patched = orders.filter(!isDel && !isUpd).select("status", "cents")
      .union(orders.filter(isUpd).select(
        when(col("status") === "O", "F").when(col("status") === "F", "P")
          .otherwise("O").as("status"),
        (col("cents") + 500L).as("cents")))
      .union(spark.range(1, 6).select(lit("O").as("status"),
        (lit(10000L) + col("id") * 100L).as("cents")))
    val full = patched.groupBy("status")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
      .orderBy("status").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(refreshed.toSeq == full.toSeq)
    // the change set is live: at least one group's count moved
    val base = orders.groupBy("status").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(refreshed.exists { case (s, n, _) => base.get(s).exists(_ != n) })
  }

  test("merge upsert actions partition the output") {
    val rows = Warehouse.mergeUpsert(spark, sf0001).collect()
    val byAction = rows.groupBy(_.getAs[String]("action")).view.mapValues(_.length).toMap
    assert(byAction.keySet == Set("kept", "updated", "inserted"))
    assert(byAction("inserted") == 10)
    // keys are unique after the merge (no matched row survives twice)
    val keys = rows.map(_.getAs[Long]("c_custkey"))
    assert(keys.length == keys.distinct.length)
  }
}
