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

  test("streaming delta feed maintains the view incrementally, matching the batch algebra") {
    // the IVM algebra run CONTINUOUSLY: ±1-weighted delta rows arrive as
    // a stream, a plain update-mode aggregation holds the running view
    // state — Structured Streaming's incremental agg IS the refresh
    // loop, so the final state must equal one batch pass over the log
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val deltas = Seq(
      ("O", 1L, 1000L), ("O", 1L, 2000L), ("F", 1L, 500L), // inserts
      ("O", -1L, -1000L), ("F", 1L, 700L), // delete (negated cents) + insert
      ("F", -1L, -500L), ("P", 1L, 900L)) // delete + insert
    val input = MemoryStream[(String, Long, Long)]
    val view = input.toDS().toDF("status", "dw", "dc")
      .groupBy("status")
      .agg(sum("dw").as("n_rows"), sum("dc").as("total_cents"))
    val lastState = scala.collection.concurrent.TrieMap[String, (Long, Long, Long)]()
    val q = view.writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.collect().foreach { r =>
          val k = r.getString(0)
          if (!lastState.get(k).exists(_._1 > id))
            lastState(k) = (id, r.getLong(1), r.getLong(2))
        }
      }.start()
    try {
      input.addData(deltas.take(3))
      q.processAllAvailable()
      input.addData(deltas.drop(3)) // state must carry across triggers
      q.processAllAvailable()
      val streamed = lastState.map { case (k, (_, n, tc)) => k -> (n, tc) }.toMap
      val batch = deltas.toDF("status", "dw", "dc")
        .groupBy("status").agg(sum("dw"), sum("dc"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch)
      // the view algebra held: O has 1 live row (2 inserts − 1 delete)
      assert(streamed("O") == (1L, 2000L))
      assert(streamed("F") == (1L, 700L))
    } finally q.stop()
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
