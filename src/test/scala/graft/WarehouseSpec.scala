package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiling, Warehouse}

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

  test("table diff totals equal the injected drift, and only dirty buckets report") {
    val report = Warehouse.tableDiff(spark, sf001).collect()
    val orders = Tables.orders(spark, sf001).select(col("o_orderkey").as("k"))
    def cnt(c: org.apache.spark.sql.Column): Long = orders.filter(c).count()
    // the three drift classes, straight from the snapshot definitions
    val expDeleted = cnt(col("k") % 1000 === 7) // in A, dropped from B
    val expInserted = cnt(col("k") % 1000 === 13) // dropped from A, in B
    val expChanged = cnt(col("k") % 500 === 3) // price doubled in B
    assert(report.map(_.getAs[Long]("n_deleted")).sum == expDeleted)
    assert(report.map(_.getAs[Long]("n_inserted")).sum == expInserted)
    assert(report.map(_.getAs[Long]("n_changed")).sum == expChanged)
    // every reported bucket is genuinely dirty, and every dirty bucket
    // is reported — the fingerprint pass loses nothing
    report.foreach { r =>
      assert(r.getAs[Long]("n_deleted") + r.getAs[Long]("n_inserted") +
        r.getAs[Long]("n_changed") > 0, s"clean bucket reported: $r")
    }
    val dirtyBuckets = orders
      .filter(col("k") % 1000 === 7 || col("k") % 1000 === 13 || col("k") % 500 === 3)
      .select((col("k") % Warehouse.DiffBuckets).as("b")).distinct().count()
    assert(report.length == dirtyBuckets)
    // rows_a/rows_b are the real per-bucket snapshot sizes
    report.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("rows_a") ==
        cnt(col("k") % Warehouse.DiffBuckets === b && col("k") % 1000 =!= 13))
      assert(r.getAs[Long]("rows_b") ==
        cnt(col("k") % Warehouse.DiffBuckets === b && col("k") % 1000 =!= 7))
    }
  }

  test("constraint audit detects injected violations and passes the intact snapshot") {
    import spark.implicits._
    // the shipped audit: the testdata is referentially intact and
    // in-range, but its lineitem PK is genuinely non-unique — the
    // audit must report that real defect with the exact dup count
    val audit = Profiling.constraintAudit(spark, sf001).collect()
    assert(audit.length == 9)
    val byName = audit.map(r => r.getString(0) ->
      (r.getAs[Long]("checked"), r.getAs[Long]("violations"))).toMap
    byName.foreach { case (name, (checked, violations)) =>
      assert(checked > 0L)
      if (name != "unique_lineitem_pk")
        assert(violations == 0L, s"unexpected violation: $name=$violations")
    }
    val li = Tables.lineitem(spark, sf001)
    val expectedDups = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(byName("unique_lineitem_pk")._2 == expectedDups)
    assert(expectedDups > 0L) // the check is exercised by real data
    // the checks are live: corrupted frames are flagged with exact counts
    val fact = Seq((1L, 10L), (2L, 11L), (3L, 99L), (4L, 98L)).toDF("id", "ref")
    val dim = Seq(10L, 11L, 11L).toDF("key") // dup dim key must not multiply
    val fkRow = Profiling
      .fkCheck("fk", fact, "ref", dim, "key").collect().head
    assert((fkRow.getLong(1), fkRow.getLong(2)) == ((4L, 2L)))
    val rgRow = Profiling
      .rangeCheck("rg", fact, col("ref") < 50).collect().head
    assert((rgRow.getLong(1), rgRow.getLong(2)) == ((4L, 2L)))
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

  test("winsorize: bounds replay exact percentiles and clip counts respect the tails") {
    val rows = Profiling.winsorizeReport(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // driver-side exact replay per type
    val byType = Tables.events(spark, sf0001)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    rows.foreach { r =>
      val t = r.getString(0); val vs = byType(t); val n = vs.length.toLong
      assert(r.getAs[Long]("n") == n)
      def pct(p: Long) = vs(((p * n + 99) / 100 - 1).toInt)
      val (lo, hi) = (pct(Profiling.WinsorLoP), pct(Profiling.WinsorHiP))
      assert(r.getAs[Long]("p_lo_cents") == lo && r.getAs[Long]("p_hi_cents") == hi,
        s"$t: bounds ${r.getAs[Long]("p_lo_cents")}/${r.getAs[Long]("p_hi_cents")} vs $lo/$hi")
      assert(r.getAs[Long]("n_low") == vs.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_high") == vs.count(_ > hi).toLong)
      assert(r.getAs[Long]("shift_cents") ==
        vs.filter(_ < lo).map(lo - _).sum + vs.filter(_ > hi).map(_ - hi).sum)
      assert(lo <= hi && r.getAs[Long]("n_low") <= n / 20 + 1 &&
        r.getAs[Long]("n_high") <= n / 20 + 1)
    }
  }

  test("Benford audit: full digit grid, exact recon, law constants well-formed") {
    // the inlined constants ARE the law: strictly decreasing, ~1 total
    val law = Profiling.BenfordMilli
    assert(law.map(_._1) == (1L to 9L))
    assert(law.map(_._2) == law.map(_._2).sorted.reverse)
    assert(math.abs(law.map(_._2).sum - 1000L) <= 1L)
    val rows = Profiling.benfordDigits(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val nPos = Tables.events(spark, sf0001)
      .filter(round(col("value") * 100, 0).cast("long") >= 1L).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nPos,
      "digit counts must partition the positive amounts")
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_milli") ==
        r.getAs[Long]("obs_milli") - r.getAs[Long]("benford_milli"))
    }
  }
}
