package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted-aggregation/join equivalence: skew mitigation must never
  * change results, only the shuffle layout. */
class SkewSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf001)

  test("saltedAgg equals direct aggregation") {
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"),
        min("value").as("mn"), max("value").as("mx"))
    val salted = Skew.saltedAgg(
      events,
      keys = Seq("event_type"),
      saltCol = Skew.salt(16, col("event_id")),
      partial = Seq(count(lit(1)).as("pn"), sum("value").as("psv"),
        min("value").as("pmn"), max("value").as("pmx")),
      fin = Seq(sum("pn").as("n"), sum("psv").as("sv"),
        min("pmn").as("mn"), max("pmx").as("mx")))
    // float sums: compare to tolerance (summation order differs by design)
    val d = direct.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val s = salted.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(d.keySet == s.keySet)
    d.foreach { case (k, (n, sv, mn, mx)) =>
      val (n2, sv2, mn2, mx2) = s(k)
      assert(n == n2 && mn == mn2 && mx == mx2)
      assert(math.abs(sv - sv2) <= 1e-6 * math.abs(sv) + 1e-9)
    }
  }

  test("saltedJoin equals direct join") {
    val orders = Tables.orders(spark, sf001)
    val customer = Tables.customer(spark, sf001)
      .select("c_custkey", "c_mktsegment")
    val direct = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(
        orders.withColumnRenamed("o_custkey", "c_custkey"), customer,
        key = "c_custkey", n = 8, tiebreak = Seq(col("o_orderkey")))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == s)
  }

  test("salt is deterministic and spreads keys") {
    val salts = events.select(Skew.salt(16, col("event_id")).as("s"))
    val counts = salts.groupBy("s").count().collect()
    assert(counts.length == 16) // all 16 buckets populated
    // re-evaluation yields identical assignment (no rand())
    val a = salts.collect().map(_.getInt(0)).toSeq
    val b = salts.collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }

  test("AQE splits a skewed join partition at runtime (the salting alternative)") {
    // deterministic salting is the replay-safe mitigation; AQE's skew
    // rewrite is the zero-code one. Prove the engine configuration
    // story actually fires: a 100%-hot-key join under tiny skew
    // thresholds must show skew=true splits in the final SMJ plan.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // data-derived 99%-hot key (a constant literal would constant-fold
      // the join condition away into a cartesian against a 1-row side)
      // skew splitting works at map-output granularity: the sf0.01
      // parquet is ONE split, so spread the fact over several map tasks
      // first or the hot reducer partition has nothing to split by
      val hotFact = events.repartition(8, col("event_id"))
        .withColumn("k",
          when(col("event_id") % 100 === 0, lit("COLD")).otherwise(lit("HOT")))
        .select(col("k"), col("event_id"), col("value"))
      val dim = spark.range(2)
        .select(when(col("id") === 0, "HOT").otherwise("COLD").as("k"),
          col("id").as("dim_id"))
      val joined = hotFact.join(dim, "k")
      // execute THIS Dataset's query execution: AQE finalizes the plan
      // as it runs, so the inspected instance must be the one acted on
      // (a count() would plan and adapt its own separate execution)
      assert(joined.collect().length == events.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew rewrite did not fire:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces near-empty shuffle partitions after a selective aggregate") {
    // the other AQE lever: 32 planned reducers for 5 groups is 27 empty
    // tasks at 100 TB scale-down points; the runtime plan must read the
    // shuffle as fewer, fused partitions
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = events.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(agg.collect().length == 5)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"expected a coalesced shuffle read:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("df cap bounds the posting join under 1000x shingle skew and reports the recall loss") {
    // the adversarial fixture for the dedup tier's one tuning knob: a
    // boilerplate 3-gram present in 1000 docs contributes ~500k
    // candidate pairs to ONE join key uncapped; the cap must (a) keep
    // the join linear, (b) keep every genuine content near-dup, and
    // (c) name what it dropped — recall loss reported, never silent
    import spark.implicits._
    import graft.operators.Dedup
    val boiler = (1L to 1000L).map(i =>
      (i, s"zz yy xx u${i}a u${i}b u${i}c u${i}d")) // hot 3-gram + unique tail
    val genuine = Seq( // near-dup via CONTENT, no boilerplate
      (2001L, "aa bb cc dd ee ff"), (2002L, "aa bb cc dd ee ff"))
    val boilerOnly = Seq( // overlap rides ONLY on the hot shingle
      (3001L, "zz yy xx"), (3002L, "zz yy xx"))
    val sh = Dedup.shingledOn(
      (boiler ++ genuine ++ boilerOnly).toDF("doc_id", "text"))

    // quadratic blow-up the cap averts, computed from the df profile:
    // candidate pairs = Σ df·(df−1)/2 over surviving codes
    val dfs = sh.select(explode(col("codes")).as("code"))
      .groupBy("code").agg(count(lit(1)).as("df"))
    def candidates(f: org.apache.spark.sql.DataFrame) =
      f.agg(sum(col("df") * (col("df") - 1) / 2)).first().getDouble(0).toLong
    assert(candidates(dfs) > 490000L) // uncapped: the hot key alone ~501k
    assert(candidates(dfs.filter(col("df") <= 100)) < 100L) // capped: linear

    val uncapped = Dedup.jaccardPairsOn(sh)
      .select("doc_i", "doc_j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairsOn(sh, maxDf = 100L)
      .select("doc_i", "doc_j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // genuine content pair survives the cap; the pair-completeness
    // delta is EXACTLY the boilerplate-only pair — the advertised
    // lower-bound semantics, not an arbitrary recall hole
    assert(uncapped == Set((2001L, 2002L), (3001L, 3002L)))
    assert(capped == Set((2001L, 2002L)))
    assert(uncapped -- capped == Set((3001L, 3002L)))

    // and the loss is named: the report carries the one hot code at its
    // true document frequency (1000 boiler + 2 boiler-only docs)
    val report = Dedup.droppedShingleReport(sh, maxDf = 100L).collect()
    assert(report.length == 1)
    assert(report.head.getAs[Long]("df") == 1002L)
    val hotCode = sh.filter(col("doc_id") === 3001L)
      .select(explode(col("codes"))).first().getLong(0)
    assert(report.head.getAs[Long]("code") == hotCode)
  }

  test("salting spreads a single hot key over many reducer partitions") {
    // the mechanism itself: unsalted, one key = one partition (the
    // straggler); salted, the same key's rows land on many
    import org.apache.spark.sql.functions.spark_partition_id
    val hot = events.withColumn("k", lit("HOT")) // 100% skew
    def partitionsUsed(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
      df.repartition(16, cols.map(col): _*)
        .select(spark_partition_id().as("p")).distinct().count()
    assert(partitionsUsed(hot, Seq("k")) == 1)
    val salted = hot.withColumn("_salt", Skew.salt(16, col("event_id")))
    // 16 salts hashed into 16 partitions collide birthday-style:
    // E[distinct] = 16(1-(15/16)^16) ≈ 10 — assert the spread, not luck
    assert(partitionsUsed(salted, Seq("k", "_salt")) >= 8)
  }
}
