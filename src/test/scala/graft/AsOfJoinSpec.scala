package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOfLast picks the latest at-or-before right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", ts(10), 1.0), // after both quotes: latest (t=8) wins
      (2L, "a", ts(5), 2.0),  // between quotes: t=3 wins
      (3L, "a", ts(8), 3.0),  // exactly AT a quote ts: included (>= semantics)
      (4L, "b", ts(4), 4.0),  // key b: only the t=4 quote qualifies
      (5L, "c", ts(9), 5.0),  // key with no right rows at all → nulls
      (6L, "a", ts(2), 6.0)   // before every quote → nulls
    ).toDF("event_id", "k", "ts", "value")
    // the t=8 quote carries a NULL attr: a match on it must surface
    // that null, never resurrect the stale t=3 value (ASOF semantics)
    val right = Seq(
      ("a", ts(3), Some(100L)), ("a", ts(8), None),
      ("b", ts(4), Some(300L)), ("b", ts(7), Some(400L))
    ).toDF("k", "ts", "q")

    val got = AsOfJoin.asOfLast(left, right, "k", "ts", "q_ts")
      .select("event_id", "q_ts", "q").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(got(1L) == (Some(ts(8)), None))
    assert(got(2L) == (Some(ts(3)), Some(100L)))
    assert(got(3L) == (Some(ts(8)), None))
    assert(got(4L) == (Some(ts(4)), Some(300L)))
    assert(got(5L) == (None, None))
    assert(got(6L) == (None, None))
  }

  test("asOfLast plans one shuffle and one Window pass") {
    import spark.implicits._
    val left = Seq((1L, "a", ts(10), 1.0)).toDF("event_id", "k", "ts", "value")
    val right = Seq(("a", ts(3), 100L)).toDF("k", "ts", "q")
    val plan = AsOfJoin.asOfLast(left, right, "k", "ts", "q_ts")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"want 1 exchange:\n$plan")
    assert("Window".r.findAllIn(plan).size == 1, s"want 1 window:\n$plan")
  }

  test("rel_asof_join matches a per-row replay at sf0.001") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val got = AsOfJoin.clickLastPurchase(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (uid, cts) = (r.getLong(1), r.getTimestamp(2))
      val eligible = purchases.filter(p => p._1 == uid && !p._2.after(cts))
      if (eligible.isEmpty) assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
      else {
        val bestTs = eligible.map(_._2.getTime).max
        val best = eligible.filter(_._2.getTime == bestTs).maxBy(_._3)
        assert(r.getTimestamp(4).getTime == bestTs)
        assert(r.getLong(5) == best._3)
        assert(r.getDouble(6) == best._4)
      }
    }
  }

  // ------------------------------------------- native AsOfJoinExec plan

  test("asOfNative matches asOfLast on the edge-case fixture (incl. null keys)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some("a"), ts(10), 1.0),
      (2L, Some("a"), ts(5), 2.0),
      (3L, Some("a"), ts(8), 3.0),  // exact-ts match (>= semantics)
      (4L, Some("b"), ts(4), 4.0),
      (5L, Some("c"), ts(9), 5.0),  // key with no right rows → nulls
      (6L, Some("a"), ts(2), 6.0),  // before every quote → nulls
      (7L, None, ts(6), 7.0)        // null key: SQL equality, matches nothing
    ).toDF("event_id", "k", "ts", "value")
    val right = Seq(
      (Some("a"), ts(3), Some(100L)), (Some("a"), ts(8), None),
      (Some("b"), ts(4), Some(300L)), (Some("b"), ts(7), Some(400L)),
      (Option.empty[String], ts(1), Some(999L)) // null right key: never a match
    ).toDF("k", "ts", "q")

    val a = AsOfJoin.asOfLast(left, right.filter(col("k").isNotNull), "k", "ts", "q_ts")
      .orderBy("event_id").collect().map(_.toString)
    val b = AsOfJoin.asOfNative(left, right, "k", "ts", "q_ts")
      .orderBy("event_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
    // the null-key left row joined nothing
    val r7 = AsOfJoin.asOfNative(left, right, "k", "ts", "q_ts")
      .where(col("event_id") === 7).collect().head
    assert(r7.isNullAt(4) && r7.isNullAt(5))
  }

  test("asOfNative plans the custom AsOfJoin exec over sorted exchanges") {
    import spark.implicits._
    val left = Seq((1L, "a", ts(10), 1.0)).toDF("event_id", "k", "ts", "value")
    val right = Seq(("a", ts(3), 100L)).toDF("k", "ts", "q")
    val plan = AsOfJoin.asOfNative(left, right, "k", "ts", "q_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"want AsOfJoin exec:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 2, s"want 2 exchanges:\n$plan")
    assert(!plan.contains("Window"), s"no Window operator expected:\n$plan")
  }

  test("rel_asof_join_native is row-identical to rel_asof_join at sf0.001") {
    val a = AsOfJoin.clickLastPurchase(spark, sf0001).collect().map(_.toString)
    val b = AsOfJoin.clickLastPurchaseNative(spark, sf0001).collect().map(_.toString)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("asOfNative ≡ asOfLast on randomized key/ts fixtures (seeded)") {
    import spark.implicits._
    // small key space + dense ts collisions = the adversarial regime
    // for the merge (candidate carryover, exact-ts inclusion, key-group
    // boundaries, left rows before any right, keys with no right rows)
    val rnd = new scala.util.Random(20260812L)
    for (round <- 1 to 8) {
      val nL = 30 + rnd.nextInt(40)
      val left = (1 to nL).map(i =>
        (i.toLong, "k" + rnd.nextInt(5), ts(rnd.nextInt(20).toLong), rnd.nextDouble()))
        .toDF("event_id", "k", "ts", "value")
      val right = (1 to 20).map(_ =>
        ("k" + rnd.nextInt(6), ts(rnd.nextInt(20).toLong), rnd.nextLong() % 1000))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique per (key, ts)
        .toDF("k", "ts", "q")
      val a = AsOfJoin.asOfLast(left, right, "k", "ts", "q_ts")
        .orderBy("event_id").collect().map(_.toString).toSeq
      val b = AsOfJoin.asOfNative(left, right, "k", "ts", "q_ts")
        .orderBy("event_id").collect().map(_.toString).toSeq
      assert(a == b, s"round $round diverged")
    }
  }

  test("asOfNative resolves names case-insensitively and rejects float keys") {
    import spark.implicits._
    val left = Seq((1L, "a", ts(10), 1.0)).toDF("event_id", "K", "TS", "value")
    val right = Seq(("a", ts(3), 100L)).toDF("k", "ts", "q")
    // session default spark.sql.caseSensitive=false: "k"/"ts" must
    // resolve against "K"/"TS" exactly as asOfLast's col() lookups do
    val r = AsOfJoin.asOfNative(left, right, "k", "ts", "q_ts").collect()
    assert(r.length == 1 && r.head.getAs[Long]("q") == 100L)
    // float/double keys: NormalizeFloatingNumbers doesn't know the
    // custom node, so they are rejected rather than silently mis-hashed
    val fl = Seq((1L, 0.0, ts(10))).toDF("event_id", "k", "ts")
    val fr = Seq((-0.0, ts(3), 100L)).toDF("k", "ts", "q")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(fl, fr, "k", "ts", "q_ts")
    }
  }

  test("limit pushes through the native as-of join to below the left exchange") {
    import spark.implicits._
    val left = (1L to 100L).map(i => (i, "a", ts(i), i.toDouble))
      .toDF("event_id", "k", "ts", "value")
    val right = Seq(("a", ts(3), 100L)).toDF("k", "ts", "q")
    val limited = AsOfJoin.asOfNative(left, right, "k", "ts", "q_ts").limit(5)
    val opt = limited.queryExecution.optimizedPlan.toString
    // LocalLimit must sit on the LEFT CHILD of the as-of node (below
    // the exchange EnsureRequirements will plant), not only on top
    val idxJoin = opt.indexOf("AsOfJoinPlan")
    assert(idxJoin >= 0, s"as-of node missing:\n$opt")
    assert(opt.indexOf("LocalLimit", idxJoin + 1) > idxJoin,
      s"expected LocalLimit pushed below the as-of join:\n$opt")
    assert(limited.count() == 5)
  }

  test("nearest as-of picks the closer direction, ties backward, per-row replayed") {
    // replay rel_asof_nearest at sf0.001 against a per-click scan
    val got = AsOfJoin.clickNearestPurchase(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    val ev = Tables.events(spark, sf0001)
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS tus", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // dedup purchases per (user, tus) by max event_id — the contract
    val purchases = ev.filter(_._4 == "purchase").groupBy(p => (p._2, p._3))
      .map { case ((u, t), ps) => (u, t, ps.map(_._1).max) }.toSeq
    val clicks = ev.filter(_._4 == "click")
    assert(got.size == clicks.length)
    clicks.foreach { case (id, u, t, _) =>
      val mine = purchases.filter(_._1 == u)
      val back = mine.filter(_._2 <= t).sortBy(p => (-p._2, -p._3)).headOption
      val fwd = mine.filter(_._2 >= t).sortBy(p => (p._2, p._3)).headOption
      val expect = (back, fwd) match {
        case (None, None) => ("none", None, None)
        case (Some(b), None) => ("backward", Some(b._3), Some(t - b._2))
        case (None, Some(f)) => ("forward", Some(f._3), Some(f._2 - t))
        case (Some(b), Some(f)) =>
          if (t - b._2 <= f._2 - t) ("backward", Some(b._3), Some(t - b._2))
          else ("forward", Some(f._3), Some(f._2 - t))
      }
      assert(got(id) == expect, s"click $id")
    }
  }
}
