package graft

import java.sql.Timestamp
import graft.operators.Behavior
import org.apache.spark.sql.functions.{col, round, unix_micros}

/** Event-pattern (view FOLLOWED BY purchase WITHIN 6 h) semantics on
  * constructed logs: earliest-match, strict ordering, window edges,
  * per-user isolation, and deterministic tie-breaks. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000000L
  private def ts(offMin: Long) = new Timestamp(T0 + offMin * 60000L)
  private val H6 = 6L * 60

  private def run(rows: (Long, Long, Long, String)*) =
    Behavior.patternWithinOn(
      rows.map { case (id, off, u, t) => (id, ts(off), u, t) }
        .toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(5)))
      .sortBy(_._1)

  test("each view matches its earliest strictly-later purchase within the window") {
    val got = run(
      (1L, 0L, 7L, "view"),
      (2L, 10L, 7L, "purchase"), // earliest for view 1
      (3L, 20L, 7L, "purchase"), // later: must not match view 1
      (4L, 15L, 7L, "view"), // matches purchase 3
      (5L, 16L, 7L, "click")) // noise
    assert(got.toSeq == Seq(
      (1L, 2L, 10L * 60000000L),
      (4L, 3L, 5L * 60000000L)))
  }

  test("window edges: a purchase exactly at +6h matches, beyond it does not") {
    val got = run(
      (1L, 0L, 1L, "view"),
      (2L, H6, 1L, "purchase"), // exactly 6 h: inclusive
      (3L, 100L, 2L, "view"),
      (4L, 100L + H6 + 1, 2L, "purchase")) // 6 h + 1 min: out
    assert(got.toSeq == Seq((1L, 2L, 6L * 3600L * 1000000L)))
  }

  test("a purchase at the same instant or before the view never matches") {
    val got = run(
      (1L, 5L, 1L, "view"),
      (2L, 5L, 1L, "purchase"), // simultaneous: strict > excludes
      (3L, 4L, 1L, "purchase")) // earlier: excluded
    assert(got.isEmpty)
  }

  test("ewma smoothing: seeded at the first reading, converges, tracks steps exactly") {
    import graft.operators.Behavior
    val rows = Behavior.ewmaSmooth(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // smoothed readings stay inside the observed per-user value range
    rows.groupBy(_._1).foreach { case (_, es) =>
      val (mn, mx) = (es.map(_._3).min, es.map(_._3).max)
      es.foreach(e => assert(e._4 >= mn - 8 && e._4 <= mx + 8))
    }
    // exact replay of the busiest user's fold, in true (ts, id) order
    val uid = rows.groupBy(_._1).maxBy(_._2.length)._1
    val byId = rows.filter(_._1 == uid).map(r => r._2 -> r._4).toMap
    val ordered = Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("user_id") === uid)
      .selectExpr("event_id", "unix_micros(ts) AS tus",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._2, e._1))
    var e = 0L
    var first = true
    ordered.foreach { case (id, _, c) =>
      if (first) { e = c; first = false } else e += (c - e) / 8
      assert(byId(id) == e, "the emitted series must be the exact sequential fold")
    }
  }

  test("matches never cross users; same-ts purchases tie-break on event_id") {
    val got = run(
      (1L, 0L, 1L, "view"),
      (2L, 1L, 2L, "purchase"), // other user: invisible to view 1
      (3L, 2L, 1L, "purchase"),
      (4L, 2L, 1L, "purchase")) // same ts as 3: id 3 must win
    assert(got.toSeq == Seq((1L, 3L, 2L * 60000000L)))
  }

  test("streaming transition edges replay the batch pairs across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{StreamingBehavior, UserEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Seq(
      UserEvent(7L, 1L, 1000L, "view"),
      UserEvent(7L, 2L, 2000L, "click"),
      UserEvent(8L, 3L, 1000L, "view"),
      // second trigger: user 7 bridges click→purchase ACROSS the
      // trigger boundary through the carried state
      UserEvent(7L, 4L, 3000L, "purchase"),
      UserEvent(8L, 5L, 2000L, "view"),
      UserEvent(8L, 6L, 2000L, "click")) // same tus as 5: sorts after by id
    val input = MemoryStream[UserEvent]
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q = StreamingBehavior.transitionEdges(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.TransitionEdge], _: Long) =>
        edges.synchronized { edges ++= df.collect().map(e => (e.user_id, e.src_type, e.dst_type)) }
        ()
      }.start()
    try {
      input.addData(evs.take(3)); q.processAllAvailable()
      input.addData(evs.drop(3)); q.processAllAvailable()
    } finally q.stop()
    // batch reference over the same rows, as a multiset of (src, dst)
    val batch = Behavior.transitionsOn(
        evs.map(e => (e.event_id, new Timestamp(e.tus / 1000L), e.user_id, e.event_type))
          .toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = edges.toSeq.groupBy(e => (e._2, e._3)).view.mapValues(_.size.toLong).toMap
    assert(streamed == batch,
      s"streaming edge counts must equal the batch transition counts: $streamed vs $batch")
  }

  test("transitions count per-user adjacent pairs with same-ts ties on event_id") {
    val got = Behavior.transitionsOn(
      Seq(
        (1L, 0L, 7L, "view"),
        (2L, 1L, 7L, "click"),
        (3L, 2L, 7L, "view"),
        (4L, 3L, 7L, "purchase"),
        (5L, 0L, 8L, "view"), // separate user: no cross-user pair
        (6L, 1L, 8L, "view"),
        (7L, 1L, 8L, "click")) // same ts as 6: order is 5, 6, 7 by id
        .map { case (id, off, u, t) => (id, ts(off), u, t) }
        .toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      ("view", "click") -> ((2L, 500L)),
      ("view", "view") -> ((1L, 250L)),
      ("view", "purchase") -> ((1L, 250L)),
      ("click", "view") -> ((1L, 1000L))))
  }

  test("paths3 counts per-user length-3 journeys, ordered by count then path") {
    val got = Behavior.paths3On(
      Seq(
        (1L, 0L, 7L, "view"),
        (2L, 1L, 7L, "click"),
        (3L, 2L, 7L, "purchase"),
        (4L, 3L, 7L, "view"), // user 7 paths: v-c-p, c-p-v
        (5L, 0L, 8L, "view"),
        (6L, 1L, 8L, "click"),
        (7L, 1L, 8L, "purchase"), // same ts as 6 → order 6, 7 by id
        (8L, 0L, 9L, "view"),
        (9L, 1L, 9L, "click")) // only 2 events: no path
        .map { case (id, off, u, t) => (id, ts(off), u, t) }
        .toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("view", "click", "purchase", 2L), // users 7 and 8
      ("click", "purchase", "view", 1L)))
  }

  test("assoc rules: pair support, both confidences, and lift on a known basket set") {
    // 4 users: {v,c} {v,c} {v} {c,p} — repeats within a user collapse
    val got = Behavior.assocRulesOn(
      Seq((1L, "view"), (1L, "click"), (1L, "view"),
        (2L, "view"), (2L, "click"),
        (3L, "view"),
        (4L, "click"), (4L, "purchase"))
        .toDF("user_id", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    // n_view=3 n_click=3 n_purchase=1 n_users=4
    assert(got == Map(
      ("click", "view") -> ((2L, 3L, 3L, 666L, 666L, 888L)),
      ("click", "purchase") -> ((1L, 3L, 1L, 333L, 1000L, 1333L))))
  }

  test("assoc rules: a user with a single type produces no pairs; lift is symmetric in its inputs") {
    val got = Behavior.assocRulesOn(
      Seq((1L, "a"), (2L, "b")).toDF("user_id", "event_type")).collect()
    assert(got.isEmpty)
  }

  test("seasonal decomposition flags the injected spike cell, not the rush-hour cells") {
    // three days with a steady rhythm: hour 9 always busy (10 events),
    // hour 3 always quiet (2) — plus ONE spiked quiet cell on day 2
    // (8 events at hour 3). MAD-on-daily-volume can't see it (day 2's
    // total moves from 12 to 18, within noise of the busy hours);
    // deseasonalization must: hour 3's mean is (2+8+2)/3 = 4, so the
    // spike's residual is 2000‰ and the steady cells sit at 500‰/2500‰…
    // exact integers asserted below.
    // …and hour 15 runs at 6 except a TOTAL outage on day 3 — no rows
    // at all for that cell, the densified grid must still flag it
    val occ = (for {
      day <- Seq("2024-01-01", "2024-01-02", "2024-01-03")
      (h, base) <- Seq((9L, 10), (3L, 2), (15L, 6))
      extra = if (day == "2024-01-02" && h == 3L) 6 else 0
      n = if (day == "2024-01-03" && h == 15L) 0 else base + extra
      _ <- 0 until n
    } yield (day, h)).toDF("d", "h")
    val got = Behavior.seasonalHourlyOn(occ).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // hour 9: every day at the mean — resid exactly 1000, no flag
    Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach { d =>
      assert(got((d, 9L)) == ((10L, 10000L, 1000L, false)), s"hour 9 on $d")
    }
    // hour 3 mean = 4: steady days resid 500 (inside the 500 band —
    // strict inequality), spike day resid 2000 → flagged
    assert(got(("2024-01-01", 3L)) == ((2L, 4000L, 500L, false)))
    assert(got(("2024-01-03", 3L)) == ((2L, 4000L, 500L, false)))
    assert(got(("2024-01-02", 3L)) == ((8L, 4000L, 2000L, true)))
    // hour 15, slot total 12 over k=3 days: steady days sit at 1500
    // (inside the strict band), the outage cell exists as a real zero
    // row and is flagged
    assert(got(("2024-01-01", 15L)) == ((6L, 4000L, 1500L, false)))
    assert(got(("2024-01-02", 15L)) == ((6L, 4000L, 1500L, false)))
    assert(got(("2024-01-03", 15L)) == ((0L, 4000L, 0L, true)))
  }

  test("A/B split partitions users; Wilson interval brackets the rate; z-test is self-consistent") {
    val lift = Behavior.abLift(spark, sf0001).orderBy("variant").collect()
    assert(lift.map(_.getString(0)).toSeq == Seq("A", "B"))
    val nUsers = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(lift.map(_.getAs[Long]("n_users")).sum == nUsers,
      "variants must partition the user population")
    lift.foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("conv_rate"),
        r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
      assert(lo <= p && p <= hi && lo >= -1e-9 && hi <= 1.0 + 1e-9,
        s"Wilson interval [$lo, $hi] must bracket $p inside [0,1]")
      assert(r.getAs[Long]("n_conv") <= r.getAs[Long]("n_users"))
    }
    // driver-side replay of the hash assignment over ALL users (the
    // sf0.001 population is bounded): per-variant counts must match
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectedCounts = Tables.events(spark, sf0001)
      .select("user_id").distinct().collect().map(_.getLong(0))
      .groupBy { u =>
        val hex = md.digest(s"$u:ab".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.charAt(0) < '8') "A" else "B"
      }.view.mapValues(_.length.toLong).toMap
    assert(lift.map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
      == expectedCounts, "hash split must replay the md5 assignment")
    val zt = Behavior.abZTest(spark, sf0001).collect()
    assert(zt.length == 1)
    val z = zt(0)
    assert(z.getAs[Long]("n_a") + z.getAs[Long]("n_b") == nUsers)
    assert(z.getAs[Long]("x_a") == lift(0).getAs[Long]("n_conv"))
    assert(z.getAs[Long]("x_b") == lift(1).getAs[Long]("n_conv"))
    assert(math.signum(z.getAs[Double]("abs_lift")) ==
      math.signum(z.getAs[Double]("z_stat")))
    assert(z.getAs[Boolean]("significant") ==
      (math.abs(z.getAs[Double]("z_stat")) > 1.96) ||
      math.abs(math.abs(z.getAs[Double]("z_stat")) - 1.96) < 1e-5)
  }

  test("Welch t-test replays exactly from driver-side sufficient statistics") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val per = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.map { case (u, rows) =>
        val y = rows.filter(_._2 == "purchase").map(_._3).sum
        val hex = md.digest(s"$u:ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
        (y, if (hex.charAt(0) < '8') "A" else "B")
      }
    def stats(v: String) = {
      val ys = per.filter(_._2 == v).map(_._1)
      (ys.size.toLong, ys.sum, ys.map(y => y * y).sum)
    }
    val (na, sya, syya) = stats("A"); val (nb, syb, syyb) = stats("B")
    val ma = sya.toDouble / na.toDouble; val mb = syb.toDouble / nb.toDouble
    val va = (na.toDouble * syya.toDouble - sya.toDouble * sya.toDouble) /
      (na.toDouble * (na.toDouble - 1.0))
    val vb = (nb.toDouble * syyb.toDouble - syb.toDouble * syb.toDouble) /
      (nb.toDouble * (nb.toDouble - 1.0))
    val se2 = va / na + vb / nb
    val t = if (se2 == 0.0) 0.0 else (mb - ma) / math.sqrt(se2)
    val df = if (se2 == 0.0) 0.0 else se2 * se2 /
      (va / na * (va / na) / (na.toDouble - 1.0) +
        vb / nb * (vb / nb) / (nb.toDouble - 1.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g = Behavior.abWelch(spark, sf0001).collect()(0)
    assert(g.getAs[Long]("n_a") == na && g.getAs[Long]("n_b") == nb)
    assert(g.getAs[Double]("mean_a_cents") == r6(ma))
    assert(g.getAs[Double]("mean_b_cents") == r6(mb))
    assert(g.getAs[Double]("t_stat") == r6(t))
    assert(g.getAs[Double]("welch_df") == r6(df))
    assert(g.getAs[Boolean]("significant") == (math.abs(t) > 1.96))
    // Welch df lands between min(n)-1 and n_a+n_b-2
    assert(df >= math.min(na, nb) - 1.0 && df <= na + nb - 2.0)
  }

  test("Markov stationary distribution replays the unrolled power iteration exactly") {
    val counts = Behavior.transitionsOn(Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val types = Tables.events(spark, sf0001)
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    var pi: Map[String, Long] = types.map(_ -> 1000000L / types.length).toMap
    (1 to 4).foreach { _ =>
      val next = scala.collection.mutable.Map.empty[String, Long]
      for (((src, dst), n) <- counts; v <- pi.get(src))
        next(dst) = next.getOrElse(dst, 0L) + v * n / totals(src)
      pi = next.toMap
    }
    val got = Behavior.markovStationary(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == pi, s"stationary diverged: $got vs $pi")
    assert(got.values.sum <= 1000000L && got.values.forall(_ >= 0L))
  }

  test("streaming Holt emits batch-identical rows for every closed day under chopping") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{date_format, to_date}
    import graft.streaming.{StreamingBehavior, TypedDay}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val arrivals = Tables.events(spark, sf0001)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .collect().map(r => TypedDay(r.getString(0), r.getString(1)))
      .sortBy(_.day) // in-order feed (the op's documented contract)
    val input = MemoryStream[TypedDay]
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Long, Long, Long)]
    val q = StreamingBehavior.holtDayCloses(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[graft.operators.Behavior.HoltPoint], _: Long) =>
          emitted.synchronized {
            emitted ++= df.collect().map(h =>
              (h.event_type, h.day, h.n, h.level, h.trend, h.forecast7))
          }
          ()
      }.start()
    try {
      val (a, rest) = arrivals.splitAt(arrivals.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      input.addData(c); q.processAllAvailable()
    } finally q.stop()
    val batch = Behavior.holtDaily(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // the stream has emitted every CLOSED day: batch minus each
    // type's final (still-open) day
    val lastDay = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filterNot(r => r._2 == lastDay(r._1)).toSet
    assert(emitted.toSet == expected,
      s"streaming day-closes diverged: ${emitted.size} vs ${expected.size}")
    assert(expected.nonEmpty)
  }

  test("pattern negation: strict-band error counting flips clean, boundaries excluded") {
    import spark.implicits._
    val log = Seq(
      // user 1: view(t0) -> purchase(t0+10m), error at t0+5m => dirty
      (1L, 0L, 1L, "view"),
      (2L, 5L, 1L, "error"),
      (3L, 10L, 1L, "purchase"),
      // user 2: clean pair; error BEFORE the view and one AT the
      // purchase instant — both outside the strict band
      (4L, 0L, 2L, "error"),
      (5L, 1L, 2L, "view"),
      (6L, 11L, 2L, "purchase"),
      (7L, 11L, 2L, "error"),
      // user 3: two errors inside the band
      (8L, 0L, 3L, "view"),
      (9L, 2L, 3L, "error"),
      (10L, 3L, 3L, "error"),
      (11L, 9L, 3L, "purchase"))
      .map { case (id, off, u, t) => (id, ts(off), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Behavior.patternNegationOn(log).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_errors_between"), r.getAs[Boolean]("clean")))).toMap
    assert(got == Map(1L -> ((1L, false)), 2L -> ((0L, true)), 3L -> ((2L, false))))
    // negation never changes WHICH pairs match — only annotates them
    val base = Behavior.patternWithinOn(log).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_id"))).toSet
    val ann = Behavior.patternNegationOn(log).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_id"))).toSet
    assert(ann == base)
  }

  test("Holt daily fold replays exactly driver-side: seed, level, trend, forecast") {
    import org.apache.spark.sql.functions.{date_format, to_date}
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      var l = 0L; var b = 0L; var first = true
      rows.sortBy(_._2).map { case (_, day, n) =>
        if (first) { l = n; b = 0L; first = false }
        else {
          val dd = n - l - b
          val lp = l
          l = lp + b + dd / 4
          b = b + (dd / 4) / 8
        }
        (t, day) -> ((n, l, b, l + 7 * b))
      }
    }.toMap
    val got = Behavior.holtDaily(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "Holt fold diverged from the driver replay")
    assert(got.nonEmpty)
  }

  test("SRM chi-squared replays exactly and agrees with the lift counters") {
    val lift = Behavior.abLift(spark, sf0001).orderBy("variant").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val got = Behavior.abSrm(spark, sf0001).collect()
    assert(got.length == 1)
    val g = got(0)
    assert(g.getAs[Long]("n_a") == lift("A") && g.getAs[Long]("n_b") == lift("B"))
    val e = (lift("A") + lift("B")).toDouble / 2.0
    val chi2 = (lift("A") - e) * (lift("A") - e) / e +
      (lift("B") - e) * (lift("B") - e) / e
    assert(g.getAs[Double]("chi2") ==
      BigDecimal(chi2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(g.getAs[Boolean]("srm") == (chi2 > 3.841))
  }

  test("streaming A/B deltas accumulate to the batch counters under any chopping") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{AbDelta, StreamingBehavior, UserEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real corpus rows as the stream, chopped at arbitrary points —
    // including re-delivering a user across triggers
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("event_type"))
      .collect()
      .map(r => UserEvent(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val input = MemoryStream[UserEvent]
    val totals = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val q = StreamingBehavior.abDeltas(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[AbDelta], _: Long) =>
        df.collect().foreach { d =>
          totals.synchronized {
            val (u, c) = totals.getOrElse(d.variant, (0L, 0L))
            totals(d.variant) = (u + d.d_users, c + d.d_conv)
          }
        }
        ()
      }.start()
    try {
      val (a, rest) = evs.splitAt(evs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      input.addData(c); q.processAllAvailable()
    } finally q.stop()
    val batch = Behavior.abLift(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_conv")))).toMap
    assert(totals.toMap == batch,
      s"streaming totals must equal batch abLift counters: $totals vs $batch")
  }

  test("CUPED readout matches an exact driver-side replay of the sufficient statistics") {
    val got = Behavior.abCuped(spark, sf0001).collect()
    assert(got.length == 1)
    val g = got(0)
    // driver-side replay with the same integer-cents + fixed-tree rules
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val md = java.security.MessageDigest.getInstance("MD5")
    val per = ev.groupBy(_._1).map { case (u, rows) =>
      val x = rows.filter(r => r._2 == "purchase" && r._3 < mid).map(_._4).sum
      val y = rows.filter(r => r._2 == "purchase" && r._3 >= mid).map(_._4).sum
      val hex = md.digest(s"$u:ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (x, y, if (hex.charAt(0) < '8') "A" else "B")
    }.toSeq
    val n = per.size.toLong
    val sx = per.map(_._1).sum
    val sy = per.map(_._2).sum
    val sxy = per.map(r => r._1 * r._2).sum
    val sxx = per.map(r => r._1 * r._1).sum
    val syy = per.map(r => r._2 * r._2).sum
    val a = per.filter(_._3 == "A"); val b = per.filter(_._3 == "B")
    val nA = a.size.toLong; val sxa = a.map(_._1).sum; val sya = a.map(_._2).sum
    val nB = b.size.toLong; val sxb = b.map(_._1).sum; val syb = b.map(_._2).sum
    val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val denx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val deny = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
    val theta = if (denx == 0.0) 0.0 else num / denx
    val adjA = sya.toDouble / nA.toDouble -
      theta * (sxa.toDouble / nA.toDouble - sx.toDouble / n.toDouble)
    val adjB = syb.toDouble / nB.toDouble -
      theta * (sxb.toDouble / nB.toDouble - sx.toDouble / n.toDouble)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g.getAs[Long]("n_a") == nA && g.getAs[Long]("n_b") == nB)
    assert(g.getAs[Double]("theta") == r6(theta))
    assert(g.getAs[Double]("raw_lift_cents") ==
      r6(syb.toDouble / nB.toDouble - sya.toDouble / nA.toDouble))
    assert(g.getAs[Double]("adj_lift_cents") == r6(adjB - adjA))
    val rho2 = if (denx * deny == 0.0) 0.0 else num * num / (denx * deny)
    assert(g.getAs[Double]("var_reduction") == r6(rho2))
    assert(rho2 >= 0.0 && rho2 <= 1.0 + 1e-12)
  }
}
