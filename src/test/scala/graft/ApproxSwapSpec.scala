package graft

import org.apache.spark.sql.functions._

/** The documented 100 TB swaps (exact → sketch) hold up: Profiling
  * notes `approx_count_distinct` replaces `count_distinct` at corpus
  * scale, Relational.valueQuantiles notes `approx_percentile` replaces
  * `percentile`. These specs pin the sketches to the exact answers so
  * the swap advice stays true as data or Spark versions move. */
class ApproxSwapSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf001)

  test("sketch table stats: monotone deciles bracketing the data, NDV within KMV error") {
    val rows = graft.operators.Profiling.tableStatsSketch(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.sorted.toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity"))
    val li = Tables.lineitem(spark, sf001)
    rows.groupBy(_._1).foreach { case (cn, rs) =>
      // 9 deciles, non-decreasing in p
      assert(rs.map(_._4).sorted.toSeq == (10 to 90 by 10))
      val byP = rs.sortBy(_._4).map(_._5)
      assert(byP.zip(byP.tail).forall { case (a, b) => a <= b }, s"$cn not monotone")
      // n is the real row count; boundaries sit inside the data range
      val src = li.select(round(col(cn.replace("column_", "")) * 100, 0)
        .cast("long").as("c"))
      val (lo, hi, n) = {
        val r = src.agg(min("c"), max("c"), count(lit(1))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      assert(rs.head._2 == n)
      byP.foreach(v => assert(v >= lo && v <= hi, s"$cn boundary $v outside [$lo,$hi]"))
      // KMV NDV within 4 sigma (k=64 → ~13% sigma) or exact when small
      val exact = src.distinct().count()
      val est = rs.head._3
      if (exact < 64) assert(est == exact)
      else assert(math.abs(est - exact).toDouble / exact < 0.52, s"$cn ndv $est vs $exact")
    }
  }

  test("drift detector: near zero on an undrifted split, fires on disjoint cohorts") {
    import spark.implicits._
    import graft.operators.Profiling
    // undrifted: the real report splits one distribution by parity
    val calm = Profiling.driftReport(spark, sf001).collect()
    assert(calm.nonEmpty)
    calm.foreach { r =>
      val l1 = r.getAs[Long]("l1_milli")
      // same distribution in both cohorts: far from the max of 2000
      assert(l1 < 400, s"${r.getString(0)}: undrifted split reads $l1")
    }
    // drifted: cohort A in [0,100), cohort B in [1000,1100) — disjoint
    // bins, so L1 ≈ 2000 (each side's mass fully unmatched)
    val drifted = (0 until 200).map { i =>
      if (i % 2 == 0) ("g", true, (i % 100).toLong)
      else ("g", false, (1000 + i % 100).toLong)
    }.toDF("grp", "is_a", "cents")
    val fired = Profiling.driftOn(drifted, col("is_a"), col("cents"), col("grp"))
      .head().getAs[Long]("l1_milli")
    assert(fired > 1800, s"disjoint cohorts read only $fired")
  }

  test("KS detector: exact on a hand case, near zero undrifted, 1000 on disjoint cohorts") {
    import spark.implicits._
    import graft.operators.Profiling
    // hand case: A = {1,2}, B = {2,3} → ECDF gaps at 1: |1/2−0/2| = .5,
    // at 2: |2/2−1/2| = .5, at 3: 0 → D = 0.5 exactly
    val hand = Seq(("g", true, 1L), ("g", true, 2L), ("g", false, 2L),
      ("g", false, 3L)).toDF("grp", "is_a", "cents")
    val hr = Profiling.ksOn(hand, col("is_a"), col("cents"), col("grp")).head()
    assert(hr.getAs[Long]("ks_num") == 2 && hr.getAs[Long]("ks_milli") == 500)
    // undrifted: the real report splits one distribution by parity
    val calm = Profiling.ksDriftReport(spark, sf001).collect()
    assert(calm.nonEmpty)
    calm.foreach { r =>
      val ks = r.getAs[Long]("ks_milli")
      assert(ks < 200, s"${r.getString(0)}: undrifted split reads $ks")
    }
    // disjoint cohorts: every A value below every B value → D = 1
    val drifted = (0 until 200).map { i =>
      if (i % 2 == 0) ("g", true, (i % 100).toLong)
      else ("g", false, (1000 + i % 100).toLong)
    }.toDF("grp", "is_a", "cents")
    val fired = Profiling.ksOn(drifted, col("is_a"), col("cents"), col("grp"))
      .head().getAs[Long]("ks_milli")
    assert(fired == 1000, s"disjoint cohorts read $fired")
  }

  test("W1 detector: point-mass distances exact, shift-invariant hand case, near zero undrifted") {
    import spark.implicits._
    import graft.operators.Profiling
    // point masses at 0 and 10 → W1 = 10 cents exactly
    val pm = Seq(("g", true, 0L), ("g", false, 10L)).toDF("grp", "is_a", "cents")
    val pr = Profiling.emdOn(pm, col("is_a"), col("cents"), col("grp")).head()
    assert(pr.getAs[Long]("emd_num") == 10 &&
      pr.getAs[Long]("w1_milli_cents") == 10000)
    // A = {0,10}, B = {5,15}: every mass unit moves 5 → W1 = 5 cents
    val sh = Seq(("g", true, 0L), ("g", true, 10L), ("g", false, 5L),
      ("g", false, 15L)).toDF("grp", "is_a", "cents")
    val sr = Profiling.emdOn(sh, col("is_a"), col("cents"), col("grp")).head()
    assert(sr.getAs[Long]("w1_milli_cents") == 5000, s"shifted pair: $sr")
    // a pure location shift is priced exactly: cohort B = cohort A
    // shifted +1001 cents (even residues vs odd residues + 1000), so
    // every unit of mass moves exactly 1001 → W1 = 1001000 milli-cents
    val drifted = (0 until 200).map { i =>
      if (i % 2 == 0) ("g", true, (i % 100).toLong)
      else ("g", false, (1000 + i % 100).toLong)
    }.toDF("grp", "is_a", "cents")
    val fired = Profiling.emdOn(drifted, col("is_a"), col("cents"), col("grp"))
      .head().getAs[Long]("w1_milli_cents")
    assert(fired == 1001000, s"shifted cohorts read $fired")
    // undrifted parity split: W1 is sampling noise — a small fraction
    // of each group's value RANGE (a real shift reads a large one)
    val ranges = Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg((max(round(col("value") * 100, 0).cast("long"))
        - min(round(col("value") * 100, 0).cast("long"))).as("range_cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val calm = Profiling.emdDriftReport(spark, sf001).collect()
    assert(calm.nonEmpty)
    calm.foreach { r =>
      val w1 = r.getAs[Long]("w1_milli_cents")
      val bound = ranges(r.getString(0)) * 1000 / 10
      assert(w1 < bound,
        s"${r.getString(0)}: undrifted split reads $w1 vs 10%-of-range $bound")
    }
  }

  test("mix-drift detector: full separation reads chi2 = N exactly, parity split stays under the df bound") {
    import spark.implicits._
    import graft.operators.Profiling
    // fully separated mix: cohort A all 'x', cohort B all 'y' → each
    // category's part is N/2, total chi-squared = N = 20 exactly, and
    // the proportion gap is the full 1000 milli
    val sep = ((1 to 10).map(_ => ("x", true)) ++ (1 to 10).map(_ => ("y", false)))
      .toDF("cat", "is_a")
    val parts = Profiling.mixDriftOn(sep, col("is_a"), col("cat")).collect()
    assert(parts.map(_.getAs[Double]("chi2_part")).sum == 20.0)
    parts.foreach(r => assert(r.getAs[Long]("gap_milli") == 1000))
    // undrifted parity split of the real event-type mix: chi-squared
    // with k-1 = 4 df — far under 15 (p < 0.005) on the null split
    val calm = Profiling.mixDriftReport(spark, sf001).collect()
    assert(calm.length >= 2)
    val tot = calm.map(_.getAs[Double]("chi2_part")).sum
    assert(tot < 15.0, s"parity split chi2 $tot")
    calm.foreach(r => assert(r.getAs[Long]("gap_milli") < 100))
  }

  test("approx_count_distinct tracks exact distinct counts within 5%") {
    for (c <- Seq("user_id", "event_id", "value")) {
      val exact = events.agg(count_distinct(col(c))).head.getLong(0)
      val approx = events.agg(approx_count_distinct(col(c), 0.01)).head.getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"$c: approx $approx vs exact $exact")
    }
  }

  test("activity correlation: +1 on lockstep series, -1 on opposed, bounds everywhere") {
    import spark.implicits._
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    // minute m: 'a' fires m%3+1 times, 'b' twice that (corr +1), 'c'
    // fires 4-(m%3+1) times (corr -1 with a)
    val rows = (0L until 30L).flatMap { m =>
      val k = (m % 3 + 1).toInt
      Seq.fill(k)(("a", t(m))) ++ Seq.fill(2 * k)(("b", t(m))) ++
        Seq.fill(4 - k)(("c", t(m)))
    }
    val got = graft.operators.Profiling
      .activityCorrOn(rows.toDF("event_type", "ts"), Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    assert(got(("a", "b")) == 1.0, s"lockstep series must correlate at +1: $got")
    assert(got(("a", "c")) == -1.0, s"opposed series must correlate at -1: $got")
    got.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
  }

  test("autocorrelation: an alternating series reads -1 at lag 1 and +1 at lag 2") {
    import spark.implicits._
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    // one event at every EVEN minute 0..18 → dense series alternates
    // 1,0,1,0,… over [0,18]; silent odd minutes are real zeros
    val rows = (0L to 18L by 2).map(m => Tuple1(t(m)))
    val got = graft.operators.Profiling
      .activityAutocorrOn(rows.toDF("ts"))
      .collect()
      .map(r => r.getAs[Long]("lag_min") -> r.getAs[Double]("corr")).toMap
    assert(got(1L) == -1.0, s"alternating series must anti-correlate at lag 1: $got")
    assert(got(2L) == 1.0, s"period-2 series must correlate at +1 at lag 2: $got")
    got.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
  }

  test("approx_percentile tracks exact quantiles within 5%") {
    val exact = events
      .agg(expr("percentile(value, array(0.25, 0.5, 0.9))")).head.getSeq[Double](0)
    val approx = events
      .agg(expr("approx_percentile(value, array(0.25, 0.5, 0.9), 1000)"))
      .head.getSeq[Double](0)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / math.max(e, 1e-9) < 0.05, s"approx $a vs exact $e")
    }
  }
}
