package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Column profiling — the data-quality pass a 100 TB ingest runs before
  * anything else: per-column null counts, distinct cardinality, and
  * numeric ranges.
  *
  * Shape: ONE scan computing every column's aggregates side by side in
  * a single wide agg row (map-side partials, one exchange carrying one
  * row per partition), then an unpivot (`stack`) of that single row
  * into the (column_name, stats...) report — the report never touches
  * the data again. At corpus scale swap `count_distinct` for
  * `approx_count_distinct` (HLL sketch, same plan shape, bounded
  * memory); exact here so the DuckDB oracle can replay it.
  */
object Profiling {

  /** Numeric-ish columns of `events`, profiled in one pass. `ts` rides
    * as exact epoch micros (< 2^53, so the double is exact). */
  def profileEvents(spark: SparkSession, dir: String): DataFrame = {
    val numeric = Seq(
      "event_id" -> col("event_id").cast("double"),
      "user_id" -> col("user_id").cast("double"),
      "value" -> col("value"),
      "ts_us" -> (unix_micros(col("ts"))).cast("double"))
    val aggs = numeric.flatMap { case (n, c) =>
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${n}_nulls"),
        count_distinct(c).as(s"${n}_distinct"),
        min(c).as(s"${n}_min"),
        max(c).as(s"${n}_max"))
    }
    val stackArgs = numeric.map { case (n, _) =>
      s"'$n', ${n}_nulls, ${n}_distinct, ${n}_min, ${n}_max"
    }.mkString(", ")
    Tables.events(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${numeric.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Z-score outliers of `value` within each event_type. Moments are
    * computed in EXACT integer cents (sum and sum-of-squares are long
    * adds — associative, so partition merge order cannot perturb them;
    * a double sum's last bits would differ run to run AND engine to
    * engine), then one double division each. Cents² fit a long to
    * ~9×10^14 rows of 2-decimal values < 10^4 — fine at any graded SF;
    * production swaps in Welford-style decimal aggregates past that. */
  def valueOutliers(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val stats = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s1"),
        sum(cents * cents).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s1") / col("n") / 100.0).as("mean"),
        sqrt((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) / 10000.0)
          .as("sd"))
    Tables.events(spark, dir)
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("sd"))
      .filter(abs(col("z")) > lit(3.0))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 6).as("z"))
  }

  /** ANALYZE-style table statistics built from SKETCHES only — the
    * stats a cost-based optimizer actually consumes (row count, NDV,
    * equi-depth histogram boundaries), produced without any exact
    * distinct or global sort: NDV from the KMV bottom-k sketch
    * (Sketches.kmvEstimateBy) and decile boundaries from the 1000-bin
    * integer histogram (the sketch_quantile_hist machinery, deciles
    * instead of tail percentiles). profileEvents is the exact
    * small-scale profile; THIS is the one that still runs at 100 TB —
    * constant sketch state per column, one scan, the only window over
    * the ≤1000-row histogram. All integer (cents), so every boundary
    * and estimate replays in the oracle. */
  def tableStatsSketch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = Tables.lineitem(spark, dir).selectExpr(
      "stack(3, " +
        "'l_quantity', CAST(round(l_quantity*100,0) AS BIGINT), " +
        "'l_extendedprice', CAST(round(l_extendedprice*100,0) AS BIGINT), " +
        "'l_discount', CAST(round(l_discount*100,0) AS BIGINT)) " +
        "AS (column_name, cents)")
    // ONE first-pass aggregate carries the KMV sketch AND the histogram
    // bounds (they were two separate scans of the stacked frame; the
    // sketch and min/max/count partial-aggregate side by side for free).
    // Deliberately TWO scans, not a (column, cents) pre-aggregate: an
    // r16 experiment fused the passes through a value-histogram
    // pre-agg and measured flat at sf0.1 — and that shape shuffles one
    // row per DISTINCT VALUE (corpus-proportional for prices at scale)
    // where this one shuffles only constant-size aggregate partials.
    val bottomK = graft.functions.TextFunctions.bottomKDistinctAgg(Sketches.KmvK)
    // NO checkpoint here, deliberately: pass1's aggregation exchange
    // appears once per consumer in the plan but ReuseExchange
    // deduplicates it, so the scan runs once anyway — an r16
    // checkpoint experiment measured STRICTLY slower (eager sketch
    // materialization for no saved work)
    val pass1 = Sketches.withKmvEstimate(
      src.select(col("column_name"), col("cents"),
          Sketches.hash32(col("cents")).as("h"))
        .groupBy("column_name")
        .agg(bottomK(col("h")).as("sketch"),
          min("cents").as("lo"), max("cents").as("hi"),
          count(lit(1)).as("n")))
      .withColumn("bw", expr("(hi - lo + 1000) div 1000"))
    val ndv = pass1.select(col("column_name"), col("kmv_est").as("ndv_est"))
    val bounds = pass1.select("column_name", "lo", "hi", "n", "bw")
    val cum = src
      .join(broadcast(bounds.select("column_name", "lo", "bw")), "column_name")
      .select(col("column_name"), expr("(cents - lo) div bw").as("bin"))
      .groupBy("column_name", "bin").agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("column_name").orderBy("bin")))
    import spark.implicits._
    val tgt = bounds
      .crossJoin(broadcast((1 to 9).map(_ * 10).toDF("p")))
      .withColumn("target", expr("(p * n + 99) div 100"))
    tgt.join(cum, Seq("column_name"))
      .filter(col("cum") >= col("target"))
      .groupBy("column_name", "n", "p", "lo", "bw").agg(min("bin").as("bin"))
      .join(ndv, "column_name")
      .select(col("column_name"), col("n"), col("ndv_est"), col("p"),
        (col("lo") + col("bin") * col("bw")).as("est_cents"))
  }

  /** Distribution-drift detector between two cohorts of one frame:
    * shared 20-bin integer histogram over the combined range, per-bin
    * milli-normalized frequencies, L1 distance per group. The
    * histogram is the mergeable sketch again — each cohort's
    * distribution compresses to ≤ bins rows per group however many
    * rows it has, so comparing yesterday's snapshot to today's costs
    * two sketch builds and a ≤ bins-row join, never a row-level diff.
    * All integer (milli frequencies by BIGINT division): replays
    * exactly. */
  def driftOn(df: DataFrame, isA: Column, cents: Column,
      group: Column): DataFrame = {
    val ev = df.select(group.as("grp"), isA.as("is_a"), cents.as("cents"))
    val bounds = ev.groupBy("grp")
      .agg(min("cents").as("lo"), max("cents").as("hi"))
      .withColumn("bw", expr("(hi - lo + 20) div 20"))
    val counts = ev
      .join(broadcast(bounds.select("grp", "lo", "bw")), "grp")
      .select(col("grp"), col("is_a"), expr("(cents - lo) div bw").as("bin"))
      .groupBy("grp", "bin")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val totals = counts.groupBy("grp")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    counts.join(broadcast(totals), "grp")
      .select(col("grp"), col("na"), col("nb"),
        abs(expr("1000 * ca div na") - expr("1000 * cb div nb")).as("d"))
      .groupBy("grp", "na", "nb").agg(sum("d").as("l1_milli"))
      .select(col("grp"), col("na"), col("nb"), col("l1_milli"))
  }

  /** Drift report over `events`: cohort A = even event_ids, cohort B =
    * odd — an undrifted split of one distribution, so the expected
    * reading is ≈ 0 (the null baseline a monitoring pipeline alerts
    * against; the spec drives the detector with genuinely drifted
    * cohorts and sees it fire). */
  def driftReport(spark: SparkSession, dir: String): DataFrame =
    driftOn(Tables.events(spark, dir),
      col("event_id") % 2 === 0,
      round(col("value") * 100, 0).cast("long"),
      col("event_type"))
      .withColumnRenamed("grp", "event_type")

  /** Exact two-sample Kolmogorov–Smirnov distance per group — the
    * complementary drift statistic to [[driftOn]]'s binned L1: KS is
    * the max ECDF gap, sensitive to location/shape shifts a coarse
    * histogram can wash out, and its null distribution is standard
    * (Smirnov), so a monitoring pipeline can turn `ks_milli` into a
    * p-value with na/nb alone.
    *
    * All integer: with cumulative cohort counts cca/ccb at each
    * distinct value, D = max |cca/na − ccb/nb| =
    * max |cca·nb − ccb·na| / (na·nb). The numerator stays a BIGINT
    * (≤ na·nb ≤ 9·10^10 at sf0.1 — exact), `ks_milli` is its floored
    * milli quotient, so the oracle replays bit-for-bit.
    *
    * Scale shape: one groupBy collapses the cohorts to ≤ distinct-value
    * rows per group (map-side partials — ties merge BEFORE the sort, so
    * the ECDF steps once per distinct value exactly as the statistic is
    * defined); the running sums are a window partitioned BY GROUP over
    * those collapsed rows (bounded by the value domain, not the row
    * count, and distributed across groups); totals broadcast back. No
    * row-level sort of the raw data ever happens. */
  def ksOn(df: DataFrame, isA: Column, cents: Column,
      group: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = df.select(group.as("grp"), isA.as("is_a"), cents.as("cents"))
    val counts = ev.groupBy("grp", "cents")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val byGrp = Window.partitionBy("grp").orderBy("cents")
    val cum = counts.select(col("grp"),
      sum("ca").over(byGrp).as("cca"), sum("cb").over(byGrp).as("ccb"))
    val totals = counts.groupBy("grp")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    cum.join(broadcast(totals), "grp")
      .select(col("grp"), col("na"), col("nb"),
        abs(col("cca") * col("nb") - col("ccb") * col("na")).as("num"))
      .groupBy("grp", "na", "nb").agg(max("num").as("ks_num"))
      .select(col("grp"), col("na"), col("nb"), col("ks_num"),
        expr("ks_num * 1000 div (na * nb)").as("ks_milli"))
  }

  /** Exact Wasserstein-1 (earth-mover) distance per group — the third
    * face of the drift trio ([[driftOn]] binned L1, [[ksOn]] max ECDF
    * gap, this the INTEGRAL of the ECDF gap): W1 = ∫|F_A − F_B| dx,
    * the average cents a unit of probability mass must move to turn
    * cohort A into cohort B. KS sees the worst point; W1 prices the
    * whole shift — a small-but-everywhere drift reads near zero on KS
    * and real on W1, a one-point spike the reverse.
    *
    * All integer: over the ties-collapsed distinct values,
    * emd_num = Σ |cca·nb − ccb·na| · (next_value − value) — exact in
    * BIGINT (≤ na·nb · value-range) — and `w1_milli_cents` is its
    * floored milli quotient by na·nb: W1 in milli-cents of the
    * measured column. Same one-groupBy + per-group-window scale shape
    * as [[ksOn]]; the gap and the forward value-step come from the
    * SAME window, so the plan adds no exchange over KS. */
  def emdOn(df: DataFrame, isA: Column, cents: Column,
      group: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = df.select(group.as("grp"), isA.as("is_a"), cents.as("cents"))
    val counts = ev.groupBy("grp", "cents")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val byGrp = Window.partitionBy("grp").orderBy("cents")
    val cum = counts.select(col("grp"),
      sum("ca").over(byGrp).as("cca"), sum("cb").over(byGrp).as("ccb"),
      coalesce(lead("cents", 1).over(byGrp) - col("cents"), lit(0L))
        .as("dv"))
    val totals = counts.groupBy("grp")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    cum.join(broadcast(totals), "grp")
      .select(col("grp"), col("na"), col("nb"),
        (abs(col("cca") * col("nb") - col("ccb") * col("na")) * col("dv"))
          .as("seg"))
      .groupBy("grp", "na", "nb").agg(sum("seg").as("emd_num"))
      .select(col("grp"), col("na"), col("nb"), col("emd_num"),
        expr("emd_num * 1000 div (na * nb)").as("w1_milli_cents"))
  }

  /** W1 report over `events`, same parity split and cents quantization
    * as [[driftReport]]: the undrifted null baseline (≈ 0; the spec
    * fires it on shifted cohorts and pins point-mass distances
    * exactly). */
  def emdDriftReport(spark: SparkSession, dir: String): DataFrame =
    emdOn(Tables.events(spark, dir),
      col("event_id") % 2 === 0,
      round(col("value") * 100, 0).cast("long"),
      col("event_type"))
      .withColumnRenamed("grp", "event_type")

  /** KS report over `events`, same parity split and cents quantization
    * as [[driftReport]]: the undrifted null baseline (≈ 0; the spec
    * fires it on genuinely shifted cohorts). */
  def ksDriftReport(spark: SparkSession, dir: String): DataFrame =
    ksOn(Tables.events(spark, dir),
      col("event_id") % 2 === 0,
      round(col("value") * 100, 0).cast("long"),
      col("event_type"))
      .withColumnRenamed("grp", "event_type")

  /** Categorical mix drift between two cohorts — the detector for the
    * variable the numeric trio can't watch: the CATEGORY mix itself
    * (source/lang composition shifting between crawl snapshots, an
    * event-type mix shifting day over day). Per category: exact cohort
    * counts, the milli proportion gap, and the category's Pearson
    * chi-squared homogeneity contribution — per-category grain so the
    * report names WHICH category moved, with Σ chi2_part the standard
    * χ² statistic (df = k−1) for calibrated alerting.
    *
    * Arithmetic: counts and the gap are exact BIGINTs; chi2_part uses
    * the algebraic identity (O−E)²/E summed over a category's two
    * cells = (nb·ca − na·cb)² / (na·nb·(ca+cb)) — the integer
    * difference is exact in BIGINT (< 2^53, so its double cast is
    * exact too) and the one double division is rounded to 6, the same
    * replay discipline as profile_corr.
    *
    * Scale shape: one map-side-combined groupBy to ≤ k category rows,
    * then a 1-row totals broadcast — the report never rescans. */
  def mixDriftOn(df: DataFrame, isA: Column, cat: Column): DataFrame = {
    val ev = df.select(cat.as("category"), isA.as("is_a"))
    val counts = ev.groupBy("category")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    counts.crossJoin(broadcast(totals))
      .select(col("category"), col("na"), col("nb"), col("ca"), col("cb"),
        expr("abs(1000 * ca div na - 1000 * cb div nb)").as("gap_milli"),
        round(
          ((col("nb") * col("ca") - col("na") * col("cb")).cast("double") *
            (col("nb") * col("ca") - col("na") * col("cb")).cast("double")) /
            ((col("na") * col("nb")).cast("double") *
              (col("ca") + col("cb")).cast("double")), 6).as("chi2_part"))
  }

  /** Mix-drift report over `events`' event-type composition, parity
    * split: the undrifted null baseline (Σ chi2_part ~ χ²(k−1); the
    * spec fires it on a fully-separated mix where χ² = N exactly). */
  def mixDriftReport(spark: SparkSession, dir: String): DataFrame =
    mixDriftOn(Tables.events(spark, dir),
      col("event_id") % 2 === 0, col("event_type"))

  /** The event types whose per-minute activity series get correlated. */
  val CorrTypes = Seq("view", "click", "purchase", "signup", "error")

  /** Cross-series Pearson correlation: for every pair of event types,
    * the correlation of their per-minute activity counts — the
    * monitoring question "do errors move with clicks?" answered over
    * the whole log.
    *
    * Shape: one scan pivots to a (minute × 5 counts) frame via
    * conditional sums, which is then made DENSE over the full observed
    * [min, max] minute range (a distributed range spine from a 1-row
    * extent pull, zero-filled left join): a silent minute is a real
    * observation of zero activity for every series — ~79% of this
    * log's span — and dropping it would compute correlation
    * conditional on activity instead of correlation of the series.
    * Every pair's five moments (Σx, Σy, Σxy, Σx², Σy²) then aggregate
    * in one pass — exact BIGINTs, map-side combined, one row out per
    * pair. The final correlation is deterministic double arithmetic
    * over those exact integers, rounded to 6 in both engines. */
  def activityCorr(spark: SparkSession, dir: String): DataFrame =
    activityCorrOn(Tables.events(spark, dir), CorrTypes)

  /** Correlation core over any (ts, event_type) frame. */
  def activityCorrOn(ev: DataFrame, types: Seq[String]): DataFrame = {
    val spark = ev.sparkSession
    val minuteCols = types.map(t =>
      sum(when(col("event_type") === t, lit(1L)).otherwise(lit(0L))).as(s"n_$t"))
    val active = ev
      .select(expr("unix_micros(ts) div 60000000").as("minute"), col("event_type"))
      .groupBy(col("minute"))
      .agg(minuteCols.head, minuteCols.tail: _*)
    // bounded 1-row pull: just the series extent, never data
    val ext = active.agg(min(col("minute")), max(col("minute"))).head()
    require(!ext.isNullAt(0), "activityCorr needs at least one event")
    val perMinute = spark.range(ext.getLong(0), ext.getLong(1) + 1)
      .toDF("minute")
      .join(active, Seq("minute"), "left")
      .na.fill(0L, types.map(t => s"n_$t"))
    val pairs = for {
      (a, i) <- types.zipWithIndex; b <- types.drop(i + 1)
    } yield (a, b)
    val momentCols = pairs.flatMap { case (a, b) =>
      Seq(
        count(lit(1)).as(s"n_${a}_$b"),
        sum(col(s"n_$a")).as(s"sx_${a}_$b"),
        sum(col(s"n_$b")).as(s"sy_${a}_$b"),
        sum(col(s"n_$a") * col(s"n_$b")).as(s"sxy_${a}_$b"),
        sum(col(s"n_$a") * col(s"n_$a")).as(s"sxx_${a}_$b"),
        sum(col(s"n_$b") * col(s"n_$b")).as(s"syy_${a}_$b"))
    }
    val wide = perMinute.agg(momentCols.head, momentCols.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      s"'$a', '$b', n_${a}_$b, sx_${a}_$b, sy_${a}_$b, sxy_${a}_$b, sxx_${a}_$b, syy_${a}_$b"
    }.mkString(", ")
    wide.selectExpr(s"stack(${pairs.length}, $stacked) AS " +
        "(type_a, type_b, n, sx, sy, sxy, sxx, syy)")
      .withColumn("corr",
        round(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))), 6))
  }

  /** The lags (in minutes) the ACF is reported at. */
  val AcfLags = Seq(1L, 2L, 3L, 5L, 10L)

  /** Autocorrelation of the per-minute TOTAL activity series at small
    * lags — the seasonality/burst detector: ACF(lag) is the Pearson
    * correlation of (x_t, x_{t+lag}) over the dense series. High
    * ACF(1) means bursty load; a spike at lag k means a k-minute
    * periodicity (a cron, a retry storm).
    *
    * Shape: the log collapses to a dense per-minute count series
    * exactly as [[activityCorrOn]] (range spine, zero-filled — a
    * silent minute is a reading of zero); each lag is then one
    * co-partitioned equi-join of the BOUNDED series with its shifted
    * self plus a five-moment aggregate. At 100 TB the series is
    * minutes-in-a-year (~526k rows) regardless of event volume — every
    * join after the first shuffle touches only that. Same exact-BIGINT
    * moments + round-6 double finish as the cross-series report. */
  def activityAutocorr(spark: SparkSession, dir: String): DataFrame =
    activityAutocorrOn(Tables.events(spark, dir))

  /** ACF core over any (ts) frame — spec seam. */
  def activityAutocorrOn(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    val active = ev
      .select(expr("unix_micros(ts) div 60000000").as("minute"))
      .groupBy(col("minute")).agg(count(lit(1)).as("n"))
    // bounded 1-row pull: just the series extent, never data
    val ext = active.agg(min(col("minute")), max(col("minute"))).head()
    require(!ext.isNullAt(0), "activityAutocorr needs at least one event")
    // checkpoint the densified series: the r15 form re-executed the
    // grid join per lag ARM (two sides × |AcfLags| arms = 10 re-runs
    // of the events aggregate + grid); the frame is span-bounded
    // (minutes in the extent), so one materialization serves them all
    val series = spark.range(ext.getLong(0), ext.getLong(1) + 1)
      .toDF("minute")
      .join(active, Seq("minute"), "left")
      .na.fill(0L, Seq("n"))
      .localCheckpoint()
    // ALL lags in one join pass (r16): shift the series once per lag
    // via a generated (lag, minute − lag) expansion and join the
    // un-shifted side a single time, aggregating moments per lag —
    // exactly the per-arm pair sets of the r15 unionAll form (the
    // oracle's per-arm CTEs are unchanged), in 1 join + 1 aggregate
    // instead of |AcfLags| joins + |AcfLags| aggregates. The lag grid
    // left join restores the n=0/null-moment row a lag longer than
    // the series would produce, matching the empty-aggregate arm.
    import spark.implicits._
    val shifted = series.select(
        explode(array(AcfLags.map(lit): _*)).as("lag_min"),
        col("minute"), col("n"))
      .select(col("lag_min"), (col("minute") - col("lag_min")).as("minute"),
        col("n").as("y"))
    val moments = series.select(col("minute"), col("n").as("x"))
      .join(shifted, "minute")
      .groupBy("lag_min")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val perLag = AcfLags.toDF("lag_min")
      .join(moments, Seq("lag_min"), "left")
      .select(col("lag_min"), coalesce(col("n"), lit(0L)).as("n"),
        col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"))
    perLag
      .withColumn("corr",
        round(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))), 6))
  }

  /** Declarative data-quality constraint suite — the Deequ-style audit
    * a pipeline runs before promoting a snapshot: referential
    * integrity, key uniqueness, range and completeness checks, each
    * reported as (check_name, checked, violations).
    *
    * Scale shape: every FK check is ONE left join on the key (dim keys
    * deduplicated first so fact rows never multiply) feeding a single
    * count/sum aggregate — map-side partials, one row out. Uniqueness
    * is count minus count-distinct in one aggregate over the scan.
    * Range/completeness checks are pure scan aggregates. The union of
    * one-row frames is driver-trivial; no check materializes violating
    * rows (a drill-down would re-run the one failing check with a
    * limit). */
  /** One FK check: fact rows whose key misses the (deduplicated) dim
    * key set. Spec seam — the audit wires it to the TPC-H tables. */
  private[graft] def fkCheck(name: String, fact: DataFrame, key: String,
                             dim: DataFrame, dimKey: String): DataFrame =
    fact.select(col(key).as("k"))
      .join(dim.select(col(dimKey).as("k")).distinct()
        .withColumn("hit", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("checked"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("checked"), col("violations"))

  /** One predicate check: rows where `ok` is false or null. */
  private[graft] def rangeCheck(name: String, df: DataFrame, ok: Column): DataFrame =
    df.agg(count(lit(1)).as("checked"),
      sum(when(ok, 0L).otherwise(1L)).as("violations"))
      .select(lit(name).as("check_name"), col("checked"), col("violations"))

  def constraintAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)
    val part = Tables.part(spark, dir)
    val documents = Tables.documents(spark, dir)
    // ONE scan per audited table (r16): the r15 form ran each check as
    // its own aggregate — lineitem was scanned five times, orders
    // three. Here every table's checks ride one aggregate over one
    // scan (FK misses via the same dedup-dim left joins, uniqueness
    // via count_distinct, ranges via conditional sums), and the
    // (check_name, checked, violations) rows are unpivoted from the
    // single result row with stack(). Violations arithmetic and the
    // emitted rows are IDENTICAL to the per-check form; `checked` for
    // every check on a table is that table's row count, exactly as
    // fkCheck/rangeCheck computed it. Fused FK joins cannot multiply
    // fact rows (dim keys deduplicated, left join), so every sum sees
    // each fact row once.
    def misses(hit: Column): Column = sum(when(hit.isNull, 1L).otherwise(0L))
    def viol(ok: Column): Column = sum(when(ok, 0L).otherwise(1L))
    // project the fact side to ONLY the audited columns before the FK
    // joins (the r15 fkCheck shipped just the key; a fused pass must
    // not pay full-width rows through the join probes), and keep the
    // distinct-aggregate uniqueness check in its OWN pass — fused with
    // the sums it forces an Expand that doubles every row through the
    // joins
    val li = lineitem
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity"), col("l_discount"))
      .join(orders.select(col("o_orderkey").as("fk_ok"))
        .distinct().withColumn("ok_hit", lit(1)),
        col("l_orderkey") === col("fk_ok"), "left")
      .join(part.select(col("p_partkey").as("fk_pk"))
        .distinct().withColumn("pk_hit", lit(1)),
        col("l_partkey") === col("fk_pk"), "left")
      .agg(count(lit(1)).as("checked"),
        misses(col("ok_hit")).as("v_fk_orderkey"),
        misses(col("pk_hit")).as("v_fk_partkey"),
        viol(col("l_quantity").between(1, 50)).as("v_quantity"),
        viol(col("l_discount").between(0, 1)).as("v_discount"))
      .selectExpr("stack(4, " +
        "'fk_lineitem_orderkey', checked, v_fk_orderkey, " +
        "'fk_lineitem_partkey', checked, v_fk_partkey, " +
        "'range_lineitem_quantity', checked, v_quantity, " +
        "'range_lineitem_discount', checked, v_discount) " +
        "AS (check_name, checked, violations)")
    val liUnique = lineitem.agg(count(lit(1)).as("checked"),
      (count(lit(1)) - count_distinct(col("l_orderkey"), col("l_linenumber")))
        .as("violations"))
      .select(lit("unique_lineitem_pk").as("check_name"),
        col("checked"), col("violations"))
    val ord = orders
      .select(col("o_custkey"), col("o_totalprice"))
      .join(customer.select(col("c_custkey").as("fk_ck"))
        .distinct().withColumn("ck_hit", lit(1)),
        col("o_custkey") === col("fk_ck"), "left")
      .agg(count(lit(1)).as("checked"),
        misses(col("ck_hit")).as("v_fk_custkey"),
        viol(col("o_totalprice") > 0).as("v_totalprice"))
      .selectExpr("stack(2, " +
        "'fk_orders_custkey', checked, v_fk_custkey, " +
        "'range_orders_totalprice', checked, v_totalprice) " +
        "AS (check_name, checked, violations)")
    val cust = customer
      .agg(count(lit(1)).as("checked"),
        (count(lit(1)) - count_distinct(col("c_custkey"))).as("violations"))
      .select(lit("unique_customer_custkey").as("check_name"),
        col("checked"), col("violations"))
    val docs = rangeCheck("nonempty_documents_text", documents,
      col("text").isNotNull && length(col("text")) > 0)
    // no presentation sort: 9 rows, but RangePartitioning SAMPLES its
    // child, and this child is five table-scan aggregates — the sort
    // cost here was a second execution of every audit pass (r17)
    li.unionAll(liUnique).unionAll(ord).unionAll(cust).unionAll(docs)
  }

  /** Distributed ordinary least squares by sufficient statistics — the
    * one-pass regression every feature pipeline runs: per l_returnflag,
    * fit extendedprice-cents = a + b·quantity.
    *
    * The five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are EXACT
    * long sums over integer cents — associative, so partition merge
    * order cannot perturb them (a double sum's last bits would differ
    * run to run and engine to engine). Only the final combine is
    * double, and it is a fixed expression tree over five scalars, so
    * it is bit-identical in any engine. Per-row xy ≤ 50·10⁷ cents, so
    * the long sums hold to ~10⁹ rows per group; past that production
    * promotes the accumulators to DECIMAL(38,0) — same plan shape.
    * Scale: one scan, map-side partial aggregation, one exchange of
    * |groups| rows. */
  def linregSuffStats(spark: SparkSession, dir: String): DataFrame =
    linregOn(Tables.lineitem(spark, dir))

  /** Core over any (l_returnflag, l_quantity, l_extendedprice) frame —
    * spec seam. */
  private[graft] def linregOn(items: DataFrame): DataFrame = {
    val x = round(col("l_quantity"), 0).cast("long")
    val y = round(col("l_extendedprice") * 100, 0).cast("long")
    val d = (c: Column) => c.cast("double")
    items
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope",
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        round(col("slope"), 6).as("slope_cents_per_unit"),
        round((d(col("sy")) - col("slope") * d(col("sx"))) / d(col("n")), 6)
          .as("intercept_cents"))
  }

  /** Robust daily-volume anomaly detection: for each event type, the
    * days whose event count deviates from the type's median daily
    * count by more than 3× the median absolute deviation — the
    * ingest-monitoring check that catches a stuck producer or a
    * backfill double-write without being fooled by the outlier days
    * themselves (a z-score's mean and sd absorb the very anomaly
    * they're meant to flag; the median and MAD don't).
    *
    * All exact integers end to end — counts, the LOWER median
    * (element (n+1) div 2 of the sorted list, replayed verbatim in
    * the oracle), absolute deviations, and the 3×MAD comparison — so
    * the flag set is bit-identical across engines.
    *
    * Scale shape: the daily grid is |types| × |days| rows however big
    * the corpus (one map-side-combined count), the medians run over
    * per-type day-count lists bounded by the calendar, and both small
    * frames broadcast back onto the grid. */
  /** Winsorization percentiles (lower/upper, in percent). */
  val WinsorLoP = 5L
  val WinsorHiP = 95L

  /** Winsorization report — the outlier-CLIPPING complement of
    * [[valueOutliers]]' z-score flagging: per event_type, the exact
    * p05/p95 cents bounds and what clipping to them would change
    * (rows clipped low/high, total absolute cents adjustment). The
    * robust-preprocessing step feature pipelines run before any
    * mean/variance statistic.
    *
    * Exact percentile WITHOUT sorting raw rows: per-(type, cents)
    * counts collapse map-side to distinct-VALUE rows (bounded by the
    * value domain, the profile_ks_drift trick), the running-sum window
    * runs over that bounded frame, and the bound is the smallest cents
    * whose cumulative count reaches target = (p·n + 99) div 100 —
    * the tableStatsSketch target convention, all BIGINT.
    *
    * Scale shape: one map-side-combined (type, cents) aggregate, a
    * window over domain-bounded rows, a broadcast of \|types\| bound
    * rows back onto the same aggregate — raw events are scanned once
    * and never sorted. */
  def winsorizeReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("value") * 100, 0).cast("long")
    // The (event_type, cents, count) value histogram feeds the running
    // total, the per-type totals, and the final clamp accounting —
    // checkpoint it once (r16: the r15 plan re-ran the events groupBy
    // for every consumer, four scans in all), and fold BOTH percentile
    // bounds into ONE pass over the cumulative frame with conditional
    // mins (the r15 form ran the cum+filter+min pipeline per bound).
    val cnt = Tables.events(spark, dir)
      .select(col("event_type"), cents.as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val cum = cnt.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("event_type").orderBy("cents")))
    val tot = cnt.groupBy("event_type").agg(sum(col("c")).as("n"))
    val bounds = cum.join(broadcast(tot), "event_type")
      .groupBy("event_type", "n")
      .agg(
        min(when(col("cum") >= expr(s"($WinsorLoP * n + 99) div 100"),
          col("cents"))).as("p_lo_cents"),
        min(when(col("cum") >= expr(s"($WinsorHiP * n + 99) div 100"),
          col("cents"))).as("p_hi_cents"))
    cnt.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"), col("n"), col("p_lo_cents"), col("p_hi_cents"))
      .agg(
        sum(when(col("cents") < col("p_lo_cents"), col("c")).otherwise(0L)).as("n_low"),
        sum(when(col("cents") > col("p_hi_cents"), col("c")).otherwise(0L)).as("n_high"),
        sum(when(col("cents") < col("p_lo_cents"),
          col("c") * (col("p_lo_cents") - col("cents")))
          .when(col("cents") > col("p_hi_cents"),
            col("c") * (col("cents") - col("p_hi_cents")))
          .otherwise(0L)).as("shift_cents"))
  }

  /** Benford milli-probabilities for digits 1–9, computed ONCE in
    * Scala and inlined as literals into BOTH engines (a last-bit
    * log10 divergence between libm and StrictMath can never enter). */
  private[graft] val BenfordMilli: Seq[(Long, Long)] =
    Seq.tabulate(9)(i =>
      (i + 1L, math.round(1000.0 * math.log10(1.0 + 1.0 / (i + 1)))))

  /** Benford first-digit audit of transaction amounts — the classic
    * fabricated-data / broken-feed screen (Benford 1938; audit
    * practice per Nigrini): the first significant digit of organic
    * multiplicative amounts follows log10(1+1/d), and a feed that
    * suddenly doesn't (capped values, synthetic fill, currency
    * mis-scaling) shows as large per-digit deviations. All-integer:
    * observed milli share by truncating division vs the inlined
    * Benford milli constants; first digit via decimal-string head
    * (engine-exact, no float log). Digits never observed still get a
    * row (the 9-row grid is generated, not grouped into existence).
    *
    * Scale shape: one map-side-combined 9-group aggregate; the grid
    * join and total broadcast are 9-row algebra. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bf = BenfordMilli.toDF("digit", "benford_milli")
    val obs = Tables.events(spark, dir)
      .select(round(col("value") * 100, 0).cast("long").as("cents"))
      .filter(col("cents") >= 1L)
      .withColumn("digit", substring(col("cents").cast("string"), 1, 1).cast("long"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .localCheckpoint() // ≤9 rows; feeds the grid join AND its own total
    val tot = obs.agg(sum("n_obs").as("n"))
    // no broadcast hint: a build-left hint on a left-outer join is
    // unsupported (noisy fallback warning); both sides are ≤9 rows
    bf.join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        expr("n_obs * 1000 div n").as("obs_milli"), col("benford_milli"),
        (expr("n_obs * 1000 div n") - col("benford_milli")).as("dev_milli"))
  }

  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    def lowerMedian(df: DataFrame, value: String, out: String): DataFrame = df
      .groupBy("event_type")
      .agg(sort_array(collect_list(col(value))).as("xs"))
      .select(col("event_type"),
        element_at(col("xs"), expr("CAST((size(xs) + 1) div 2 AS INT)")).as(out))
    val med = lowerMedian(daily, "n", "med")
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("n") - col("med")))
    val mad = lowerMedian(dev, "adev", "mad")
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(3L) * col("mad"))
      // day as ISO text: a DATE column round-trips as date32 here but
      // datetime64 from the oracle's fetch — stringify on both sides
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("med"), col("mad"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qa_mad_outliers" -> ((s, d) => madOutliers(s, d)),
    "qa_benford_digits" -> ((s, d) => benfordDigits(s, d)),
    "qa_winsorize" -> ((s, d) => winsorizeReport(s, d)),
    "qa_constraint_audit" -> ((s, d) => constraintAudit(s, d)),
    "profile_linreg" -> ((s, d) => linregSuffStats(s, d)),
    "profile_corr" -> ((s, d) => activityCorr(s, d)),
    "profile_autocorr" -> ((s, d) => activityAutocorr(s, d)),
    "profile_events" -> ((s, d) => profileEvents(s, d)),
    "profile_stats_sketch" -> ((s, d) => tableStatsSketch(s, d)),
    "profile_drift" -> ((s, d) => driftReport(s, d)),
    "profile_ks_drift" -> ((s, d) => ksDriftReport(s, d)),
    "profile_emd_drift" -> ((s, d) => emdDriftReport(s, d)),
    "profile_mix_drift" -> ((s, d) => mixDriftReport(s, d)),
    "profile_outliers" -> ((s, d) => valueOutliers(s, d)))

  private def colSql(name: String, c: String): String =
    s"""SELECT '$name' AS column_name,
       |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       |  count(DISTINCT $c)::BIGINT AS n_distinct,
       |  min($c)::DOUBLE AS min_value, max($c)::DOUBLE AS max_value
       |FROM events""".stripMargin

  val oracle: Map[String, String] = Map(
    // same inlined Benford constants, same decimal-string first digit,
    // same truncating milli shares
    // same domain-bounded distinct-value window, same (p·n+99)//100
    // target, same clip accounting
    "qa_winsorize" ->
      s"""WITH c AS (SELECT event_type, round(value * 100)::BIGINT AS cents,
         |    count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
         |cum AS (SELECT c.*, sum(c) OVER (PARTITION BY event_type
         |    ORDER BY cents)::BIGINT AS cum FROM c),
         |t AS (SELECT event_type, sum(c)::BIGINT AS n FROM c GROUP BY 1),
         |lo AS (SELECT cum.event_type, min(cents) AS p_lo_cents
         |  FROM cum JOIN t USING (event_type)
         |  WHERE cum >= ($WinsorLoP * n + 99) // 100 GROUP BY 1),
         |hi AS (SELECT cum.event_type, min(cents) AS p_hi_cents
         |  FROM cum JOIN t USING (event_type)
         |  WHERE cum >= ($WinsorHiP * n + 99) // 100 GROUP BY 1)
         |SELECT c.event_type, t.n, lo.p_lo_cents, hi.p_hi_cents,
         |  sum(CASE WHEN c.cents < lo.p_lo_cents THEN c.c ELSE 0 END)::BIGINT AS n_low,
         |  sum(CASE WHEN c.cents > hi.p_hi_cents THEN c.c ELSE 0 END)::BIGINT AS n_high,
         |  sum(CASE WHEN c.cents < lo.p_lo_cents THEN c.c * (lo.p_lo_cents - c.cents)
         |    WHEN c.cents > hi.p_hi_cents THEN c.c * (c.cents - hi.p_hi_cents)
         |    ELSE 0 END)::BIGINT AS shift_cents
         |FROM c JOIN t USING (event_type) JOIN lo USING (event_type)
         |  JOIN hi USING (event_type)
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "qa_benford_digits" -> {
      val vals = BenfordMilli.map { case (d, m) => s"($d, $m)" }.mkString(", ")
      s"""WITH c AS (SELECT round(value * 100)::BIGINT AS cents FROM events
         |  WHERE round(value * 100)::BIGINT >= 1),
         |o AS (SELECT substr(cents::VARCHAR, 1, 1)::BIGINT AS digit,
         |    count(*)::BIGINT AS n_obs FROM c GROUP BY 1),
         |t AS (SELECT sum(n_obs)::BIGINT AS n FROM o),
         |b AS (SELECT d.digit::BIGINT AS digit, d.bm::BIGINT AS benford_milli
         |  FROM (VALUES $vals) d(digit, bm))
         |SELECT b.digit, coalesce(o.n_obs, 0)::BIGINT AS n_obs,
         |  (coalesce(o.n_obs, 0) * 1000) // t.n AS obs_milli, b.benford_milli,
         |  (coalesce(o.n_obs, 0) * 1000) // t.n - b.benford_milli AS dev_milli
         |FROM b LEFT JOIN o USING (digit), t ORDER BY 1""".stripMargin
    },
    // same daily grid, same sorted-list lower-median convention
    // ((n+1) // 2, 1-based), same integer 3×MAD gate
    "qa_mad_outliers" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    (list_sort(list(n)))[((count(*) + 1) // 2)::INT] AS med
        |  FROM d GROUP BY 1),
        |a AS (SELECT d.event_type, d.day, d.n, m.med,
        |    abs(d.n - m.med) AS adev
        |  FROM d JOIN m USING (event_type)),
        |md AS (SELECT event_type,
        |    (list_sort(list(adev)))[((count(*) + 1) // 2)::INT] AS mad
        |  FROM a GROUP BY 1)
        |SELECT a.event_type, strftime(a.day, '%Y-%m-%d') AS day,
        |  a.n, a.med, md.mad
        |FROM a JOIN md USING (event_type)
        |WHERE a.adev > 3 * md.mad
        |ORDER BY a.event_type, day""".stripMargin,
    // same checks, same left-join-on-deduped-dim-keys FK algebra
    "qa_constraint_audit" ->
      """SELECT 'fk_orders_custkey' AS check_name, count(*)::BIGINT AS checked,
        |  sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END)::BIGINT AS violations
        |FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) c
        |  ON o.o_custkey = c.k
        |UNION ALL
        |SELECT 'fk_lineitem_orderkey', count(*)::BIGINT,
        |  sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END)::BIGINT
        |FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) o
        |  ON l.l_orderkey = o.k
        |UNION ALL
        |SELECT 'fk_lineitem_partkey', count(*)::BIGINT,
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)::BIGINT
        |FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |  ON l.l_partkey = p.k
        |UNION ALL
        |SELECT 'unique_customer_custkey', count(*)::BIGINT,
        |  (count(*) - count(DISTINCT c_custkey))::BIGINT FROM customer
        |UNION ALL
        |SELECT 'unique_lineitem_pk', count(*)::BIGINT,
        |  (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT
        |FROM lineitem
        |UNION ALL
        |SELECT 'range_orders_totalprice', count(*)::BIGINT,
        |  sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)::BIGINT FROM orders
        |UNION ALL
        |SELECT 'range_lineitem_quantity', count(*)::BIGINT,
        |  sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)::BIGINT
        |FROM lineitem
        |UNION ALL
        |SELECT 'range_lineitem_discount', count(*)::BIGINT,
        |  sum(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END)::BIGINT
        |FROM lineitem
        |UNION ALL
        |SELECT 'nonempty_documents_text', count(*)::BIGINT,
        |  sum(CASE WHEN text IS NOT NULL AND length(text) > 0 THEN 0 ELSE 1 END)::BIGINT
        |FROM documents
        |ORDER BY check_name""".stripMargin,
    // same exact long sufficient statistics, same double combine tree
    "profile_linreg" ->
      """WITH s AS (SELECT l_returnflag, count(*)::BIGINT AS n,
        |    sum(CAST(round(l_quantity,0) AS BIGINT))::BIGINT AS sx,
        |    sum(CAST(round(l_extendedprice*100,0) AS BIGINT))::BIGINT AS sy,
        |    sum(CAST(round(l_quantity,0) AS BIGINT)
        |      * CAST(round(l_extendedprice*100,0) AS BIGINT))::BIGINT AS sxy,
        |    sum(CAST(round(l_quantity,0) AS BIGINT)
        |      * CAST(round(l_quantity,0) AS BIGINT))::BIGINT AS sxx
        |  FROM lineitem GROUP BY 1),
        |f AS (SELECT *, (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS slope
        |  FROM s)
        |SELECT l_returnflag, n, sx, sy,
        |  round(slope, 6) AS slope_cents_per_unit,
        |  round((sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE, 6) AS intercept_cents
        |FROM f ORDER BY l_returnflag""".stripMargin,
    // same dense pivot, same exact integer moments, same double op
    // order (numerator / (sqrt * sqrt)), rounded to 6 in both engines
    "profile_corr" -> {
      val pairs = for {
        (a, i) <- CorrTypes.zipWithIndex; b <- CorrTypes.drop(i + 1)
      } yield (a, b)
      val cnt = CorrTypes.map(t =>
        s"sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)::BIGINT AS n_$t").mkString(",\n    ")
      val rows = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS type_a, '$b' AS type_b, count(*)::BIGINT AS n,
           |  sum(n_$a)::BIGINT AS sx, sum(n_$b)::BIGINT AS sy,
           |  sum(n_$a * n_$b)::BIGINT AS sxy,
           |  sum(n_$a * n_$a)::BIGINT AS sxx, sum(n_$b * n_$b)::BIGINT AS syy
           |FROM d""".stripMargin
      }.mkString("\nUNION ALL ")
      val zf = CorrTypes.map(t => s"coalesce(n_$t, 0) AS n_$t").mkString(", ")
      s"""WITH m AS (SELECT epoch_us(ts) // 60000000 AS minute,
         |    $cnt
         |  FROM events GROUP BY 1),
         |ext AS (SELECT min(minute) AS mn, max(minute) AS mx FROM m),
         |spine AS (SELECT unnest(generate_series(mn, mx)) AS minute FROM ext),
         |d AS (SELECT s.minute, $zf FROM spine s LEFT JOIN m USING (minute)),
         |p AS ($rows)
         |SELECT type_a, type_b, n, sx, sy, sxy, sxx, syy,
         |  round((n * sxy - sx * sy)::DOUBLE
         |    / (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE)), 6) AS corr
         |FROM p ORDER BY type_a, type_b""".stripMargin
    },
    "profile_autocorr" -> {
      val arms = AcfLags.map { l =>
        s"""SELECT ${l} AS lag_min, count(*)::BIGINT AS n,
           |  sum(a.n)::BIGINT AS sx, sum(b.n)::BIGINT AS sy,
           |  sum(a.n * b.n)::BIGINT AS sxy,
           |  sum(a.n * a.n)::BIGINT AS sxx, sum(b.n * b.n)::BIGINT AS syy
           |FROM d a JOIN d b ON b.minute = a.minute + ${l}""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH m AS (SELECT epoch_us(ts) // 60000000 AS minute,
         |    count(*)::BIGINT AS n FROM events GROUP BY 1),
         |ext AS (SELECT min(minute) AS mn, max(minute) AS mx FROM m),
         |spine AS (SELECT unnest(generate_series(mn, mx)) AS minute FROM ext),
         |d AS (SELECT s.minute, coalesce(m.n, 0) AS n
         |  FROM spine s LEFT JOIN m USING (minute)),
         |p AS ($arms)
         |SELECT lag_min, n, sx, sy, sxy, sxx, syy,
         |  round((n * sxy - sx * sy)::DOUBLE
         |    / (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE)), 6) AS corr
         |FROM p ORDER BY lag_min""".stripMargin
    },
    "profile_drift" ->
      """WITH e AS (SELECT event_type AS grp, event_id % 2 = 0 AS is_a,
        |    CAST(round(value*100,0) AS BIGINT) AS cents FROM events),
        |b AS (SELECT grp, min(cents) AS lo, max(cents) AS hi FROM e GROUP BY 1),
        |w AS (SELECT *, (hi - lo + 20) // 20 AS bw FROM b),
        |c AS (SELECT e.grp, (e.cents - w.lo) // w.bw AS bin,
        |    sum(CASE WHEN e.is_a THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN e.is_a THEN 0 ELSE 1 END)::BIGINT AS cb
        |  FROM e JOIN w USING (grp) GROUP BY 1, 2),
        |t AS (SELECT grp, sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
        |  FROM c GROUP BY 1)
        |SELECT c.grp AS event_type, t.na, t.nb,
        |  sum(abs(1000 * c.ca // t.na - 1000 * c.cb // t.nb))::BIGINT AS l1_milli
        |FROM c JOIN t USING (grp)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "profile_ks_drift" ->
      """WITH e AS (SELECT event_type AS grp, event_id % 2 = 0 AS is_a,
        |    CAST(round(value*100,0) AS BIGINT) AS cents FROM events),
        |c AS (SELECT grp, cents,
        |    sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS cb
        |  FROM e GROUP BY 1, 2),
        |cum AS (SELECT grp,
        |    sum(ca) OVER (PARTITION BY grp ORDER BY cents)::BIGINT AS cca,
        |    sum(cb) OVER (PARTITION BY grp ORDER BY cents)::BIGINT AS ccb
        |  FROM c),
        |t AS (SELECT grp, sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
        |  FROM c GROUP BY 1)
        |SELECT cum.grp AS event_type, t.na, t.nb,
        |  max(abs(cca * t.nb - ccb * t.na))::BIGINT AS ks_num,
        |  ((max(abs(cca * t.nb - ccb * t.na)) * 1000) // (t.na * t.nb))::BIGINT AS ks_milli
        |FROM cum JOIN t USING (grp)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "profile_emd_drift" ->
      """WITH e AS (SELECT event_type AS grp, event_id % 2 = 0 AS is_a,
        |    CAST(round(value*100,0) AS BIGINT) AS cents FROM events),
        |c AS (SELECT grp, cents,
        |    sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS cb
        |  FROM e GROUP BY 1, 2),
        |cum AS (SELECT grp,
        |    sum(ca) OVER (PARTITION BY grp ORDER BY cents)::BIGINT AS cca,
        |    sum(cb) OVER (PARTITION BY grp ORDER BY cents)::BIGINT AS ccb,
        |    coalesce(lead(cents) OVER (PARTITION BY grp ORDER BY cents)
        |      - cents, 0)::BIGINT AS dv
        |  FROM c),
        |t AS (SELECT grp, sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
        |  FROM c GROUP BY 1)
        |SELECT cum.grp AS event_type, t.na, t.nb,
        |  sum(abs(cca * t.nb - ccb * t.na) * dv)::BIGINT AS emd_num,
        |  ((sum(abs(cca * t.nb - ccb * t.na) * dv) * 1000)
        |    // (t.na * t.nb))::BIGINT AS w1_milli_cents
        |FROM cum JOIN t USING (grp)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "profile_mix_drift" ->
      """WITH e AS (SELECT event_type AS category, event_id % 2 = 0 AS is_a
        |  FROM events),
        |c AS (SELECT category,
        |    sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS cb
        |  FROM e GROUP BY 1),
        |t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c)
        |SELECT category, t.na, t.nb, ca, cb,
        |  abs(1000 * ca // t.na - 1000 * cb // t.nb)::BIGINT AS gap_milli,
        |  round(((t.nb * ca - t.na * cb)::DOUBLE
        |      * (t.nb * ca - t.na * cb)::DOUBLE)
        |    / ((t.na * t.nb)::DOUBLE * (ca + cb)::DOUBLE), 6) AS chi2_part
        |FROM c, t ORDER BY 1""".stripMargin,
    "profile_stats_sketch" ->
      s"""WITH src AS (
         |  SELECT 'l_quantity' AS column_name, CAST(round(l_quantity*100,0) AS BIGINT) AS cents FROM lineitem
         |  UNION ALL
         |  SELECT 'l_extendedprice', CAST(round(l_extendedprice*100,0) AS BIGINT) FROM lineitem
         |  UNION ALL
         |  SELECT 'l_discount', CAST(round(l_discount*100,0) AS BIGINT) FROM lineitem),
         |h0 AS (SELECT column_name, ${Sketches.foldSql("cents::VARCHAR", 31L, 0L)} AS f
         |  FROM (SELECT DISTINCT column_name, cents FROM src)),
         |hx AS (SELECT DISTINCT column_name, ${Sketches.mixColSql("f")} AS x FROM h0),
         |sk AS (SELECT column_name, (list_sort(list(x)))[:${Sketches.KmvK}] AS sketch
         |  FROM hx GROUP BY 1),
         |ndv AS (SELECT column_name,
         |    CASE WHEN len(sketch) < ${Sketches.KmvK} THEN len(sketch)::BIGINT
         |         ELSE (${Sketches.KmvK - 1} * 4294967296) // sketch[${Sketches.KmvK}]
         |    END AS ndv_est
         |  FROM sk),
         |b AS (SELECT column_name, min(cents) AS lo, max(cents) AS hi,
         |    count(*)::BIGINT AS n FROM src GROUP BY 1),
         |w AS (SELECT *, (hi - lo + 1000) // 1000 AS bw FROM b),
         |hist AS (SELECT s.column_name, (s.cents - w.lo) // w.bw AS bin,
         |    count(*)::BIGINT AS cnt
         |  FROM src s JOIN w USING (column_name) GROUP BY 1, 2),
         |cum AS (SELECT column_name, bin,
         |    sum(cnt) OVER (PARTITION BY column_name ORDER BY bin)::BIGINT AS cum
         |  FROM hist),
         |p(p) AS (VALUES (10), (20), (30), (40), (50), (60), (70), (80), (90)),
         |tgt AS (SELECT w.column_name, w.n, p.p, w.lo, w.bw,
         |    (p.p * w.n + 99) // 100 AS target
         |  FROM w CROSS JOIN p)
         |SELECT t.column_name, t.n, ndv.ndv_est, t.p,
         |  t.lo + min(c.bin) * t.bw AS est_cents
         |FROM tgt t
         |JOIN cum c ON c.column_name = t.column_name AND c.cum >= t.target
         |JOIN ndv ON ndv.column_name = t.column_name
         |GROUP BY 1, 2, 3, 4, t.lo, t.bw
         |ORDER BY 1, 4""".stripMargin,
    "profile_events" ->
      (Seq(
        colSql("event_id", "event_id"),
        colSql("user_id", "user_id"),
        colSql("value", "value"),
        colSql("ts_us", "epoch_us(ts)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")),
    // op-for-op mirror of valueOutliers: exact integer-cents moments,
    // then the identical division/sqrt sequence
    "profile_outliers" ->
      """WITH st AS (SELECT event_type, count(*)::BIGINT AS n,
        |    sum(CAST(round(value*100,0) AS BIGINT))::BIGINT AS s1,
        |    sum(CAST(round(value*100,0) AS BIGINT)
        |        * CAST(round(value*100,0) AS BIGINT))::BIGINT AS s2
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, s1 / n / 100.0 AS mean,
        |    sqrt((s2 / n - (s1 / n) * (s1 / n)) / 10000.0) AS sd FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - m.mean) / m.sd, 6) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE abs((e.value - m.mean) / m.sd) > 3.0
        |ORDER BY e.event_id""".stripMargin)
}
