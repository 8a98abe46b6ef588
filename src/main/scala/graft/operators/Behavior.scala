package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral analytics over the events stream table — funnel
  * conversion and cohort retention, the two canonical product-analytics
  * workloads.
  *
  * Both are pure integer/timestamp arithmetic (counts, mins, integer
  * week indexes from epoch microseconds — no calendar truncation whose
  * week-start conventions could differ between engines), so results
  * replay exactly in the oracle.
  *
  * Scale shape: everything aggregates per user_id first — one hash
  * shuffle of (user, small aggregate) each phase, map-side combined;
  * the ordered-stage dependency (click after first view, purchase
  * after first qualifying click) is resolved by re-aggregating the
  * same co-partitioned frame, not by windows over raw events. At
  * 100 TB the user-grain frames are orders of magnitude smaller than
  * the event log, and every join keys on the same user_id hash.
  */
object Behavior {

  /** Conversion window: a stage counts only within 24 h of the
    * previous stage's first event (epoch-microsecond arithmetic). */
  private val WindowUs = 24L * 3600L * 1000000L

  /** Ordered view → click → purchase funnel: users counted at a stage
    * only if it happened at-or-after their previous stage's first
    * event AND within the conversion window (min-timestamp "first
    * touch" semantics). One row per stage. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
      .filter(col("t_view").isNotNull)
    val t2 = ev.join(t1, "user_id")
      .filter(col("event_type") === "click" && col("ts") >= col("t_view") &&
        unix_micros(col("ts")) - unix_micros(col("t_view")) <= WindowUs)
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val t3 = ev.join(t2, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") >= col("t_click") &&
        unix_micros(col("ts")) - unix_micros(col("t_click")) <= WindowUs)
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    val counts = t1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
      .union(t2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click")))
      .union(t3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase")))
    // no presentation sort (3 rows, but the range sampler re-executes
    // the three funnel-stage aggregates — r17, same class as the r16
    // trailing-sort sweep)
    counts.select(col("stage"), col("n").as("n_users"))
  }

  /** Weekly cohort retention: users bucketed by the integer epoch-week
    * of their first `signup` event; for each later week-offset, how
    * many are active (any event). Week index = epoch_us // (7·86400·10^6)
    * — plain integer division, no week-start convention. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val WeekUs = 7L * 86400L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) div $WeekUs").as("week"))
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(cohorts, "user_id")
      .filter(col("week") >= col("cohort_week"))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Pattern window: a purchase matches a view only within 6 h. */
  private val PatternUs = 6L * 3600L * 1000000L

  /** Event-pattern detection (CEP's bread-and-butter `A FOLLOWED BY B
    * WITHIN T`, the reference ecosystem's FlinkCEP shape): for every
    * `view`, its EARLIEST strictly-later `purchase` by the same user
    * within six hours — one row per matched view with the exact
    * microsecond gap. Earliest-match ties break on (ts, event_id).
    *
    * Scale shape: views⋈purchases is a plain user_id equi-join (both
    * sides pre-filtered in the scan) with the time band as a post-
    * filter, then a min(struct) aggregate per view picks the first
    * match — the same keyed aggregate-join discipline as the funnel,
    * no window over raw events, no per-user sort. The streaming twin
    * of this shape is the watermarked interval join in
    * streaming/StreamJoins.scala. */
  def patternWithin(spark: SparkSession, dir: String): DataFrame =
    patternWithinOn(Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))

  /** Matching core over any (event_id, ts, user_id, event_type) frame —
    * separable so specs can probe match semantics on constructed logs. */
  def patternWithinOn(ev: DataFrame): DataFrame = {
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    // argmin by the packed atomic (p_ts, p_id) key (Ohlcv.packedOrd) —
    // order-identical to min(struct(p_ts, p_id)) but the buffer fields
    // stay mutable, so the per-view earliest-purchase selection plans
    // HashAggregate instead of a per-partial-group SortAggregate
    val pord = Ohlcv.packedOrd(col("p_ts"), col("p_id"))
    views.join(purchases, Seq("user_id"))
      .filter(col("p_ts") > col("view_ts") &&
        unix_micros(col("p_ts")) - unix_micros(col("view_ts")) <= PatternUs)
      .groupBy(col("user_id"), col("view_id"), col("view_ts"))
      .agg(min_by(col("p_id"), pord).as("purchase_id"),
        min_by(col("p_ts"), pord).as("purchase_ts"))
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
  }

  /** CEP NEGATION — the pattern form the simple followed-by can't
    * express: `view FOLLOWED BY purchase WITHIN 6 h` with every
    * intervening `error` counted, and `clean` = NOT EXISTS error
    * strictly between (ts-strict on both ends). Flink CEP's notFollowedBy
    * / MATCH_RECOGNIZE's `{- C -}` exclusion, realized as the family's
    * keyed aggregate-join: the matched pairs from [[patternWithinOn]]
    * left-join the user's errors with the band as a post-filter, and a
    * conditional count per match closes the negation — no per-user
    * sort, no window over raw events.
    *
    * Scale shape: one more user_id equi-join than the base pattern,
    * banded per-user (bounded by each entity's history), aggregate
    * map-side combined on the match key. */
  def patternNegation(spark: SparkSession, dir: String): DataFrame =
    patternNegationOn(Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))

  /** Core over any (event_id, ts, user_id, event_type) frame — spec
    * seam, mirroring [[patternWithinOn]]. */
  private[graft] def patternNegationOn(ev: DataFrame): DataFrame = {
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("e_ts"))
    patternWithinOn(ev).join(errors, Seq("user_id"), "left")
      .withColumn("hit", col("e_ts").isNotNull &&
        col("e_ts") > col("view_ts") && col("e_ts") < col("purchase_ts"))
      .groupBy(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"), col("gap_us"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_errors_between"))
      .withColumn("clean", col("n_errors_between") === lit(0L))
  }

  /** Markov transition matrix over each user's event-type sequence:
    * counts of adjacent src → dst event-type pairs in per-user
    * (ts, event_id) order, with the per-source transition probability
    * in integer milli (truncating div — engine-exact). The behavioral
    * "what happens next" model a recommender or anomaly scorer starts
    * from.
    *
    * Scale shape: lag() runs inside a per-USER window — one hash
    * shuffle on user_id with the sort bounded by each entity's own
    * history, never a corpus-wide order; the (src, dst) aggregate
    * map-side-combines into at most |types|² rows, and the per-source
    * totals re-aggregate that tiny matrix and broadcast back. */
  def transitions(spark: SparkSession, dir: String): DataFrame =
    transitionsOn(Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))

  /** Core over any (event_id, ts, user_id, event_type) frame — seam for
    * spec logs, mirroring [[patternWithinOn]]. */
  private[graft] def transitionsOn(evIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val ev = evIn.select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"))
    val counts = ev.withColumn("src_type", lag(col("event_type"), 1).over(w))
      .filter(col("src_type").isNotNull)
      .groupBy(col("src_type"), col("event_type").as("dst_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("src_type")).agg(sum(col("n")).as("total"))
    counts.join(broadcast(totals), "src_type")
      .select(col("src_type"), col("dst_type"), col("n"),
        expr("n * 1000 div total").as("milli_prob"))
  }

  /** Journeys kept by [[paths3]]. */
  private[graft] val Paths3TopK = 30

  /** Top user journeys — the most frequent length-3 event-type paths
    * across all users ([[transitionsOn]] is the order-2 Markov view;
    * product analytics asks the order-3 question "what do users DO,
    * three steps at a time"). Same scale shape as transitions: ONE
    * hash shuffle on user_id for the ordered window, two `lead`s over
    * it (no extra exchange — same window frame), a map-side-combined
    * count per (step1, step2, step3) — at most |event_types|³ groups
    * however big the corpus — and the global top-k as sort+limit =
    * TakeOrderedAndProject, never a full sort. */
  def paths3(spark: SparkSession, dir: String): DataFrame =
    paths3On(Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))

  private[graft] def paths3On(evIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val ev = evIn.select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"))
    ev.withColumn("step2", lead(col("event_type"), 1).over(w))
      .withColumn("step3", lead(col("event_type"), 2).over(w))
      .filter(col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(Paths3TopK)
  }

  /** Power-iteration rounds for [[markovStationary]]. */
  private val MarkovIters = 4

  /** Stationary distribution of the user-behaviour Markov chain —
    * where the [[transitions]] matrix says users spend their time in
    * the long run ("which state dominates at equilibrium", the
    * summary a product dashboard puts next to the transition matrix).
    * π₀ uniform in micro units (10⁶), then [[MarkovIters]] rounds of
    * π′(dst) = Σ_src (π(src)·n(src,dst)) div total(src) — per-term
    * truncating integer division, so every iterate is engine-exact
    * (the oracle unrolls the same rounds as CTEs). Types without
    * observed outgoing edges deterministically shed mass — both
    * engines agree because the join semantics are identical.
    *
    * Scale shape: the counts matrix is [[transitionsOn]]'s map-side
    * combined ≤\|types\|² aggregate; every iteration joins frames
    * bounded by the TYPE inventory, never the event log. */
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    // ONE distributed pass over the log: the lag window + the
    // (src, dst) count matrix, KEEPING null-src rows (each user's
    // first event) so the dst column alone carries the full type
    // inventory — the r15 form ran a second events scan just for
    // `types`. The matrix is ≤ |types|² + |types| rows — the TYPE
    // inventory squared, not the log — which is the repo's standing
    // bounded-driver-pull class (k centroids, ≤1001-row sketches), so
    // the four power-iteration rounds run as a local exact-integer
    // loop instead of 8 tiny-frame shuffle jobs (r15 plan: 9
    // exchanges; r16: 2 — the lag window and the count matrix). The
    // per-term truncating division and the order-independent integer
    // sums are bit-identical to the joined form; the bound is
    // ENFORCED, not assumed.
    val cm = ev.withColumn("src_type", lag(col("event_type"), 1).over(w))
      .groupBy(col("src_type"), col("event_type").as("dst_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
    require(cm.length <= 100000,
      s"markovStationary: transition matrix ${cm.length} rows — the type " +
        "inventory is expected to be small; promote the iteration back to " +
        "joins before running on an unbounded type domain")
    val trans = cm.filter(!_.isNullAt(0))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = cm.map(_.getString(1)).distinct.sorted
    val total = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val k = types.length.toLong
    var pi: Map[String, Long] = types.map(t => t -> 1000000L / k).toMap
    for (_ <- 1 to MarkovIters) {
      // π′(dst) = Σ_src π(src)·n(src,dst) div total(src): a dst gets a
      // row iff some π-carrying src transitions into it (join
      // semantics), even when every term truncates to zero
      val next = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      for ((src, dst, n) <- trans; v <- pi.get(src))
        next(dst) = next.getOrElse(dst, 0L) + v * n / total(src)
      pi = next.toMap
    }
    import spark.implicits._
    pi.toSeq.sortBy(_._1).toDF("event_type", "pi_micro")
  }

  /** One smoothed reading per event. */
  final case class EwmaPoint(user_id: Long, event_id: Long,
      cents: Long, ewma_cents: Long)

  /** EWMA smoothing constant: 1/8 per step, in truncating division. */
  private val EwmaShift = 8L

  /** One Holt state row per (event_type, day). */
  final case class HoltPoint(event_type: String, day: String,
      n: Long, level: Long, trend: Long, forecast7: Long)

  /** Per-user sequential smoothing: an exponentially-weighted moving
    * average of each user's `value` stream in event order —
    * e₀ = x₀, eᵢ = eᵢ₋₁ + trunc((xᵢ − eᵢ₋₁)/8), all integer cents — the
    * state a per-entity anomaly detector keeps (and the batch twin of
    * what a `mapGroupsWithState` streaming smoother would hold).
    *
    * An inherently SEQUENTIAL fold: eᵢ depends on every prior reading,
    * so no window/aggregate expresses it. The right Spark shape is
    * typed `flatMapGroups` — one shuffle keyed on user_id, then an
    * in-memory ordered fold per user, bounded by per-user activity
    * (≤ ~10² events here; at 100 TB the bound is the entity's history,
    * not the corpus — repartition stays uniform because the fold is
    * per-key). Truncating division (Scala `/` on Long = Spark `div` =
    * DuckDB `//`, all toward zero) keeps the arithmetic engine-exact
    * on negative deltas. */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long, Long)]) =>
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        var e = 0L
        var first = true
        evs.iterator.map { ev =>
          if (first) { e = ev._4; first = false }
          else e += (ev._4 - e) / EwmaShift
          EwmaPoint(uid, ev._2, ev._4, e)
        }
      }
      .toDF()
  }

  /** Holt double-exponential smoothing of daily event volumes — the
    * level+trend forecaster one notch up from [[ewmaSmooth]]'s
    * level-only fold (Holt 1957; the capacity-planning shape: "is this
    * feed growing, and where will it be next week"). Integer milli-free
    * form with shift-style smoothing (α = 1/4, β = 1/8, truncating
    * division — Scala `/` = Spark `div` = DuckDB `//`, all toward
    * zero, engine-exact on shrinking feeds):
    * l₁ = y₁, b₁ = 0; then with δ = yᵢ − l − b:
    * l += b + δ div 4,  b += (δ div 4) div 8;  forecast₇ = l + 7·b.
    *
    * Sequential like EWMA, so the same scale shape: one shuffle keyed
    * on event_type, per-key ordered fold bounded by the CALENDAR
    * (days), not the corpus; the daily counts themselves are one
    * map-side-combined aggregate. The oracle replays the fold through
    * a serialized "level:trend" accumulator. */
  def holtDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (t: String, it: Iterator[(String, String, Long)]) =>
        val days = it.toArray.sortBy(_._2)
        var l = 0L; var b = 0L; var first = true
        days.iterator.map { d =>
          if (first) { l = d._3; b = 0L; first = false }
          else {
            val lp = l; val bp = b
            val dd = d._3 - lp - bp
            l = lp + bp + dd / 4
            b = bp + (dd / 4) / 8
          }
          HoltPoint(t, d._2, d._3, l, b, l + 7 * b)
        }
      }
      .toDF().orderBy("event_type", "day")
  }

  /** Association rules over per-user event-type baskets — market-basket
    * mining's support / confidence / lift for every unordered type pair
    * {a, b} (a < b), all integer milli (truncating div, engine-exact):
    * conf(a→b) = 1000·n_ab div n_a, lift = 1000·n_ab·n_users div
    * (n_a·n_b). Lift > 1000 means the types co-occur more than
    * independence predicts — the "users who view also purchase" signal
    * a recommender mines.
    *
    * Scale shape: the event log collapses to per-user distinct type
    * SETS in ONE shuffle (collect_set under map-side combine, bounded
    * by |types| per user); pairs, per-type user counts, and the user
    * total are all derived from that user-grain frame — the pair
    * expansion is a map-side array transform (≤ C(|types|,2) structs
    * per user, never a self-join of the log), and the final joins
    * broadcast |types|-row and 1-row frames. At 100 TB nothing beyond
    * the first shuffle touches event-grain data. */
  def assocRules(spark: SparkSession, dir: String): DataFrame =
    assocRulesOn(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")))

  /** Core over any (user_id, event_type) frame — spec seam. */
  private[graft] def assocRulesOn(ev: DataFrame): DataFrame = {
    val sets = ev.groupBy("user_id")
      .agg(collect_set(col("event_type")).as("types"))
    val nUsers = sets.agg(count(lit(1)).as("n_users"))
    val typeCounts = sets.select(explode(col("types")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(types, a ->
          |  transform(filter(types, b -> b > a), b ->
          |    named_struct('ta', a, 'tb', b))))""".stripMargin)).as("p"))
      .groupBy(col("p.ta").as("type_a"), col("p.tb").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(typeCounts.select(
        col("event_type").as("type_a"), col("n_t").as("n_a"))), "type_a")
      .join(broadcast(typeCounts.select(
        col("event_type").as("type_b"), col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        expr("n_ab * 1000 div n_a").as("conf_ab_milli"),
        expr("n_ab * 1000 div n_b").as("conf_ba_milli"),
        expr("n_ab * n_users * 1000 div (n_a * n_b)").as("lift_milli"))
  }

  /** Residual threshold: |resid − 1000‰| beyond this flags the cell. */
  val SeasonalAnomalyMilli = 500L

  /** STL-lite seasonal decomposition of event volume: the hour-of-day
    * seasonal profile (mean count per hour slot across days) and each
    * (date, hour) cell's deseasonalized residual in exact milli-ratios
    * — resid = 1000·n·k div s where (s, k) are the slot's total and
    * day-count. Removing the within-day cycle FIRST is what separates
    * a real anomaly from rush hour; qa_mad_outliers flags whole odd
    * days, this flags odd cells net of the daily rhythm.
    *
    * Scale shape: the event log collapses to a (date, hour) grid in
    * one map-side-combined shuffle (the grid is |days|×24 however big
    * the log is); the 24-row profile re-joins by broadcast. Integer
    * end to end — both engines replay the exact milli values. */
  def seasonalHourly(spark: SparkSession, dir: String): DataFrame = {
    // the date as a plain string: DATE round-trips with different
    // physical types per engine, the comparator canonicalizes strings
    seasonalHourlyOn(Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
        hour(col("ts")).cast("long").as("h")))
  }

  /** Core over any (d, h) occurrence frame — spec seam. A silent
    * (date, hour) cell is a REAL zero observation: the grid is
    * densified over observed-dates × observed-hours before profiling,
    * so a total outage at a normally busy hour is flagged (resid 0 →
    * |0−1000| > band) instead of structurally invisible, and the slot
    * mean divides by every day, not only the days that happened to
    * have traffic. Hours with no traffic on ANY day stay absent —
    * their slot total would be 0 and a 0/0 residual is noise, not an
    * anomaly. Same densify-the-spine move as Profiling.activityCorr. */
  private[graft] def seasonalHourlyOn(occ: DataFrame): DataFrame = {
    val seen = occ.groupBy("d", "h").agg(count(lit(1)).as("n"))
    val grid = seen.select("d").distinct()
      .crossJoin(broadcast(seen.select("h").distinct()))
    val byCell = grid.join(seen, Seq("d", "h"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val prof = byCell.groupBy("h")
      .agg(sum(col("n")).as("s"), count(lit(1)).as("k"))
    byCell.join(broadcast(prof), "h")
      .select(col("d"), col("h"), col("n"),
        expr("s * 1000 div k").as("expected_milli"),
        expr("n * k * 1000 div s").as("resid_milli"))
      .withColumn("anomaly",
        abs(col("resid_milli") - lit(1000L)) > lit(SeasonalAnomalyMilli))
  }

  /** Fixed RFM band edges (recency days ascending → scores 5..2;
    * frequency / monetary cents descending → scores 5..2; everything
    * past the last edge scores 1). Fixed operational bands, NOT
    * quantile banding: ntile over all users is a single-reducer global
    * window (the scale-killer this codebase bans), and fixed bands are
    * what a production scorecard pins anyway so scores stay comparable
    * across runs. */
  private[graft] val RfmRecencyDays = Seq(2L, 5L, 10L, 20L)
  private[graft] val RfmFreq = Seq(100L, 60L, 30L, 10L)
  private[graft] val RfmCents = Seq(5000000L, 3000000L, 2000000L, 1000000L)

  /** Classic RFM user scoring over the events stream: per user, days
    * since last activity (vs the corpus max — both exact integer
    * microsecond math), event count, and monetary value in exact
    * cents, banded into 1–5 scores plus the concatenated RFM code.
    * One map-side-combined aggregate to |users| rows, a 1-row
    * broadcast for the corpus clock, then scan-side CASE bands. */
  def rfmScores(spark: SparkSession, dir: String): DataFrame = {
    def asc(c: Column, edges: Seq[Long]): Column =
      edges.zip(5L to 2L by -1).foldRight(lit(1L)) {
        case ((e, s), rest) => when(c <= e, s).otherwise(rest)
      }
    def desc(c: Column, edges: Seq[Long]): Column =
      edges.zip(5L to 2L by -1).foldRight(lit(1L)) {
        case ((e, s), rest) => when(c >= e, s).otherwise(rest)
      }
    val per = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(round(col("value") * 100).cast("long")).as("monetary_cents"))
    val clock = per.agg(max(col("last_us")).as("corpus_us"))
    per.crossJoin(broadcast(clock))
      .withColumn("recency_days",
        expr("(corpus_us - last_us) div 86400000000"))
      .withColumn("r_score", asc(col("recency_days"), RfmRecencyDays))
      .withColumn("f_score", desc(col("frequency"), RfmFreq))
      .withColumn("m_score", desc(col("monetary_cents"), RfmCents))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("rfm_code"))
  }

  /** Two-sided 95% critical value for the A/B z-test. */
  private val AbZ = 1.96

  /** Deterministic 50/50 experiment split: first hex digit of
    * md5(user_id || ":ab") < '8' → variant A (the repo's hash-split
    * convention — sample_hash / assignSplits use the same md5 seam, so
    * assignment is replay-stable and oracle-exact). */
  private def variantCol: Column =
    when(substring(md5(concat(col("user_id").cast("string"), lit(":ab"))),
      1, 1) < "8", "A").otherwise("B")

  private def abPerUser(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("variant", variantCol)

  /** A/B experiment readout — per variant: users, conversions (any
    * `purchase`), conversion rate, and the Wilson 95% score interval
    * (the CI that stays inside [0,1] at small n, the standard
    * product-analytics presentation). All inputs are exact integer
    * ratios; the only irrationals are one sqrt per row (IEEE
    * correctly-rounded in both engines) — rounded to 6 dp.
    *
    * Scale shape: one per-user map-side-combined aggregate (the same
    * user_id hash shuffle every Behavior query rides), then a 2-row
    * variant aggregate; nothing after the first shuffle scales with
    * the event log. */
  def abLift(spark: SparkSession, dir: String): DataFrame = {
    val g = abPerUser(spark, dir)
      .groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val n = col("n_users").cast("double")
    val p = col("n_conv").cast("double") / col("n_users")
    val z2 = lit(AbZ) * lit(AbZ)
    val den = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / den
    val half = lit(AbZ) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n)) / den
    g.select(col("variant"), col("n_users"), col("n_conv"),
      round(p, 6).as("conv_rate"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }

  /** Two-proportion z-test on the same split: pooled-variance z
    * statistic for P(convert | B) − P(convert | A), absolute lift, and
    * the 95% verdict. One row. */
  def abZTest(spark: SparkSession, dir: String): DataFrame = {
    val s = abPerUser(spark, dir).agg(
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "A", col("converted")).otherwise(0L)).as("x_a"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === "B", col("converted")).otherwise(0L)).as("x_b"))
    val d = s.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      (col("x_a").cast("double") / col("n_a")).as("pa"),
      (col("x_b").cast("double") / col("n_b")).as("pb"),
      ((col("x_a") + col("x_b")).cast("double") /
        (col("n_a") + col("n_b"))).as("pp"))
      .withColumn("se", sqrt(col("pp") * (lit(1.0) - col("pp")) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
    // a fully-converted (or fully-unconverted) population has zero
    // pooled variance: define z = 0 (no evidence) instead of 0/0 —
    // mirrored in the oracle's CASE
    val z = when(col("se") === lit(0.0), lit(0.0))
      .otherwise((col("pb") - col("pa")) / col("se"))
    d.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(col("pa"), 6).as("p_a"), round(col("pb"), 6).as("p_b"),
      round(col("pb") - col("pa"), 6).as("abs_lift"),
      round(z, 6).as("z_stat"),
      (abs(z) > lit(AbZ)).as("significant"))
  }

  /** CUPED variance-reduced lift (Deng et al. 2013, "Improving the
    * sensitivity of online controlled experiments by utilizing
    * pre-experiment data"): per-user purchase spend is split at the
    * integer midpoint of the observed time range into a pre-period
    * covariate X and the experiment metric Y; θ = cov(X,Y)/var(X) is
    * fit on the POOLED population, each variant's mean is adjusted by
    * θ·(mean(Xᵥ) − mean(X)), and the fraction of metric variance the
    * covariate removes is ρ². One row.
    *
    * Parity discipline is [[graft.operators.Profiling.linregSuffStats]]'s:
    * the sufficient statistics (n, ΣX, ΣY, ΣXY, ΣX², ΣY², per-variant
    * n/ΣX/ΣY) are EXACT long sums over integer cents; every double is
    * a fixed expression tree over those scalars, mirrored textually in
    * the oracle (per-row xy ≤ ~10¹², so long sums hold to ~10⁶ users
    * per the linreg bound; DECIMAL(38,0) is the documented promotion).
    *
    * Scale shape: one broadcast of the 1-row time span, one per-user
    * map-side-combined aggregate (the family's user_id shuffle), then
    * a single 1-row reduce — nothing downstream scales with events. */
  def abCuped(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val ev = Tables.events(spark, dir)
    val span = ev
      .agg(min(unix_micros(col("ts"))).as("t0"), max(unix_micros(col("ts"))).as("t1"))
      .select(expr("(t0 + t1) div 2").as("mid"))
    val per = ev.crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" &&
          unix_micros(col("ts")) < col("mid"), cents).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" &&
          unix_micros(col("ts")) >= col("mid"), cents).otherwise(0L)).as("y"))
      .withColumn("variant", variantCol)
    val d = (c: Column) => c.cast("double")
    val s = per.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "A", col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("variant") === "A", col("y")).otherwise(0L)).as("sya"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === "B", col("x")).otherwise(0L)).as("sxb"),
      sum(when(col("variant") === "B", col("y")).otherwise(0L)).as("syb"))
      .withColumn("num", d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
      .withColumn("denx", d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      .withColumn("deny", d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
      // a constant covariate carries no information: θ := 0 (CASE
      // mirrored in the oracle), reducing CUPED to the raw lift
      .withColumn("theta",
        when(col("denx") === lit(0.0), lit(0.0))
          .otherwise(col("num") / col("denx")))
    val adjA = d(col("sya")) / d(col("n_a")) -
      col("theta") * (d(col("sxa")) / d(col("n_a")) - d(col("sx")) / d(col("n")))
    val adjB = d(col("syb")) / d(col("n_b")) -
      col("theta") * (d(col("sxb")) / d(col("n_b")) - d(col("sx")) / d(col("n")))
    s.select(col("n_a"), col("n_b"),
      round(col("theta"), 6).as("theta"),
      round(d(col("syb")) / d(col("n_b")) - d(col("sya")) / d(col("n_a")), 6)
        .as("raw_lift_cents"),
      round(adjB - adjA, 6).as("adj_lift_cents"),
      round(when(col("denx") * col("deny") === lit(0.0), lit(0.0))
        .otherwise(col("num") * col("num") / (col("denx") * col("deny"))), 6)
        .as("var_reduction"))
  }

  /** Welch's unequal-variance t-test on per-user purchase REVENUE —
    * the continuous-metric significance readout next to [[abZTest]]'s
    * binary conversion (Welch 1947; the default two-sample test when
    * variances differ, as revenue's always do). Per-variant mean and
    * sample variance come from exact cents sufficient statistics
    * (n, Σy, Σy²); t = (μ_B − μ_A)/√(s²_A/n_A + s²_B/n_B) and the
    * Welch–Satterthwaite df are fixed double trees over those scalars,
    * mirrored textually in the oracle. Zero pooled spread ⇒ t := 0
    * (same guard as the z-test). One row. */
  def abWelch(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val per = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", cents).otherwise(0L)).as("y"))
      .withColumn("variant", variantCol)
    val s = per.agg(
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "A", col("y")).otherwise(0L)).as("sy_a"),
      sum(when(col("variant") === "A", col("y") * col("y")).otherwise(0L)).as("syy_a"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === "B", col("y")).otherwise(0L)).as("sy_b"),
      sum(when(col("variant") === "B", col("y") * col("y")).otherwise(0L)).as("syy_b"))
    val d = (c: Column) => c.cast("double")
    def varOf(n: Column, sy: Column, syy: Column): Column =
      (d(n) * d(syy) - d(sy) * d(sy)) / (d(n) * (d(n) - lit(1.0)))
    val s2 = s
      .withColumn("m_a", d(col("sy_a")) / d(col("n_a")))
      .withColumn("m_b", d(col("sy_b")) / d(col("n_b")))
      .withColumn("va", varOf(col("n_a"), col("sy_a"), col("syy_a")))
      .withColumn("vb", varOf(col("n_b"), col("sy_b"), col("syy_b")))
      .withColumn("se2", col("va") / col("n_a") + col("vb") / col("n_b"))
    val t = when(col("se2") === lit(0.0), lit(0.0))
      .otherwise((col("m_b") - col("m_a")) / sqrt(col("se2")))
    val df = when(col("se2") === lit(0.0), lit(0.0))
      .otherwise(col("se2") * col("se2") /
        (col("va") / col("n_a") * (col("va") / col("n_a")) / (d(col("n_a")) - lit(1.0)) +
         col("vb") / col("n_b") * (col("vb") / col("n_b")) / (d(col("n_b")) - lit(1.0))))
    s2.select(col("n_a"), col("n_b"),
      round(col("m_a"), 6).as("mean_a_cents"),
      round(col("m_b"), 6).as("mean_b_cents"),
      round(t, 6).as("t_stat"),
      round(df, 6).as("welch_df"),
      (abs(t) > lit(AbZ)).as("significant"))
  }

  /** Sample-ratio-mismatch check — the experiment-health gate every
    * A/B platform runs before reading results: a 1-df chi-squared
    * test that the hash split actually landed on its designed 50/50
    * (an SRM means assignment is broken — bot filtering, logging
    * loss, redirect asymmetry — and every downstream readout is
    * invalid). χ² = (n_a−E)²/E + (n_b−E)²/E with E = n/2; flagged
    * above the 95% critical value 3.841. Integer counts, one fixed
    * double tree, one row. */
  def abSrm(spark: SparkSession, dir: String): DataFrame = {
    val s = abPerUser(spark, dir).agg(
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"))
    val e = (col("n_a") + col("n_b")).cast("double") / lit(2.0)
    val chi2 = (col("n_a") - e) * (col("n_a") - e) / e +
      (col("n_b") - e) * (col("n_b") - e) / e
    s.select(col("n_a"), col("n_b"),
      round(chi2, 6).as("chi2"),
      (chi2 > lit(3.841)).as("srm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_ab_lift" -> ((s, d) => abLift(s, d)),
    "evt_ab_srm" -> ((s, d) => abSrm(s, d)),
    "evt_ab_welch" -> ((s, d) => abWelch(s, d)),
    "evt_ab_ztest" -> ((s, d) => abZTest(s, d)),
    "evt_ab_cuped" -> ((s, d) => abCuped(s, d)),
    "evt_rfm" -> ((s, d) => rfmScores(s, d)),
    "evt_seasonal_hourly" -> ((s, d) => seasonalHourly(s, d)),
    "funnel_conversion" -> ((s, d) => funnel(s, d)),
    "evt_pattern_within" -> ((s, d) => patternWithin(s, d)),
    "evt_pattern_negation" -> ((s, d) => patternNegation(s, d)),
    "evt_markov_stationary" -> ((s, d) => markovStationary(s, d)),
    "evt_ewma" -> ((s, d) => ewmaSmooth(s, d)),
    "evt_holt_daily" -> ((s, d) => holtDaily(s, d)),
    "evt_transitions" -> ((s, d) => transitions(s, d)),
    "evt_paths3" -> ((s, d) => paths3(s, d)),
    "evt_assoc_rules" -> ((s, d) => assocRules(s, d)),
    "cohort_retention" -> ((s, d) => cohortRetention(s, d)))

  private def caseSqlAsc(c: String, edges: Seq[Long]): String =
    edges.zip(5L to 2L by -1)
      .map { case (e, s) => s"WHEN $c <= $e THEN $s" }
      .mkString("CASE ", " ", " ELSE 1 END")

  private def caseSqlDesc(c: String, edges: Seq[Long]): String =
    edges.zip(5L to 2L by -1)
      .map { case (e, s) => s"WHEN $c >= $e THEN $s" }
      .mkString("CASE ", " ", " ELSE 1 END")

  /** Shared per-user → variant CTEs for the A/B pair. */
  private val abCtes: String =
    """pu AS (SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS converted
      |  FROM events GROUP BY 1),
      |v AS (SELECT CASE WHEN substr(md5(user_id::VARCHAR || ':ab'), 1, 1) < '8'
      |    THEN 'A' ELSE 'B' END AS variant, converted FROM pu)""".stripMargin

  val oracle: Map[String, String] = Map(
    // the Wilson terms are written in the same association order as
    // the engine's Column algebra; sqrt is IEEE-exact in both
    "evt_ab_lift" ->
      s"""WITH $abCtes,
         |g AS (SELECT variant, count(*)::BIGINT AS n_users,
         |    sum(converted)::BIGINT AS n_conv FROM v GROUP BY 1),
         |g2 AS (SELECT variant, n_users, n_conv,
         |    n_conv::DOUBLE / n_users AS p, n_users::DOUBLE AS n FROM g)
         |SELECT variant, n_users, n_conv, round(p, 6) AS conv_rate,
         |  round((p + 1.96*1.96/(2.0*n))/(1.0 + 1.96*1.96/n)
         |    - 1.96 * sqrt(p*(1.0-p)/n + 1.96*1.96/(4.0*n*n)) / (1.0 + 1.96*1.96/n), 6) AS wilson_lo,
         |  round((p + 1.96*1.96/(2.0*n))/(1.0 + 1.96*1.96/n)
         |    + 1.96 * sqrt(p*(1.0-p)/n + 1.96*1.96/(4.0*n*n)) / (1.0 + 1.96*1.96/n), 6) AS wilson_hi
         |FROM g2 ORDER BY variant""".stripMargin,
    "evt_ab_ztest" ->
      s"""WITH $abCtes,
         |s AS (SELECT
         |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)::BIGINT AS x_a,
         |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)::BIGINT AS n_b,
         |    sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)::BIGINT AS x_b
         |  FROM v),
         |d AS (SELECT n_a, x_a, n_b, x_b,
         |    x_a::DOUBLE / n_a AS p_a, x_b::DOUBLE / n_b AS p_b,
         |    (x_a + x_b)::DOUBLE / (n_a + n_b) AS pp FROM s),
         |e AS (SELECT d.*, sqrt(pp*(1.0-pp)*(1.0/n_a + 1.0/n_b)) AS se FROM d),
         |f AS (SELECT e.*, CASE WHEN se = 0.0 THEN 0.0
         |    ELSE (p_b - p_a) / se END AS z FROM e)
         |SELECT n_a, x_a, n_b, x_b, round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
         |  round(p_b - p_a, 6) AS abs_lift,
         |  round(z, 6) AS z_stat,
         |  abs(z) > 1.96 AS significant
         |FROM f""".stripMargin,
    // exact-cents sufficient statistics; the t and Welch df are the
    // same fixed double trees, with the zero-spread guard mirrored
    "evt_ab_welch" ->
      """WITH pu AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |v AS (SELECT pu.*, CASE WHEN substr(md5(user_id::VARCHAR || ':ab'), 1, 1) < '8'
        |    THEN 'A' ELSE 'B' END AS variant FROM pu),
        |s AS (SELECT
        |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN variant = 'A' THEN y ELSE 0 END)::BIGINT AS sy_a,
        |    sum(CASE WHEN variant = 'A' THEN y * y ELSE 0 END)::BIGINT AS syy_a,
        |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN variant = 'B' THEN y ELSE 0 END)::BIGINT AS sy_b,
        |    sum(CASE WHEN variant = 'B' THEN y * y ELSE 0 END)::BIGINT AS syy_b
        |  FROM v),
        |d AS (SELECT s.*,
        |    sy_a::DOUBLE / n_a::DOUBLE AS m_a, sy_b::DOUBLE / n_b::DOUBLE AS m_b,
        |    (n_a::DOUBLE * syy_a::DOUBLE - sy_a::DOUBLE * sy_a::DOUBLE)
        |      / (n_a::DOUBLE * (n_a::DOUBLE - 1.0)) AS va,
        |    (n_b::DOUBLE * syy_b::DOUBLE - sy_b::DOUBLE * sy_b::DOUBLE)
        |      / (n_b::DOUBLE * (n_b::DOUBLE - 1.0)) AS vb FROM s),
        |e AS (SELECT d.*, va / n_a + vb / n_b AS se2 FROM d),
        |f AS (SELECT e.*,
        |    CASE WHEN se2 = 0.0 THEN 0.0 ELSE (m_b - m_a) / sqrt(se2) END AS t,
        |    CASE WHEN se2 = 0.0 THEN 0.0 ELSE se2 * se2 /
        |      (va / n_a * (va / n_a) / (n_a::DOUBLE - 1.0)
        |       + vb / n_b * (vb / n_b) / (n_b::DOUBLE - 1.0)) END AS df FROM e)
        |SELECT n_a, n_b, round(m_a, 6) AS mean_a_cents, round(m_b, 6) AS mean_b_cents,
        |  round(t, 6) AS t_stat, round(df, 6) AS welch_df,
        |  abs(t) > 1.96 AS significant
        |FROM f""".stripMargin,
    "evt_ab_srm" ->
      s"""WITH $abCtes,
         |s AS (SELECT
         |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)::BIGINT AS n_b
         |  FROM v),
         |e AS (SELECT s.*, (n_a + n_b)::DOUBLE / 2.0 AS e FROM s)
         |SELECT n_a, n_b,
         |  round((n_a - e) * (n_a - e) / e + (n_b - e) * (n_b - e) / e, 6) AS chi2,
         |  (n_a - e) * (n_a - e) / e + (n_b - e) * (n_b - e) / e > 3.841 AS srm
         |FROM e""".stripMargin,
    // exact-cents sufficient statistics, doubles only in the final
    // fixed expression tree (profile_linreg's discipline)
    "evt_ab_cuped" ->
      """WITH span AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |pu AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) < mid
        |      THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN event_type = 'purchase' AND epoch_us(ts) >= mid
        |      THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS y
        |  FROM events, span GROUP BY 1),
        |v AS (SELECT pu.*, CASE WHEN substr(md5(user_id::VARCHAR || ':ab'), 1, 1) < '8'
        |    THEN 'A' ELSE 'B' END AS variant FROM pu),
        |s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum(x*y)::BIGINT AS sxy, sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy,
        |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN variant = 'A' THEN x ELSE 0 END)::BIGINT AS sxa,
        |    sum(CASE WHEN variant = 'A' THEN y ELSE 0 END)::BIGINT AS sya,
        |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN variant = 'B' THEN x ELSE 0 END)::BIGINT AS sxb,
        |    sum(CASE WHEN variant = 'B' THEN y ELSE 0 END)::BIGINT AS syb
        |  FROM v),
        |d AS (SELECT s.*,
        |    n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
        |    n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS denx,
        |    n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS deny FROM s),
        |e AS (SELECT d.*, CASE WHEN denx = 0.0 THEN 0.0 ELSE num / denx END AS theta FROM d),
        |f AS (SELECT e.*,
        |    sya::DOUBLE / n_a::DOUBLE - theta * (sxa::DOUBLE / n_a::DOUBLE - sx::DOUBLE / n::DOUBLE) AS adj_a,
        |    syb::DOUBLE / n_b::DOUBLE - theta * (sxb::DOUBLE / n_b::DOUBLE - sx::DOUBLE / n::DOUBLE) AS adj_b FROM e)
        |SELECT n_a, n_b, round(theta, 6) AS theta,
        |  round(syb::DOUBLE / n_b::DOUBLE - sya::DOUBLE / n_a::DOUBLE, 6) AS raw_lift_cents,
        |  round(adj_b - adj_a, 6) AS adj_lift_cents,
        |  round(CASE WHEN denx * deny = 0.0 THEN 0.0
        |    ELSE num * num / (denx * deny) END, 6) AS var_reduction
        |FROM f""".stripMargin,
    "evt_rfm" ->
      s"""WITH per AS (SELECT user_id,
         |    max(epoch_us(ts))::BIGINT AS last_us,
         |    count(*)::BIGINT AS frequency,
         |    sum(round(value * 100)::BIGINT)::BIGINT AS monetary_cents
         |  FROM events GROUP BY 1),
         |mx AS (SELECT max(last_us) AS corpus_us FROM per),
         |r AS (SELECT user_id, (corpus_us - last_us) // 86400000000 AS recency_days,
         |    frequency, monetary_cents FROM per, mx),
         |s AS (SELECT user_id, recency_days, frequency, monetary_cents,
         |    (${caseSqlAsc("recency_days", RfmRecencyDays)})::BIGINT AS r_score,
         |    (${caseSqlDesc("frequency", RfmFreq)})::BIGINT AS f_score,
         |    (${caseSqlDesc("monetary_cents", RfmCents)})::BIGINT AS m_score
         |  FROM r)
         |SELECT user_id, recency_days, frequency, monetary_cents,
         |  r_score, f_score, m_score,
         |  r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS rfm_code
         |FROM s ORDER BY user_id""".stripMargin,
    "evt_seasonal_hourly" ->
      s"""WITH seen AS (SELECT strftime(ts, '%Y-%m-%d') AS d, hour(ts)::BIGINT AS h,
         |    count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
         |bh AS (SELECT gd.d, gh.h, coalesce(seen.n, 0)::BIGINT AS n
         |  FROM (SELECT DISTINCT d FROM seen) gd
         |  CROSS JOIN (SELECT DISTINCT h FROM seen) gh
         |  LEFT JOIN seen ON seen.d = gd.d AND seen.h = gh.h),
         |pr AS (SELECT h, sum(n)::BIGINT AS s, count(*)::BIGINT AS k
         |  FROM bh GROUP BY 1)
         |SELECT d, bh.h, n, (s * 1000) // k AS expected_milli,
         |  (n * k * 1000) // s AS resid_milli,
         |  abs((n * k * 1000) // s - 1000) > $SeasonalAnomalyMilli AS anomaly
         |FROM bh JOIN pr ON bh.h = pr.h
         |ORDER BY d, bh.h""".stripMargin,
    // earliest match = row_number over (p.ts, p.event_id) — the same
    // total order as Spark's min(struct(p_ts, p_id))
    "evt_pattern_within" ->
      """SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
        |  p.event_id AS purchase_id, p.ts AS purchase_ts,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |FROM events v JOIN events p
        |  ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |  AND p.ts > v.ts AND epoch_us(p.ts) - epoch_us(v.ts) <= 21600000000
        |WHERE v.event_type = 'view'
        |QUALIFY row_number() OVER (PARTITION BY v.event_id ORDER BY p.ts, p.event_id) = 1
        |ORDER BY v.user_id, view_id""".stripMargin,
    // the power iteration unrolled: one CTE per round, per-term
    // truncating division identical to the engine's
    "evt_markov_stationary" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
        |c AS (SELECT src_type, event_type AS dst_type, count(*)::BIGINT AS n
        |  FROM (SELECT event_type, lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id) AS src_type FROM e)
        |  WHERE src_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src_type, sum(n)::BIGINT AS total FROM c GROUP BY 1),
        |k AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM e),
        |p0 AS (SELECT DISTINCT event_type AS t, 1000000 // k.k AS v FROM e, k),
        |p1 AS (SELECT c.dst_type AS t, sum((p.v * c.n) // tt.total)::BIGINT AS v
        |  FROM p0 p JOIN c ON c.src_type = p.t JOIN t tt ON tt.src_type = p.t
        |  GROUP BY 1),
        |p2 AS (SELECT c.dst_type AS t, sum((p.v * c.n) // tt.total)::BIGINT AS v
        |  FROM p1 p JOIN c ON c.src_type = p.t JOIN t tt ON tt.src_type = p.t
        |  GROUP BY 1),
        |p3 AS (SELECT c.dst_type AS t, sum((p.v * c.n) // tt.total)::BIGINT AS v
        |  FROM p2 p JOIN c ON c.src_type = p.t JOIN t tt ON tt.src_type = p.t
        |  GROUP BY 1),
        |p4 AS (SELECT c.dst_type AS t, sum((p.v * c.n) // tt.total)::BIGINT AS v
        |  FROM p3 p JOIN c ON c.src_type = p.t JOIN t tt ON tt.src_type = p.t
        |  GROUP BY 1)
        |SELECT t AS event_type, v AS pi_micro FROM p4 ORDER BY 1""".stripMargin,
    // the base pattern's QUALIFY CTE plus a correlated strict-band
    // error count — SQL's native form of the negation
    "evt_pattern_negation" ->
      """WITH m AS (SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
        |    p.event_id AS purchase_id, p.ts AS purchase_ts,
        |    epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |  FROM events v JOIN events p
        |    ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |    AND p.ts > v.ts AND epoch_us(p.ts) - epoch_us(v.ts) <= 21600000000
        |  WHERE v.event_type = 'view'
        |  QUALIFY row_number() OVER (PARTITION BY v.event_id ORDER BY p.ts, p.event_id) = 1)
        |SELECT m.*,
        |  (SELECT count(*) FROM events e WHERE e.user_id = m.user_id
        |    AND e.event_type = 'error' AND e.ts > m.view_ts
        |    AND e.ts < m.purchase_ts)::BIGINT AS n_errors_between,
        |  (SELECT count(*) FROM events e WHERE e.user_id = m.user_id
        |    AND e.event_type = 'error' AND e.ts > m.view_ts
        |    AND e.ts < m.purchase_ts) = 0 AS clean
        |FROM m ORDER BY user_id, view_id""".stripMargin,
    // the sequential fold replayed as a '|'-serialized running
    // accumulator (the bpeFoldSql trick): list_reduce's acc carries
    // every intermediate EWMA, unnest pairs them back to events
    "evt_ewma" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |g AS (SELECT user_id,
        |    list(event_id ORDER BY tus, event_id) AS ids,
        |    list(cents ORDER BY tus, event_id) AS cs
        |  FROM e GROUP BY 1),
        |f AS (SELECT user_id, ids, cs,
        |    string_split(list_reduce(list_transform(cs, c -> c::VARCHAR),
        |      (acc, c) -> acc || '|' ||
        |        (string_split(acc, '|')[-1]::BIGINT
        |         + (c::BIGINT - string_split(acc, '|')[-1]::BIGINT) // 8)::VARCHAR),
        |      '|') AS es
        |  FROM g)
        |SELECT user_id, ids[u.i::INT] AS event_id, cs[u.i::INT] AS cents,
        |  es[u.i::INT]::BIGINT AS ewma_cents
        |FROM f, UNNEST(range(1, len(ids) + 1)) AS u(i)
        |ORDER BY user_id, event_id""".stripMargin,
    // the Holt fold replayed through a serialized "level:trend"
    // accumulator — same discipline as evt_ewma's, two state values
    "evt_holt_daily" -> {
      val lp = "string_split(string_split(acc, '|')[-1], ':')[1]::BIGINT"
      val bp = "string_split(string_split(acc, '|')[-1], ':')[2]::BIGINT"
      val lNew = s"($lp + $bp + (c::BIGINT - $lp - $bp) // 4)"
      val bNew = s"($bp + ((c::BIGINT - $lp - $bp) // 4) // 8)"
      s"""WITH d AS (SELECT event_type, strftime(ts::DATE, '%Y-%m-%d') AS day,
         |    count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
         |g AS (SELECT event_type,
         |    list(day ORDER BY day) AS days,
         |    list(n ORDER BY day) AS ns
         |  FROM d GROUP BY 1),
         |f AS (SELECT event_type, days, ns,
         |    string_split(list_reduce(
         |      list_prepend(ns[1]::VARCHAR || ':0',
         |        list_transform(ns[2:], x -> x::VARCHAR)),
         |      (acc, c) -> acc || '|' || $lNew::VARCHAR || ':' || $bNew::VARCHAR),
         |      '|') AS st
         |  FROM g)
         |SELECT event_type, days[u.i::INT] AS day, ns[u.i::INT] AS n,
         |  string_split(st[u.i::INT], ':')[1]::BIGINT AS level,
         |  string_split(st[u.i::INT], ':')[2]::BIGINT AS trend,
         |  string_split(st[u.i::INT], ':')[1]::BIGINT
         |    + 7 * string_split(st[u.i::INT], ':')[2]::BIGINT AS forecast7
         |FROM f, UNNEST(range(1, len(days) + 1)) AS u(i)
         |ORDER BY event_type, day""".stripMargin
    },
    "evt_transitions" ->
      """WITH p AS (SELECT user_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS src_type,
        |    event_type AS dst_type
        |  FROM events),
        |c AS (SELECT src_type, dst_type, count(*)::BIGINT AS n FROM p
        |  WHERE src_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src_type, sum(n)::BIGINT AS total FROM c GROUP BY 1)
        |SELECT c.src_type, c.dst_type, c.n, (c.n * 1000) // t.total AS milli_prob
        |FROM c JOIN t USING (src_type)
        |ORDER BY 1, 2""".stripMargin,
    "evt_paths3" ->
      s"""WITH p AS (SELECT
         |    event_type AS step1,
         |    lead(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS step2,
         |    lead(event_type, 2) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS step3
         |  FROM events)
         |SELECT step1, step2, step3, count(*)::BIGINT AS n FROM p
         |WHERE step3 IS NOT NULL GROUP BY 1, 2, 3
         |ORDER BY n DESC, step1, step2, step3 LIMIT $Paths3TopK""".stripMargin,
    "funnel_conversion" ->
      """WITH t1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY 1 HAVING t_view IS NOT NULL),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= t1.t_view
        |    AND epoch_us(e.ts) - epoch_us(t1.t_view) <= 86400000000 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= t2.t_click
        |    AND epoch_us(e.ts) - epoch_us(t2.t_click) <= 86400000000 GROUP BY 1)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, count(*)::BIGINT AS n_users FROM t1
        |  UNION ALL SELECT '2_click', count(*)::BIGINT FROM t2
        |  UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM t3)
        |ORDER BY stage""".stripMargin,
    "evt_assoc_rules" ->
      """WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
        |tc AS (SELECT event_type, count(*)::BIGINT AS n_t FROM ue GROUP BY 1),
        |nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM ue),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*)::BIGINT AS n_ab
        |  FROM ue a JOIN ue b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
        |  (n_ab * 1000) // ta.n_t AS conf_ab_milli,
        |  (n_ab * 1000) // tb.n_t AS conf_ba_milli,
        |  (n_ab * nu.n_users * 1000) // (ta.n_t * tb.n_t) AS lift_milli
        |FROM p JOIN tc ta ON ta.event_type = p.type_a
        |  JOIN tc tb ON tb.event_type = p.type_b, nu
        |ORDER BY type_a, type_b""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(DISTINCT ev.user_id)::BIGINT AS n_users
        |FROM ev JOIN cohorts USING (user_id)
        |WHERE week >= cohort_week
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
