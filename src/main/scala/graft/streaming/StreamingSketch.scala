package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.Sketches

/** A keyed (key, value) pair on the stream. */
final case class KeyedValue(key: String, value: String)

/** An event-time-stamped value on the stream. */
final case class TimedValue(ts: Timestamp, value: String)

/** Running distinct-count estimate for one key. */
final case class DistinctEstimate(key: String, n_estimate: Long)

/** Running KMV estimate for one key. */
final case class KmvEstimate(key: String, n_sketch: Long, kmv_est: Long)

/** Streaming cardinality — per-key HLL registers as keyed state.
  *
  * `dropDuplicates` on a stream keeps every seen value in the state
  * store; over an unbounded stream that state grows without limit and
  * watermark eviction changes the answer. The sketch inverts the
  * trade: per key the state is EXACTLY Sketches.HllM bytes (one byte
  * per register) forever, and the estimate covers the whole stream
  * history, at HLL accuracy instead of exactness.
  *
  * The registers are updated with the SAME hash and estimated with the
  * SAME integer arithmetic as the batch column-algebra form
  * (Sketches.hllEstimateBy) — a streaming run over the same rows emits
  * bit-identical estimates to the batch query (spec-proven), so a
  * lambda architecture's serving layer can mix both without seams.
  *
  * Scale: one shuffle on the key (the groupByKey), then state-local
  * updates; no per-value state growth, no watermark coupling. Update
  * mode emits the refreshed estimate each trigger.
  */
object StreamingSketch {

  /** BIGINT `div` as column algebra (Catalyst IntegralDivide): the
    * streaming twins must use the SAME integer arithmetic as their
    * batch originals (Profiling's `expr("... div ...")`) — `/` on
    * longs is double division, whose truncation can diverge from
    * integer div in ulp-edge cases at very large counts. Built through
    * the bridge because lambda-bound HOF variables are invisible to
    * `expr(...)` strings. */
  private def intDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Approximate distinct values per event-time window — TWO chained
    * stateful aggregations in append mode (register max per
    * (window, bucket), then the window's estimate), legal since the
    * second groups by the first's time window. State per open window
    * is ≤ HllM register rows and the watermark evicts it; the emitted
    * estimate uses the exact integer arithmetic of
    * Sketches.hllEstimateBy, so a closed window's estimate equals the
    * batch computation over the same rows (spec-proven). */
  def windowedDistinct(tv: Dataset[TimedValue], windowDur: String,
      watermarkDelay: String): DataFrame = {
    import org.apache.spark.sql.functions.{window => timeWindow}
    Sketches.withHllEstimate(
      tv.toDF()
        .withWatermark("ts", watermarkDelay)
        // hash aliased through a projection so bucket and rho don't each
        // re-run the fold+mixer
        .select(col("ts"), Sketches.hash32(col("value")).as("x"))
        .select(col("ts") +: Sketches.hllRhoCols(col("x")): _*)
        .groupBy(timeWindow(col("ts"), windowDur), col("bucket"))
        .agg(max("rho").as("rho"))
        // second stateful agg: re-window the first window onto itself via
        // window_time — the chained-aggregation form append mode accepts
        .groupBy(timeWindow(window_time(col("window")), windowDur))
        .agg(Sketches.hllAggCols.head, Sketches.hllAggCols.tail: _*))
      .select(col("window").getField("start").as("window_start"),
        col("n_zero_buckets"), col("hll_est"))
  }

  /** Running KMV state per key: the bottom-k distinct hashes as a
    * bounded list (k longs per key forever — same constant-state
    * discipline as the HLL registers), inserted with the SAME bounded
    * set-union the batch Aggregator runs (functions.BottomKDistinct)
    * and estimated with the SAME integer arithmetic
    * (Sketches.kmvEstimate) — so a streaming run over the same rows
    * emits bit-identical estimates to the batch column form
    * (spec-proven). Unlike HLL registers, the KMV state additionally
    * supports downstream set algebra: union two keys' final sketches
    * and you have a valid sketch of the union (the batch Jaccard
    * report's mechanism). */
  def kmvByKey(kv: Dataset[KeyedValue]): Dataset[KmvEstimate] = {
    import kv.sparkSession.implicits._
    val agg = new graft.functions.BottomKDistinct(Sketches.KmvK)
    kv.groupByKey(_.key)
      .mapGroupsWithState[List[Long], KmvEstimate](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[List[Long]]) =>
          // normalize restored state to the descending (worst-first)
          // buffer order reduce expects: a checkpoint written by the
          // pre-r16 ascending-buffer version would otherwise hit the
          // head<=x full-reject on almost every insert and silently
          // corrupt the sketch; sorting is idempotent on current state
          // (k elements, once per key per microbatch)
          val restored = state.getOption
            .map(_.sortWith(_ > _)).getOrElse(agg.zero)
          val sk = rows.foldLeft(restored) {
            (buf, r) => agg.reduce(buf, Sketches.hash32Scalar(r.value))
          }
          state.update(sk)
          // finish() orders the sketch ascending (the buffer itself is
          // descending since r16) — kmvEstimate reads the kth minimum
          // as the LAST element of an ascending sketch
          KmvEstimate(key, sk.size.toLong,
            Sketches.kmvEstimate(agg.finish(sk).toList))
      }
  }

  /** Windowed drift monitor — the streaming twin of
    * operators.Profiling.driftOn: each closed event-time window's value
    * histogram is compared against a FIXED baseline histogram (built
    * batch-side, shipped as a map literal), emitting the L1 distance in
    * milli. Two chained stateful aggregations in append mode (the
    * windowedDistinct mechanism): per-(window, bin) counts, then one
    * bounded collect per window — ≤ bins rows of state per open window,
    * watermark-evicted. Absent bins still contribute their baseline
    * mass: L1 = Σ_present |f_w − f_base| + (Σ_all f_base − Σ_present
    * f_base), all integer.
    *
    * `values` are integer readings (cents); `lo`/`bw` are the
    * baseline's binning so stream and baseline share the grid;
    * `baselineMilli` maps bin → milli frequency. This is the
    * monitoring loop a 100 TB ingest runs: yesterday's corpus
    * compresses to ≤ bins literals, today's stream keeps ≤ bins
    * counters per window, drift is one subtraction per bin. */
  def windowedDrift(tv: Dataset[TimedValue], windowDur: String,
      watermarkDelay: String, lo: Long, bw: Long,
      baselineMilli: Map[Long, Long]): DataFrame = {
    import org.apache.spark.sql.functions.{window => timeWindow}
    val base = typedlit(baselineMilli)
    val baseSum = baselineMilli.values.sum
    tv.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"),
        expr(s"(CAST(value AS BIGINT) - ${lo}L) div ${bw}L").as("bin"))
      .groupBy(timeWindow(col("ts"), windowDur), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(timeWindow(window_time(col("window")), windowDur))
      .agg(collect_list(struct(col("bin"), col("cnt"))).as("bins"),
        sum(col("cnt")).as("n"))
      .select(col("window").getField("start").as("window_start"), col("n"),
        (aggregate(col("bins"), lit(0L), (acc, b) =>
          acc + abs(intDiv(lit(1000L) * b.getField("cnt"), col("n"))
            - coalesce(element_at(base, b.getField("bin")), lit(0L))))
          + (lit(baseSum) - aggregate(col("bins"), lit(0L), (acc, b) =>
            acc + coalesce(element_at(base, b.getField("bin")), lit(0L)))))
          .as("l1_milli"))
  }

  /** Windowed categorical mix drift — the streaming twin of
    * operators.Profiling.mixDriftOn against a FIXED baseline mix
    * (yesterday's corpus category proportions in milli, shipped as
    * literals — the same baseline discipline as [[windowedDrift]]).
    * Per closed window: the observed count and the L1 mix distance
    * Σ_present |f_w − f_base| + Σ_absent f_base, all integer milli —
    * a category the stream stops emitting still charges its baseline
    * mass, exactly like an absent bin in [[windowedDrift]].
    *
    * State per open window is ≤ k category counters,
    * watermark-evicted — the mix compresses to k counters however
    * high the event rate, which is the point under a 100 TB/day
    * firehose. The chained two-aggregation append-mode mechanism is
    * [[windowedDistinct]]'s. */
  def windowedMixDrift(tv: Dataset[TimedValue], windowDur: String,
      watermarkDelay: String, baselineMilli: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.functions.{window => timeWindow}
    val base = typedlit(baselineMilli)
    val baseSum = baselineMilli.values.sum
    tv.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("value").as("category"))
      .groupBy(timeWindow(col("ts"), windowDur), col("category"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(timeWindow(window_time(col("window")), windowDur))
      .agg(collect_list(struct(col("category"), col("cnt"))).as("cats"),
        sum(col("cnt")).as("n"))
      .select(col("window").getField("start").as("window_start"), col("n"),
        (aggregate(col("cats"), lit(0L), (acc, c) =>
          acc + abs(intDiv(lit(1000L) * c.getField("cnt"), col("n"))
            - coalesce(element_at(base, c.getField("category")), lit(0L))))
          + (lit(baseSum) - aggregate(col("cats"), lit(0L), (acc, c) =>
            acc + coalesce(element_at(base, c.getField("category")), lit(0L)))))
          .as("mix_l1_milli"))
  }

  /** Windowed Count-Min heavy-hitter monitor — the streaming twin of
    * operators.Sketches.cmsTopK: each closed event-time window reports
    * CMS frequency estimates for a FIXED probe set (the heavy-hitter
    * candidates a batch pass nominated, shipped as literals — the same
    * baseline discipline as [[windowedDrift]]).
    *
    * State per open window is the sketch itself: ≤ d·w = 64 exact
    * integer cells, watermark-evicted — never per-token counters, which
    * is the point of CMS under a 100 TB/day token firehose. Two chained
    * stateful aggregations in append mode (the [[windowedDistinct]]
    * mechanism): per-(window, row, slot) counts, then one bounded
    * per-window reduction taking each probe's min over its d cells
    * (absent cell = exact zero). Slots hash with the SAME column/scalar
    * pair as the batch sketch (Sketches.cmsSlotCols/cmsSlotsScalar), so
    * a closed window's estimate is bit-identical to the batch CMS over
    * the same rows (spec-proven). */
  def windowedCms(tv: Dataset[TimedValue], windowDur: String,
      watermarkDelay: String, probes: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{window => timeWindow}
    require(probes.nonEmpty, "windowedCms needs at least one probe token")
    val cells = tv.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("ts") +: Sketches.cmsSlotCols(col("value")): _*)
      .selectExpr("ts", "stack(4, 0, s0, 1, s1, 2, s2, 3, s3) AS (r, slot)")
      .groupBy(timeWindow(col("ts"), windowDur), col("r"), col("slot"))
      .agg(count(lit(1)).as("cnt"))
    // one min-cell aggregate per (probe, hash row); absent cell = 0
    val perProbeRow = probes.zipWithIndex.flatMap { case (p, pi) =>
      Sketches.cmsSlotsScalar(p).zipWithIndex.map { case (s, r) =>
        min(when(col("r") === r && col("slot") === s, col("cnt"))).as(s"p${pi}_r$r")
      }
    }
    val est = probes.indices.map { pi =>
      least((0 until Sketches.CmsHashes.length)
        .map(r => coalesce(col(s"p${pi}_r$r"), lit(0L))): _*).as(s"e$pi")
    }
    val stacked = probes.zipWithIndex
      .map { case (p, pi) => s"'${p.replace("'", "''")}', e$pi" }
      .mkString(", ")
    cells
      .groupBy(timeWindow(window_time(col("window")), windowDur))
      .agg(perProbeRow.head, perProbeRow.tail: _*)
      .select(col("window").getField("start").as("window_start") +: est: _*)
      .selectExpr("window_start",
        s"stack(${probes.length}, $stacked) AS (token, cms_est)")
  }

  /** Running distinct-`value` estimate per key. */
  def distinctByKey(kv: Dataset[KeyedValue]): Dataset[DistinctEstimate] = {
    import kv.sparkSession.implicits._
    kv.groupByKey(_.key)
      .mapGroupsWithState[Array[Byte], DistinctEstimate](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[Array[Byte]]) =>
          val reg = state.getOption.getOrElse(new Array[Byte](Sketches.HllM))
          rows.foreach(r => Sketches.hllUpdate(reg, r.value))
          state.update(reg)
          DistinctEstimate(key, Sketches.hllEstimate(reg))
      }
  }
}
