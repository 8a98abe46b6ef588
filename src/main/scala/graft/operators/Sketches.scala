package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PolyHash => PolyHashExpr}
import org.apache.spark.sql.graft.ColumnBridge

/** Mergeable sketches — the 100 TB cardinality/frequency primitives.
  *
  * Exact `count_distinct` and per-key exact counts are the two
  * aggregations that stop scaling first: both shuffle every distinct
  * value. A sketch caps the shuffled state at a constant (registers /
  * counter cells) per group regardless of input size, and merges
  * associatively, so map-side partials combine like any other agg.
  * Spark ships HLL/CMS (`approx_count_distinct`,
  * `count_min_sketch`) — but their hash (xxhash64) is engine-private,
  * so results cannot be replayed by another engine. These variants
  * re-derive both sketches over the repo's deterministic polynomial
  * hash + an integer avalanche finalizer: every register value, and
  * therefore every estimate, is reproducible bit-for-bit in DuckDB.
  * Swap the hash for xxhash64 when cross-engine parity is not needed;
  * the plan shape is identical.
  *
  * Scale shape (both sketches): one narrow scan projecting hashes, one
  * map-side-combined shuffle of at most (groups × registers) rows, one
  * tiny finishing agg. No distinct, no windows. Reference anchor: the
  * reference has no approximate layer at all — its only aggregation is
  * whole-window OHLC buffering (/root/reference/7_ohlc.py:83-121);
  * sketches are part of the beyond-reference training-data tier.
  */
object Sketches {

  /** HLL registers (m). 256 → relative error ≈ 1.04/√256 ≈ 6.5%. */
  private[graft] val HllM = 256
  /** Bias constant α·1000 for m=256: round(0.7213/(1 + 1.079/256)·1000). */
  private[graft] val AlphaMilli = 719L
  /** α·m²·2^25, milli-scaled: numerator of the raw estimator (the
    * register sum below is scaled by 2^25 to stay integral). */
  private[graft] val HllConstMilli: Long = AlphaMilli * HllM * HllM * 33554432L
  /** Linear-counting table, milli-scaled: LcMilli(v) = round(m·ln(m/v)·1000)
    * for v = 1..m−1 empty registers (index 0 unused). ln() runs HERE, at
    * plan-build time — the runtime (and the oracle, which embeds the same
    * literals) does a table lookup, so no transcendental ever has to agree
    * across engines. */
  private[graft] val LcMilli: Seq[Long] =
    0L +: (1 until HllM).map(v => Math.round(HllM * math.log(HllM.toDouble / v) * 1000))
  /** Raw-estimate cutoff below which linear counting wins: 2.5·m·1000. */
  private[graft] val LcCutoffMilli = 2500L * HllM

  /** CMS geometry: d=4 hash rows × w=16 cells. w is deliberately tiny so
    * the sf0.01 corpus (31 distinct tokens) actually collides and the
    * min-over-rows estimator is exercised; at corpus scale w is the knob
    * (2^20 cells ≈ 8 MB per row of exact-integer counters). */
  private[graft] val CmsW = 16
  private[graft] val CmsHashes = Seq((31L, 0L), (37L, 7L), (41L, 11L), (43L, 13L))

  /** The d slot columns of a value under the CMS hash rows — shared by
    * the batch sketch and the streaming windowed twin. */
  private[graft] def cmsSlotCols(c: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    CmsHashes.zipWithIndex.map { case ((m, off), i) =>
      (avalanche32(polyHashWith(c, m, off)) % CmsW).as(s"s$i")
    }

  /** Scalar twin of [[cmsSlotCols]] — bit-identical by construction
    * (mix32 == avalanche32, HashOps.polyHash == the PolyHash column). */
  private[graft] def cmsSlotsScalar(value: String): Seq[Long] =
    CmsHashes.map { case (m, off) =>
      mix32(graft.functions.HashOps.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(value), m, off)) % CmsW
    }

  /** 32-bit avalanche finalizer (xor-shift-multiply, twice, then a final
    * xor-shift): the standard integer mixer shape. The polynomial hash
    * alone has no avalanche — a short decimal string never wraps the
    * 2^31−1 modulus, so its high bits are structured and HLL's
    * leading-zero statistic would be garbage. Plain long arithmetic
    * (xor / shift / multiply / mod 2^32), identical in DuckDB. */
  def avalanche32(h: Column): Column = {
    def r(x: Column): Column =
      (x.bitwiseXOR(shiftright(x, 16)) * lit(73244475L)) % lit(4294967296L)
    val m = r(r(h))
    m.bitwiseXOR(shiftright(m, 16))
  }

  private def polyHashWith(c: Column, mult: Long, init: Long): Column =
    ColumnBridge.column(PolyHashExpr(ColumnBridge.expression(c.cast("string")), mult, init))

  /** Mixed 32-bit hash of any value via its decimal/string form. */
  def hash32(c: Column): Column = avalanche32(polyHashWith(c, 31L, 0L))

  /** Independent second hash (multiplier 37, offset 7) — the pair that
    * double-hashing constructions (bloom probes) derive their k probe
    * positions from. */
  def hash37(c: Column): Column = avalanche32(polyHashWith(c, 37L, 7L))

  /** (bucket, rho) projection of a mixed hash column — the shared front
    * of the batch AND windowed-streaming estimators.
    * ρ = clz(top-24-bits) + 1; w = x >> 8 (the bucket uses the low
    * 8 bits). */
  private[graft] def hllRhoCols(x: Column): Seq[Column] = Seq(
    (x % HllM).as("bucket"),
    when(shiftright(x, 8) === 0, 25L)
      .otherwise(lit(25L) - length(bin(shiftright(x, 8)))).as("rho"))

  /** Aggregates over per-bucket max-ρ rows: scaled register sum + empty
    * count — shared by batch and windowed-streaming estimators. */
  private[graft] val hllAggCols: Seq[Column] = Seq(
    (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(25 - rho AS INT))"))
      + (lit(HllM.toLong) - count(lit(1))) * 33554432L).as("zs"),
    (lit(HllM.toLong) - count(lit(1))).as("n_zero_buckets"))

  /** zs/n_zero_buckets → `hll_est`, the milli-scaled branch chain. Any
    * change here reaches the batch report, the windowed stream, and (via
    * the spec's bit-identity assertions) flags the scalar twin. */
  private[graft] def withHllEstimate(df: DataFrame): DataFrame = df
    .withColumn("raw_milli", expr(s"${HllConstMilli}L div zs"))
    .withColumn("est_milli",
      when(col("n_zero_buckets") > 0 && col("raw_milli") < LcCutoffMilli,
        element_at(typedLit(LcMilli), (col("n_zero_buckets") + 1).cast("int")))
        .otherwise(col("raw_milli")))
    .withColumn("hll_est", expr("est_milli div 1000"))

  /** Generic per-group HLL estimate as column algebra: groups `df` by
    * `keys` and estimates the distinct count of `value`. Emits
    * keys ++ (n_zero_buckets, hll_est). Σ2^−ρ is kept scaled by 2^25 so
    * the harmonic mean is exact BIGINT division; α and the LC table are
    * milli-scaled integer literals shared with the oracle — and with
    * the scalar streaming twin below, which must produce identical
    * estimates. */
  def hllEstimateBy(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val kc = keys.map(col)
    withHllEstimate(
      df.select(kc :+ hash32(value).as("x"): _*)
        .select(kc ++ hllRhoCols(col("x")): _*)
        .groupBy(kc :+ col("bucket"): _*)
        .agg(max("rho").as("rho"))
        .groupBy(kc: _*)
        .agg(hllAggCols.head, hllAggCols.tail: _*))
      .select(kc ++ Seq(col("n_zero_buckets"), col("hll_est")): _*)
  }

  /** HyperLogLog distinct-count report over `events`: per event_type,
    * the cardinality of event_id (high — exercises the raw harmonic
    * estimator) and user_id (low — exercises the linear-counting
    * branch), next to the exact count for verification. At 100 TB the
    * exact column is dropped and only the register shuffle remains:
    * ≤ m rows per (group × input partition) cross the wire, however
    * many trillion rows scanned. */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir).selectExpr(
      "event_type",
      "stack(2, 'event_id', event_id, 'user_id', user_id) AS (column_name, val)")
    val est = hllEstimateBy(src, Seq("event_type", "column_name"), col("val"))
    val exact = src.groupBy("event_type", "column_name")
      .agg(count_distinct(col("val")).as("n_exact"))
    est.join(exact, Seq("event_type", "column_name"))
      .select(col("event_type"), col("column_name"), col("n_exact"),
        col("n_zero_buckets"), col("hll_est"))
  }

  /** Exact distinct users per event type via the chunked-bitmap
    * Aggregator ([[graft.functions.BitmapDistinct]]) next to the
    * built-in exact count — the verification column, dropped at scale
    * exactly like [[hllDistinct]]'s: what remains is one aggregation
    * whose shuffled state is popcount-dense bitmap chunks, not the raw
    * id population the Expand-based exact count ships. */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val bd = udaf(new graft.functions.BitmapDistinct())
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(bd(col("user_id")).as("n_users"),
        count_distinct(col("user_id")).as("n_exact"))
  }

  // ---- scalar twin (stateful streaming) --------------------------------

  /** Scalar form of [[avalanche32]] — bit-identical by construction. */
  private[graft] def mix32(h0: Long): Long = {
    def r(x: Long): Long = ((x ^ (x >>> 16)) * 73244475L) % 4294967296L
    val m = r(r(h0))
    m ^ (m >>> 16)
  }

  /** Scalar form of [[hash32]]. */
  private[graft] def hash32Scalar(value: String): Long =
    mix32(graft.functions.HashOps.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(value), 31L, 0L))

  /** Fold one value into an m-register HLL state (one byte per
    * register — the entire per-key streaming state is HllM bytes). */
  private[graft] def hllUpdate(reg: Array[Byte], value: String): Unit = {
    val x = hash32Scalar(value)
    val bucket = (x % HllM).toInt
    val w = x >>> 8
    val rho =
      if (w == 0) 25 else 25 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > reg(bucket)) reg(bucket) = rho.toByte
  }

  /** Estimate from a register array — the same milli-scaled integer
    * arithmetic as [[hllEstimateBy]]'s final projection, so a streaming
    * state fed the same values yields the identical estimate. */
  private[graft] def hllEstimate(reg: Array[Byte]): Long = {
    var zs = 0L; var v = 0; var i = 0
    while (i < HllM) {
      zs += 1L << (25 - reg(i))
      if (reg(i) == 0) v += 1
      i += 1
    }
    if (v == HllM) return 0L // no values ever folded in — a state the
    // batch form can't reach (SQL emits no row for an empty group), but
    // the scalar API can be handed
    val raw = HllConstMilli / zs
    (if (v > 0 && raw < LcCutoffMilli) LcMilli(v) else raw) / 1000
  }

  /** Sketch-algebra drill: HLL registers are a MERGEABLE summary, and
    * this query proves it end to end — per-event_type user sketches,
    * the register-max UNION of those per-type sketches, and the sketch
    * built directly over all rows, side by side. The union row and the
    * direct row must carry the SAME estimate bit-for-bit: max-per-
    * bucket over partial registers is exactly the register state the
    * full scan produces.
    *
    * This is the property that makes sketches composable warehouse
    * objects at 100 TB: per-partition/per-day sketches roll up to any
    * coarser grain (week, global) by register max — ≤ m tiny rows per
    * group move, the data is never rescanned. */
  def hllUnion(spark: SparkSession, dir: String): DataFrame = {
    val rho = Tables.events(spark, dir)
      .select(col("event_type"), hash32(col("user_id")).as("x"))
      .select(col("event_type") +: hllRhoCols(col("x")): _*)
    val perTypeReg = rho.groupBy(col("event_type"), col("bucket"))
      .agg(max("rho").as("rho"))
    val perType = withHllEstimate(
        perTypeReg.groupBy(col("event_type"))
          .agg(hllAggCols.head, hllAggCols.tail: _*))
      .select(col("event_type").as("scope"), col("n_zero_buckets"), col("hll_est"))
    val unionEst = withHllEstimate(
        perTypeReg.groupBy(col("bucket")).agg(max("rho").as("rho"))
          .agg(hllAggCols.head, hllAggCols.tail: _*))
      .select(lit("union(types)").as("scope"), col("n_zero_buckets"), col("hll_est"))
    val direct = withHllEstimate(
        rho.groupBy(col("bucket")).agg(max("rho").as("rho"))
          .agg(hllAggCols.head, hllAggCols.tail: _*))
      .select(lit("direct(all)").as("scope"), col("n_zero_buckets"), col("hll_est"))
    perType.unionByName(unionEst).unionByName(direct)
  }

  /** Count-Min heavy-hitter report over the corpus vocabulary: exact
    * top-20 token counts next to their CMS estimates (est ≥ exact by
    * construction; equality when no collision). The sketch is built
    * from per-token totals, not per-occurrence rows — hashing each
    * distinct token once and weighting by its count is algebraically
    * identical to incrementing per occurrence, and turns |corpus| hash
    * evaluations into |vocabulary|. */
  def cmsTopK(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val counts = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val slotCols = cmsSlotCols(col("token"))
    val hashed = counts.select(col("token") +: col("n") +: slotCols: _*)
    val cells = hashed.selectExpr(
      "stack(4, 0, s0, 1, s1, 2, s2, 3, s3) AS (r, slot)", "n")
    val sketch = cells.groupBy("r", "slot").agg(sum("n").as("cnt"))
    val probes = hashed.orderBy(col("n").desc, col("token")).limit(20)
      .selectExpr("token", "n AS n_exact",
        "stack(4, 0, s0, 1, s1, 2, s2, 3, s3) AS (r, slot)")
    probes.join(sketch, Seq("r", "slot"))
      .groupBy("token", "n_exact").agg(min("cnt").as("cms_est"))
  }

  /** Histogram-sketch quantiles — the third classic sketch: approx
    * p50/p90/p99 of `value` per event_type from a fixed 1000-bin
    * integer histogram over cents.
    *
    * Exact percentiles need a per-group sort of every value; the
    * histogram caps shuffled state at ≤ bins rows per group (mergeable:
    * bin counts add), and the estimate is the lower edge of the bin
    * where the running count crosses ⌈p·n/100⌉ — error bounded by one
    * bin width. All integer (cents, integer-division bin width and
    * edges), so the estimate replays exactly. The cumulative window
    * runs over the SKETCH (≤ bins × groups rows), never the data — the
    * scale-banned shape is a window over the corpus, not over a
    * constant-size summary. */
  def quantileHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("cents"))
    val bounds = cents.groupBy("event_type")
      .agg(min("cents").as("lo"), max("cents").as("hi"), count(lit(1)).as("n"))
      .withColumn("bw", expr("(hi - lo + 1000) div 1000"))
    val cum = cents.join(broadcast(bounds.select("event_type", "lo", "bw")), "event_type")
      .select(col("event_type"), expr("(cents - lo) div bw").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("event_type").orderBy("bin")))
    import spark.implicits._
    val tgt = bounds.crossJoin(broadcast(Seq(50, 90, 99).toDF("p")))
      .withColumn("target", expr("(p * n + 99) div 100"))
    tgt.join(cum, Seq("event_type"))
      .filter(col("cum") >= col("target"))
      .groupBy("event_type", "p", "lo", "bw").agg(min("bin").as("bin"))
      .select(col("event_type"), col("p"),
        (col("lo") + col("bin") * col("bw")).as("est_cents"))
  }

  /** Bloom geometry: m=32768 bits as 1024×32-bit words (32-bit words so
    * no shift ever touches the BIGINT sign bit in either engine), k=4
    * probes by double hashing h1 + i·h2. Sized for ~0.8% FP at the
    * sf0.01 dim (~2.9k keys) — real false positives exist AND the
    * filter is actually selective; at scale m is the knob (2^30 bits =
    * 128 MB filters a trillion-row fact). */
  private val BloomBits = 32768L
  private val BloomK = 4

  /** Membership-sketch report — the explicit form of a runtime join
    * filter: build a bloom over the URGENT orders' keys, test every
    * distinct lineitem key against it, and report pass/true/false-
    * positive counts. The broadcast is 1024 words (~8 KB as BIGINT rows) however
    * many keys the dim holds — the poor-man's semi-join when shipping
    * the key set itself is too big, and unlike Spark's injected
    * `might_contain` (spec-proven separately) this one's bits replay
    * in DuckDB. No false negatives by construction: every true match
    * passes. */
  def bloomReport(spark: SparkSession, dir: String): DataFrame = {
    def probes(df: DataFrame): DataFrame = df
      .select(col("key"), hash32(col("key")).as("h1"), hash37(col("key")).as("h2"))
      .select(col("key"), explode(array((0 until BloomK).map(i =>
        (col("h1") + lit(i.toLong) * col("h2")) % BloomBits): _*)).as("probe"))
      .select(col("key"), expr("probe div 32").as("word"), (col("probe") % 32).as("bit"))
    val dimKeys = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("key"))
    // bitset pulled to the driver as the geometry-bounded literal array
    // (m/32 = 1024 longs regardless of data) and tested with the fused
    // BloomMightContain probe INSIDE the fact scan — the same machinery
    // [[bloomJoin]] uses and proves oracle-equivalent. The former form
    // exploded every distinct fact key ×k probes into a broadcast join
    // + a re-aggregation by key: two extra corpus-sized passes for the
    // identical per-key verdict (r17, guide §2.4).
    val wordRows = probes(dimKeys).groupBy("word")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").as("bits"))
      .collect()
    val words = Array.fill((BloomBits / 32).toInt)(0L)
    wordRows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val passes = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("key").cast("long")),
        words.toSeq, BloomK, BloomBits))
    val verdicts = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("key")).distinct()
      .select(col("key"), when(passes, lit(1L)).otherwise(lit(0L)).as("all_set"))
    verdicts
      .join(dimKeys.distinct().withColumn("is_true", lit(1L)), Seq("key"), "left")
      .agg(sum(col("all_set")).as("n_keys_pass"),
        sum(coalesce(col("is_true"), lit(0L))).as("n_keys_true"),
        sum(when(col("all_set") === 1 && col("is_true").isNull, 1L).otherwise(0L))
          .as("n_false_positives"))
  }

  /** Bloom-PRUNED dimension join — [[bloomReport]]'s sketch put to its
    * real work: the explicit form of a runtime join filter (what
    * Spark's InjectRuntimeFilter synthesizes, here with bits that
    * replay in the oracle). The URGENT orders' keys compress to a
    * 1024-word bloom pulled to the driver — bounded by GEOMETRY
    * (m/32 = 1024 longs ≈ 8 KB regardless of data; at scale m is the
    * knob and the words ship as a broadcast variable) — and the fact
    * scan tests all four probes against that literal array, so the
    * prune happens INSIDE the lineitem scan stage, before any
    * exchange. False positives (~0.8% at this geometry) survive the
    * filter but die in the real equi-join that follows, so the result
    * is bit-identical to the unpruned join — which is exactly what the
    * oracle runs. At 100 TB this is the difference between shuffling
    * the full fact table and shuffling the ~matching fraction. */
  def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val wordRows = urgent
      .select(col("o_orderkey").as("key"))
      .select(col("key"), hash32(col("key")).as("h1"), hash37(col("key")).as("h2"))
      .select(explode(array((0 until BloomK).map(i =>
        (col("h1") + lit(i.toLong) * col("h2")) % BloomBits): _*)).as("probe"))
      .select(expr("probe div 32").as("word"), (col("probe") % 32).as("bit"))
      .groupBy("word")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").as("bits"))
      .collect()
    val words = Array.fill((BloomBits / 32).toInt)(0L)
    wordRows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    // fused probe: both hashes once per row, k probes in one loop, the
    // bitset a single codegen reference. The column-algebra cascade
    // (k conjoined element_at probes over a literal array column) is
    // 8× slower — projection collapse re-derives h1/h2 inside every
    // probe subexpression and inlines the 1024-word literal 2k times.
    // The key stays a LONG into the probe (decimal-digit arithmetic
    // hash) — the previous cast("string") allocated a UTF8String per
    // fact row before any hashing could start.
    val passes = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          col("l_orderkey").cast("long")),
        words.toSeq, BloomK, BloomBits))
    val pruned = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
      .filter(passes)
    def cents(c: Column): Column = round(c * 100, 0).cast("long")
    pruned.join(urgent.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  // ---- KMV (k-minimum-values) sketch -----------------------------------

  /** KMV sketch size. 64 → relative error ≈ 1/√(k−2) ≈ 13%; the demo
    * corpus has 150 users per type, so the estimator branch (not the
    * exact small-set branch) is exercised. */
  private[graft] val KmvK = 64
  /** Hash domain size: hash32/avalanche32 emit values in [0, 2^32). */
  private[graft] val KmvDomain = 4294967296L

  /** sketch ARRAY<BIGINT> → (n_sketch, kmv_est): THE estimator
    * projection, shared by the batch report and (via the scalar twin
    * below and the spec's bit-identity assertion) the streaming state. */
  private[graft] def withKmvEstimate(df: DataFrame): DataFrame = df
    .withColumn("n_sketch", size(col("sketch")).cast("long"))
    .withColumn("kmv_est",
      when(col("n_sketch") < KmvK, col("n_sketch"))
        .otherwise(expr(s"(${KmvK - 1} * ${KmvDomain}L) div element_at(sketch, $KmvK)")))

  /** Scalar twin of [[withKmvEstimate]] over an ascending bottom-k
    * sketch — the streaming state's estimator. */
  private[graft] def kmvEstimate(sk: List[Long]): Long =
    if (sk.sizeIs < KmvK) sk.size.toLong
    else (KmvK - 1).toLong * KmvDomain / sk.last

  /** Per-group KMV sketches of user_id — the bottom-k DISTINCT hashes,
    * kept bounded INSIDE the aggregator (functions.BottomKDistinct):
    * each map task forwards ≤ k longs per group, never the distinct
    * value set itself. Returns (event_type, sketch ARRAY<BIGINT>). */
  private def kmvSketches(spark: SparkSession, dir: String): DataFrame = {
    val bottomK = graft.functions.TextFunctions.bottomKDistinctAgg(KmvK)
    Tables.events(spark, dir)
      .select(col("event_type"), hash32(col("user_id")).as("h"))
      .groupBy("event_type")
      .agg(bottomK(col("h")).as("sketch"))
  }

  /** Generic per-group KMV distinct estimate: the sketch-based sibling
    * of [[hllEstimateBy]], with set-algebra-capable state. Emits
    * keys ++ (n_sketch, kmv_est). */
  def kmvEstimateBy(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val bottomK = graft.functions.TextFunctions.bottomKDistinctAgg(KmvK)
    val kc = keys.map(col)
    withKmvEstimate(
      df.select(kc :+ hash32(value).as("h"): _*)
        .groupBy(kc: _*)
        .agg(bottomK(col("h")).as("sketch")))
      .select(kc ++ Seq(col("n_sketch"), col("kmv_est")): _*)
  }

  /** KMV distinct-count report per event_type: when the sketch is not
    * full the set IS the distinct set (exact count); when full, the
    * k-th minimum estimates density: est = (k−1)·2^32 div h_k — pure
    * integer arithmetic, replayed bit-for-bit by the oracle. Unlike
    * HLL, a KMV sketch also supports set operations (see the Jaccard
    * report below) — the reason to keep both in the toolbox. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val est = withKmvEstimate(kmvSketches(spark, dir))
      .select("event_type", "n_sketch", "kmv_est")
    val exact = Tables.events(spark, dir).groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    est.join(exact, "event_type")
      .select("event_type", "n_exact", "n_sketch", "kmv_est")
  }

  /** KMV set algebra: estimated |A∪B|, |A∩B|, |A\B|, |B\A| for every
    * event-type pair, beside the exact union/intersection — the full
    * multiset-operations story (Beyer et al. 2007) that makes KMV the
    * planning sketch HLL cannot be. The union sketch is the bottom-k
    * of the merged sketches (itself a valid KMV sample of A∪B), the
    * intersection estimate rides its shared fraction
    * (K∩/|merged| · Û), and the differences follow by inclusion-
    * exclusion over already-estimated terms, clamped at zero — all
    * integer milli-free arithmetic replayed bit-for-bit by the oracle.
    *
    * Scale shape: after the one sketch-building shuffle, the pair join
    * touches G² sketch rows of ≤ k longs each — the corpus is never
    * read again. The exact columns exist for the report and drop out
    * at 100 TB. */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    val sk = withKmvEstimate(kmvSketches(spark, dir))
    val a = sk.select(col("event_type").as("type_a"), col("sketch").as("sk_a"),
      col("kmv_est").as("est_a"))
    val b = sk.select(col("event_type").as("type_b"), col("sketch").as("sk_b"),
      col("kmv_est").as("est_b"))
    val est = a.join(b, col("type_a") < col("type_b"))
      .withColumn("merged",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, KmvK))
      .withColumn("msz", size(col("merged")).cast("long"))
      .withColumn("union_est",
        when(col("msz") < KmvK, col("msz"))
          .otherwise(expr(s"(${KmvK - 1} * ${KmvDomain}L) div element_at(merged, $KmvK)")))
      .withColumn("n_shared",
        expr("size(filter(merged, v -> array_contains(sk_a, v) AND array_contains(sk_b, v)))")
          .cast("long"))
      .withColumn("inter_est", expr("n_shared * union_est div msz"))
    val users = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val ua = users.select(col("event_type").as("type_a"), col("user_id"))
    val ub = users.select(col("event_type").as("type_b"), col("user_id"))
    val inter = ua.join(ub, ua("user_id") === ub("user_id") &&
        col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_inter"))
    val card = users.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    est
      .join(card.select(col("event_type").as("type_a"), col("n").as("n_a")), "type_a")
      .join(card.select(col("event_type").as("type_b"), col("n").as("n_b")), "type_b")
      .join(inter, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L)))
          .as("n_union_exact"),
        col("union_est"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter_exact"),
        col("inter_est"),
        greatest(col("est_a") - col("inter_est"), lit(0L)).as("diff_ab_est"),
        greatest(col("est_b") - col("inter_est"), lit(0L)).as("diff_ba_est"))
  }

  /** KMV set-similarity report: estimated vs exact Jaccard of the user
    * sets of every event-type pair. The union sketch of A and B is the
    * bottom-k of (sketch_A ∪ sketch_B) — itself a valid KMV sample of
    * A ∪ B — and the fraction of it present in BOTH sketches estimates
    * |A∩B| / |A∪B| (Beyer et al., "On synopses for distinct-value
    * estimation under multiset operations", 2007). At 100 TB the exact
    * columns are dropped: the pair join then touches only G² sketch
    * rows of k longs each, never the corpus. */
  def kmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sk = kmvSketches(spark, dir)
    val a = sk.select(col("event_type").as("type_a"), col("sketch").as("sk_a"))
    val b = sk.select(col("event_type").as("type_b"), col("sketch").as("sk_b"))
    val est = a.join(b, col("type_a") < col("type_b"))
      .withColumn("merged",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, KmvK))
      .select(col("type_a"), col("type_b"),
        expr("1000L * size(filter(merged, v -> array_contains(sk_a, v) AND array_contains(sk_b, v))) div size(merged)")
          .as("jaccard_est_milli"))
    val users = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val ua = users.select(col("event_type").as("type_a"), col("user_id"))
    val ub = users.select(col("event_type").as("type_b"), col("user_id"))
    val exact = ua.join(ub, ua("user_id") === ub("user_id") &&
        col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_inter"))
      .join(users.groupBy(col("event_type").as("type_a"))
        .agg(count(lit(1)).as("n_a")), "type_a")
      .join(users.groupBy(col("event_type").as("type_b"))
        .agg(count(lit(1)).as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"),
        expr("1000L * n_inter div (n_a + n_b - n_inter)").as("jaccard_exact_milli"))
    // a fully disjoint pair has no row in `exact` (its intersection join
    // is empty) but a real Jaccard of zero — left join, not inner
    est.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("jaccard_exact_milli"), lit(0L)).as("jaccard_exact_milli"),
        col("jaccard_est_milli"))
  }

  /** Join-cardinality estimation from a coordinated bottom-k key
    * sample — the cost-based-optimizer primitive: |A ⋈ B on key| =
    * Σ_key f_A·f_B, here the self-join events⋈events on user_id
    * (F₂ = Σ f², the second frequency moment — THE skew statistic).
    *
    * Estimator: the bottom-k hash sample of the key domain is a
    * uniform sample of DISTINCT keys (KMV), so F̂₂ = D̂ · Σ_sample f²
    * div m with D̂ the KMV distinct estimate, m the realized sample
    * size, and per-key f computed exactly but ONLY for sampled keys.
    * All integer arithmetic over the deterministic hash — replays in
    * the oracle bit-for-bit.
    *
    * Scale shape: ONE shuffle to the (user, f) grain; the sketch is a
    * k-long bounded aggregate; the sample filter `h ≤ τ` re-scans the
    * user-grain frame with a broadcast 1-row τ. The exact d/F₂ columns
    * are verification-only — at 100 TB they drop, and with them the
    * only full-width aggregate: the estimator itself touches k keys.
    * This is how a planner sizes a shuffle join WITHOUT running it. */
  def joinCardEstimate(spark: SparkSession, dir: String): DataFrame = {
    val bottomK = graft.functions.TextFunctions.bottomKDistinctAgg(KmvK)
    val counts = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("f"))
      .withColumn("h", hash32(col("user_id")))
    val tau = counts.agg(bottomK(col("h")).as("sketch"))
      .select(size(col("sketch")).cast("long").as("n_sketch"),
        when(size(col("sketch")) < KmvK, lit(KmvDomain))
          .otherwise(element_at(col("sketch"), KmvK)).as("tau"),
        when(size(col("sketch")) < KmvK, size(col("sketch")).cast("long"))
          .otherwise(expr(s"(${KmvK - 1} * ${KmvDomain}L) div element_at(sketch, $KmvK)"))
          .as("d_est"))
    val sample = counts.crossJoin(broadcast(tau))
      .filter(col("h") <= col("tau"))
      .groupBy(col("d_est"))
      .agg(count(lit(1)).as("m"), sum(col("f") * col("f")).as("s2"))
    val exact = counts.agg(count(lit(1)).as("d_exact"),
      sum(col("f") * col("f")).as("f2_exact"))
    sample.crossJoin(broadcast(exact))
      .select(col("d_est"), col("d_exact"), col("m"),
        expr("d_est * s2 div m").as("f2_est"), col("f2_exact"),
        expr("1000 * abs(d_est * s2 div m - f2_exact) div f2_exact").as("err_milli"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv_distinct" -> ((s, d) => kmvDistinct(s, d)),
    "sketch_bitmap_distinct" -> ((s, d) => bitmapDistinct(s, d)),
    "sketch_kmv_jaccard" -> ((s, d) => kmvJaccard(s, d)),
    "sketch_kmv_setops" -> ((s, d) => kmvSetOps(s, d)),
    "sketch_hll_distinct" -> ((s, d) => hllDistinct(s, d)),
    "sketch_hll_union" -> ((s, d) => hllUnion(s, d)),
    "sketch_cms_topk" -> ((s, d) => cmsTopK(s, d)),
    "sketch_quantile_hist" -> ((s, d) => quantileHist(s, d)),
    "sketch_bloom_filter" -> ((s, d) => bloomReport(s, d)),
    "sketch_bloom_join" -> ((s, d) => bloomJoin(s, d)),
    "sketch_join_card" -> ((s, d) => joinCardEstimate(s, d)))

  // ---- oracle ----------------------------------------------------------

  /** The polynomial fold in DuckDB SQL, over `e` — keep this bound to a
    * named CTE column ONCE per hash: the avalanche below textually
    * duplicates its argument 8×, which is fine for a column reference
    * but would re-run the per-char fold 8× if inlined. */
  private[operators] def foldSql(e: String, mult: Long, init: Long): String =
    s"list_reduce(list_prepend(${init}::BIGINT, " +
      s"list_transform(string_split($e, ''), c -> ascii(c)::BIGINT)), " +
      s"(a, c) -> (a * $mult + c) % 2147483647)"

  /** The avalanche mixer over an (already-folded) column reference. */
  private[operators] def mixColSql(c: String): String = {
    val r1 = s"(xor($c, ($c) // 65536) * 73244475) % 4294967296"
    val r2 = s"(xor(($r1), ($r1) // 65536) * 73244475) % 4294967296"
    s"xor(($r2), ($r2) // 65536)"
  }

  private val lcSql = LcMilli.mkString("[", ",", "]")

  private val cmsFoldSql = CmsHashes.zipWithIndex.map { case ((m, s), i) =>
    s"${foldSql("token", m, s)} AS f$i"
  }.mkString(", ")

  private val cmsSlotSql = (0 until CmsHashes.length).map { i =>
    s"(${mixColSql(s"f$i")}) % $CmsW AS s$i"
  }.mkString(", ")

  /** Shared oracle front: distinct (event_type, user) pairs, their mixed
    * hashes, and the per-type bottom-64 sketch. The oracle states the
    * SEMANTIC bottom-k (sort + slice over the distinct hash set); the
    * engine's bounded aggregator must reproduce it exactly. */
  private val kmvSketchSql =
    s"""du AS (SELECT DISTINCT event_type, user_id FROM events),
       |h0 AS (SELECT event_type, ${foldSql("user_id::VARCHAR", 31L, 0L)} AS f FROM du),
       |h AS (SELECT DISTINCT event_type, ${mixColSql("f")} AS x FROM h0),
       |sk AS (SELECT event_type, (list_sort(list(x)))[:$KmvK] AS sketch
       |  FROM h GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    // the bitmap count is exact, so its oracle IS count(DISTINCT)
    "sketch_bitmap_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  count(DISTINCT user_id)::BIGINT AS n_exact
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "sketch_kmv_distinct" ->
      s"""WITH $kmvSketchSql,
         |est AS (SELECT event_type, len(sketch)::BIGINT AS n_sketch,
         |    CASE WHEN len(sketch) < $KmvK THEN len(sketch)::BIGINT
         |         ELSE (${KmvK - 1} * 4294967296) // sketch[$KmvK] END AS kmv_est
         |  FROM sk),
         |ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT e.event_type, ex.n_exact, e.n_sketch, e.kmv_est
         |FROM est e JOIN ex USING (event_type) ORDER BY 1""".stripMargin,
    "sketch_kmv_jaccard" ->
      s"""WITH $kmvSketchSql,
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    a.sketch AS sk_a, b.sketch AS sk_b
         |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
         |est AS (SELECT type_a, type_b,
         |    1000 * len(list_filter(merged,
         |      v -> list_contains(sk_a, v) AND list_contains(sk_b, v))) // len(merged)
         |      AS jaccard_est_milli
         |  FROM (SELECT *,
         |      (list_sort(list_distinct(list_concat(sk_a, sk_b))))[:$KmvK] AS merged
         |    FROM pairs)),
         |inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    count(*)::BIGINT AS n_inter
         |  FROM du a JOIN du b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |card AS (SELECT event_type, count(*)::BIGINT AS n FROM du GROUP BY 1),
         |ex AS (SELECT i.type_a, i.type_b,
         |    1000 * i.n_inter // (ca.n + cb.n - i.n_inter) AS jaccard_exact_milli
         |  FROM inter i
         |  JOIN card ca ON ca.event_type = i.type_a
         |  JOIN card cb ON cb.event_type = i.type_b)
         |SELECT e.type_a, e.type_b,
         |  coalesce(ex.jaccard_exact_milli, 0)::BIGINT AS jaccard_exact_milli,
         |  e.jaccard_est_milli::BIGINT AS jaccard_est_milli
         |FROM est e LEFT JOIN ex USING (type_a, type_b)
         |ORDER BY 1, 2""".stripMargin,
    "sketch_kmv_setops" ->
      s"""WITH $kmvSketchSql,
         |est0 AS (SELECT event_type, sketch,
         |    CASE WHEN len(sketch) < $KmvK THEN len(sketch)::BIGINT
         |         ELSE (${KmvK - 1} * 4294967296) // sketch[$KmvK] END AS kmv_est
         |  FROM sk),
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    a.sketch AS sk_a, b.sketch AS sk_b,
         |    a.kmv_est AS est_a, b.kmv_est AS est_b
         |  FROM est0 a JOIN est0 b ON a.event_type < b.event_type),
         |m AS (SELECT *,
         |    (list_sort(list_distinct(list_concat(sk_a, sk_b))))[:$KmvK] AS merged
         |  FROM pairs),
         |e AS (SELECT type_a, type_b, est_a, est_b,
         |    len(merged)::BIGINT AS msz,
         |    CASE WHEN len(merged) < $KmvK THEN len(merged)::BIGINT
         |         ELSE (${KmvK - 1} * 4294967296) // merged[$KmvK] END AS union_est,
         |    len(list_filter(merged, v -> list_contains(sk_a, v)
         |      AND list_contains(sk_b, v)))::BIGINT AS n_shared
         |  FROM m),
         |e2 AS (SELECT type_a, type_b, est_a, est_b, union_est,
         |    (n_shared * union_est) // msz AS inter_est
         |  FROM e),
         |inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    count(*)::BIGINT AS n_inter
         |  FROM du a JOIN du b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |card AS (SELECT event_type, count(*)::BIGINT AS n FROM du GROUP BY 1)
         |SELECT e2.type_a, e2.type_b,
         |  (ca.n + cb.n - coalesce(i.n_inter, 0))::BIGINT AS n_union_exact,
         |  e2.union_est,
         |  coalesce(i.n_inter, 0)::BIGINT AS n_inter_exact,
         |  e2.inter_est,
         |  greatest(e2.est_a - e2.inter_est, 0)::BIGINT AS diff_ab_est,
         |  greatest(e2.est_b - e2.inter_est, 0)::BIGINT AS diff_ba_est
         |FROM e2
         |JOIN card ca ON ca.event_type = e2.type_a
         |JOIN card cb ON cb.event_type = e2.type_b
         |LEFT JOIN inter i ON i.type_a = e2.type_a AND i.type_b = e2.type_b
         |ORDER BY 1, 2""".stripMargin,
    // per-type registers, register-max union, and the direct sketch —
    // the union and direct rows must agree exactly (mergeability)
    "sketch_hll_union" ->
      s"""WITH h0 AS (SELECT event_type, ${foldSql("user_id::VARCHAR", 31L, 0L)} AS hash FROM events),
         |h AS (SELECT event_type, ${mixColSql("hash")} AS x FROM h0),
         |r AS (SELECT event_type, x % $HllM AS bucket,
         |    CASE WHEN x // $HllM = 0 THEN 25 ELSE 25 - length(bin(x // $HllM)) END AS rho
         |  FROM h),
         |treg AS (SELECT event_type, bucket, max(rho) AS rho FROM r GROUP BY 1, 2),
         |scopes AS (
         |  SELECT event_type AS scope, bucket, rho FROM treg
         |  UNION ALL
         |  SELECT 'union(types)', bucket, max(rho) FROM treg GROUP BY 2
         |  UNION ALL
         |  SELECT 'direct(all)', bucket, max(rho) FROM r GROUP BY 2),
         |z AS (SELECT scope,
         |    (sum((1::BIGINT << (25 - rho)))::BIGINT + ($HllM - count(*))::BIGINT * 33554432) AS zs,
         |    ($HllM - count(*))::BIGINT AS n_zero_buckets
         |  FROM scopes GROUP BY 1)
         |SELECT scope, n_zero_buckets,
         |  ((CASE WHEN n_zero_buckets > 0 AND $HllConstMilli // zs < $LcCutoffMilli
         |         THEN ($lcSql)[n_zero_buckets + 1]
         |         ELSE $HllConstMilli // zs END) // 1000)::BIGINT AS hll_est
         |FROM z ORDER BY scope""".stripMargin,
    "sketch_hll_distinct" ->
      s"""WITH src AS (
         |  SELECT event_type, 'event_id' AS column_name, event_id AS val FROM events
         |  UNION ALL
         |  SELECT event_type, 'user_id', user_id FROM events),
         |h0 AS (SELECT event_type, column_name, ${foldSql("val::VARCHAR", 31L, 0L)} AS hash FROM src),
         |h AS (SELECT event_type, column_name, ${mixColSql("hash")} AS x FROM h0),
         |reg AS (
         |  SELECT event_type, column_name, x % $HllM AS bucket,
         |    max(CASE WHEN x // $HllM = 0 THEN 25 ELSE 25 - length(bin(x // $HllM)) END) AS rho
         |  FROM h GROUP BY 1, 2, 3),
         |z AS (
         |  SELECT event_type, column_name,
         |    (sum((1::BIGINT << (25 - rho)))::BIGINT + ($HllM - count(*))::BIGINT * 33554432) AS zs,
         |    ($HllM - count(*))::BIGINT AS n_zero_buckets
         |  FROM reg GROUP BY 1, 2),
         |ex AS (SELECT event_type, column_name, count(DISTINCT val)::BIGINT AS n_exact
         |  FROM src GROUP BY 1, 2)
         |SELECT z.event_type, z.column_name, ex.n_exact, z.n_zero_buckets,
         |  ((CASE WHEN z.n_zero_buckets > 0 AND $HllConstMilli // z.zs < $LcCutoffMilli
         |         THEN ($lcSql)[z.n_zero_buckets + 1]
         |         ELSE $HllConstMilli // z.zs END) // 1000)::BIGINT AS hll_est
         |FROM z JOIN ex USING (event_type, column_name)
         |ORDER BY 1, 2""".stripMargin,
    "sketch_cms_topk" ->
      s"""WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token FROM documents),
         |counts AS (SELECT token, count(*)::BIGINT AS n FROM toks GROUP BY 1),
         |folded AS (SELECT token, n, $cmsFoldSql FROM counts),
         |hashed AS (SELECT token, n, $cmsSlotSql FROM folded),
         |cells AS (SELECT unnest([0,1,2,3]) AS r, unnest([s0,s1,s2,s3]) AS slot, n FROM hashed),
         |sketch AS (SELECT r, slot, sum(n)::BIGINT AS cnt FROM cells GROUP BY 1, 2),
         |topk AS (SELECT token, n, s0, s1, s2, s3 FROM hashed ORDER BY n DESC, token LIMIT 20),
         |probes AS (SELECT token, n AS n_exact, unnest([0,1,2,3]) AS r, unnest([s0,s1,s2,s3]) AS slot FROM topk)
         |SELECT token, n_exact, min(cnt)::BIGINT AS cms_est
         |FROM probes JOIN sketch USING (r, slot)
         |GROUP BY 1, 2 ORDER BY n_exact DESC, token""".stripMargin,
    "sketch_quantile_hist" ->
      """WITH c AS (SELECT event_type, CAST(round(value*100,0) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type, min(cents) AS lo, max(cents) AS hi, count(*)::BIGINT AS n FROM c GROUP BY 1),
        |w AS (SELECT *, (hi - lo + 1000) // 1000 AS bw FROM b),
        |hist AS (SELECT c.event_type, (c.cents - w.lo) // w.bw AS bin, count(*)::BIGINT AS cnt
        |  FROM c JOIN w USING (event_type) GROUP BY 1, 2),
        |cum AS (SELECT event_type, bin, sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)::BIGINT AS cum
        |  FROM hist),
        |p(p) AS (VALUES (50), (90), (99)),
        |tgt AS (SELECT w.event_type, p.p, w.lo, w.bw, (p.p * w.n + 99) // 100 AS target
        |  FROM w CROSS JOIN p)
        |SELECT t.event_type, t.p, t.lo + min(c.bin) * t.bw AS est_cents
        |FROM tgt t JOIN cum c ON c.event_type = t.event_type AND c.cum >= t.target
        |GROUP BY 1, 2, t.lo, t.bw ORDER BY 1, 2""".stripMargin,
    "sketch_bloom_filter" ->
      s"""WITH dimk AS (SELECT o_orderkey AS key FROM orders
         |  WHERE o_orderpriority = '1-URGENT'),
         |dh AS (SELECT key, ${foldSql("key::VARCHAR", 31L, 0L)} AS f1,
         |    ${foldSql("key::VARCHAR", 37L, 7L)} AS f2 FROM dimk),
         |dp AS (SELECT key,
         |    unnest(list_transform([0, 1, 2, 3],
         |      i -> ((${mixColSql("f1")}) + i * (${mixColSql("f2")})) % $BloomBits)) AS probe
         |  FROM dh),
         |bloom AS (SELECT probe // 32 AS word,
         |    bit_or((1::BIGINT << (probe % 32)::INT))::BIGINT AS bits
         |  FROM dp GROUP BY 1),
         |fk AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
         |fh AS (SELECT key, ${foldSql("key::VARCHAR", 31L, 0L)} AS f1,
         |    ${foldSql("key::VARCHAR", 37L, 7L)} AS f2 FROM fk),
         |fp AS (SELECT key,
         |    unnest(list_transform([0, 1, 2, 3],
         |      i -> ((${mixColSql("f1")}) + i * (${mixColSql("f2")})) % $BloomBits)) AS probe
         |  FROM fh),
         |v AS (SELECT key,
         |    min(coalesce((b.bits >> (p.probe % 32)::INT) & 1, 0))::BIGINT AS all_set
         |  FROM (SELECT key, probe, probe // 32 AS word FROM fp) p
         |  LEFT JOIN bloom b USING (word) GROUP BY key)
         |SELECT sum(v.all_set)::BIGINT AS n_keys_pass,
         |  sum(CASE WHEN d.key IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_keys_true,
         |  sum(CASE WHEN v.all_set = 1 AND d.key IS NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_false_positives
         |FROM v LEFT JOIN (SELECT DISTINCT key FROM dimk) d USING (key)""".stripMargin,
    // the bloom prune has no false negatives and the closing equi-join
    // kills its false positives, so the engine's pruned plan must equal
    // the PLAIN join — the oracle runs the unpruned form on purpose
    "sketch_join_card" ->
      s"""WITH c AS (SELECT user_id, count(*)::BIGINT AS f FROM events GROUP BY 1),
         |h0 AS (SELECT user_id, f, ${foldSql("user_id::VARCHAR", 31L, 0L)} AS f0 FROM c),
         |hh AS (SELECT user_id, f, ${mixColSql("f0")} AS h FROM h0),
         |sk AS (SELECT (list_sort(list_distinct(list(h))))[:$KmvK] AS sketch FROM hh),
         |t AS (SELECT len(sketch)::BIGINT AS n_sketch,
         |    CASE WHEN len(sketch) < $KmvK THEN 4294967296 ELSE sketch[$KmvK] END AS tau,
         |    CASE WHEN len(sketch) < $KmvK THEN len(sketch)::BIGINT
         |         ELSE (${KmvK - 1} * 4294967296) // sketch[$KmvK] END AS d_est
         |  FROM sk),
         |s AS (SELECT t.d_est, count(*)::BIGINT AS m, sum(hh.f * hh.f)::BIGINT AS s2
         |  FROM hh, t WHERE hh.h <= t.tau GROUP BY 1),
         |ex AS (SELECT count(*)::BIGINT AS d_exact, sum(f * f)::BIGINT AS f2_exact FROM c)
         |SELECT s.d_est, ex.d_exact, s.m,
         |  (s.d_est * s.s2) // s.m AS f2_est, ex.f2_exact,
         |  (1000 * abs((s.d_est * s.s2) // s.m - ex.f2_exact)) // ex.f2_exact AS err_milli
         |FROM s, ex""".stripMargin,
    "sketch_bloom_join" ->
      """SELECT l_returnflag,
        |  sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT)))::BIGINT / 10000.0 AS revenue,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
