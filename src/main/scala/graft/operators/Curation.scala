package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.{polyHash, tokens}

/** Corpus-curation operators for training-data pipelines (extension
  * beyond the reference surface, same family as TextAnalysis):
  * repetition-based quality filtering, PII scrubbing, deterministic
  * sampling, and domain-mixing weights.
  *
  * Scale notes:
  *  - `repetitionStats` computes its n-gram counts inside the scan
  *    (fused native pass) — like everything else in the filter tier
  *    it is scan-projection algebra, zero shuffles; only the DSIR
  *    model build aggregates (to a bounded 256-row frame).
  *  - Sampling is HASH-deterministic (md5 of a stable key), never
  *    rand(): reproducible across retries, speculative tasks, and
  *    engines — the only sampling discipline that survives a 1000-
  *    executor re-run, and it makes the sample itself oracle-checkable.
  *  - `mixWeights` aggregates to one row per domain then cross-joins
  *    the 1-row total back — broadcast by construction.
  */
object Curation {

  // ---------------------------------------------------------------- //
  // Repetition filtering (Gopher-style, Rae et al. 2021 §A1.1):      //
  // documents dominated by a repeated 2-gram, or whose 3-grams       //
  // mostly recur, are boilerplate/spam candidates.                   //
  // ---------------------------------------------------------------- //

  /** Per-doc repetition stats: fraction of 2-grams taken by the most
    * frequent 2-gram, fraction of 3-grams that occur more than once,
    * and the resulting keep/drop flag.
    *
    * Repetition is a purely LOCAL statistic, so the counts come from
    * the fused native pass ([[graft.functions.TextFunctions
    * .repetitionCounts]] → [max2, n2, dup3, n3]) inside the scan —
    * ZERO exchanges, where the grouped formulation exploded every
    * word 2-/3-gram into corpus-scale rows and shuffled them twice
    * (the r11 plan audit's 4-exchange / 8-aggregate row). A zero
    * n-gram total means "too short to have n-grams" and maps to the
    * NULL fraction the old left-join-miss produced; the DuckDB oracle
    * still replays the grouped formulation, pinning the fused pass
    * against an independent implementation. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionStatsOn(Tables.documents(spark, dir))

  /** Core over any (doc_id, text) frame — spec seam. */
  private[graft] def repetitionStatsOn(docs: DataFrame): DataFrame = {
    val rs = graft.functions.TextFunctions.repetitionCounts(col("text"))
    docs
      .select(col("doc_id"), rs.as("rs"))
      .select(col("doc_id"),
        when(col("rs").getItem(1) > 0,
          col("rs").getItem(0).cast("double") / col("rs").getItem(1))
          .as("top2gram_frac"),
        when(col("rs").getItem(3) > 0,
          col("rs").getItem(2).cast("double") / col("rs").getItem(3))
          .as("dup3gram_frac"))
      .withColumn("repetitive",
        col("top2gram_frac") > 0.18 || col("dup3gram_frac") > 0.30)
  }

  // ---------------------------------------------------------------- //
  // PII / URL scrubbing. The corpus carries no PII, so the query     //
  // plants deterministic PII derived from doc_id (mirrored in the    //
  // oracle) — the regexes and replacement order are the deliverable. //
  // ---------------------------------------------------------------- //

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[A-Za-z0-9./_-]+"
  private val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** Scrub emails, URLs, then phone numbers (in that order — the email
    * pattern must not see URL hostnames it could partially eat) and
    * count each hit class. One scan projection, zero shuffle. */
  def scrubPii(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or http://ex"), col("doc_id").cast("string"),
      lit(".com/page tel 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), planted.as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("aug"), lit(UrlRe)).cast("long").as("n_urls"),
        regexp_count(col("aug"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
            UrlRe, "<URL>"),
          PhoneRe, "<PHONE>").as("scrubbed"))
  }

  // ---------------------------------------------------------------- //
  // Deterministic sampling.                                          //
  // ---------------------------------------------------------------- //

  /** md5-keyed uniform u in [0,1): the first 4 hex chars as an integer
    * over 2^16 — exact in a double, identical in any engine with md5.
    * Operators-visible: the cluster-keyed split reuses the same rule. */
  private[operators] def hashU(key: Column): Column =
    conv(substring(md5(key), 1, 4), 16, 10).cast("long") / 65536.0

  private def sampleKey: Column =
    concat(col("doc_id").cast("string"), lit(":"), col("lang"))

  /** Uniform 1/16 Bernoulli sample: first md5 nibble = '0'. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", substring(md5(sampleKey), 1, 8))
      .where(substring(col("bucket"), 1, 1) === "0")
      .select(col("doc_id"), col("lang"), col("bucket"))

  /** Per-language acceptance rates: downsample the majority language,
    * keep the tail — the standard rebalancing shape. */
  val strataRates: Map[String, Double] =
    Map("en" -> 0.25, "es" -> 0.5, "de" -> 0.75, "fr" -> 1.0, "zh" -> 1.0)

  /** Stratified sample: keep iff hashU < rate(lang). */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = strataRates.foldLeft(lit(1.0)) { case (els, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(els)
    }
    Tables.documents(spark, dir)
      .withColumn("u", hashU(sampleKey))
      .where(col("u") < rate)
      .select(col("doc_id"), col("lang"), col("u"))
  }

  /** Documents drawn under the temperature mixture per
    * [[temperatureMix]] report (the expected_docs budget). */
  val MixBudget = 10000L

  /** Temperature-scaled language mixture weights — the multilingual
    * sampling rebalance of mT5/XLM-R-style corpora: raw language share
    * p_l = n_l/N is flattened to w_l ∝ p_l^α before normalizing, so
    * head languages stop drowning the tail without inverting the
    * ranking. Ships at α = 1/2 via `sqrt`: IEEE 754 REQUIRES sqrt
    * correctly rounded, so the flattened weight is bit-identical in
    * any engine — the one exponent in the α family that keeps this
    * report inside the repo's exact-oracle discipline (a general
    * exp(α·ln p) chain would stake the hash gate on two engines' libm
    * agreeing to the last bit). [[strataRates]] is the hand-tuned
    * per-language knob; this derives the knob from the data.
    *
    * The weight normalizer Σw folds in lang-sorted index order
    * (float addition is not associative; a plain sum's partial-merge
    * order is nondeterministic), matching the oracle's ordered
    * list_reduce. Scale shape: one map-side-combined count per
    * language, then all arithmetic on the |langs|-row frame. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("total"))
    val raw = counts.crossJoin(broadcast(tot))
      .withColumn("w", sqrt(col("n_docs").cast("double") / col("total")))
    val wsum = raw
      .agg(array_sort(collect_list(struct(col("lang"), col("w")))).as("ws"))
      .select(aggregate(col("ws"), lit(0.0),
        (acc, e) => acc + e.getField("w")).as("wsum"))
    raw.crossJoin(broadcast(wsum))
      .select(col("lang"), col("n_docs"),
        round(col("w") / col("wsum") * 1e6, 0).cast("long").as("weight_micro"),
        round(col("w") / col("wsum") * MixBudget, 0).cast("long")
          .as("expected_docs"))
  }

  /** Deterministic train/val/test split (80/10/10 by hash): the same
    * document lands in the same split on every run, every engine, every
    * cluster — the property rand() splits silently lose on retry. */
  def assignSplits(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("u", hashU(sampleKey))
      .withColumn("split",
        when(col("u") < 0.8, "train").when(col("u") < 0.9, "val").otherwise("test"))
      .select(col("doc_id"), col("lang"), col("split"))

  /** Canonical text normalization for dedup/tokenizer front-ends:
    * lowercase, collapse whitespace runs, strip leading/trailing space.
    * One scan projection; emits the cleaned text plus a changed flag so
    * a pipeline can count normalization impact for free. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm",
        trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .select(col("doc_id"), col("norm"),
        (col("norm") =!= col("text")).as("changed"),
        (length(col("text")) - length(col("norm"))).cast("long").as("chars_removed"))

  val PackCapacity = 2048L
  val PackBuckets = 8

  /** Greedy contiguous sequence packing: documents fill fixed
    * token-budget bins (`seq_id`) in doc_id order — the batching step
    * between a cleaned corpus and a trainer. A single global running
    * sum would be one reducer owning the whole corpus, so packing runs
    * per hash bucket: parallelism = buckets, each bin stays
    * bucket-local, and the assignment is still fully deterministic
    * (raise PackBuckets with the cluster, not the data). */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packedWith(Tables.documents(spark, dir), Seq(col("doc_id")))

  /** Shared packing core: per-bucket running token sum in the given
    * order, bins cut at PackCapacity multiples. */
  private def packedWith(docs: DataFrame, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(col("doc_id"), lit(PackBuckets)).cast("int"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $PackCapacity"))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("seq_id"))
  }

  /** Length-sorted greedy packing — the distributable face of
    * first-fit-decreasing: within each bucket, documents fill bins
    * longest-first (ties on doc_id), so the short tail tops off bins
    * the long heads opened instead of every boundary cutting a long
    * document. Same bucket/window shape as [[packSequences]]; only the
    * fill order differs, and [[packEfficiency]] prices the difference. */
  def packSequencesSorted(spark: SparkSession, dir: String): DataFrame =
    packedWith(Tables.documents(spark, dir),
      Seq(col("n_tokens").desc, col("doc_id")))

  /** Packing-efficiency report: one row per strategy (doc-order vs
    * length-sorted greedy) with bin count, padding under capacity,
    * boundary overflow, and milli utilization — the diagnostic that
    * decides whether re-sorting the corpus before packing is worth a
    * shuffle at the trainer's sequence budget. All-BIGINT arithmetic.
    *
    * Scale shape: each leg is the packing window (parallel over
    * buckets) collapsed by one map-side-combined (bucket, seq_id)
    * aggregate to bin grain, then a 1-row fold; the union is 2 rows. */
  def packEfficiency(spark: SparkSession, dir: String): DataFrame = {
    def leg(name: String, packed: DataFrame): DataFrame =
      packed.groupBy(col("bucket"), col("seq_id"))
        .agg(sum(col("n_tokens")).as("bin_tokens"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(greatest(lit(0L), lit(PackCapacity) - col("bin_tokens")))
            .as("padding_tokens"),
          sum(greatest(lit(0L), col("bin_tokens") - lit(PackCapacity)))
            .as("overflow_tokens"),
          sum(least(col("bin_tokens"), lit(PackCapacity))).as("used"))
        .select(lit(name).as("strategy"), col("n_seqs"),
          col("padding_tokens"), col("overflow_tokens"),
          expr(s"1000 * used div (n_seqs * $PackCapacity)")
            .as("utilization_milli"))
    leg("doc_order", packSequences(spark, dir))
      .unionAll(leg("length_sorted", packSequencesSorted(spark, dir)))
  }

  val ChunkTokens = 40
  val ChunkStride = 30

  /** Sliding-window document chunking: each document splits into
    * fixed-budget token windows of ChunkTokens, advancing by
    * ChunkStride (25% overlap) — the retrieval/embedding prep step that
    * turns long documents into model-sized passages with continuity
    * across cuts. Chunk starts are 0, S, 2S, … while start < n_tokens,
    * so every token is covered and only the last window runs short.
    *
    * The complement of packSequences: packing concatenates SHORT
    * documents up to a budget, chunking splits LONG ones down to it.
    *
    * Scale shape: pure per-row algebra — tokenize once, explode the
    * ceil(n/S) window starts, slice the token array per start. Output
    * rows ≈ corpus tokens / S; zero shuffles, zero windows, linear in
    * input splits. */
  def chunkStride(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), t.as("toks"), size(t).as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), col("n") - 1, lit(ChunkStride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_tok"),
        slice(col("toks"), col("col") + lit(1), lit(ChunkTokens)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** FIM span-gate rate: docs whose first md5 nibble is below this
    * (of 16) get the fill-in-middle transform — 8 = the 50% rate of
    * Bavarian et al. 2022 §4.1. */
  val FimNibbles = 8L
  private val FimPre = "<|pre|>"
  private val FimSuf = "<|suf|>"
  private val FimMid = "<|mid|>"

  /** md5-hex prefix of a salted doc key folded to a BIGINT — the
    * integer twin of [[hashU]] for draws that need a modulus, not a
    * unit uniform. 8 hex chars < 2^32, exact in a long. */
  private def hexLong(salt: String, n: Int): Column =
    conv(substring(md5(concat(lit(salt + "|"),
      col("doc_id").cast("string"))), 1, n), 16, 10).cast("long")

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): for a
    * hash-gated half of the corpus, split each document's character
    * stream at two hash-drawn cut points into (prefix, middle, suffix)
    * and re-emit in PSM order `<|pre|>P<|suf|>S<|mid|>M`; the other
    * half passes through untouched. Both the gate and the cuts are
    * md5-deterministic per doc_id, so the transform is replay- and
    * speculation-safe like every sampler in this suite, and the cut
    * invariants (1 ≤ a < b ≤ len, middle nonempty, prefix nonempty)
    * hold by construction: a = 1 + h1 mod (len−1), b = a + 1 +
    * h2 mod (len−a).
    *
    * Scale shape: one pure scan projection — md5/substring column
    * algebra, zero shuffles, zero joins; the plan is a single
    * WholeStageCodegen span over the parquet scan at any corpus size. */
  def fimTransform(spark: SparkSession, dir: String): DataFrame =
    fimOn(Tables.documents(spark, dir))

  /** Core over any (doc_id, text) frame — spec seam. */
  private[graft] def fimOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"),
        hexLong("fim", 1).as("g"),
        hexLong("fima", 8).as("h1"),
        hexLong("fimb", 8).as("h2"))
      .withColumn("fim_applied", col("g") < FimNibbles && col("len") >= 2)
      .withColumn("cut_a",
        when(col("fim_applied"), lit(1L) + col("h1") % (col("len") - 1))
          .otherwise(0L))
      .withColumn("cut_b",
        when(col("fim_applied"),
          col("cut_a") + 1L + col("h2") % (col("len") - col("cut_a")))
          .otherwise(0L))
      .select(col("doc_id"), col("fim_applied"), col("cut_a"), col("cut_b"),
        when(col("fim_applied"),
          concat(lit(FimPre), expr("substring(text, 1, cut_a)"),
            lit(FimSuf), expr("substring(text, cut_b + 1, len)"),
            lit(FimMid), expr("substring(text, cut_a + 1, cut_b - cut_a)")))
          .otherwise(col("text")).as("fim_text"))

  // ---------------------------------------------------------------- //
  // Domain mixing: sqrt-temperature weights over the language        //
  // distribution (multilingual-sampling shape, Conneau & Lample      //
  // 2019 §3.1 with alpha = 0.5).                                     //
  // ---------------------------------------------------------------- //

  /** Per-language doc/token counts, corpus share p, and normalized
    * sqrt(p) mixing weight. Rounded to 9 decimals in both engines: the
    * cross-group sum of 5 sqrt doubles is the one order-sensitive
    * float reduction in this suite. */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))
    val totals = perLang.agg(
      sum(col("n_docs")).as("total_docs"),
      sum(sqrt(col("n_docs").cast("double"))).as("sum_sqrt"))
    perLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_docs") / col("total_docs").cast("double"), 9).as("p"),
        round(sqrt(col("n_docs").cast("double")) / col("sum_sqrt"), 9).as("weight"))
  }

  /** Budget share for [[mixBudgetAlloc]]: 3/5 of the corpus tokens. */
  val MixBudgetNum = 3L
  val MixBudgetDen = 5L

  /** Water-filling token allocation: spread a training-token budget
    * across sources so no source exceeds its available tokens and all
    * unsaturated sources receive the SAME level L — the max-min-fair
    * allocation (small sources keep everything they have, big sources
    * are capped at the common water level; the budget-constrained
    * complement of the temperature mixes, which reweight but never cap).
    *
    * Exact integer algorithm: sort sources by avail asc; source r is
    * saturated iff B − P(r−1) − avail_r·(n−r+1) ≥ 0 (the no-division
    * form of avail_r ≤ level-if-r-unsaturated; the criterion is
    * monotone under the sort, so saturation is prefix-closed and
    * k = count(sat) is THE cut); the level is then
    * L = (B − P(k)) div (n − k). Every comparison is BIGINT — parity
    * is unconditional. The div remainder (< n−k tokens) is reported as
    * slack, not distributed.
    *
    * Scale shape: one map-side-combined per-source aggregate; the
    * window and the 1-row cut fold run on the \|sources\|-row frame
    * (bounded — same discipline as the sketch/tile windows). */
  def mixBudgetAlloc(spark: SparkSession, dir: String): DataFrame =
    mixBudgetAllocOn(Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(tokens(col("text"))).cast("long")).as("avail")))

  /** Core over any (source, avail) frame — spec seam. */
  private[graft] def mixBudgetAllocOn(perSrc: DataFrame): DataFrame =
    waterFillOn(perSrc.withColumn("cap", col("avail")),
      MixBudgetNum, MixBudgetDen)
      .select(col("source"), col("avail").as("avail_tokens"),
        col("allocated"), col("saturated"))

  /** Shared water-filling cut over a (source, avail, cap) frame with
    * budget B = Σavail·num div den: fill every source to the common
    * level L capped at its own cap (the no-division prefix criterion
    * documented on [[mixBudgetAlloc]], applied to cap instead of
    * avail). Returns source, avail, cap, allocated, saturated. */
  private def waterFillOn(perSrc: DataFrame, num: Long, den: Long): DataFrame = {
    val w = Window.orderBy(col("cap"), col("source"))
    val totals = perSrc.agg(sum(col("avail")).as("total"),
      count(lit(1)).as("n"))
      .select(col("total"), col("n"),
        expr(s"total * $num div $den").as("b"))
    val ranked = perSrc
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("pprev",
        coalesce(sum(col("cap")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("saturated",
        col("b") - col("pprev") - col("cap") * (col("n") - col("r") + 1) >= 0)
    val cut = ranked.agg(
      sum(when(col("saturated"), 1L).otherwise(0L)).as("k"),
      coalesce(sum(when(col("saturated"), col("cap"))), lit(0L)).as("pk"))
    ranked.crossJoin(broadcast(cut))
      .withColumn("allocated",
        when(col("saturated"), col("cap"))
          .otherwise(expr("(b - pk) div (n - k)")))
  }

  /** UniMax epoch cap and budget share for [[mixUnimaxAlloc]]:
    * at most 2 epochs per source, budget 17/10 of the corpus tokens. */
  val UnimaxEpochs = 2L
  val UnimaxBudgetNum = 17L
  val UnimaxBudgetDen = 10L

  /** UniMax allocation (Chung et al. 2023): spread a token budget
    * LARGER than the corpus across sources as uniformly as possible,
    * but cap every source at [[UnimaxEpochs]] epochs of its own data —
    * small sources are up-sampled (epochs > 1) only up to the repeat
    * cap, instead of being drowned by proportional sampling or
    * repeated without bound by plain uniform sampling. Exactly the
    * [[mixBudgetAlloc]] water-fill with capacity cap = epochs·avail;
    * the fractional `epochs` column (rounded to 6 dp in both engines)
    * is the per-source sampling rate a loader would apply.
    *
    * Scale shape: identical to [[mixBudgetAlloc]] — one map-side
    * combined aggregate, then bounded \|sources\|-row algebra. */
  def mixUnimaxAlloc(spark: SparkSession, dir: String): DataFrame =
    mixUnimaxAllocOn(Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(tokens(col("text"))).cast("long")).as("avail")))

  /** Core over any (source, avail) frame — spec seam. */
  private[graft] def mixUnimaxAllocOn(perSrc: DataFrame): DataFrame =
    waterFillOn(perSrc.withColumn("cap", col("avail") * lit(UnimaxEpochs)),
      UnimaxBudgetNum, UnimaxBudgetDen)
      .select(col("source"), col("avail").as("avail_tokens"),
        col("cap").as("cap_tokens"), col("allocated"),
        round(col("allocated").cast("double") / col("avail"), 6).as("epochs"),
        col("saturated"))

  /** Per-source unigram KL divergence to the corpus mix,
    * KL(Pₛ ‖ P_corpus) = Σₜ pₛₜ·ln(pₛₜ/qₜ) — the mixing diagnostic
    * that names WHICH source's token distribution has drifted from the
    * blend it feeds (the quantity DSIR importance weights are built
    * from, and the per-source face of profile_mix_drift's categorical
    * χ²). Every source token appears in the corpus by construction, so
    * qₜ > 0 wherever pₛₜ > 0 and no smoothing is needed; KL ≥ 0 with 0
    * iff the source matches the mix (Gibbs).
    *
    * Arithmetic: all counts are exact BIGINTs; each token's term is a
    * fixed double tree over those scalars (one ln, products < 2^53 so
    * exact in double), summed per source and rounded to 6 — the same
    * discipline as text_char_lm's avg(ln). The `+ 0.0` canonicalizes a
    * −0.0 that a float-error-negative near-zero KL could round to.
    *
    * Scale shape: one explode → map-side-combined (source, token)
    * count; source totals and the 1-row corpus total broadcast; the
    * only data-sized shuffle is the (source×vocab)-bounded token join,
    * equi-keyed on token (AQE broadcasts it while the vocab is small).
    * Output is |sources| rows. */
  def sourceKl(spark: SparkSession, dir: String): DataFrame =
    sourceKlOn(Tables.documents(spark, dir))

  /** Core over any (source, text) frame — spec seam. */
  private[graft] def sourceKlOn(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
      explode(tokens(col("text"))).as("tok"))
    val st = tok.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
    val srcTot = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val tokTot = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val total = tokTot.agg(sum(col("c_t")).as("n"))
    val term = col("c_st").cast("double") / col("n_s") *
      log(col("c_st").cast("double") * col("n") /
        (col("n_s").cast("double") * col("c_t")))
    st.join(tokTot, Seq("tok"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(total))
      .groupBy(col("source"), col("n_s"))
      .agg(count(lit(1)).as("n_vocab"), sum(term).as("kl_raw"))
      .select(col("source"), col("n_s").as("n_tokens"), col("n_vocab"),
        (round(col("kl_raw"), 6) + lit(0.0)).as("kl_nats"))
  }

  /** The deterministic "arriving batch" slice the driver-gated ingest-KL
    * probe judges: every 10th doc — mirrors Dedup's incremental drill. */
  val IngestKlBatchMod = 10L

  /** Batch-vs-corpus token-mix KL: the ingest-monitoring face of
    * [[sourceKl]] — does an arriving micro-batch's token distribution
    * match the standing corpus it is about to join? The corpus side is
    * the PERSISTED text-index generation artifact
    * ([[Retrieval.ensureTextIndex]]'s (doc_id, dl, token, tf) postings,
    * summed to token grain), so the monitor pays an index-bounded scan,
    * never a corpus re-tokenization. p is the batch mix renormalized
    * over the in-vocab support; q is the corpus mix restricted to that
    * support (unnormalized — the missing mass only ADDS to the
    * statistic, so kl_nats ≥ 0 still, with 0 exactly on a perfect
    * in-vocab match of a full-coverage batch). Out-of-vocabulary
    * arrivals cannot be judged against q and are priced separately as
    * oov_milli — a sudden OOV spike is its own drift signal (new
    * language, new domain, encoding rot).
    *
    * Arithmetic: KL = S/n_in − ln(n_in) with S = Σ c·ln(c·N/c_t) —
    * factoring n_in out lets one aggregate pass compute S from exact
    * BIGINTs without knowing n_in per term; round-6 + 0.0 as in
    * [[sourceKl]]. */
  def ingestKl(spark: SparkSession, dir: String): DataFrame = {
    val (tfsT, _) = Retrieval.ensureTextIndex(spark, dir)
    ingestKlOn(
      Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(IngestKlBatchMod)) === 0L)
        .select(col("doc_id"), col("text")),
      corpusTokenTotals(spark, tfsT))
  }

  /** Corpus token totals off the persisted postings table — the static
    * q-side frame a monitor derives once per generation bind. */
  private[graft] def corpusTokenTotals(spark: SparkSession,
      tfsT: String): DataFrame =
    spark.table(tfsT).groupBy(col("token")).agg(sum(col("tf")).as("c_t"))

  /** One batch's KL verdict row against a prepared totals frame — the
    * exact per-micro-batch computation
    * [[graft.streaming.StreamingIngestGate.startKlMonitor]] replays. */
  private[graft] def ingestKlOn(batch: DataFrame,
      totals: DataFrame): DataFrame = {
    val bt = batch.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c_bt"))
    val n = totals.agg(sum(col("c_t")).as("n"))
    bt.join(totals, Seq("token"), "left")
      .crossJoin(broadcast(n))
      .agg(coalesce(sum(col("c_bt")), lit(0L)).as("n_tokens"),
        count(lit(1)).as("n_batch_vocab"),
        coalesce(sum(when(col("c_t").isNull, col("c_bt"))), lit(0L))
          .as("oov_tokens"),
        coalesce(sum(when(col("c_t").isNotNull, col("c_bt"))), lit(0L))
          .as("n_in"),
        sum(when(col("c_t").isNotNull,
          col("c_bt").cast("double") *
            log(col("c_bt").cast("double") * col("n") /
              col("c_t").cast("double")))).as("s_raw"))
      .select(col("n_tokens"), col("n_batch_vocab"), col("oov_tokens"),
        coalesce(expr("1000 * oov_tokens div n_tokens"), lit(0L))
          .as("oov_milli"),
        (round(when(col("n_in") > 0,
          col("s_raw") / col("n_in") -
            log(col("n_in").cast("double"))).otherwise(0.0), 6) + lit(0.0))
          .as("kl_nats"))
  }

  // ---------------------------------------------------------------- //
  // Rule-based document filters (Gopher, Rae et al. 2021 §A1.1):     //
  // hard thresholds on cheap per-document statistics. Complements    //
  // repetitionStats (n-gram duplication) and TextAnalysis.quality    //
  // (a blended score): these are the individually-reported pass/fail //
  // gates a curation pipeline tunes one by one.                      //
  // ---------------------------------------------------------------- //

  /** Per-document Gopher-style filter report: each statistic as an
    * exact integer (milli-scaled where fractional), each rule's verdict
    * folded into `keep`. Thresholds are calibrated so the demo corpus
    * genuinely splits; at 100 TB this is one scan projection — the
    * entire report costs zero shuffles. */
  def gopherFilters(spark: SparkSession, dir: String): DataFrame =
    gopherOn(Tables.documents(spark, dir), col("text"))

  /** The Gopher gate over ANY (doc_id, <text>) frame — the composable
    * core: [[gopherFilters]] runs it on raw documents, Html runs it on
    * boilerplate-stripped main content (the CCNet/RefinedWeb stage
    * order: extract first, quality-gate second). Rows whose text is
    * empty are emitted with zeroed stats and keep=false rather than
    * dividing by zero. */
  private[operators] def gopherOn(docs: DataFrame, text: Column): DataFrame = {
    // one fused TokenStats pass per document (native expression; the
    // five separate HOF lambdas + per-token rlike it replaced were the
    // most expensive scan in the text suite) — Catalyst CSE evaluates
    // the shared array once per row
    val ts = graft.functions.TextFunctions.tokenStatsArr(
      text, TextAnalysis.stop("en"))
    docs
      .select(
        col("doc_id"),
        element_at(ts, 1).as("n_words"),
        element_at(ts, 2).as("sum_len"),
        element_at(ts, 3).as("n_distinct"),
        element_at(ts, 4).as("stop_hits"),
        element_at(ts, 5).as("n_alpha"))
      .select(col("doc_id"), col("n_words"),
        expr("CASE WHEN n_words > 0 THEN sum_len * 1000 div n_words ELSE 0 END")
          .as("mean_len_milli"),
        expr("CASE WHEN n_words > 0 THEN n_distinct * 1000 div n_words ELSE 0 END")
          .as("diversity_milli"),
        col("stop_hits"),
        expr("CASE WHEN n_words > 0 THEN n_alpha * 1000 div n_words ELSE 0 END")
          .as("alpha_frac_milli"))
      .withColumn("keep",
        col("n_words").between(30L, 100000L) &&
          col("mean_len_milli").between(3000L, 10000L) &&
          col("diversity_milli") >= 350L &&
          col("stop_hits") >= 2L &&
          col("alpha_frac_milli") >= 800L)
  }

  /** Reservoir size for [[sampleReservoir]]. */
  private[graft] val ReservoirK = 32

  /** Deterministic fixed-size sample: the k documents with the
    * smallest stable hashes of doc_id. Semantically a uniform
    * without-replacement sample (a good hash ranks rows in
    * effectively random order) whose MEMBERSHIP is a pure function of
    * the data — reruns, speculative tasks, and other engines pick the
    * identical k rows, unlike rand()-reservoirs. Kept bounded
    * map-side by the TopKByScore aggregator: each task forwards ≤ k
    * candidates, so k × partitions rows cross the shuffle however
    * large the corpus — never a global ORDER BY hash LIMIT k sort.
    * (sampleHash keeps a fixed FRACTION; this keeps a fixed COUNT.) */
  def sampleReservoir(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(ReservoirK))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        Sketches.hash32(col("doc_id")).as("h"))
      .agg(topk(col("doc_id"), -col("h").cast("double")).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + lit(1)).cast("long").as("rnk"),
        col("col.vec_id").as("doc_id"),
        (-col("col.cosine")).cast("long").as("hash_val"))
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .select("rnk", "doc_id", "lang", "hash_val")
  }


  /** Perplexity-bucket boundary positions in the sorted sample —
    * tertiles of [[ReservoirK]]. */
  private[graft] val PplLowPos = ReservoirK / 3
  private[graft] val PplHighPos = 2 * ReservoirK / 3

  /** CCNet-style perplexity filter (Wenzek et al. 2020): score every
    * document by the corpus-trained char-bigram LM
    * (TextAnalysis.charLmScore), derive head/middle/tail boundaries as
    * TERTILES OF A BOUNDED DETERMINISTIC SAMPLE — the production
    * shape: CCNet buckets on a sample's perplexity distribution, and
    * the [[ReservoirK]] smallest-hash scored docs are a pure function
    * of the data (reruns and other engines pick identical members) —
    * then keep head + middle, dropping the least-LM-like third.
    *
    * Exactness: NLL micro-rounded before any comparison, thresholds
    * are integer positions in the sorted integer sample — no float
    * boundary can disagree cross-engine. Scale shape: LM scoring is
    * the corpus pass; the sample is a bounded map-side top-k; the
    * verdict is one broadcast of two integers back over the scored
    * frame. Docs too short to score (< 1 bigram) are out of scope by
    * the LM's contract — they belong to the length gates upstream. */
  def pplFilter(spark: SparkSession, dir: String): DataFrame =
    pplFilterFrom(TextAnalysis.charLmScore(spark, dir))

  /** [[pplFilter]] scored by the PERSISTED char-bigram LM — the
    * deployed shape: the gate loads its generation's model table and
    * scores in one corpus pass, retraining nothing. Hash-identical to
    * the recompute twin (shares its oracle verbatim). */
  def pplFilterPersisted(spark: SparkSession, dir: String): DataFrame =
    pplFilterFrom(TextAnalysis.charLmScorePersisted(spark, dir))

  private def pplFilterFrom(nllNats: DataFrame): DataFrame = {
    val nll = nllNats
      .select(col("doc_id"),
        expr("cast(round(nll_nats * 1000000.0, 0) as bigint)").as("nll_micro"))
      .localCheckpoint() // feeds the sample and the verdict
    val topk = udaf(new graft.functions.TopKByScore(ReservoirK))
    val sampleIds = nll
      .select(col("doc_id"), Sketches.hash32(col("doc_id")).as("h"))
      .agg(topk(col("doc_id"), -col("h").cast("double")).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.vec_id").as("doc_id"))
    val th = sampleIds.join(nll, "doc_id")
      .agg(sort_array(collect_list(col("nll_micro"))).as("s"))
      .select(
        element_at(col("s"),
          greatest(lit(1), least(size(col("s")), lit(PplLowPos)))).as("t_low"),
        element_at(col("s"),
          greatest(lit(1), least(size(col("s")), lit(PplHighPos)))).as("t_high"))
    nll.crossJoin(broadcast(th))
      .select(col("doc_id"), col("nll_micro"),
        when(col("nll_micro") <= col("t_low"), lit("head"))
          .when(col("nll_micro") <= col("t_high"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"),
        (col("nll_micro") <= col("t_high")).as("keep"))
  }

  /** Per-stratum reservoir size for [[sampleReservoirPerLang]]. */
  private[graft] val StratumK = 8

  /** Fixed-COUNT sample per stratum: the k smallest-hash documents of
    * EACH language — the per-group flavor of [[sampleReservoir]]
    * (sampleStratified keeps a per-group FRACTION; audits and eval-set
    * construction usually want an exact per-group count). Same bounded
    * shape, just keyed: the top-k aggregator partial-aggregates under
    * the groupBy, so each map task forwards ≤ k candidates per
    * language and no stratum ever funnels through a global sort —
    * at 100 TB this is one hash-partitioned aggregate over ≤ k ×
    * partitions × |langs| rows. */
  def sampleReservoirPerLang(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(StratumK))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        Sketches.hash32(col("doc_id")).as("h"))
      .groupBy(col("lang"))
      .agg(topk(col("doc_id"), -col("h").cast("double")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + lit(1)).cast("long").as("rnk"),
        col("col.vec_id").as("doc_id"),
        (-col("col.cosine")).cast("long").as("hash_val"))
  }

  /** Priority-sample size for [[samplePriority]]. */
  private[graft] val PriorityK = 16

  /** Deterministic weighted sampling without replacement — priority
    * sampling (Duffield, Lund & Thorup, JACM 2007): each row gets
    * priority w/u for a uniform u ∈ (0, 1], and the k highest
    * priorities form a sample whose inclusion odds are
    * weight-proportional. Here u is the stable hash scaled into
    * (0, 2^32], so priority = w·2^32 div (hash+1) is EXACT integer
    * arithmetic — the sample is a pure function of the data, like
    * every other sampler in this suite, and replays in the oracle.
    * Weight = n_chars: longer documents are proportionally likelier
    * to be drawn (token-budget-weighted corpus audits want exactly
    * this). Bounded map-side by the top-k aggregator, as in
    * [[sampleReservoir]]. */
  def samplePriority(spark: SparkSession, dir: String): DataFrame = {
    // exact BIGINT ranking end to end: priorities reach n_chars·2^32,
    // which overflows a double's 2^53 integer range for documents past
    // ~2M chars — the long-keyed aggregator keeps the engine's order
    // identical to the oracle's BIGINT order unconditionally
    val topk = udaf(new graft.functions.TopKByLongScore(PriorityK))
    val prio = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        Sketches.hash32(col("doc_id")).as("h"))
      .select(col("doc_id"),
        expr("n_chars * 4294967296L div (h + 1L)").as("priority"))
    prio
      .agg(topk(col("doc_id"), col("priority")).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + lit(1)).cast("long").as("rnk"),
        col("col.vec_id").as("doc_id"),
        col("col.score").as("priority"))
      .join(Tables.documents(spark, dir).select("doc_id", "n_chars"), "doc_id")
      .select("rnk", "doc_id", "n_chars", "priority")
  }

  /** Curriculum staging: each document binned into a length quartile
    * (stage 1 = shortest … 4 = longest) — the difficulty-binning step a
    * curriculum-learning loader runs before epoch scheduling. A naive
    * ntile() is a window over the CORPUS (single-reducer global sort,
    * the banned shape); here quartile boundaries come from the same
    * integer histogram-sketch discipline as Sketches.quantileHist —
    * 1000-bin histogram, cumulative window over the ≤1000-row SKETCH,
    * integer-division targets — broadcast back as three cuts, and the
    * stage assignment is one scan projection. All integer arithmetic;
    * the oracle replays the identical histogram estimate. */
  def curriculumStages(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val bounds = docs
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"), count(lit(1)).as("n"))
      .withColumn("bw", expr("(hi - lo + 1000) div 1000"))
    val cum = docs.crossJoin(broadcast(bounds.select("lo", "bw")))
      .select(expr("(n_chars - lo) div bw").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
    val tgt = bounds.crossJoin(broadcast(Seq(25, 50, 75).toDF("p")))
      .withColumn("target", expr("(p * n + 99) div 100"))
    val cuts = tgt.crossJoin(cum)
      .filter(col("cum") >= col("target"))
      .groupBy("p", "lo", "bw").agg(min("bin").as("bin"))
      .select(col("p"), (col("lo") + col("bin") * col("bw")).as("cut"))
      .groupBy().pivot("p", Seq(25, 50, 75)).agg(first("cut"))
      .select(col("25").as("q1"), col("50").as("q2"), col("75").as("q3"))
    docs.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_chars"),
        when(col("n_chars") <= col("q1"), lit(1L))
          .when(col("n_chars") <= col("q2"), lit(2L))
          .when(col("n_chars") <= col("q3"), lit(3L))
          .otherwise(lit(4L)).as("stage"))
  }

  /** Budget as a fraction of total corpus tokens: keep the top-quality
    * quarter. */
  val BudgetDenom = 4L

  /** Token-budget curation: select the highest-quality documents whose
    * tokens fit a budget (total div 4) — the "give me the best X
    * tokens" cut an annealing / midtraining data order starts from.
    * Greedy quality-first at milli-bin granularity: a bin is selected
    * iff ALL tokens in bins at-or-above it fit the budget, so the
    * decision is a pure function of the bin histogram (no per-doc
    * knapsack, no ordering ambiguity inside a bin).
    *
    * Scale shape: docs reduce to a ≤1001-row (bin, tokens) histogram
    * (map-side combined); the top-down cumulative runs over that
    * bounded frame; the verdict broadcast-joins back to the corpus on
    * the bin. One corpus shuffle total — the histogram's. */
  def tokenBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
      .select(col("doc_id") +: TextAnalysis.qualityFeatures(col("text")): _*)
      .withColumn("quality", TextAnalysis.qualityExpr)
      .select(col("doc_id"),
        floor(col("quality") * lit(1000.0)).as("q_bin"),
        col("n_tokens"))
    val hist = d.groupBy(col("q_bin")).agg(sum(col("n_tokens")).as("bin_tokens"))
    // cumulative from the TOP over the bounded bin frame: tokens in
    // bins >= this one
    val w = Window.orderBy(col("q_bin").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("bin_tokens")).over(w))
      .select(col("q_bin"), col("cum"))
    // total from the bounded histogram, not a third corpus scan —
    // every doc lands in exactly one bin, so the sums are identical
    val budget = hist.agg(sum(col("bin_tokens")).as("total"))
      .select(expr(s"total div $BudgetDenom").as("budget"))
    d.join(broadcast(cum), Seq("q_bin"))
      .crossJoin(broadcast(budget))
      .select(col("doc_id"), col("q_bin"), col("n_tokens"),
        (col("cum") <= col("budget")).as("selected"))
  }

  // ---------------------------------------------------------------- //
  // Model-based quality filtering (the fastText-classifier stage of   //
  // CCNet/RefinedWeb-style pipelines): weak-label on a cheap rule,    //
  // train a hashed-feature linear scorer by counting, apply it in     //
  // the scan. Everything is exact integer arithmetic.                 //
  // ---------------------------------------------------------------- //

  val ClassifierBuckets = 64L
  private val SC = 1000000L

  /** Hashed-feature quality classifier, trained and applied in one
    * plan:
    *  1. weak label: `hq = 2·n_distinct ≥ n_tokens` (vocabulary
    *     diversity — the kind of cheap rule that bootstraps a real
    *     quality classifier);
    *  2. train by counting: every token hashes into one of 64 buckets
    *     (native PolyHash % B — feature hashing, Weinberger et al.
    *     2009); a bucket's weight is its Laplace-smoothed high-quality
    *     rate `SC·(pos+1) div (total+2)`, exact BIGINT;
    *  3. apply: a document's score is the integer mean of its tokens'
    *     bucket weights; predicted high-quality iff score ≥ SC/2.
    *
    * Scale shape: the token-grain frame aggregates to B = 64 weight
    * rows (map-side combined), which BROADCAST back onto the same
    * token frame; the only corpus-sized exchange is the per-doc score
    * aggregation keyed on doc_id. Two passes over the corpus — one to
    * train, one to score — is the honest cost of train-then-apply.
    * Swapping real trained weights for the counted ones changes only
    * the 64-row table. */
  def classifierQuality(spark: SparkSession, dir: String): DataFrame =
    classifierQualityOn(Tables.documents(spark, dir))

  /** The weak-labeled token-grain frame — (doc_id, hq) docs plus
    * (doc_id, hq, token, bucket) tokens, shared by training, scoring,
    * and the persisted-model probe. */
  private[operators] def classifierFrames(corpus: DataFrame): (DataFrame, DataFrame) = {
    val t = tokens(col("text"))
    val docs = corpus
      .select(col("doc_id"), t.as("toks"))
      .withColumn("hq",
        lit(2) * size(array_distinct(col("toks"))) >= size(col("toks")))
    val tok = docs
      .select(col("doc_id"), col("hq"), explode(col("toks")).as("token"))
      .withColumn("bucket", pmod(polyHash(col("token")), lit(ClassifierBuckets)))
    (docs, tok)
  }

  /** Score a token frame with a (bucket, w_sc) weight table — the
    * apply core shared by the fresh path and the persisted probe. */
  private[operators] def classifierScoreWith(tok: DataFrame, w: DataFrame): DataFrame =
    tok.join(broadcast(w), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum(w_sc) div count(*)").as("score_sc"))

  /** Train-and-score core over any (doc_id, text) frame. */
  def classifierQualityOn(corpus: DataFrame): DataFrame = {
    val (docs, tok) = classifierFrames(corpus)
    val w = tok.groupBy(col("bucket")).agg(
      expr(s"($SC * (sum(CASE WHEN hq THEN 1 ELSE 0 END) + 1)) div (count(*) + 2)")
        .as("w_sc"))
    val scored = classifierScoreWith(tok, w)
    // decision threshold = the corpus mean score (1-row broadcast):
    // mean-of-weights scores shrink toward the base rate as documents
    // grow (law of large numbers over ~50 tokens), so an absolute
    // SC/2 cut would be degenerate; the data-derived cut splits at the
    // distribution's center regardless of shrinkage
    val thr = scored.agg(expr("sum(score_sc) div count(*)").as("mean_sc"))
    scored.crossJoin(broadcast(thr))
      .join(docs.select(col("doc_id"), col("hq")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("score_sc"),
        (col("score_sc") >= col("mean_sc")).as("predicted_hq"),
        col("hq").as("label_hq"))
  }

  /** Write-once-per-generation quality-classifier artifact (persisted
    * MODEL family, with the char-LM and BPE tables): the 64-row
    * bucket-weight table plus a 1-row stats table holding the decision
    * threshold (corpus mean score) and the observed score range the
    * calibration report bins over. Everything downstream of the model
    * is exact integer arithmetic, so the persisted probes are
    * hash-identical to the recompute twins and share their oracles
    * verbatim. */
  private[graft] def ensureClassifierModel(spark: SparkSession, dir: String,
      tag: String = "", corpusFilter: Column = lit(true)): (String, String) = {
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    val wT = s"graft_clsw_idx_$sfx"
    val statsT = s"graft_clsstats_idx_$sfx"
    IndexStore.lock("cls_" + sfx).synchronized {
      if (!spark.catalog.tableExists(wT) ||
          !spark.catalog.tableExists(statsT)) {
        val (_, tok) = classifierFrames(
          Tables.documents(spark, dir).filter(corpusFilter))
        val w = tok.groupBy(col("bucket")).agg(
          expr(s"($SC * (sum(CASE WHEN hq THEN 1 ELSE 0 END) + 1)) div (count(*) + 2)")
            .as("w_sc"))
          .localCheckpoint() // feeds both the table write and the stats scoring
        w.coalesce(1)
          .write.mode("overwrite").format("parquet")
          .option("path", s"${IndexStore.root}/clsw_$sfx")
          .saveAsTable(wT)
        classifierScoreWith(tok, w)
          .agg(expr("sum(score_sc) div count(*)").as("mean_sc"),
            min(col("score_sc")).as("mn"), max(col("score_sc")).as("mx"))
          .coalesce(1)
          .write.mode("overwrite").format("parquet")
          .option("path", s"${IndexStore.root}/clsstats_$sfx")
          .saveAsTable(statsT)
      }
    }
    (wT, statsT)
  }

  /** Generation ROLLOVER for the classifier (see
    * [[TextAnalysis.rolloverCharLmModel]]): retrain weights, threshold,
    * and calibration range over corpus ∪ admitted under `newTag`. */
  private[graft] def rolloverClassifierModel(spark: SparkSession, dir: String,
      admittedDocs: DataFrame, newTag: String,
      corpusFilter: Column = lit(true)): (String, String) = {
    val sfx = IndexStore.suffix(dir, newTag, corpusFilter)
    val wT = s"graft_clsw_idx_$sfx"
    val statsT = s"graft_clsstats_idx_$sfx"
    IndexStore.lock("cls_" + sfx).synchronized {
      if (!spark.catalog.tableExists(wT) ||
          !spark.catalog.tableExists(statsT)) {
        val (_, tok) = classifierFrames(
          Tables.documents(spark, dir).filter(corpusFilter)
            .select(col("doc_id"), col("text"))
            .unionByName(admittedDocs.dropDuplicates("doc_id")
              .select(col("doc_id"), col("text"))))
        val w = tok.groupBy(col("bucket")).agg(
          expr(s"($SC * (sum(CASE WHEN hq THEN 1 ELSE 0 END) + 1)) div (count(*) + 2)")
            .as("w_sc"))
          .localCheckpoint()
        w.coalesce(1)
          .write.mode("overwrite").format("parquet")
          .option("path", s"${IndexStore.root}/clsw_$sfx")
          .saveAsTable(wT)
        classifierScoreWith(tok, w)
          .agg(expr("sum(score_sc) div count(*)").as("mean_sc"),
            min(col("score_sc")).as("mn"), max(col("score_sc")).as("mx"))
          .coalesce(1)
          .write.mode("overwrite").format("parquet")
          .option("path", s"${IndexStore.root}/clsstats_$sfx")
          .saveAsTable(statsT)
      }
    }
    (wT, statsT)
  }

  /** [[classifierQuality]] served from the persisted model: one corpus
    * pass (tokenize + score, the query's job), weights and threshold
    * loaded from the generation tables — no training aggregate in the
    * probe plan. */
  def classifierQualityPersisted(spark: SparkSession, dir: String): DataFrame = {
    val (wT, statsT) = ensureClassifierModel(spark, dir)
    val (docs, tok) = classifierFrames(Tables.documents(spark, dir))
    classifierScoreWith(tok, spark.table(wT))
      .crossJoin(broadcast(spark.table(statsT).select(col("mean_sc"))))
      .join(docs.select(col("doc_id"), col("hq")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("score_sc"),
        (col("score_sc") >= col("mean_sc")).as("predicted_hq"),
        col("hq").as("label_hq"))
  }

  /** [[classifierCalibration]] served from the persisted model — the
    * decile edges come off the persisted (mn, mx), so the report is a
    * single scan-score-bin pass. */
  def classifierCalibrationPersisted(spark: SparkSession, dir: String): DataFrame = {
    val (wT, statsT) = ensureClassifierModel(spark, dir)
    val (docs, tok) = classifierFrames(Tables.documents(spark, dir))
    classifierScoreWith(tok, spark.table(wT))
      .join(docs.select(col("doc_id"), col("hq").as("label_hq")), Seq("doc_id"))
      .crossJoin(broadcast(spark.table(statsT).select(col("mn"), col("mx"))))
      .withColumn("decile", expr("((score_sc - mn) * 10) div (mx - mn + 1)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label_hq"), lit(1L)).otherwise(lit(0L))).as("n_hq"))
      .withColumn("hq_rate_milli", expr("(1000 * n_hq) div n_docs"))
  }

  /** Calibration (reliability) table for the hashed classifier: docs
    * bucketed into ten equal-width bins of the OBSERVED score range
    * (min/max via a 1-row broadcast — fixed absolute deciles would
    * collapse into one bin under the mean-of-weights shrinkage), each
    * bin reporting its observed high-quality rate in milli — the
    * diagnostic that tells a curation team what a score cut means
    * before they pick a filtering threshold. A useful scorer shows
    * hq_rate_milli rising with the decile. */
  def classifierCalibration(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = classifierQualityOn(Tables.documents(spark, dir))
    val range = perDoc.agg(min(col("score_sc")).as("mn"), max(col("score_sc")).as("mx"))
    perDoc.crossJoin(broadcast(range))
      .withColumn("decile", expr("((score_sc - mn) * 10) div (mx - mn + 1)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label_hq"), lit(1L)).otherwise(lit(0L))).as("n_hq"))
      .withColumn("hq_rate_milli", expr("(1000 * n_hq) div n_docs"))
  }

  // ---------------------------------------------------------------- //
  // DSIR importance weights.                                         //
  // ---------------------------------------------------------------- //

  /** Hashed-n-gram feature space size for [[dsirWeights]] — DSIR's
    * dimensionality knob; 256 keeps the model a broadcastable
    * 256-row frame at ANY corpus size. */
  val DsirBuckets = 256

  // feature → bucket is the same cross-engine md5-prefix trick as
  // hashU — conv(substr(md5(f),1,4),16,10) % DsirBuckets — executed
  // fused inside TextFunctions.wordGramBuckets (HashExpressionsSpec
  // pins the native path against that exact column algebra)

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its hashed unigram+bigram bag
    * is under the TARGET-domain model than under the RAW-corpus model
    * (the released pipeline hashes both n-gram orders into one
    * feature space). The
    * target here is the English slice (the stand-in for "looks like
    * my high-quality domain sample"); both models are Laplace-smoothed
    * bucket unigram distributions over [[DsirBuckets]] hashed tokens.
    *
    * Exactness: the per-bucket log-ratio is micro-rounded to a BIGINT
    * ONCE (256 values), and each document's weight is the
    * order-independent INTEGER sum `Σ count_b · lr_micro[b]` — no
    * float accumulates across rows, so engines agree bit-for-bit (the
    * charLM convention, one step stronger: the only float op is 256
    * `ln` calls on small-integer rationals).
    *
    * Scale shape: two corpus passes (model, then scoring — the DSIR
    * shape), each a scan + ONE shuffle; the model pass reduces to a
    * 256-row frame whose totals ride a 1-row broadcast, and scoring
    * joins the 256-row log-ratio table by broadcast. `selected` is
    * the zero-threshold cut (more target-like than raw); a production
    * resample would feed `weight_micro` to the deterministic samplers
    * above. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirScoreWith(dsirToks(Tables.documents(spark, dir)),
      dsirModelCached(spark, dir))

  /** The 256-row count model, materialized once per (session, dir) —
    * the training pass is shared by the weights query, the resample,
    * and anything else scoring against this corpus (the tfsCached
    * convention); each consumer then pays only its own scoring scan,
    * which is the DSIR paper's steady-state cost. */
  private val dsirModelMemo = new DirMemo
  private def dsirModelCached(spark: SparkSession, dir: String): DataFrame =
    dsirModelMemo(spark, dir) {
      dsirCounts(dsirToks(Tables.documents(spark, dir))).localCheckpoint()
    }

  /** (doc_id, lang, bucket) feature-bucket frame shared by training,
    * scoring, and the persisted probe. Features are the hashed
    * UNIGRAMS AND adjacent-word BIGRAMS — Xie et al.'s released
    * pipeline hashes both into one bucket space; bigrams let the
    * importance model see word order, not just the bag. Both n-gram
    * kinds share the same [[DsirBuckets]]-bucket table, so the model
    * stays one broadcastable 256-row frame. */
  private[operators] def dsirToks(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextFunctions
          .wordGramBuckets(col("text"), DsirBuckets)).as("bucket"))

  /** The (bucket, c_r, c_t) count model off a token-bucket frame —
    * c_r counts every token (the raw distribution), c_t only the
    * target slice's (`lang = 'en'`; unlabeled rows count raw-only). */
  private def dsirCounts(toks: DataFrame): DataFrame =
    toks.groupBy("bucket")
      .agg(count(lit(1)).as("c_r"),
        count(when(col("lang") === "en", 1)).as("c_t"))

  /** Score a token frame with a (bucket, c_r, c_t) count model — the
    * apply core shared by the fresh path, the persisted probe, and the
    * model gate. Totals and log-ratios DERIVE from the tiny model here
    * (256-row aggregate + broadcast), so a persisted model stored as
    * raw counts reproduces the fresh path's floats bit for bit. The
    * log-ratio table is DENSIFIED over all [[DsirBuckets]] buckets —
    * a bucket the training corpus never produced gets the Laplace
    * unseen ratio ln((t_r+B)/(t_t+B)) instead of silently dropping
    * the token from the sum: a gate scoring off-distribution ARRIVALS
    * against a frozen model must count exactly the tokens the model
    * has no evidence for (on the training corpus itself every scored
    * bucket is observed, so this changes nothing there). */
  private[operators] def dsirScoreWith(toks: DataFrame, model: DataFrame): DataFrame = {
    val tot = model.agg(sum(col("c_r")).as("t_r"), sum(col("c_t")).as("t_t"))
    val dense = toks.sparkSession.range(DsirBuckets)
      .select(col("id").as("bucket"))
      .join(model, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_r"), lit(0L)).as("c_r"),
        coalesce(col("c_t"), lit(0L)).as("c_t"))
    val lr = dense.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(log(
          ((col("c_t") + 1).cast("double") *
            (col("t_r") + DsirBuckets).cast("double")) /
          ((col("c_r") + 1).cast("double") *
            (col("t_t") + DsirBuckets).cast("double"))) * 1e6, 0)
          .cast("long").as("lr_micro"))
    toks.join(broadcast(lr), "bucket")
      // lang rides as a grouping key (functionally dependent on
      // doc_id), keeping the corpus aggregate hash-based — a string
      // max/any_value in the agg list forces SortAggregate's two sorts
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_toks"),
        sum(col("lr_micro")).as("weight_micro"))
      .withColumn("selected", col("weight_micro") > 0)
      .select("doc_id", "lang", "n_toks", "weight_micro", "selected")
  }

  /** Write-once-per-generation DSIR model artifact (persisted MODEL
    * family, with the char-LM, classifier, and BPE tables): the
    * 256-row hashed-unigram count table (bucket, c_r, c_t), stored as
    * RAW COUNTS — totals and log-ratios derive at probe time from the
    * tiny table, so the persisted probe reproduces the recompute twin
    * bit for bit and shares its oracle verbatim. Counts are ADDITIVE
    * (like the text index's n_docs/sum_dl), so a retrain over corpus ∪
    * admitted is exact integer arithmetic with no order sensitivity.
    * Same staleness contract as the other models: admitting gates fold
    * docs into the BAND index only; DSIR scores every later arrival
    * with generation-G counts until the next rollover retrains. */
  private[graft] def ensureDsirModel(spark: SparkSession, dir: String,
      tag: String = "", corpusFilter: Column = lit(true)): String = {
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    val mT = s"graft_dsirm_idx_$sfx"
    IndexStore.lock("dsir_" + sfx).synchronized {
      if (!spark.catalog.tableExists(mT)) {
        dsirCounts(dsirToks(Tables.documents(spark, dir).filter(corpusFilter)))
          .coalesce(1)
          .write.mode("overwrite").format("parquet")
          .option("path", s"${IndexStore.root}/dsirm_$sfx")
          .saveAsTable(mT)
      }
    }
    mT
  }

  /** Generation ROLLOVER for the DSIR model: retrain the count table
    * over corpus ∪ admitted under `newTag`. Admitted docs arriving
    * through the gates carry no language label (the AdmissionLog
    * payload is (doc_id, text)) — they join the RAW distribution only,
    * which is the paper's shape: DSIR's target is a small curated
    * sample that stays fixed while the raw corpus grows. A caller that
    * HAS labels passes a frame with a `lang` column and its English
    * rows join the target sample too. */
  private[graft] def rolloverDsirModel(spark: SparkSession, dir: String,
      admittedDocs: DataFrame, newTag: String,
      corpusFilter: Column = lit(true)): String = {
    val sfx = IndexStore.suffix(dir, newTag, corpusFilter)
    val mT = s"graft_dsirm_idx_$sfx"
    val adm0 = admittedDocs.dropDuplicates("doc_id")
    val adm =
      if (adm0.columns.contains("lang"))
        adm0.select(col("doc_id"), col("lang"), col("text"))
      else adm0.select(col("doc_id"),
        lit(null).cast("string").as("lang"), col("text"))
    IndexStore.lock("dsir_" + sfx).synchronized {
      if (!spark.catalog.tableExists(mT)) {
        dsirCounts(dsirToks(
          Tables.documents(spark, dir).filter(corpusFilter)
            .select(col("doc_id"), col("lang"), col("text"))
            .unionByName(adm)))
          .coalesce(1)
          .write.mode("overwrite").format("parquet")
          .option("path", s"${IndexStore.root}/dsirm_$sfx")
          .saveAsTable(mT)
      }
    }
    mT
  }

  /** [[dsirWeights]] served from the persisted model: one corpus pass
    * (tokenize + score, the query's job), counts loaded from the
    * generation table — no training aggregate in the probe plan. */
  def dsirWeightsPersisted(spark: SparkSession, dir: String): DataFrame = {
    val mT = ensureDsirModel(spark, dir)
    dsirScoreWith(dsirToks(Tables.documents(spark, dir)), spark.table(mT))
  }

  /** Resample size for [[dsirResample]]. */
  val DsirResampleK = 100

  /** DSIR's selection step — sample K docs WITHOUT replacement with
    * probability ∝ importance weight — via the Gumbel top-k trick
    * (Vieira 2014; the mechanism Xie et al.'s released pipeline uses):
    * add independent Gumbel noise to each log-weight and take the top
    * K. The noise is hash-derived (`-ln(-ln(u))`, u the salted md5
    * uniform — the [[hashU]] convention, +1/65537 so u is never 0), so
    * the "random" sample is a pure function of the data: reproducible
    * across engines, retries, and cluster sizes. The key stays in
    * micro-nats (weight_micro is already 1e6·log w; the noise rounds
    * to the same grid), ties broken by doc_id.
    *
    * Scale shape: the weights pass (two scans, two shuffles) plus a
    * TakeOrderedAndProject — per-partition K-row heaps, a K-row driver
    * merge; no global sort, no Window. */
  def dsirResample(spark: SparkSession, dir: String): DataFrame =
    dsirResampleFrom(dsirWeights(spark, dir))

  /** [[dsirResample]] served from the persisted generation model —
    * the weights come off the frozen count table
    * ([[dsirWeightsPersisted]]), the Gumbel keys are the same pure
    * function of the data, so the sample is identical to the
    * recompute twin's (shared oracle) with no training aggregate in
    * the plan. */
  def dsirResamplePersisted(spark: SparkSession, dir: String): DataFrame =
    dsirResampleFrom(dsirWeightsPersisted(spark, dir))

  private def dsirResampleFrom(weights: DataFrame): DataFrame = {
    // 8 hex digits → 2^32 distinct uniforms: at corpus scale the
    // 16-bit version collided often enough that ties fell back to
    // doc_id order more than true Gumbel noise would; 32 bits keeps
    // the same salted-md5 oracle-replayable derivation
    val h = conv(substring(md5(
      concat(lit("dsir:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val gumbel = -log(-log((h + 1) / 4294967297.0))
    weights
      .withColumn("key_micro",
        col("weight_micro") + round(gumbel * 1e6, 0).cast("long"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(DsirResampleK)
      .select("doc_id", "lang", "weight_micro", "key_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_dsir_weights" -> ((s, d) => dsirWeights(s, d)),
    "curation_dsir_weights_persisted" -> ((s, d) => dsirWeightsPersisted(s, d)),
    "curation_dsir_resample" -> ((s, d) => dsirResample(s, d)),
    "curation_dsir_resample_persisted" -> ((s, d) => dsirResamplePersisted(s, d)),
    "text_classifier_calibration" -> ((s, d) => classifierCalibration(s, d)),
    "text_classifier_calibration_persisted" ->
      ((s, d) => classifierCalibrationPersisted(s, d)),
    "text_classifier_quality" -> ((s, d) => classifierQuality(s, d)),
    "text_classifier_quality_persisted" ->
      ((s, d) => classifierQualityPersisted(s, d)),
    "curriculum_stages" -> ((s, d) => curriculumStages(s, d)),
    "curation_token_budget" -> ((s, d) => tokenBudgetSelect(s, d)),
    "curation_ppl_filter" -> ((s, d) => pplFilter(s, d)),
    "curation_ppl_filter_persisted" -> ((s, d) => pplFilterPersisted(s, d)),
    "sample_priority" -> ((s, d) => samplePriority(s, d)),
    "sample_reservoir" -> ((s, d) => sampleReservoir(s, d)),
    "sample_reservoir_per_lang" -> ((s, d) => sampleReservoirPerLang(s, d)),
    "text_gopher_filters" -> ((s, d) => gopherFilters(s, d)),
    "text_repetition" -> ((s, d) => repetitionStats(s, d)),
    "text_scrub" -> ((s, d) => scrubPii(s, d)),
    "sample_hash" -> ((s, d) => sampleHash(s, d)),
    "sample_stratified" -> ((s, d) => sampleStratified(s, d)),
    "curation_temperature_mix" -> ((s, d) => temperatureMix(s, d)),
    "sample_splits" -> ((s, d) => assignSplits(s, d)),
    "pack_sequences" -> ((s, d) => packSequences(s, d)),
    "text_chunk_stride" -> ((s, d) => chunkStride(s, d)),
    "text_normalize" -> ((s, d) => normalizeText(s, d)),
    "curation_fim" -> ((s, d) => fimTransform(s, d)),
    "curation_source_kl" -> ((s, d) => sourceKl(s, d)),
    "pack_sequences_sorted" -> ((s, d) => packSequencesSorted(s, d)),
    "pack_efficiency" -> ((s, d) => packEfficiency(s, d)),
    "curation_ingest_kl" -> ((s, d) => ingestKl(s, d)),
    "mix_budget_alloc" -> ((s, d) => mixBudgetAlloc(s, d)),
    "mix_unimax_alloc" -> ((s, d) => mixUnimaxAlloc(s, d)),
    "mix_weights" -> ((s, d) => mixWeights(s, d)))

  private def sqlGrams(n: Int): String =
    if (n == 2) "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
    else "list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"

  // single line on purpose: this is spliced into stripMargin templates,
  // where a continuation line starting with '||' would lose a pipe
  private val sqlAug =
    "text || ' contact user' || doc_id::VARCHAR || '@mail.example.com or http://ex' || " +
      "doc_id::VARCHAR || '.com/page tel 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"

  // hashU replica: hex digits folded to an int (DuckDB lacks conv());
  // operators-visible so the split-leakage audit replays the SAME split
  private[operators] val sqlU =
    """list_reduce(list_transform(string_split(substr(md5(doc_id::VARCHAR || ':' || lang), 1, 4), ''),
      |  c -> strpos('0123456789abcdef', c) - 1), (a, b) -> a * 16 + b) / 65536.0""".stripMargin

  // hexLong replica: n md5-hex chars of the salted doc key folded to a
  // BIGINT (single line: spliced into stripMargin templates)
  private def sqlHexLong(salt: String, n: Int): String =
    s"list_reduce(list_transform(string_split(substr(md5('$salt|' || doc_id::VARCHAR), 1, $n), ''), " +
      s"c -> (strpos('0123456789abcdef', c) - 1)::BIGINT), (a, b) -> a * 16 + b)"

  private[operators] val stopEnSql =
    TextAnalysis.stop("en").map(w => s"'$w'").mkString(", ")

  // the DSIR training + scoring chain, shared by the weights and
  // resample oracles and (CTE-prefixed) the model-gate composition —
  // ends in `${p}w` = one row per tokenizable doc
  private[operators] def dsirCtes(p: String): String =
    s"""${p}tk AS (SELECT doc_id, lang,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |${p}e AS (SELECT doc_id, lang, unnest(toks) AS tok FROM ${p}tk
       |  UNION ALL
       |  SELECT doc_id, lang, unnest(${sqlGrams(2)}) AS tok FROM ${p}tk),
       |${p}eb AS (SELECT doc_id, lang,
       |    list_reduce(list_transform(string_split(substr(md5(tok), 1, 4), ''),
       |      c -> strpos('0123456789abcdef', c) - 1),
       |      (a, b) -> a * 16 + b) % $DsirBuckets AS bucket
       |  FROM ${p}e),
       |${p}m AS (SELECT bucket, count(*)::BIGINT AS c_r,
       |    (count(*) FILTER (WHERE lang = 'en'))::BIGINT AS c_t
       |  FROM ${p}eb GROUP BY 1),
       |${p}tot AS (SELECT sum(c_r)::BIGINT AS t_r, sum(c_t)::BIGINT AS t_t FROM ${p}m),
       |${p}dn AS (SELECT bucket,
       |    coalesce(c_r, 0)::BIGINT AS c_r, coalesce(c_t, 0)::BIGINT AS c_t
       |  FROM (SELECT unnest(range(0, $DsirBuckets))::BIGINT AS bucket) r
       |  LEFT JOIN ${p}m USING (bucket)),
       |${p}lr AS (SELECT bucket,
       |    round(ln(((c_t + 1)::DOUBLE * (t_r + $DsirBuckets)::DOUBLE) /
       |             ((c_r + 1)::DOUBLE * (t_t + $DsirBuckets)::DOUBLE))
       |      * 1000000.0)::BIGINT AS lr_micro
       |  FROM ${p}dn, ${p}tot),
       |${p}w AS (SELECT doc_id, lang, count(*)::BIGINT AS n_toks,
       |    sum(lr_micro)::BIGINT AS weight_micro,
       |    sum(lr_micro)::BIGINT > 0 AS selected
       |  FROM ${p}eb JOIN ${p}lr USING (bucket)
       |  GROUP BY doc_id, lang)""".stripMargin

  private val dsirChainSql: String = s"WITH ${dsirCtes("")}"

  // the hashed-classifier train + score chain, shared by the quality
  // report's oracle and the model-gate composition — ends in
  // sc(doc_id, n_tokens, score_sc), lab(doc_id, toks, hq), st(mean_sc)
  private[operators] val classifierCtes: String =
    s"""t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
       |lab AS (SELECT doc_id, toks, 2 * len(list_distinct(toks)) >= len(toks) AS hq FROM t),
       |tok AS (SELECT doc_id, hq, unnest(toks) AS token FROM lab),
       |b AS (SELECT doc_id, hq,
       |    list_reduce(list_prepend(0::BIGINT, list_transform(string_split(token, ''), c -> ascii(c)::BIGINT)),
       |      (a, c) -> (a * 31 + c) % 2147483647) % $ClassifierBuckets AS bucket
       |  FROM tok),
       |w AS (SELECT bucket,
       |    ($SC * (sum(CASE WHEN hq THEN 1 ELSE 0 END)::BIGINT + 1)) // (count(*)::BIGINT + 2) AS w_sc
       |  FROM b GROUP BY 1),
       |sc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |    sum(w_sc)::BIGINT // count(*)::BIGINT AS score_sc
       |  FROM b JOIN w USING (bucket) GROUP BY 1),
       |st AS (SELECT sum(score_sc) // count(*) AS mean_sc FROM sc)""".stripMargin

  private val oracleBase: Map[String, String] = Map(
    "curation_dsir_weights" ->
      s"""$dsirChainSql
         |SELECT doc_id, lang, n_toks, weight_micro, selected
         |FROM w ORDER BY doc_id""".stripMargin,
    "curation_dsir_resample" ->
      s"""$dsirChainSql
         |SELECT doc_id, lang, weight_micro,
         |  weight_micro + round(-ln(-ln(
         |    (list_reduce(list_transform(
         |       string_split(substr(md5('dsir:' || doc_id::VARCHAR), 1, 8), ''),
         |       c -> strpos('0123456789abcdef', c) - 1),
         |       (a, b) -> a * 16 + b) + 1) / 4294967297.0))
         |    * 1000000.0)::BIGINT AS key_micro
         |FROM w ORDER BY key_micro DESC, doc_id LIMIT $DsirResampleK""".stripMargin,
    "curation_token_budget" ->
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |d AS (SELECT doc_id,
         |    floor((${TextAnalysis.qualitySql}) * 1000)::BIGINT AS q_bin,
         |    len(toks)::BIGINT AS n_tokens FROM t),
         |h AS (SELECT q_bin, sum(n_tokens)::BIGINT AS bin_tokens FROM d GROUP BY 1),
         |c AS (SELECT q_bin, sum(bin_tokens) OVER (ORDER BY q_bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         |  FROM h),
         |tot AS (SELECT sum(n_tokens)::BIGINT // $BudgetDenom AS budget FROM d)
         |SELECT d.doc_id, d.q_bin, d.n_tokens, (c.cum <= tot.budget) AS selected
         |FROM d JOIN c USING (q_bin), tot
         |ORDER BY 1""".stripMargin,
    "curriculum_stages" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
        |b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi, count(*)::BIGINT AS n FROM d),
        |b2 AS (SELECT lo, hi, n, (hi - lo + 1000) // 1000 AS bw FROM b),
        |h AS (SELECT (n_chars - lo) // bw AS bin, count(*)::BIGINT AS cnt FROM d, b2 GROUP BY 1),
        |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum FROM h),
        |t AS (SELECT p, (p * n + 99) // 100 AS target, lo, bw
        |  FROM b2, (SELECT unnest([25, 50, 75]) AS p)),
        |q AS (SELECT p, lo + min(bin) * bw AS cut
        |  FROM t JOIN c ON c.cum >= t.target GROUP BY p, lo, bw),
        |cuts AS (SELECT max(CASE WHEN p = 25 THEN cut END) AS q1,
        |    max(CASE WHEN p = 50 THEN cut END) AS q2,
        |    max(CASE WHEN p = 75 THEN cut END) AS q3 FROM q)
        |SELECT doc_id, n_chars,
        |  (CASE WHEN n_chars <= q1 THEN 1 WHEN n_chars <= q2 THEN 2
        |        WHEN n_chars <= q3 THEN 3 ELSE 4 END)::BIGINT AS stage
        |FROM d, cuts ORDER BY doc_id""".stripMargin,
    "sample_priority" ->
      s"""WITH h0 AS (SELECT doc_id, n_chars,
         |    ${Sketches.foldSql("doc_id::VARCHAR", 31L, 0L)} AS f FROM documents),
         |p AS (SELECT doc_id, n_chars,
         |    (n_chars * 4294967296) // ((${Sketches.mixColSql("f")}) + 1) AS priority
         |  FROM h0),
         |r AS (SELECT doc_id, n_chars, priority,
         |    row_number() OVER (ORDER BY priority DESC, doc_id) AS rnk FROM p)
         |SELECT rnk, doc_id, n_chars, priority::BIGINT AS priority FROM r
         |WHERE rnk <= $PriorityK ORDER BY rnk""".stripMargin,
    "sample_reservoir_per_lang" ->
      s"""WITH h0 AS (SELECT doc_id, lang,
         |    ${Sketches.foldSql("doc_id::VARCHAR", 31L, 0L)} AS f FROM documents),
         |h AS (SELECT doc_id, lang, ${Sketches.mixColSql("f")} AS x FROM h0),
         |r AS (SELECT doc_id, lang, x,
         |    row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rnk FROM h)
         |SELECT lang, rnk, doc_id, x::BIGINT AS hash_val FROM r
         |WHERE rnk <= $StratumK ORDER BY lang, rnk""".stripMargin,
    // the oracle states the semantic definition — the global hash-order
    // sort the bounded aggregator must reproduce exactly
    "curation_ppl_filter" ->
      s"""WITH ${TextAnalysis.charLmCtes},
         |lmm AS (SELECT doc_id, round(nll_nats * 1000000.0)::BIGINT AS nll_micro FROM lm),
         |h0 AS (SELECT doc_id, ${Sketches.foldSql("doc_id::VARCHAR", 31L, 0L)} AS f FROM lmm),
         |h AS (SELECT doc_id, ${Sketches.mixColSql("f")} AS x FROM h0),
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY x, doc_id) AS rnk FROM h),
         |samp AS (SELECT list_sort(list(l.nll_micro)) AS s
         |  FROM r JOIN lmm l USING (doc_id) WHERE rnk <= $ReservoirK),
         |th AS (SELECT list_extract(s, greatest(1, least(len(s), $PplLowPos))) AS t_low,
         |    list_extract(s, greatest(1, least(len(s), $PplHighPos))) AS t_high FROM samp)
         |SELECT l.doc_id, l.nll_micro,
         |  (CASE WHEN l.nll_micro <= t.t_low THEN 'head'
         |        WHEN l.nll_micro <= t.t_high THEN 'middle'
         |        ELSE 'tail' END) AS bucket,
         |  (l.nll_micro <= t.t_high) AS keep
         |FROM lmm l, th t ORDER BY l.doc_id""".stripMargin,
    "sample_reservoir" ->
      s"""WITH h0 AS (SELECT doc_id, lang,
         |    ${Sketches.foldSql("doc_id::VARCHAR", 31L, 0L)} AS f FROM documents),
         |h AS (SELECT doc_id, lang, ${Sketches.mixColSql("f")} AS x FROM h0),
         |r AS (SELECT doc_id, lang, x,
         |    row_number() OVER (ORDER BY x, doc_id) AS rnk FROM h)
         |SELECT rnk, doc_id, lang, x::BIGINT AS hash_val FROM r
         |WHERE rnk <= $ReservoirK ORDER BY rnk""".stripMargin,
    "text_gopher_filters" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
         |f AS (SELECT doc_id,
         |    len(toks)::BIGINT AS n_words,
         |    list_reduce(list_prepend(0::BIGINT, list_transform(toks, x -> length(x)::BIGINT)), (a, b) -> a + b) AS sum_len,
         |    len(list_distinct(toks))::BIGINT AS n_distinct,
         |    len(list_filter(toks, x -> x IN ($stopEnSql)))::BIGINT AS stop_hits,
         |    len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+${"$"}')))::BIGINT AS n_alpha
         |  FROM t)
         |SELECT doc_id, n_words,
         |  sum_len * 1000 // n_words AS mean_len_milli,
         |  n_distinct * 1000 // n_words AS diversity_milli,
         |  stop_hits,
         |  n_alpha * 1000 // n_words AS alpha_frac_milli,
         |  (n_words BETWEEN 30 AND 100000
         |    AND sum_len * 1000 // n_words BETWEEN 3000 AND 10000
         |    AND n_distinct * 1000 // n_words >= 350
         |    AND stop_hits >= 2
         |    AND n_alpha * 1000 // n_words >= 800) AS keep
         |FROM f ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
         |g2 AS (SELECT doc_id, unnest(${sqlGrams(2)}) AS gram FROM t WHERE len(toks) >= 2),
         |g3 AS (SELECT doc_id, unnest(${sqlGrams(3)}) AS gram FROM t WHERE len(toks) >= 3),
         |a2 AS (SELECT doc_id, max(c)::BIGINT AS max2, sum(c)::BIGINT AS n2
         |  FROM (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
         |a3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup3, sum(c)::BIGINT AS n3
         |  FROM (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1)
         |SELECT t.doc_id,
         |  max2::DOUBLE / n2 AS top2gram_frac,
         |  dup3::DOUBLE / n3 AS dup3gram_frac,
         |  (max2::DOUBLE / n2 > 0.18 OR dup3::DOUBLE / n3 > 0.30) AS repetitive
         |FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "text_scrub" ->
      s"""WITH a AS (SELECT doc_id, $sqlAug AS aug FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(aug, '$EmailRe'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(aug, '$UrlRe'))::BIGINT AS n_urls,
         |  len(regexp_extract_all(aug, '$PhoneRe'))::BIGINT AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$EmailRe', '<EMAIL>', 'g'), '$UrlRe', '<URL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |FROM a ORDER BY doc_id""".stripMargin,
    "sample_hash" ->
      """SELECT doc_id, lang, substr(md5(doc_id::VARCHAR || ':' || lang), 1, 8) AS bucket
        |FROM documents
        |WHERE substr(md5(doc_id::VARCHAR || ':' || lang), 1, 1) = '0'
        |ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      s"""SELECT doc_id, lang, $sqlU AS u
         |FROM documents
         |WHERE $sqlU < CASE lang WHEN 'en' THEN 0.25 WHEN 'es' THEN 0.5
         |  WHEN 'de' THEN 0.75 WHEN 'fr' THEN 1.0 WHEN 'zh' THEN 1.0 ELSE 1.0 END
         |ORDER BY doc_id""".stripMargin,
    // sqrt is correctly rounded by IEEE mandate in both engines; the
    // Σw normalizer folds in lang order exactly like the engine's
    // array_sort + aggregate
    "curation_temperature_mix" ->
      s"""WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
         |t AS (SELECT sum(n_docs)::BIGINT AS total FROM c),
         |rw AS (SELECT lang, n_docs,
         |    sqrt(n_docs::DOUBLE / total::DOUBLE) AS w FROM c, t),
         |s AS (SELECT list_reduce(list_prepend(0.0::DOUBLE, list(w ORDER BY lang)),
         |    (a, v) -> a + v) AS wsum FROM rw)
         |SELECT lang, n_docs,
         |  CAST(round(w / wsum * 1000000, 0) AS BIGINT) AS weight_micro,
         |  CAST(round(w / wsum * $MixBudget, 0) AS BIGINT) AS expected_docs
         |FROM rw, s ORDER BY lang""".stripMargin,
    "sample_splits" ->
      s"""SELECT doc_id, lang,
         |  CASE WHEN $sqlU < 0.8 THEN 'train'
         |       WHEN $sqlU < 0.9 THEN 'val' ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
        |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> text AS changed,
        |  (length(text) - length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))::BIGINT
        |    AS chars_removed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      s"""WITH t AS (SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens,
         |    (doc_id % $PackBuckets)::INT AS bucket
         |  FROM documents),
         |c AS (SELECT doc_id, bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
         |  FROM t)
         |SELECT doc_id, bucket, n_tokens, (cum - n_tokens) // $PackCapacity AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    // the classifier CTE chain + decile bucketing; same integer div
    "text_classifier_calibration" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
         |lab AS (SELECT doc_id, toks, 2 * len(list_distinct(toks)) >= len(toks) AS hq FROM t),
         |tok AS (SELECT doc_id, hq, unnest(toks) AS token FROM lab),
         |b AS (SELECT doc_id, hq,
         |    list_reduce(list_prepend(0::BIGINT, list_transform(string_split(token, ''), c -> ascii(c)::BIGINT)),
         |      (a, c) -> (a * 31 + c) % 2147483647) % $ClassifierBuckets AS bucket
         |  FROM tok),
         |w AS (SELECT bucket,
         |    ($SC * (sum(CASE WHEN hq THEN 1 ELSE 0 END)::BIGINT + 1)) // (count(*)::BIGINT + 2) AS w_sc
         |  FROM b GROUP BY 1),
         |sc AS (SELECT doc_id, sum(w_sc)::BIGINT // count(*)::BIGINT AS score_sc
         |  FROM b JOIN w USING (bucket) GROUP BY 1),
         |rg AS (SELECT min(score_sc) AS mn, max(score_sc) AS mx FROM sc),
         |d AS (SELECT l.doc_id, ((s.score_sc - rg.mn) * 10) // (rg.mx - rg.mn + 1) AS decile, l.hq
         |  FROM sc s JOIN lab l USING (doc_id), rg)
         |SELECT decile, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN hq THEN 1 ELSE 0 END)::BIGINT AS n_hq,
         |  (1000 * sum(CASE WHEN hq THEN 1 ELSE 0 END)::BIGINT) // count(*)::BIGINT AS hq_rate_milli
         |FROM d GROUP BY 1 ORDER BY decile""".stripMargin,
    // per-token 31-ary polynomial hash fold (the fp31 replica) mod the
    // bucket count; weights and scores in the same integer divisions
    "text_classifier_quality" ->
      s"""WITH $classifierCtes
         |SELECT s.doc_id, s.n_tokens, s.score_sc,
         |  s.score_sc >= st.mean_sc AS predicted_hq, l.hq AS label_hq
         |FROM sc s JOIN lab l USING (doc_id), st
         |ORDER BY s.doc_id""".stripMargin,
    // DuckDB list slices are 1-based and inclusive on both ends:
    // toks[s+1 : s+W] is Spark's slice(toks, s+1, W)
    "text_chunk_stride" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
         |s AS (SELECT doc_id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0),
         |c AS (SELECT doc_id, toks, n, unnest(range(0, n, $ChunkStride))::BIGINT AS start_tok FROM s)
         |SELECT doc_id, start_tok // $ChunkStride AS chunk_idx, start_tok,
         |  least($ChunkTokens, n - start_tok)::BIGINT AS n_chunk_tokens,
         |  array_to_string(toks[(start_tok + 1)::INT : (start_tok + $ChunkTokens)::INT], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "mix_weights" ->
      """WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs,
        |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY lang),
        |t AS (SELECT sum(n_docs)::BIGINT AS total_docs, sum(sqrt(n_docs::DOUBLE)) AS sum_sqrt FROM g)
        |SELECT lang, n_docs, n_tokens,
        |  round(n_docs / total_docs::DOUBLE, 9) AS p,
        |  round(sqrt(n_docs::DOUBLE) / sum_sqrt, 9) AS weight
        |FROM g, t ORDER BY lang""".stripMargin,
    // md5-hex-prefix fold to BIGINT (hexLong replica; DuckDB lacks conv)
    "curation_fim" ->
      s"""WITH h AS (SELECT doc_id, text, length(text)::BIGINT AS len,
         |    ${sqlHexLong("fim", 1)} AS g,
         |    ${sqlHexLong("fima", 8)} AS h1,
         |    ${sqlHexLong("fimb", 8)} AS h2
         |  FROM documents),
         |f AS (SELECT doc_id, text, len, h1, h2,
         |    (g < $FimNibbles AND len >= 2) AS fim_applied FROM h),
         |a AS (SELECT *, CASE WHEN fim_applied
         |    THEN 1 + h1 % (len - 1) ELSE 0 END AS cut_a FROM f),
         |b AS (SELECT *, CASE WHEN fim_applied
         |    THEN cut_a + 1 + h2 % (len - cut_a) ELSE 0 END AS cut_b FROM a)
         |SELECT doc_id, fim_applied, cut_a, cut_b,
         |  CASE WHEN fim_applied
         |    THEN '$FimPre' || substr(text, 1, cut_a::INT)
         |      || '$FimSuf' || substr(text, (cut_b + 1)::INT, len::INT)
         |      || '$FimMid' || substr(text, (cut_a + 1)::INT, (cut_b - cut_a)::INT)
         |    ELSE text END AS fim_text
         |FROM b ORDER BY doc_id""".stripMargin,
    "pack_sequences_sorted" ->
      s"""WITH t AS (SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens,
         |    (doc_id % $PackBuckets)::INT AS bucket
         |  FROM documents),
         |c AS (SELECT doc_id, bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
         |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
         |  FROM t)
         |SELECT doc_id, bucket, n_tokens, (cum - n_tokens) // $PackCapacity AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "pack_efficiency" ->
      s"""WITH t AS (SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens,
         |    (doc_id % $PackBuckets)::INT AS bucket
         |  FROM documents),
         |c1 AS (SELECT bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum FROM t),
         |c2 AS (SELECT bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
         |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum FROM t),
         |b1 AS (SELECT bucket, (cum - n_tokens) // $PackCapacity AS seq_id,
         |    sum(n_tokens)::BIGINT AS bin_tokens FROM c1 GROUP BY 1, 2),
         |b2 AS (SELECT bucket, (cum - n_tokens) // $PackCapacity AS seq_id,
         |    sum(n_tokens)::BIGINT AS bin_tokens FROM c2 GROUP BY 1, 2)
         |SELECT 'doc_order' AS strategy, count(*)::BIGINT AS n_seqs,
         |  sum(greatest(0, $PackCapacity - bin_tokens))::BIGINT AS padding_tokens,
         |  sum(greatest(0, bin_tokens - $PackCapacity))::BIGINT AS overflow_tokens,
         |  1000 * sum(least(bin_tokens, $PackCapacity))::BIGINT
         |    // (count(*)::BIGINT * $PackCapacity) AS utilization_milli
         |FROM b1
         |UNION ALL
         |SELECT 'length_sorted', count(*)::BIGINT,
         |  sum(greatest(0, $PackCapacity - bin_tokens))::BIGINT,
         |  sum(greatest(0, bin_tokens - $PackCapacity))::BIGINT,
         |  1000 * sum(least(bin_tokens, $PackCapacity))::BIGINT
         |    // (count(*)::BIGINT * $PackCapacity)
         |FROM b2 ORDER BY strategy""".stripMargin,
    // same windows, same no-division saturation criterion, same
    // integer level — all BIGINT, parity unconditional
    "mix_budget_alloc" ->
      s"""WITH a AS (SELECT source,
         |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT AS avail
         |  FROM documents GROUP BY 1),
         |t AS (SELECT sum(avail)::BIGINT AS total, count(*)::BIGINT AS n,
         |    sum(avail)::BIGINT * $MixBudgetNum // $MixBudgetDen AS b FROM a),
         |r AS (SELECT source, avail,
         |    row_number() OVER (ORDER BY avail, source)::BIGINT AS r,
         |    coalesce(sum(avail) OVER (ORDER BY avail, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS pprev
         |  FROM a),
         |s AS (SELECT r.*, t.n, t.b,
         |    (t.b - r.pprev - r.avail * (t.n - r.r + 1) >= 0) AS saturated
         |  FROM r, t),
         |c AS (SELECT sum(CASE WHEN saturated THEN 1 ELSE 0 END)::BIGINT AS k,
         |    coalesce(sum(CASE WHEN saturated THEN avail END), 0)::BIGINT AS pk
         |  FROM s)
         |SELECT source, avail AS avail_tokens,
         |  CASE WHEN saturated THEN avail ELSE (b - pk) // (n - k) END AS allocated,
         |  saturated
         |FROM s, c ORDER BY source""".stripMargin,
    // the same water-fill algebra on cap = epochs·avail; the one
    // float is epochs = allocated/avail, rounded 6 dp in both engines
    "mix_unimax_alloc" ->
      s"""WITH a AS (SELECT source,
         |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT AS avail,
         |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
         |      * $UnimaxEpochs AS cap
         |  FROM documents GROUP BY 1),
         |t AS (SELECT sum(avail)::BIGINT AS total, count(*)::BIGINT AS n,
         |    sum(avail)::BIGINT * $UnimaxBudgetNum // $UnimaxBudgetDen AS b FROM a),
         |r AS (SELECT source, avail, cap,
         |    row_number() OVER (ORDER BY cap, source)::BIGINT AS r,
         |    coalesce(sum(cap) OVER (ORDER BY cap, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS pprev
         |  FROM a),
         |s AS (SELECT r.*, t.n, t.b,
         |    (t.b - r.pprev - r.cap * (t.n - r.r + 1) >= 0) AS saturated
         |  FROM r, t),
         |c AS (SELECT sum(CASE WHEN saturated THEN 1 ELSE 0 END)::BIGINT AS k,
         |    coalesce(sum(CASE WHEN saturated THEN cap END), 0)::BIGINT AS pk
         |  FROM s)
         |SELECT source, avail AS avail_tokens, cap AS cap_tokens,
         |  CASE WHEN saturated THEN cap ELSE (b - pk) // (n - k) END AS allocated,
         |  round((CASE WHEN saturated THEN cap ELSE (b - pk) // (n - k) END)::DOUBLE
         |    / avail, 6) AS epochs,
         |  saturated
         |FROM s, c ORDER BY source""".stripMargin,
    // recomputes the persisted postings from raw documents — the
    // persisted ≡ recompute discipline for the monitor's q side
    "curation_ingest_kl" ->
      s"""WITH tk AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
         |  FROM documents),
         |t AS (SELECT token, count(*)::BIGINT AS c_t FROM tk GROUP BY 1),
         |n AS (SELECT sum(c_t)::BIGINT AS n FROM t),
         |b AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
         |  FROM documents WHERE doc_id % $IngestKlBatchMod = 0),
         |bt AS (SELECT token, count(*)::BIGINT AS c_bt FROM b GROUP BY 1),
         |j AS (SELECT bt.token, c_bt, t.c_t FROM bt LEFT JOIN t USING (token)),
         |a AS (SELECT coalesce(sum(c_bt), 0)::BIGINT AS n_tokens,
         |    count(*)::BIGINT AS n_batch_vocab,
         |    coalesce(sum(CASE WHEN c_t IS NULL THEN c_bt END), 0)::BIGINT AS oov_tokens,
         |    coalesce(sum(CASE WHEN c_t IS NOT NULL THEN c_bt END), 0)::BIGINT AS n_in,
         |    sum(CASE WHEN c_t IS NOT NULL
         |      THEN c_bt::DOUBLE * ln(c_bt::DOUBLE * n / c_t::DOUBLE) END) AS s_raw
         |  FROM j, n)
         |SELECT n_tokens, n_batch_vocab, oov_tokens,
         |  1000 * oov_tokens // n_tokens AS oov_milli,
         |  round(CASE WHEN n_in > 0 THEN s_raw / n_in - ln(n_in::DOUBLE)
         |    ELSE 0.0 END, 6) + 0.0 AS kl_nats
         |FROM a""".stripMargin,
    "curation_source_kl" ->
      """WITH tk AS (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, count(*)::BIGINT AS c_st FROM tk GROUP BY 1, 2),
        |s AS (SELECT source, sum(c_st)::BIGINT AS n_s FROM st GROUP BY 1),
        |t AS (SELECT tok, sum(c_st)::BIGINT AS c_t FROM st GROUP BY 1),
        |n AS (SELECT sum(c_t)::BIGINT AS n FROM t)
        |SELECT st.source, s.n_s AS n_tokens, count(*)::BIGINT AS n_vocab,
        |  round(sum(c_st::DOUBLE / n_s * ln(c_st::DOUBLE * n / (n_s::DOUBLE * c_t))), 6)
        |    + 0.0 AS kl_nats
        |FROM st JOIN t USING (tok) JOIN s USING (source), n
        |GROUP BY 1, 2 ORDER BY st.source""".stripMargin)

  /** Persisted-model twins share the recompute oracles verbatim — the
    * driver-level proof that loading the generation artifact changes
    * nothing a query can observe. */
  val oracle: Map[String, String] = oracleBase ++ Map(
    "text_classifier_quality_persisted" ->
      oracleBase("text_classifier_quality"),
    "text_classifier_calibration_persisted" ->
      oracleBase("text_classifier_calibration"),
    "curation_ppl_filter_persisted" -> oracleBase("curation_ppl_filter"),
    "curation_dsir_weights_persisted" -> oracleBase("curation_dsir_weights"),
    "curation_dsir_resample_persisted" -> oracleBase("curation_dsir_resample"))
}
