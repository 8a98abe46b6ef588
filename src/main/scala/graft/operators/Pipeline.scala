package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** End-to-end training-corpus cleaning — the composition the whole
  * extension suite exists for, in one declarative plan:
  *
  *   quality-filter → exact-dedup canonicalization → deterministic
  *   sampling → embedding enrichment → per-source accounting.
  *
  * Everything stays one Catalyst plan: the quality score and digest
  * compute in the scan projection, dedup is one shuffle, the sample is
  * a hash predicate (pushable, reproducible — `rand()` sampling breaks
  * retries and can't be oracle-checked), and the enrichment join keys
  * on the canonical id. At 100 TB this is exactly one pass over the
  * corpus plus one dedup shuffle plus one join.
  */
object Pipeline {

  val QualityMin = 0.5
  val SamplePct = 80 // keep 80% of surviving docs, by fingerprint bucket

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    // THE suite's quality blend (TextAnalysis.qualityExpr) — not a
    // local re-implementation that could drift from text_quality
    val scored = Tables.documents(spark, dir)
      .select(Seq(col("doc_id"), col("text"), col("source")) ++
        TextAnalysis.qualityFeatures(col("text")): _*)
      .withColumn("quality", TextAnalysis.qualityExpr)
      .filter(col("quality") >= QualityMin)
    // canonical doc per digest: keep only the minimum doc_id of each
    // exact-duplicate group (a window-free self-semi-join shape)
    val canon = scored
      .withColumn("digest", md5(col("text")))
      .withColumn("canonical_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("canonical_id"))
    // deterministic sample: fingerprint bucket < pct
    val sampled = canon.filter(polyHash(col("text")) % 100 < SamplePct)
    // enrich with the embedding's cluster label (doc_id = vec_id here)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("label"))
    sampled.join(emb, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("label")).as("n_labels"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  /** [[cleanCorpus]] instrumented with per-stage data-quality counters
    * via `observe()` — the operational must-have at 100 TB: every
    * filter stage reports what it dropped WITHOUT a second pass
    * (`observe` metrics piggyback the existing action as accumulators;
    * a count() per stage would re-scan the corpus once per counter).
    * Returns the same DataFrame plus the Observations to read after
    * the action completes. */
  def cleanCorpusObserved(spark: SparkSession, dir: String)
      : (DataFrame, org.apache.spark.sql.Observation, org.apache.spark.sql.Observation) = {
    import org.apache.spark.sql.Observation
    val inObs = Observation("clean_in")
    val keptObs = Observation("clean_kept")
    val scored = Tables.documents(spark, dir)
      .select(Seq(col("doc_id"), col("text"), col("source")) ++
        TextAnalysis.qualityFeatures(col("text")): _*)
      .withColumn("quality", TextAnalysis.qualityExpr)
      .observe(inObs, count(lit(1)).as("n_in"),
        count(when(col("quality") < QualityMin, 1)).as("n_low_quality"))
      .filter(col("quality") >= QualityMin)
    val canon = scored
      .withColumn("digest", md5(col("text")))
      .withColumn("canonical_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("canonical_id"))
    val sampled = canon.filter(polyHash(col("text")) % 100 < SamplePct)
      .observe(keptObs, count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("kept_tokens"))
    (sampled.select(col("doc_id"), col("source"), col("n_tokens")), inObs, keptObs)
  }

  /** A doc surviving span-scrub must keep at least this many tokens. */
  val SpanCleanMinTokens = 10L

  /** The SPAN-level cleaning composition — the end-to-end shape of the
    * suffix-array dedup pipelines (Lee et al. 2022): duplicate-span
    * removal accounting → minimum-surviving-length gate → per-source
    * report (docs in/kept, tokens in/kept, scrub fraction). Composes
    * Dedup.spanSavings (kept tokens = n − removed; no text rebuild
    * needed for accounting) with the doc gate, so the whole report is
    * the span pipeline plus ONE corpus-scan join and a |sources|-row
    * aggregate. */
  def spanCleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val sav = Dedup.spanSavings(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("removed_tokens"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(sav, "doc_id")
      .withColumn("kept", col("n_tokens") - col("removed_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_in"),
        sum(col("kept")).as("tokens_kept"),
        sum(when(col("kept") >= SpanCleanMinTokens, 1L).otherwise(0L))
          .as("n_docs_kept"))
      .withColumn("scrub_milli",
        when(col("tokens_in") > 0,
          expr("(tokens_in - tokens_kept) * 1000 div tokens_in"))
          .otherwise(lit(0L)))
  }

  /** The batch crawl pipeline end to end, ONE Catalyst plan: WARC
    * archive read (Content-Length framing, one task per file) →
    * boilerplate extraction → Gopher quality gate. Because the WARC
    * roundtrip is lossless and extraction is lossless for content
    * blocks, the verdicts must hash-match the parquet-fed
    * text_html_gopher — which is exactly what the oracle asserts: the
    * archive hop and the framing parser cannot silently alter a single
    * document without breaking parity. This is the composition a real
    * crawl run executes from its first byte. */
  def crawlPipeline(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.WarcIO.ensureArchive(spark, dir)
    val docs = graft.sources.WarcIO.read(spark, path)
      .select(col("doc_id"), col("payload").as("text"))
    Curation.gopherOn(Html.extractOn(docs), col("main_text"))
  }

  /** The FULL ingest verdict per arriving page, one reason each —
    * the production crawl-ingest stage order in a single per-batch
    * plan: boilerplate-extract, quality-gate the extracted text
    * (cheap scan, no join), and probe the persisted dedup band index
    * ONLY for quality survivors (the expensive join never sees
    * rejected pages). Totality: every arriving doc_id emits exactly
    * one row with reason ∈ {no_content, quality, duplicate, keep} —
    * no_content when nothing shingleable survived extraction (such a
    * page cannot be judged against the corpus; it also always fails
    * the quality gate, so the ordering no_content-before-quality is a
    * classification choice, not a behavior change).
    *
    * At 100 TB: extraction + quality are the map-side pass; the probe
    * shuffles only quality-passers' bands into the static bucketed
    * index — the gate's cost per batch is proportional to what
    * SURVIVES, not what arrives. */
  private[graft] def ingestVerdictFor(spark: SparkSession, batch: DataFrame,
      bandsT: String, setsT: String): DataFrame =
    ingestVerdictOnExtracted(spark, extractedOf(batch), bandsT, setsT)

  /** The gate's ONE extraction pass, materialized — split out so the
    * admitting full-ingest gate can reuse the extracted frame for its
    * admission merge (the index stores MAIN TEXT: future arrivals are
    * probed extracted-vs-extracted) without extracting twice. */
  private[graft] def extractedOf(batch: DataFrame): DataFrame =
    Html.extractOn(batch.dropDuplicates("doc_id"))
      .select(col("doc_id"), col("main_text").as("text"))
      .localCheckpoint()

  private[graft] def ingestVerdictOnExtracted(spark: SparkSession,
      extracted: DataFrame, bandsT: String, setsT: String): DataFrame = {
    // ONE extraction pass and ONE shingle pass, materialized: the lazy
    // composition re-ran the extractor in every branch that consumed it
    // (quality, shingles, totality spine — extraction is the gate's
    // most expensive scan work), and it MinHash-signed every
    // shingleable doc before the quality join, discarding rejected
    // docs' signatures after the fact. Now `base` carries one row per
    // page (doc_id, codes, sz, q_keep) and signatures are computed
    // ONLY for quality survivors — the stage-order economics ("the
    // index join pays only for what survives") taken down to the
    // signature expression itself. Verdicts are unchanged row-for-row.
    val base = Dedup.shingledOn(extracted)
      .join(Curation.gopherOn(extracted, col("text"))
        .select(col("doc_id"), col("keep").as("q_keep")), Seq("doc_id"))
      .localCheckpoint()
    val probed = Dedup.probeBandIndex(spark,
      Dedup.signaturesOnSh(base.filter(col("q_keep"))),
      bandsT, setsT)
    base
      .join(probed.select(col("batch_id").as("doc_id"), col("n_dups"),
        col("best_jaccard")), Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("sz") <= 0, lit("no_content"))
          .when(!col("q_keep"), lit("quality"))
          .when(coalesce(col("n_dups"), lit(0L)) > 0, lit("duplicate"))
          .otherwise(lit("keep")))
      .select(col("doc_id"), col("reason"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("best_jaccard"),
        (col("reason") === "keep").as("keep"))
  }

  /** Batch drill of the composed gate: the mod-4 held-out documents
    * arrive as pages against the persisted index over everything
    * else — oracle-replayed end to end (extraction, Gopher verdict,
    * banded MinHash probe of extracted-vs-raw shingles). */
  def ingestGatePipeline(spark: SparkSession, dir: String): DataFrame = {
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir,
      corpusFilter = Dedup.drillCorpusFilter)
    val batch = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
      // the drill batch otherwise arrives as ONE scan task and the
      // batch-side quality/shingle/minhash projections run
      // single-threaded (r17; batch-proportional, never corpus)
      .repartition(col("doc_id"))
    ingestVerdictFor(spark, batch, bandsT, setsT)
  }

  // ---------------------------------------------------------------- //
  // MODEL-gated ingest: the persisted generation models as the        //
  // quality stage (FineWeb-style — a trained gate, not heuristics).   //
  // ---------------------------------------------------------------- //

  /** Quantile targets for the DATA-DERIVED model-gate cuts — the gate
    * thresholds are not magic constants but percentiles of the
    * generation's own training-corpus score distributions, persisted
    * beside the model tables and swapped by [[Rollover.cutover]] (a
    * retrain shifts the NLL/weight distributions; frozen absolute cuts
    * would silently drift in meaning). LM: keep pages whose
    * char-bigram NLL lands at or under the training P90 bin (reject
    * the worst-perplexity decile's tail). DSIR: reject pages below the
    * training P5 importance-weight bin (only the clearly
    * off-distribution tail — far laxer than the resampler's zero cut). */
  val LmCutPct = 90L
  val DsirCutPct = 5L

  /** Histogram resolution for the cut derivation — the same fixed
    * 1000-bin integer-histogram discipline as Sketches.quantileHist:
    * scores reduce to a ≤1001-row (bin, count) frame, the quantile is
    * read off the cumulative sum, and the resulting cut is a bin EDGE
    * (exact integer arithmetic, so the DuckDB oracle replays the
    * derivation bit for bit). */
  val CutBins = 1000L

  /** The quantile-cut core: `vals` is a single-column (`v`, BIGINT
    * micro-units) score frame; returns one row holding the cut at
    * `pct`%. `upperEdge` picks which edge of the quantile bin becomes
    * the cut: the EXCLUSIVE upper edge for a keep-below gate (LM —
    * everything through the P90 bin passes `v < cut`), the INCLUSIVE
    * lower edge for a keep-at-or-above gate (DSIR — only the strictly
    * below-P5-bin tail fails `v >= cut`). All arithmetic is
    * nonnegative-offset integer floor division, identical in both
    * engines; the cumulative window runs over the ≤1001-row binned
    * sketch, never the corpus. */
  private def histCutMicro(vals: DataFrame, pct: Long,
      upperEdge: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vals.localCheckpoint() // one scoring pass feeds both reads
    val b = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      .withColumn("bw", expr(s"(hi - lo + $CutBins) div $CutBins"))
      .localCheckpoint()
    val cum = v.crossJoin(broadcast(b.select(col("lo"), col("bw"))))
      .select(expr("(v - lo) div bw").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy("bin")))
    val off = if (upperEdge) 1L else 0L
    cum.crossJoin(broadcast(b.select(col("lo"), col("bw"), col("n"))))
      .filter(col("cum") >= expr(s"($pct * n + 99) div 100"))
      .agg(min(expr(s"lo + (bin + $off) * bw")).as("cut_micro"))
  }

  /** Build + persist one generation's gate-cuts table (1 row:
    * lm_cut_micro, dsir_cut_micro) from a training frame scored with
    * that SAME generation's persisted LM and DSIR models — the ninth
    * rollover family. */
  private def writeGateCuts(spark: SparkSession, docs: DataFrame,
      lmT: String, dsirT: String, sfx: String): String = {
    val t = s"graft_gatecuts_idx_$sfx"
    val nll = TextAnalysis.charLmScoreWith(
        TextAnalysis.charLmDocBigrams(docs.select(col("doc_id"), col("text"))),
        spark.table(lmT))
      .select(round(col("nll_nats") * lit(1e6), 0).cast("long").as("v"))
    val wts = Curation.dsirScoreWith(Curation.dsirToks(docs),
        spark.table(dsirT))
      .select(col("weight_micro").as("v"))
    val cuts = histCutMicro(nll, LmCutPct, upperEdge = true)
      .withColumnRenamed("cut_micro", "lm_cut_micro")
      .crossJoin(histCutMicro(wts, DsirCutPct, upperEdge = false)
        .withColumnRenamed("cut_micro", "dsir_cut_micro"))
      .localCheckpoint()
    // An empty score frame aggregates to a NULL cut, and a NULL cut
    // falls through every comparison in modelGateVerdictOn — the gate
    // would silently admit everything. A generation build that can't
    // derive its cuts must die here, not ship.
    val r = cuts.head()
    require(!r.isNullAt(r.fieldIndex("lm_cut_micro")) &&
        !r.isNullAt(r.fieldIndex("dsir_cut_micro")),
      s"gate-cut derivation for $sfx scored zero rows — refusing to " +
        "persist NULL cuts (a gate that admits everything)")
    cuts
      .coalesce(1)
      .write.mode("overwrite").format("parquet")
      .option("path", s"${IndexStore.root}/gatecuts_$sfx")
      .saveAsTable(t)
    t
  }

  /** Write-once-per-generation gate cuts (persisted MODEL-family
    * discipline — check-then-build under the suffix lock, FROZEN
    * between generations like the weights they derive from). */
  private[graft] def ensureGateCuts(spark: SparkSession, dir: String,
      tag: String = "",
      corpusFilter: org.apache.spark.sql.Column = lit(true)): String = {
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    val t = s"graft_gatecuts_idx_$sfx"
    IndexStore.lock("gatecuts_" + sfx).synchronized {
      if (!spark.catalog.tableExists(t)) {
        val lmT = TextAnalysis.ensureCharLmModel(spark, dir, tag, corpusFilter)
        val dsirT = Curation.ensureDsirModel(spark, dir, tag, corpusFilter)
        writeGateCuts(spark,
          Tables.documents(spark, dir).filter(corpusFilter)
            .select(col("doc_id"), col("lang"), col("text")),
          lmT, dsirT, sfx)
      }
    }
    t
  }

  /** Generation ROLLOVER for the gate cuts: re-derive both quantiles
    * from corpus ∪ admitted scored under the NEW generation's models
    * (built first — catalog hits when the rollover sequence already
    * ran them), so G+1 judges arrivals with G+1's cuts the moment
    * [[Rollover.cutover]] swaps. */
  private[graft] def rolloverGateCuts(spark: SparkSession, dir: String,
      admittedDocs: DataFrame, newTag: String,
      corpusFilter: org.apache.spark.sql.Column = lit(true)): String = {
    val sfx = IndexStore.suffix(dir, newTag, corpusFilter)
    val t = s"graft_gatecuts_idx_$sfx"
    IndexStore.lock("gatecuts_" + sfx).synchronized {
      if (!spark.catalog.tableExists(t)) {
        val lmT = TextAnalysis.rolloverCharLmModel(
          spark, dir, admittedDocs, newTag, corpusFilter)
        val dsirT = Curation.rolloverDsirModel(
          spark, dir, admittedDocs, newTag, corpusFilter)
        val adm0 = admittedDocs.dropDuplicates("doc_id")
        val adm = // unlabeled admissions score raw-only, as in the model
          if (adm0.columns.contains("lang"))
            adm0.select(col("doc_id"), col("lang"), col("text"))
          else adm0.select(col("doc_id"),
            lit(null).cast("string").as("lang"), col("text"))
        writeGateCuts(spark,
          Tables.documents(spark, dir).filter(corpusFilter)
            .select(col("doc_id"), col("lang"), col("text"))
            .unionByName(adm),
          lmT, dsirT, sfx)
      }
    }
    t
  }

  /** The derived cuts themselves — the 1-row report a curation team
    * reads before trusting the gate, with the full derivation
    * (LM/DSIR train → score → histogram → quantile edge) replayed by
    * the oracle. */
  def gateCuts(spark: SparkSession, dir: String): DataFrame =
    spark.table(ensureGateCuts(spark, dir))
      .select(col("lm_cut_micro"), col("dsir_cut_micro"))

  /** The MODEL-gated ingest verdict per arriving document — the
    * quality stage is the persisted generation's trained models
    * rather than [[ingestVerdictFor]]'s heuristic blend: the
    * char-bigram LM (perplexity ceiling at the generation's persisted
    * training-P90 cut), the hashed quality classifier (its own
    * persisted train-time mean as the cut), and the DSIR importance
    * weight (off-distribution floor at the persisted training-P5
    * cut — every threshold data-derived and rolled with the
    * generation, none hard-coded), then the
    * band-index dedup probe for model survivors only. One
    * reason-tagged row per arriving doc_id, reason ∈ {no_content,
    * lm_ppl, classifier, dsir, duplicate, keep} in STAGE ORDER —
    * first failing stage tags, survivors pay the next stage.
    *
    * All three model scores are scan work: each is one pass over the
    * batch joined against a broadcast model table (bigram table,
    * 64-row weights + 1-row stats, 256-row counts); the probe
    * shuffles only model-passers' bands into the static bucketed
    * index. Between generations the models are FROZEN (the model
    * family's staleness contract); a [[Rollover.cutover]] swaps all
    * of them at a batch boundary. */
  private[graft] def modelGateVerdictOn(spark: SparkSession, batch: DataFrame,
      lmT: String, wT: String, statsT: String, dsirT: String,
      cutsT: String, bandsT: String, setsT: String): DataFrame = {
    val docs = batch.dropDuplicates("doc_id")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val lm = TextAnalysis
      .charLmScoreWith(TextAnalysis.charLmDocBigrams(docs), spark.table(lmT))
      .select(col("doc_id"), col("nll_nats"))
    val cls = Curation
      .classifierScoreWith(Curation.classifierFrames(docs)._2, spark.table(wT))
      .crossJoin(broadcast(spark.table(statsT).select(col("mean_sc"))))
      .select(col("doc_id"), col("score_sc"), col("mean_sc"))
    // arrivals carry no language label; DSIR scores them against the
    // generation counts all the same (buckets are all that matter)
    val dsir = Curation.dsirScoreWith(
      Curation.dsirToks(docs.withColumn("lang", lit(null).cast("string"))),
      spark.table(dsirT))
      .select(col("doc_id"), col("weight_micro"))
    val base = Dedup.shingledOn(docs)
      .join(lm, Seq("doc_id"), "left")
      .join(cls, Seq("doc_id"), "left")
      .join(dsir, Seq("doc_id"), "left")
      .crossJoin(broadcast(spark.table(cutsT)
        .select(col("lm_cut_micro"), col("dsir_cut_micro"))))
      .withColumn("nll_micro",
        round(col("nll_nats") * lit(1e6), 0).cast("long"))
      .withColumn("m_keep",
        col("sz") > 0 && col("nll_nats").isNotNull &&
          col("nll_micro") < col("lm_cut_micro") &&
          col("score_sc") >= col("mean_sc") &&
          col("weight_micro") >= col("dsir_cut_micro"))
      .localCheckpoint()
    val probed = Dedup.probeBandIndex(spark,
      Dedup.signaturesOnSh(base.filter(col("m_keep"))), bandsT, setsT)
    base
      .join(probed.select(col("batch_id").as("doc_id"), col("n_dups"),
        col("best_jaccard")), Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("sz") <= 0 || col("nll_nats").isNull ||
          col("score_sc").isNull || col("weight_micro").isNull,
          lit("no_content"))
          .when(col("nll_micro") >= col("lm_cut_micro"), lit("lm_ppl"))
          .when(col("score_sc") < col("mean_sc"), lit("classifier"))
          .when(col("weight_micro") < col("dsir_cut_micro"), lit("dsir"))
          .when(coalesce(col("n_dups"), lit(0L)) > 0, lit("duplicate"))
          .otherwise(lit("keep")))
      .select(col("doc_id"), col("reason"),
        col("nll_nats"), col("score_sc"), col("weight_micro"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("best_jaccard"),
        (col("reason") === "keep").as("keep"))
  }

  /** Batch drill of the model gate: the mod-4 held-out documents
    * arrive against the DEFAULT generation's models (trained on the
    * full corpus, as a standing production gate's are) and a band
    * index over everything else — every stage oracle-replayed end to
    * end (LM train + NLL, classifier train + mean cut, DSIR train +
    * weight, banded MinHash probe). */
  def modelGatePipeline(spark: SparkSession, dir: String): DataFrame = {
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir,
      corpusFilter = Dedup.drillCorpusFilter)
    val lmT = TextAnalysis.ensureCharLmModel(spark, dir)
    val (wT, statsT) = Curation.ensureClassifierModel(spark, dir)
    val dsirT = Curation.ensureDsirModel(spark, dir)
    val cutsT = ensureGateCuts(spark, dir)
    val batch = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
    modelGateVerdictOn(spark, batch, lmT, wT, statsT, dsirT, cutsT,
        bandsT, setsT)
  }

  /** Gate-agreement (ablation) report over the whole corpus: the
    * 2³-cell histogram of the three model gates' pass/fail verdicts —
    * the diagnostic a curation team reads before tuning thresholds
    * (a gate whose rejections are a subset of another's adds cost and
    * no signal; a gate rejecting what every other gate keeps needs a
    * second look). One row per (lm, classifier, dsir) combination
    * with its count and milli-share. Three scoring passes (each a
    * scan + broadcast model join, two of them memoized) and one
    * 8-row aggregate. */
  def gateOverlap(spark: SparkSession, dir: String): DataFrame = {
    val cuts = broadcast(spark.table(ensureGateCuts(spark, dir))
      .select(col("lm_cut_micro"), col("dsir_cut_micro")))
    val lm = TextAnalysis.charLmScore(spark, dir)
      .crossJoin(cuts)
      .select(col("doc_id"),
        (round(col("nll_nats") * lit(1e6), 0).cast("long") <
          col("lm_cut_micro")).as("lm_pass"))
    val cls = Curation.classifierQuality(spark, dir)
      .select(col("doc_id"), col("predicted_hq").as("cls_pass"))
    val dsir = Curation.dsirWeights(spark, dir)
      .crossJoin(cuts)
      .select(col("doc_id"),
        (col("weight_micro") >= col("dsir_cut_micro")).as("dsir_pass"))
    val cells = lm.join(cls, Seq("doc_id")).join(dsir, Seq("doc_id"))
      .groupBy(col("lm_pass"), col("cls_pass"), col("dsir_pass"))
      .agg(count(lit(1)).as("n_docs"))
      // ≤8 rows; without the checkpoint the three scoring passes ran
      // TWICE — once for the cells and once for their own total (r16)
      .localCheckpoint()
    val tot = cells.agg(sum(col("n_docs")).as("total"))
    cells.crossJoin(broadcast(tot))
      .select(col("lm_pass"), col("cls_pass"), col("dsir_pass"),
        col("n_docs"), expr("(1000 * n_docs) div total").as("pct_milli"))
  }

  /** The full pretraining-shard build, ONE Catalyst plan end to end —
    * the composition every piece below exists for:
    *
    *   quality filter (TextAnalysis blend ≥ [[QualityMin]])
    *   → exact-dedup canonicalization (min doc_id per md5 digest)
    *   → decontamination (eval docs excluded from the corpus AND any
    *     doc sharing ≥ Dedup.DecontamMinShared distinct word-3-gram
    *     shingles with the eval suite anti-joined out — the EXACT
    *     Dedup.decontamOverlap operator, composed)
    *   → temperature-weighted sampling (per-lang sqrt-temperature
    *     weights computed on the SURVIVING corpus, Curation's
    *     temperatureMix algebra; keep iff hashU < min(1, flattened
    *     share / raw share) — deterministic, retry/speculation-safe)
    *   → greedy contiguous packing into PackCapacity-token sequences
    *     per hash bucket (Curation.packSequences' algebra)
    *   → deterministic shard assignment at SEQUENCE grain
    *     (SourceHealth.shardOrder's placement/order hash pair over the
    *     sequence key).
    *
    * Output: one row per packed sequence with its doc/token counts,
    * doc-id extrema, shard, and intra-shard position — the manifest a
    * trainer's data loader consumes. The DuckDB oracle replays the
    * whole chain from raw documents, so any stage drifting from its
    * individually-gated twin hash-fails HERE even if the stage's own
    * query still passes.
    *
    * Scale shape: the corpus pays the quality/digest scan (one pass),
    * the dedup window shuffle, the broadcast decontam semi-join, and
    * the pack shuffle (parallelism = PackBuckets by design — raise
    * with the cluster); the rate frame is |langs| rows crossed in by
    * broadcast, and everything after packing is |sequences|-bounded. */
  def shardBuild(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus = non-eval docs (the eval suite must never be trained on)
    val scored = Tables.documents(spark, dir)
      .filter(col("doc_id") % Dedup.DecontamEvalMod =!= 0)
      .select(Seq(col("doc_id"), col("text"), col("lang")) ++
        TextAnalysis.qualityFeatures(col("text")): _*)
      .withColumn("quality", TextAnalysis.qualityExpr)
      .filter(col("quality") >= QualityMin)
    // Canonical-id dedup on a NARROW proxy (r16, guide §8 shape): the
    // r15 form ran min() over a Window partitioned by digest, which
    // shuffled the full (text + quality features) row payload by
    // digest. Decide on (digest, doc_id) only — corpus-bounded, a few
    // dozen bytes per row — then keep survivors with a semi-join on
    // doc_id; min-per-digest picks the identical canonical ids.
    val keepIds = scored
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .groupBy("digest").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val canon = scored.join(keepIds, Seq("doc_id"), "left_semi")
    // the cleaned corpus feeds the per-lang counts, their total, the
    // acceptance-rate algebra AND the sampling join — materialize it
    // once (r16: unmaterialized, the quality-filter + dedup + decontam
    // chain re-ran per consumer; a production build materializes the
    // clean corpus between stages, which is exactly this shape)
    val clean = canon.join(
      Dedup.decontamOverlap(spark, dir).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // sqrt-temperature acceptance rates from the surviving corpus:
    // rate_l = min(1, flattened share / raw share) downsamples only
    // over-represented langs (temperatureMix's exact weight algebra —
    // IEEE sqrt and the lang-ordered wsum fold keep it bit-identical
    // in DuckDB; the rate's division/multiply order mirrors the oracle)
    val counts = clean.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("total"))
    val raw = counts.crossJoin(broadcast(tot))
      .withColumn("w", sqrt(col("n_docs").cast("double") / col("total")))
    val wsum = raw
      .agg(array_sort(collect_list(struct(col("lang"), col("w")))).as("ws"))
      .select(aggregate(col("ws"), lit(0.0),
        (acc, e) => acc + e.getField("w")).as("wsum"))
    val rates = raw.crossJoin(broadcast(wsum))
      .select(col("lang"),
        least(lit(1.0), col("w") / col("wsum") *
          (col("total").cast("double") / col("n_docs").cast("double")))
          .as("rate"))
    val sampled = clean.join(broadcast(rates), Seq("lang"))
      .withColumn("u", Curation.hashU(
        concat(col("doc_id").cast("string"), lit(":"), col("lang"))))
      .filter(col("u") < col("rate"))
    // greedy contiguous packing (packSequences' algebra over survivors)
    val wb = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = sampled
      .select(col("doc_id"), col("n_tokens"))
      .withColumn("bucket",
        pmod(col("doc_id"), lit(Curation.PackBuckets)).cast("int"))
      .withColumn("cum", sum(col("n_tokens")).over(wb))
      .withColumn("seq_id", expr(s"(cum - n_tokens) div ${Curation.PackCapacity}"))
    // sequence manifest + shard placement (shardOrder's hash pair)
    val seqs = packed.groupBy(col("bucket"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .withColumn("seq_key",
        col("bucket").cast("long") * lit(1000000L) + col("seq_id"))
    val wsd = Window.partitionBy(col("shard"))
      .orderBy(col("ord_hash"), col("seq_key"))
    seqs
      .withColumn("shard",
        pmod(Sketches.hash32(col("seq_key")), lit(SourceHealth.NumShards)))
      .withColumn("ord_hash", Sketches.hash37(col("seq_key")))
      .withColumn("pos", row_number().over(wsd).cast("long"))
      .select(col("bucket"), col("seq_id"), col("n_docs"), col("seq_tokens"),
        col("min_doc"), col("max_doc"), col("shard"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_shard_build" -> ((s, d) => shardBuild(s, d)),
    "pipeline_crawl" -> ((s, d) => crawlPipeline(s, d)),
    "pipeline_ingest_gate" -> ((s, d) => ingestGatePipeline(s, d)),
    "pipeline_model_gate" -> ((s, d) => modelGatePipeline(s, d)),
    "pipeline_gate_overlap" -> ((s, d) => gateOverlap(s, d)),
    "pipeline_gate_cuts" -> ((s, d) => gateCuts(s, d)),
    "pipeline_clean_corpus" -> ((s, d) => cleanCorpus(s, d)),
    "pipeline_span_clean" -> ((s, d) => spanCleanCorpus(s, d)))

  // the cut-derivation chain as CTEs — requires TextAnalysis.charLmCtes
  // (ends in `lm`) and Curation.dsirCtes("d") (ends in `dw`) upstream;
  // ends in glcut(lm_cut_micro) and gdcut(dsir_cut_micro), replaying
  // histCutMicro's fixed-width integer histogram + quantile edge
  private def gateCutCtes: String =
    s"""glv AS (SELECT round(nll_nats * 1000000.0)::BIGINT AS v FROM lm),
       |glb AS (SELECT min(v)::BIGINT AS lo, max(v)::BIGINT AS hi,
       |    count(*)::BIGINT AS n FROM glv),
       |glw AS (SELECT lo, n, (hi - lo + $CutBins) // $CutBins AS bw FROM glb),
       |glh AS (SELECT (v - lo) // bw AS bin, count(*)::BIGINT AS cnt
       |  FROM glv, glw GROUP BY 1),
       |glc AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM glh),
       |glcut AS (SELECT (lo + (mb + 1) * bw)::BIGINT AS lm_cut_micro
       |  FROM (SELECT min(bin) AS mb FROM glc, glw
       |        WHERE cum >= ($LmCutPct * n + 99) // 100), glw),
       |gdv AS (SELECT weight_micro AS v FROM dw),
       |gdb AS (SELECT min(v)::BIGINT AS lo, max(v)::BIGINT AS hi,
       |    count(*)::BIGINT AS n FROM gdv),
       |gdw AS (SELECT lo, n, (hi - lo + $CutBins) // $CutBins AS bw FROM gdb),
       |gdh AS (SELECT (v - lo) // bw AS bin, count(*)::BIGINT AS cnt
       |  FROM gdv, gdw GROUP BY 1),
       |gdc AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM gdh),
       |gdcut AS (SELECT (lo + mb * bw)::BIGINT AS dsir_cut_micro
       |  FROM (SELECT min(bin) AS mb FROM gdc, gdw
       |        WHERE cum >= ($DsirCutPct * n + 99) // 100), gdw)""".stripMargin

  val oracle: Map[String, String] = Map(
    "pipeline_gate_cuts" ->
      s"""WITH ${TextAnalysis.charLmCtes},
         |${Curation.dsirCtes("d")},
         |$gateCutCtes
         |SELECT lm_cut_micro, dsir_cut_micro FROM glcut, gdcut""".stripMargin,
    // the archive hop is lossless by the WARC roundtrip contract, so
    // the crawl pipeline's verdict IS the parquet-fed extract→gopher
    // composition — same oracle SQL verbatim
    "pipeline_crawl" -> Html.oracle("text_html_gopher"),
    // the composed gate end to end: extraction + Gopher CTEs (Html),
    // batch shingles over EXTRACTED text vs corpus shingles over RAW
    // text (the index generation's source), banded MinHash candidates
    // restricted to quality-passers, reason classification with
    // totality over every batch doc
    "pipeline_ingest_gate" -> {
      val batchSrc =
        s"(SELECT doc_id, main_text AS text FROM mt WHERE doc_id % ${Dedup.IncrementalBatchMod} = 0)"
      val corpusSrc =
        s"(SELECT doc_id, text FROM documents WHERE doc_id % ${Dedup.IncrementalBatchMod} <> 0)"
      s"""WITH ${Html.gopherCtes},
         |${Dedup.shingleCtesOn(batchSrc, "b")},
         |${Dedup.shingleCtesOn(corpusSrc, "c")},
         |${Dedup.minhashBandsOn("b")},
         |${Dedup.minhashBandsOn("c")},
         |qp AS (SELECT doc_id FROM gv WHERE keep),
         |cand AS (SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
         |  FROM bbands a
         |  JOIN qp ON qp.doc_id = a.doc_id
         |  JOIN cbands b ON a.band = b.band AND a.m1 = b.m1 AND a.m2 = b.m2),
         |agg AS (SELECT batch_id, count(*)::BIGINT AS n_dups, max(jaccard) AS best_jaccard
         |  FROM (SELECT batch_id, corpus_id,
         |      len(list_intersect(si.codes, sj.codes))::DOUBLE
         |        / (si.sz + sj.sz - len(list_intersect(si.codes, sj.codes))) AS jaccard
         |    FROM cand JOIN bsh si ON si.doc_id = batch_id
         |    JOIN csh sj ON sj.doc_id = corpus_id)
         |  WHERE jaccard >= ${Dedup.JaccardThreshold} GROUP BY 1),
         |jd AS (SELECT doc_id FROM bsh WHERE sz > 0),
         |allb AS (SELECT doc_id FROM documents
         |  WHERE doc_id % ${Dedup.IncrementalBatchMod} = 0),
         |v AS (SELECT a.doc_id,
         |    (CASE WHEN jd.doc_id IS NULL THEN 'no_content'
         |          WHEN NOT gv.keep THEN 'quality'
         |          WHEN coalesce(g.n_dups, 0) > 0 THEN 'duplicate'
         |          ELSE 'keep' END) AS reason,
         |    coalesce(g.n_dups, 0)::BIGINT AS n_dups,
         |    g.best_jaccard
         |  FROM allb a
         |  LEFT JOIN jd ON jd.doc_id = a.doc_id
         |  LEFT JOIN gv ON gv.doc_id = a.doc_id
         |  LEFT JOIN agg g ON g.batch_id = a.doc_id)
         |SELECT doc_id, reason, n_dups, best_jaccard,
         |  (reason = 'keep') AS keep
         |FROM v ORDER BY doc_id""".stripMargin
    },
    "pipeline_gate_overlap" ->
      s"""WITH ${TextAnalysis.charLmCtes},
         |${Curation.classifierCtes},
         |${Curation.dsirCtes("d")},
         |$gateCutCtes,
         |cells AS (SELECT
         |    round(lm.nll_nats * 1000000.0)::BIGINT < gl.lm_cut_micro AS lm_pass,
         |    sc.score_sc >= st.mean_sc AS cls_pass,
         |    dw.weight_micro >= gd.dsir_cut_micro AS dsir_pass,
         |    count(*)::BIGINT AS n_docs
         |  FROM lm JOIN sc USING (doc_id) JOIN dw USING (doc_id),
         |    st, glcut gl, gdcut gd
         |  GROUP BY 1, 2, 3),
         |tot AS (SELECT sum(n_docs)::BIGINT AS total FROM cells)
         |SELECT lm_pass, cls_pass, dsir_pass, n_docs,
         |  (1000 * n_docs) // total AS pct_milli
         |FROM cells, tot ORDER BY lm_pass, cls_pass, dsir_pass""".stripMargin,
    // the model gate, every stage replayed: the LM/classifier/DSIR
    // train+score chains over the full corpus (the default generation
    // the engine's ensure* tables hold), the batch restricted at the
    // end; dedup probe for model survivors only, as the engine stages
    "pipeline_model_gate" -> {
      val batchSrc =
        s"(SELECT doc_id, text FROM documents WHERE doc_id % ${Dedup.IncrementalBatchMod} = 0)"
      val corpusSrc =
        s"(SELECT doc_id, text FROM documents WHERE doc_id % ${Dedup.IncrementalBatchMod} <> 0)"
      s"""WITH ${TextAnalysis.charLmCtes},
         |${Curation.classifierCtes},
         |${Curation.dsirCtes("d")},
         |$gateCutCtes,
         |${Dedup.shingleCtesOn(batchSrc, "b")},
         |${Dedup.shingleCtesOn(corpusSrc, "c")},
         |${Dedup.minhashBandsOn("b")},
         |${Dedup.minhashBandsOn("c")},
         |allb AS (SELECT doc_id FROM documents
         |  WHERE doc_id % ${Dedup.IncrementalBatchMod} = 0),
         |mg AS (SELECT a.doc_id, lm.nll_nats, sc.score_sc, st.mean_sc,
         |    dw.weight_micro, bsh.sz,
         |    round(lm.nll_nats * 1000000.0)::BIGINT AS nll_micro,
         |    gl.lm_cut_micro, gd.dsir_cut_micro
         |  FROM allb a
         |  LEFT JOIN lm ON lm.doc_id = a.doc_id
         |  LEFT JOIN sc ON sc.doc_id = a.doc_id
         |  LEFT JOIN dw ON dw.doc_id = a.doc_id
         |  LEFT JOIN bsh ON bsh.doc_id = a.doc_id, st, glcut gl, gdcut gd),
         |qp AS (SELECT doc_id FROM mg
         |  WHERE sz > 0 AND nll_nats IS NOT NULL AND nll_micro < lm_cut_micro
         |    AND score_sc >= mean_sc AND weight_micro >= dsir_cut_micro),
         |cand AS (SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
         |  FROM bbands a JOIN qp ON qp.doc_id = a.doc_id
         |  JOIN cbands b ON a.band = b.band AND a.m1 = b.m1 AND a.m2 = b.m2),
         |agg AS (SELECT batch_id, count(*)::BIGINT AS n_dups, max(jaccard) AS best_jaccard
         |  FROM (SELECT batch_id, corpus_id,
         |      len(list_intersect(si.codes, sj.codes))::DOUBLE
         |        / (si.sz + sj.sz - len(list_intersect(si.codes, sj.codes))) AS jaccard
         |    FROM cand JOIN bsh si ON si.doc_id = batch_id
         |    JOIN csh sj ON sj.doc_id = corpus_id)
         |  WHERE jaccard >= ${Dedup.JaccardThreshold} GROUP BY 1)
         |SELECT mg.doc_id,
         |  (CASE WHEN mg.sz IS NULL OR mg.sz <= 0 OR mg.nll_nats IS NULL
         |          OR mg.score_sc IS NULL OR mg.weight_micro IS NULL THEN 'no_content'
         |        WHEN mg.nll_micro >= mg.lm_cut_micro THEN 'lm_ppl'
         |        WHEN mg.score_sc < mg.mean_sc THEN 'classifier'
         |        WHEN mg.weight_micro < mg.dsir_cut_micro THEN 'dsir'
         |        WHEN coalesce(g.n_dups, 0) > 0 THEN 'duplicate'
         |        ELSE 'keep' END) AS reason,
         |  mg.nll_nats, mg.score_sc, mg.weight_micro,
         |  coalesce(g.n_dups, 0)::BIGINT AS n_dups, g.best_jaccard,
         |  (CASE WHEN mg.sz IS NULL OR mg.sz <= 0 OR mg.nll_nats IS NULL
         |          OR mg.score_sc IS NULL OR mg.weight_micro IS NULL THEN 'no_content'
         |        WHEN mg.nll_micro >= mg.lm_cut_micro THEN 'lm_ppl'
         |        WHEN mg.score_sc < mg.mean_sc THEN 'classifier'
         |        WHEN mg.weight_micro < mg.dsir_cut_micro THEN 'dsir'
         |        WHEN coalesce(g.n_dups, 0) > 0 THEN 'duplicate'
         |        ELSE 'keep' END) = 'keep' AS keep
         |FROM mg LEFT JOIN agg g ON g.batch_id = mg.doc_id
         |ORDER BY mg.doc_id""".stripMargin
    },
    // the whole shard-build chain replayed from raw documents: the
    // decontam shingle chain (prefixed 'd'), the quality/dedup CTEs
    // from pipeline_clean_corpus's shape, temperatureMix's exact rate
    // algebra (sqrt + lang-ordered fold, same operation order), the
    // hashU sample, the pack window, and shardOrder's fold+avalanche
    // pair over the sequence key
    "pipeline_shard_build" ->
      s"""WITH ${Dedup.shingleCtesOn("documents", "d")},
         |evalcodes AS (SELECT DISTINCT unnest(codes) AS code FROM dsh
         |  WHERE doc_id % ${Dedup.DecontamEvalMod} = 0),
         |cpost AS (SELECT doc_id, unnest(codes) AS code FROM dsh
         |  WHERE doc_id % ${Dedup.DecontamEvalMod} <> 0),
         |contaminated AS (SELECT c.doc_id FROM cpost c
         |  JOIN evalcodes e USING (code)
         |  GROUP BY 1 HAVING count(*) >= ${Dedup.DecontamMinShared}),
         |t0 AS (SELECT doc_id, text, lang,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents WHERE doc_id % ${Dedup.DecontamEvalMod} <> 0),
         |scored AS (SELECT doc_id, text, lang, len(toks)::BIGINT AS n_tokens,
         |    ${TextAnalysis.qualitySql} AS quality
         |  FROM t0),
         |q AS (SELECT * FROM scored WHERE quality >= $QualityMin),
         |canon AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
         |  FROM q),
         |keep1 AS (SELECT k.* FROM canon k LEFT JOIN contaminated c USING (doc_id)
         |  WHERE k.doc_id = k.canonical_id AND c.doc_id IS NULL),
         |lc AS (SELECT lang, count(*)::BIGINT AS n_docs FROM keep1 GROUP BY 1),
         |lt AS (SELECT sum(n_docs)::BIGINT AS total FROM lc),
         |rw AS (SELECT lang, n_docs, total,
         |    sqrt(n_docs::DOUBLE / total::DOUBLE) AS w FROM lc, lt),
         |ws AS (SELECT list_reduce(list_prepend(0.0::DOUBLE, list(w ORDER BY lang)),
         |    (a, v) -> a + v) AS wsum FROM rw),
         |rates AS (SELECT lang,
         |    least(1.0, w / wsum * (total::DOUBLE / n_docs::DOUBLE)) AS rate
         |  FROM rw, ws),
         |samp AS (SELECT k.doc_id, k.n_tokens FROM keep1 k JOIN rates r USING (lang)
         |  WHERE ${Curation.sqlU} < r.rate),
         |pk AS (SELECT doc_id, n_tokens,
         |    (doc_id % ${Curation.PackBuckets})::INT AS bucket FROM samp),
         |pc AS (SELECT doc_id, bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
         |  FROM pk),
         |ps AS (SELECT doc_id, bucket, n_tokens,
         |    (cum - n_tokens) // ${Curation.PackCapacity} AS seq_id FROM pc),
         |sq AS (SELECT bucket, seq_id,
         |    (bucket * 1000000 + seq_id)::BIGINT AS seq_key,
         |    count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS seq_tokens,
         |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |  FROM ps GROUP BY 1, 2),
         |h0 AS (SELECT *, ${Sketches.foldSql("seq_key::VARCHAR", 31L, 0L)} AS f31,
         |    ${Sketches.foldSql("seq_key::VARCHAR", 37L, 7L)} AS f37 FROM sq),
         |h AS (SELECT *, (${Sketches.mixColSql("f31")}) % ${SourceHealth.NumShards} AS shard,
         |    ${Sketches.mixColSql("f37")} AS ord_hash FROM h0)
         |SELECT bucket, seq_id, n_docs, seq_tokens, min_doc, max_doc,
         |  shard::BIGINT AS shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY ord_hash, seq_key)::BIGINT AS pos
         |FROM h ORDER BY bucket, seq_id""".stripMargin,
    "pipeline_clean_corpus" ->
      s"""WITH t0 AS (SELECT doc_id, text, source,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |scored AS (SELECT doc_id, text, source,
         |    len(toks)::BIGINT AS n_tokens,
         |    ${TextAnalysis.qualitySql} AS quality
         |  FROM t0),
         |q AS (SELECT * FROM scored WHERE quality >= $QualityMin),
         |canon AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
         |  FROM q),
         |keep AS (SELECT * FROM canon WHERE doc_id = canonical_id),
         |sampled AS (SELECT * FROM keep
         |  WHERE list_reduce(list_prepend(0::BIGINT,
         |      list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
         |      (a, c) -> (a * 31 + c) % 2147483647) % 100 < $SamplePct)
         |SELECT s.source, count(*)::BIGINT AS n_docs,
         |  count(DISTINCT e.label)::BIGINT AS n_labels,
         |  sum(s.n_tokens)::BIGINT AS total_tokens
         |FROM sampled s LEFT JOIN embeddings e ON e.vec_id = s.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the span-dedup interval chain (Dedup.spanIvCte) rolled up to the
    // per-source report: kept = n_tokens − removed, gate at MinTokens
    "pipeline_span_clean" ->
      s"""WITH ${Dedup.spanIvCte},
         |perdoc AS (SELECT doc_id, sum(span_end - span_start)::BIGINT AS rt
         |  FROM iv GROUP BY 1),
         |nt AS (SELECT doc_id, source,
         |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
         |  FROM documents),
         |k AS (SELECT nt.doc_id, nt.source, nt.n_tokens,
         |    nt.n_tokens - coalesce(p.rt, 0) AS kept
         |  FROM nt LEFT JOIN perdoc p USING (doc_id))
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_tokens)::BIGINT AS tokens_in,
         |  sum(kept)::BIGINT AS tokens_kept,
         |  sum(CASE WHEN kept >= ${Pipeline.SpanCleanMinTokens} THEN 1 ELSE 0 END)::BIGINT
         |    AS n_docs_kept,
         |  (CASE WHEN sum(n_tokens) > 0
         |        THEN (sum(n_tokens) - sum(kept)) * 1000 // sum(n_tokens)
         |        ELSE 0 END)::BIGINT AS scrub_milli
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)
}
