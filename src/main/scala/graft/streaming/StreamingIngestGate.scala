package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** The streaming form of the persisted-index ingest gate: documents
  * arrive as a STREAM (a crawl feed, a Kafka topic of scraped pages),
  * and every micro-batch is probed against the standing corpus's
  * on-disk bucketed MinHash band index — the same
  * `Dedup.probeBandIndex` core the batch drill runs — emitting one
  * keep/drop verdict row per arriving document.
  *
  * Why foreachBatch and not a stream-stream join: the corpus index is
  * a STATIC generation artifact (rewritten once per curation cycle,
  * not an evolving stream), so the right topology is a per-batch
  * batch-join against the bucketed table — each micro-batch shuffles
  * only its own bands into the index's bucket layout, the corpus never
  * moves, and there is no streaming state at all (the gate is
  * stateless by design; arriving docs are deliberately NOT checked
  * against each other — within-batch duplication is left to the next
  * generation's full pass, matching the batch gate's contract).
  *
  * The index covers the FULL standing corpus by default (the
  * production shape — a gate probing a partial index hands near-dups
  * of the excluded docs false keep verdicts); `corpusFilter` exists so
  * drills/specs can reproduce the batch drill's held-out split
  * explicitly.
  *
  * At 100 TB: the index tables are the generation's bucketed parquet;
  * each ingest micro-batch is crawl-minutes of data probed
  * bucket-locally; the verdict sink feeds the keep queue. */
object StreamingIngestGate {

  /** Start the gate over a streaming (doc_id, text) frame. The corpus
    * index for `dir` is ensured once at start (catalog hit → no
    * rebuild). The STATELESS gates (this, [[startCrawl]],
    * [[startFullIngest]]) bind their generation at start by design: a
    * generation rebind is just a restart — they hold no state and no
    * admissions, so stopping and restarting against the new tag loses
    * nothing; only the ADMITTING gates need the in-flight handoff
    * machinery ([[GenerationRef]] + [[graft.operators.Rollover.cutover]]).
    * `sink` receives each micro-batch's verdict frame
    * (batch_id, n_dups, best_jaccard, keep, no_content). EVERY
    * arriving doc_id gets exactly one verdict row — a doc whose text
    * is too short to shingle cannot be judged against the corpus and
    * passes through explicitly flagged (keep=true, n_dups=0,
    * no_content=true) instead of vanishing from the sink. */
  def start(spark: SparkSession, dir: String, docs: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir, tag, corpusFilter)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(verdictFor(spark, batch, bandsT, setsT), batchId)
      }
      .start()
  }

  /** One micro-batch's verdicts — shingle + sign only the arrivals,
    * probe the static index, then left-join back to the RAW batch ids
    * so unshingleable docs still emit a row. Public seam so specs can
    * replay the exact per-batch computation.
    *
    * Two decision columns, because the two downstream questions differ
    * and conflating them flips admissions for unjudgeable docs when a
    * consumer migrates between this gate and the full ingest gate
    * (`Pipeline.ingestVerdictFor`, where reason=no_content carries
    * keep=false): `keep` is the DUP verdict only — an unshingleable doc
    * is not a duplicate, so it keeps, flagged no_content=true; `admit`
    * is the CORPUS-ADMISSION decision — an unjudgeable doc is never
    * admitted, matching the full gate's no_content policy (and it is
    * what [[startAdmitting]] folds into the index). */
  private[graft] def verdictFor(spark: SparkSession, batch: DataFrame,
      bandsT: String, setsT: String): DataFrame = {
    val probed = Dedup.probeBandIndex(spark,
      Dedup.signaturesOnSh(Dedup.shingledOn(batch)), bandsT, setsT)
    batch.select(col("doc_id").as("batch_id")).distinct()
      .join(probed.withColumn("judged", lit(true)), Seq("batch_id"), "left")
      .select(col("batch_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("best_jaccard"),
        coalesce(col("keep"), lit(true)).as("keep"),
        col("judged").isNull.as("no_content"),
        (coalesce(col("keep"), lit(true)) && col("judged").isNotNull).as("admit"))
  }

  /** [[start]]'s winnow-family form: the same stateless gate contract
    * driven by the persisted winnow fingerprint index — winnow only
    * the arrivals, probe the static postings (~2/(w+1) the band
    * postings' volume), exact-verify against the persisted sets. Same
    * verdict schema; every arriving doc_id emits exactly one row. */
  def startWinnow(spark: SparkSession, dir: String, docs: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (postsT, setsT) = Dedup.ensureWinnowIndex(spark, dir, tag, corpusFilter)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(winnowVerdictFor(spark, batch, postsT, setsT), batchId)
      }
      .start()
  }

  /** One micro-batch's winnow verdicts — [[verdictFor]]'s contract
    * (left-join back to the raw arrivals so unjudgeable docs surface
    * as explicit no_content keeps, never admitted) over
    * [[Dedup.probeWinnowIndex]]. */
  private[graft] def winnowVerdictFor(spark: SparkSession, batch: DataFrame,
      postsT: String, setsT: String): DataFrame = {
    val probed = Dedup.probeWinnowIndex(spark, batch, postsT, setsT)
    batch.select(col("doc_id").as("batch_id")).distinct()
      .join(probed.withColumn("judged", lit(true)), Seq("batch_id"), "left")
      .select(col("batch_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("best_jaccard"),
        coalesce(col("keep"), lit(true)).as("keep"),
        col("judged").isNull.as("no_content"),
        (coalesce(col("keep"), lit(true)) && col("judged").isNotNull).as("admit"))
  }

  /** Streaming token-mix drift monitor: every arriving micro-batch's
    * token distribution is scored against the standing corpus's
    * PERSISTED text-index postings as one KL + OOV verdict row
    * ([[graft.operators.Curation.ingestKlOn]] — the exact computation
    * the driver-gated `curation_ingest_kl` probe runs). Stateless like
    * the dedup gates: the corpus totals are derived ONCE at start from
    * the generation artifact (vocab-bounded, frozen via localCheckpoint
    * so no per-batch index re-aggregation), and each batch pays only
    * its own tokenization plus a vocab-sized join. A KL step or an OOV
    * spike in the sink is the feed-drift alarm (new language, new
    * domain, encoding rot) a crawl pipeline wants BEFORE admission. */
  def startKlMonitor(spark: SparkSession, dir: String, docs: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (tfsT, _) = graft.operators.Retrieval.ensureTextIndex(
      spark, dir, tag, corpusFilter)
    val totals = graft.operators.Curation
      .corpusTokenTotals(spark, tfsT).localCheckpoint()
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Curation.ingestKlOn(batch, totals), batchId)
      }
      .start()
  }

  /** The full streaming CRAWL-ingest pipeline: arriving (doc_id, html)
    * pages are boilerplate-extracted (stateless scan — Html.extractOn
    * runs inside foreachBatch unchanged), then the EXTRACTED main text
    * is probed against the dedup index. This is the production stage
    * order (extract first, judge content not chrome): two pages whose
    * content is identical but whose navigation differs must still
    * collide in the band index, which judging raw HTML would miss.
    * Pages whose extraction leaves no shingleable content surface as
    * no_content=true verdicts rather than disappearing — a keep-queue
    * consumer sees every arriving page exactly once. */
  def startCrawl(spark: SparkSession, dir: String, pages: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir, tag, corpusFilter)
    pages.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val extracted = graft.operators.Html.extractOn(batch)
          .select(col("doc_id"), col("main_text").as("text"))
        sink(verdictFor(spark, extracted, bandsT, setsT), batchId)
      }
      .start()
  }

  /** Default admission-merge count between automatic compactions of an
    * admitting gate's index. Each merge appends at most one file per
    * bucket, so files-per-bucket is bounded by this value at all times
    * — without it, a long-running admitting stream accretes one file
    * per bucket per batch forever (thousands of batches → thousands of
    * files per bucket before any manual `compact*Index` call). The
    * compaction is row-identical by construction (the merge→compact
    * drills in PersistedIndexSpec/PersistedAnnIndexSpec prove the
    * rewrite changes no row); this knob only schedules it. */
  val CompactEveryMerges = 16

  /** Shared per-batch admission maintenance for every admitting gate
    * (both doc-tier gates here and the ANN gate): record the batch's
    * kept rows in the generation's [[graft.operators.AdmissionLog]],
    * fold them into the serving index, and compact index + log on the
    * every-`compactEvery` cadence. The ordering is the load-bearing
    * invariant, stated once: log BEFORE merge — a crash between the
    * two over-logs a kept row (benign: the rollover builders dedup and
    * the batch replay re-merges it) where the reverse order could
    * leave an admitted row invisible to the next retrain. Batches that
    * admitted nothing — the steady production state is mostly
    * rejects — skip the log append and the merge entirely (each would
    * still cost a lock, an anti-join job, and a catalog refresh) —
    * including the compaction clock: only merges add files, so an
    * all-reject stretch triggers no full-table rewrite of an index
    * that has not changed (the knob is CompactEvery MERGES, not
    * batches), and the files-per-bucket ≤ compactEvery bound holds
    * regardless. `kept` must already be checkpointed by the caller
    * (the emptiness probe and the two consumers must agree on one
    * materialized frame). */
  private[streaming] def maintain(spark: SparkSession, kind: String,
      sfx: String, kept: DataFrame,
      merges: java.util.concurrent.atomic.AtomicLong, compactEvery: Int)(
      merge: DataFrame => Unit)(compact: () => Unit): Unit = {
    if (kept.take(1).nonEmpty) {
      graft.operators.AdmissionLog.append(spark, kind, sfx, kept)
      merge(kept)
      if (merges.incrementAndGet() % compactEvery == 0) {
        compact()
        graft.operators.AdmissionLog.compact(spark, kind, sfx)
      }
    }
  }

  /** The ADMITTING gate: like [[start]], but each micro-batch's KEPT
    * documents are folded into the standing band index before the next
    * batch probes (`Dedup.mergeBatchIntoBandIndex` — a bucket-spec
    * append of batch-sized frames). This is the grow-as-you-accept
    * production mode: a document that duplicates something accepted
    * TEN SECONDS ago is flagged, where the stateless gate only judges
    * against the last full generation. The verdict frame is
    * checkpointed before the merge so the emitted verdicts are
    * provably pre-admission (a lazy probe re-evaluated after the merge
    * would see the batch's own docs and self-flag them); within one
    * micro-batch, arrivals still do not judge each other — the merge
    * boundary is the batch boundary. Every `compactEvery` merges the
    * index compacts back to one file per bucket (same suffix lock as
    * the merge, so probe/merge/compact serialize); generation
    * boundaries still apply the full rollover lifecycle. */
  def startAdmitting(spark: SparkSession, dir: String, docs: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true),
      compactEvery: Int = CompactEveryMerges)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir, tag, corpusFilter)
    val sfx = graft.operators.IndexStore.suffix(dir, tag, corpusFilter)
    val merges = new java.util.concurrent.atomic.AtomicLong(0L)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val verdict = verdictFor(spark, batch, bandsT, setsT).localCheckpoint()
        sink(verdict, batchId)
        val kept = batch.join(
          verdict.filter(col("admit"))
            .select(col("batch_id").as("doc_id")),
          "doc_id")
          .select(col("doc_id"), col("text"))
          .localCheckpoint()
        // the fixed-generation gate logs admissions too: the log is the
        // generation's RECORD, and a later Rollover.cutover from this
        // generation must not silently lose what this gate accepted
        maintain(spark, graft.operators.AdmissionLog.DocKind, sfx, kept,
          merges, compactEvery)(
          k => Dedup.mergeBatchIntoBandIndex(spark, dir, k, tag, corpusFilter))(
          () => Dedup.compactBandIndex(spark, dir, tag, corpusFilter))
      }
      .start()
  }

  /** [[startAdmitting]] with a SWAPPABLE generation: the gate reads
    * `gen` once per micro-batch ([[GenerationRef.advance]] — which also
    * promotes a pending [[graft.operators.Rollover.cutover]] under this
    * batch's serialization), probes that generation's tables, and
    * merges the batch's admitted docs into the SAME generation — so a
    * handoff lands cleanly at a batch boundary: no document is dropped
    * or double-judged, and the old generation's tables become droppable
    * once the promotion is observed (`gen.get()._1 == newTag`).
    * Admissions are also recorded in the generation's
    * [[graft.operators.AdmissionLog]] (logged BEFORE the index merge:
    * a crash between the two over-logs a kept doc — benign, the
    * rollover dedups — where the reverse order could leave an admitted
    * doc invisible to the next retrain). This is the long-running
    * production topology: the stateless admitting loop runs for the
    * life of the crawl while generations retrain and retire
    * underneath it. */
  def startAdmittingRollable(spark: SparkSession, dir: String,
      docs: DataFrame, gen: GenerationRef,
      compactEvery: Int = CompactEveryMerges)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val merges = new java.util.concurrent.atomic.AtomicLong(0L)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (tag, cf) = gen.advance()
        val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir, tag, cf)
        val verdict = verdictFor(spark, batch, bandsT, setsT).localCheckpoint()
        sink(verdict, batchId)
        val kept = batch.join(
          verdict.filter(col("admit"))
            .select(col("batch_id").as("doc_id")),
          "doc_id")
          .select(col("doc_id"), col("text"))
          .localCheckpoint()
        maintain(spark, graft.operators.AdmissionLog.DocKind,
          graft.operators.IndexStore.suffix(dir, tag, cf), kept,
          merges, compactEvery)(
          k => Dedup.mergeBatchIntoBandIndex(spark, dir, k, tag, cf))(
          () => Dedup.compactBandIndex(spark, dir, tag, cf))
      }
      .start()
  }

  /** The FULL production ingest per micro-batch — extract → quality
    * gate → dedup probe for quality survivors only, one reason-tagged
    * verdict row per arriving page (`Pipeline.ingestVerdictFor`; see
    * its scaladoc for the stage-order economics). This is the
    * topology a crawl actually deploys: the cheap scans judge every
    * page, the index join pays only for what survives them. */
  def startFullIngest(spark: SparkSession, dir: String, pages: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir, tag, corpusFilter)
    pages.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Pipeline.ingestVerdictFor(spark, batch, bandsT, setsT),
          batchId)
      }
      .start()
  }

  /** [[startFullIngest]] with ADMISSION and a SWAPPABLE generation —
    * the topology a crawl actually deploys, end to end: every
    * micro-batch reads the generation once
    * ([[GenerationRef.advance]], which also promotes a pending
    * [[graft.operators.Rollover.cutover]] under this batch's
    * serialization), runs the full extract → quality → dedup verdict,
    * and folds the batch's KEEP pages — their EXTRACTED main text,
    * the same form the probe shingles — into the standing band index
    * and the generation's admission log before the next batch probes.
    * A page duplicating content accepted seconds ago is flagged
    * `duplicate`; quality rejects and no-content pages are never
    * admitted (reason ≠ keep ⇒ not merged), matching the batch gate's
    * admission policy. Verdicts are checkpointed pre-admission, the
    * index auto-compacts every `compactEvery` merges, and generations
    * retrain and retire underneath the running stream exactly as in
    * [[startAdmittingRollable]]. */
  def startFullIngestRollable(spark: SparkSession, dir: String,
      pages: DataFrame, gen: GenerationRef,
      compactEvery: Int = CompactEveryMerges)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val merges = new java.util.concurrent.atomic.AtomicLong(0L)
    pages.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (tag, cf) = gen.advance()
        val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir, tag, cf)
        val extracted = graft.operators.Pipeline.extractedOf(batch)
        val verdict = graft.operators.Pipeline
          .ingestVerdictOnExtracted(spark, extracted, bandsT, setsT)
          .localCheckpoint()
        sink(verdict, batchId)
        val kept = extracted.join(
          verdict.filter(col("keep")).select(col("doc_id")), "doc_id")
          .select(col("doc_id"), col("text"))
          .localCheckpoint()
        maintain(spark, graft.operators.AdmissionLog.DocKind,
          graft.operators.IndexStore.suffix(dir, tag, cf), kept,
          merges, compactEvery)(
          k => Dedup.mergeBatchIntoBandIndex(spark, dir, k, tag, cf))(
          () => Dedup.compactBandIndex(spark, dir, tag, cf))
      }
      .start()
  }

  /** [[startFullIngestRollable]]'s MODEL-gated twin — the quality
    * stage is the generation's persisted TRAINED models
    * ([[graft.operators.Pipeline.modelGateVerdictOn]]: char-LM
    * perplexity ceiling, classifier with its train-time mean cut,
    * DSIR importance floor) instead of the heuristic blend. Every
    * micro-batch reads the generation once ([[GenerationRef.advance]],
    * promoting a pending cutover under this batch's serialization),
    * loads the generation's model tables (catalog hits after the
    * first batch — a deployed gate LOADS its models), judges, and
    * folds the batch's keeps into the band index + admission log
    * before the next batch probes. The models stay FROZEN between
    * generations (the model family's staleness contract — admissions
    * reach the dedup index immediately but the scoring weights only
    * at the next rollover); a [[graft.operators.Rollover.cutover]]
    * swaps the LM, classifier, DSIR counts, and band index TOGETHER
    * at one batch boundary, so no batch ever judges with one
    * generation's LM and another's classifier. */
  def startModelGatedRollable(spark: SparkSession, dir: String,
      docs: DataFrame, gen: GenerationRef,
      compactEvery: Int = CompactEveryMerges)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val merges = new java.util.concurrent.atomic.AtomicLong(0L)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (tag, cf) = gen.advance()
        val (bandsT, setsT) = Dedup.ensureBandIndex(spark, dir, tag, cf)
        val lmT = graft.operators.TextAnalysis.ensureCharLmModel(spark, dir, tag, cf)
        val (wT, statsT) = graft.operators.Curation.ensureClassifierModel(spark, dir, tag, cf)
        val dsirT = graft.operators.Curation.ensureDsirModel(spark, dir, tag, cf)
        val cutsT = graft.operators.Pipeline.ensureGateCuts(spark, dir, tag, cf)
        val verdict = graft.operators.Pipeline
          .modelGateVerdictOn(spark, batch, lmT, wT, statsT, dsirT, cutsT,
            bandsT, setsT)
          .localCheckpoint()
        sink(verdict, batchId)
        val kept = batch.dropDuplicates("doc_id")
          .join(verdict.filter(col("keep")).select(col("doc_id")), "doc_id")
          .select(col("doc_id"), col("text"))
          .localCheckpoint()
        maintain(spark, graft.operators.AdmissionLog.DocKind,
          graft.operators.IndexStore.suffix(dir, tag, cf), kept,
          merges, compactEvery)(
          k => Dedup.mergeBatchIntoBandIndex(spark, dir, k, tag, cf))(
          () => Dedup.compactBandIndex(spark, dir, tag, cf))
      }
      .start()
  }
}
