package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Whole-generation rollover orchestration — the operational entry
  * point a curation deployment calls once per cycle: rebuild or
  * RETRAIN every persisted artifact family for the next generation
  * from the standing corpus plus everything the admitting gates
  * accepted since the last one, while the current generation keeps
  * serving; then swap probes (the rollable gates' `GenerationRef`)
  * and [[dropGeneration]] the old tag.
  *
  * Family-by-family semantics live with their operators
  * ([[Dedup.rolloverBandIndex]], [[Similarity.rolloverPqIndex]],
  * [[Retrieval.rolloverTextIndex]], the model rollovers in
  * TextAnalysis/Curation); this object only sequences them, so the
  * per-family parity proofs (RolloverSpec, PersistedModelSpec) carry
  * over unchanged. Each family build is itself suffix-locked and
  * check-then-build, so a crashed rollover RESUMES by re-calling
  * [[generation]] — finished families are catalog hits. */
object Rollover {

  /** All table-name prefixes one generation owns — the drop inventory.
    * The ANN prefixes are split out because the vector corpus carries
    * its own predicate ([[generation]]'s `annAdmitted`), so its tables
    * usually live under a DIFFERENT suffix than the doc families'. */
  private val AnnFamilies: Seq[String] = Seq(
    "graft_pq_books_", "graft_pq_codes_", "graft_admlog_vec_",
    "graft_admtrained_vec_")
  private val Families: Seq[String] = Seq(
    "graft_band_idx_", "graft_sets_idx_", "graft_span_idx_",
    "graft_winnow_idx_", "graft_winsets_idx_",
    "graft_tfs_idx_", "graft_txtstats_idx_",
    "graft_charlm_idx_", "graft_clsw_idx_", "graft_clsstats_idx_",
    "graft_bpem_idx_", "graft_bpev_idx_", "graft_dsirm_idx_",
    "graft_gatecuts_idx_",
    "graft_admlog_doc_", "graft_admtrained_doc_") ++ AnnFamilies

  /** Fold the old generation's admissions that the new generation has
    * not yet absorbed — `old log − new log`, an id-only bucket-local
    * anti-join BEFORE any expensive work — into the new generation via
    * `merge`, then record them in the new log. MERGE-THEN-APPEND is the
    * load-bearing order, stated once for the promotion catch-up and the
    * foldInto straggler sweep alike: the new log must never hold a row
    * the new index has not absorbed (a crash between the two re-runs
    * the fold with the row still in the delta; the reverse order would
    * hide it from every later fold). The guard skips the merge + append
    * when nothing is missing — the steady case for a clean handoff. */
  private def foldMissing(spark: SparkSession, kind: String,
      oldSfx: String, newSfx: String)(merge: DataFrame => Unit): Unit = {
    val key = AdmissionLog.keyOf(kind)
    // BOTH sides of the diff are id-only — the old log carries full
    // payloads (text / embeddings) and at production scale holds a
    // whole generation's admissions, so materializing it inside the
    // promotion micro-batch is exactly the stall-the-stream cost the
    // id-only pruning exists to avoid. Payloads are fetched AFTER the
    // diff, for the (usually tiny) delta only, via a broadcast
    // semi-join that leaves the bucketed log unshuffled.
    val missingIds = AdmissionLog.snapshotIds(spark, kind, oldSfx)
      .join(AdmissionLog.snapshotIds(spark, kind, newSfx), Seq(key), "left_anti")
      .localCheckpoint()
    if (missingIds.take(1).nonEmpty) {
      val delta = AdmissionLog.snapshotDelta(spark, kind, oldSfx, missingIds)
      merge(delta)
      AdmissionLog.append(spark, kind, newSfx, delta)
    }
  }

  /** Build generation `newTag` across every family: the dedup band and
    * span indexes, the text postings, and the four model artifacts
    * (char-LM, BPE, classifier, DSIR counts) from corpus ∪
    * `admittedDocs`; the ANN books+codes retrained from
    * corpus ∪ the admitted vectors when a vector batch is supplied
    * (the doc and vector corpora are separate tables with separate
    * corpus predicates — `annAdmitted` carries its own filter; None
    * skips the ANN family). Returns the new generation's tables by
    * family, all serving immediately. */
  def generation(spark: SparkSession, dir: String,
      admittedDocs: DataFrame, newTag: String,
      corpusFilter: Column = lit(true),
      annAdmitted: Option[(DataFrame, Column)] = None): Map[String, Seq[String]] = {
    val (bandsT, setsT) =
      Dedup.rolloverBandIndex(spark, dir, admittedDocs, newTag, corpusFilter)
    val spanT =
      Dedup.rolloverSpanIndex(spark, dir, admittedDocs, newTag, corpusFilter)
    val (winT, winSetsT) =
      Dedup.rolloverWinnowIndex(spark, dir, admittedDocs, newTag, corpusFilter)
    val (tfsT, txtStatsT) =
      Retrieval.rolloverTextIndex(spark, dir, admittedDocs, newTag, corpusFilter)
    val lmT =
      TextAnalysis.rolloverCharLmModel(spark, dir, admittedDocs, newTag, corpusFilter)
    val (bpeMergesT, bpeVocabT) =
      TextAnalysis.rolloverBpeModel(spark, dir, admittedDocs, newTag, corpusFilter)
    val (clsWT, clsStatsT) =
      Curation.rolloverClassifierModel(spark, dir, admittedDocs, newTag, corpusFilter)
    val dsirT =
      Curation.rolloverDsirModel(spark, dir, admittedDocs, newTag, corpusFilter)
    val cutsT = // after the LM + DSIR retrains: the cuts score with them
      Pipeline.rolloverGateCuts(spark, dir, admittedDocs, newTag, corpusFilter)
    val ann = annAdmitted.map { case (vecs, vecFilter) =>
      val (booksT, codesT) =
        Similarity.rolloverPqIndex(spark, dir, vecs, newTag, vecFilter)
      "ann" -> Seq(booksT, codesT)
    }
    Map(
      "band" -> Seq(bandsT, setsT),
      "span" -> Seq(spanT),
      "winnow" -> Seq(winT, winSetsT),
      "text" -> Seq(tfsT, txtStatsT),
      "charlm" -> Seq(lmT),
      "bpe" -> Seq(bpeMergesT, bpeVocabT),
      "classifier" -> Seq(clsWT, clsStatsT),
      "dsir" -> Seq(dsirT),
      "gatecuts" -> Seq(cutsT)) ++ ann
  }

  /** The no-hand-merge generation handoff for LIVE admitting gates —
    * the tracked-catch-up form of [[generation]]: snapshot each gate's
    * [[AdmissionLog]], build generation `newTag` from corpus ∪
    * snapshot while the old generation keeps serving AND admitting,
    * then schedule the swap through the gate's own
    * [[graft.streaming.GenerationRef.requestSwap]]. The promotion —
    * and with it the catch-up that folds every admission made since
    * the snapshot into the new generation — runs INSIDE the gate's
    * next micro-batch, after the previous batch's merge committed
    * (micro-batches are serialized per query), so the window a caller
    * of plain `swap` can never close (a batch admitting into G between
    * the hand catch-up and the flip, forgotten when G drops) does not
    * exist here. The catch-up folds `old log − new log` — exactly the
    * admissions the new generation has not absorbed, whatever a
    * crashed-and-retried earlier cutover attempt did or did not finish
    * — so re-calling cutover after any crash converges. The new
    * generation's log ends as a superset of the old one's — admissions
    * must survive ACROSS generations, or the next cutover's corpus ∪
    * log rebuild would forget them.
    *
    * `docGen` drives the seven text-tier families, `annGen` the ANN
    * books+codes (each gate handle carries its own corpus predicate);
    * pass whichever gates are running. `afterSnapshot` is a drill seam
    * — RolloverSpec lands a deterministic post-snapshot admission
    * there to prove the catch-up. The old generation is NOT droppable
    * when this returns — drop it only after promotion is observed
    * (`gen.get()._1 == newTag`), via [[dropGeneration]]. */
  def cutover(spark: SparkSession, dir: String, newTag: String,
      docGen: Option[graft.streaming.GenerationRef] = None,
      annGen: Option[graft.streaming.GenerationRef] = None,
      afterSnapshot: () => Unit = () => ()): Map[String, Seq[String]] = {
    require(docGen.nonEmpty || annGen.nonEmpty,
      "cutover needs at least one gate handle")
    // overlapping cutovers are an operator error, not a race to absorb:
    // a second cutover scheduled over an unpromoted swap would orphan
    // the unpromoted generation's tables and lose the admissions its
    // catch-up was going to fold (the new closure would re-read the
    // generation BEFORE it). Fail fast; retry after a batch promotes.
    (docGen ++ annGen).foreach(g => g.pendingTag.foreach(t =>
      throw new IllegalStateException(
        s"cutover to $newTag with an unpromoted swap to $t still pending — " +
          "wait for a batch to promote it (gen.get()._1 == tag) first")))
    // SNAPSHOT each live gate's admission log, materialized under the
    // log lock (a racing gate-side compact is a drop-and-recreate —
    // an unlocked read landing in that window would silently build the
    // new generation from corpus alone). Anything admitted after this
    // line is the promotion-time catch-up's job.
    val docSnap = docGen.map { g =>
      val (tag, cf) = g.get()
      val oldSfx = IndexStore.suffix(dir, tag, cf)
      (g, cf, oldSfx, AdmissionLog.snapshot(spark, AdmissionLog.DocKind, oldSfx))
    }
    val annSnap = annGen.map { g =>
      val (tag, cf) = g.get()
      val oldSfx = IndexStore.suffix(dir, tag, cf)
      (g, cf, oldSfx, AdmissionLog.snapshot(spark, AdmissionLog.VecKind, oldSfx))
    }
    afterSnapshot()
    // BUILD the new generation from corpus ∪ snapshot; the old one
    // keeps serving and admitting throughout. The snapshot lands in
    // the new generation's log ONLY when the build was fresh: the
    // builders are check-then-build, so a RETRY of a crashed cutover
    // gets catalog hits holding the FIRST attempt's snapshot — and
    // blindly logging the retry's (larger) snapshot would mark docs
    // the tables never saw as already-folded, hiding them from the
    // promotion catch-up below. The invariant the catch-up depends on:
    // the new generation's log never holds a row its band/codes index
    // does not.
    val docTables = docSnap.map { case (_, cf, _, snap) =>
      val newSfx = IndexStore.suffix(dir, newTag, cf)
      val fresh = !spark.catalog.tableExists("graft_band_idx_" + newSfx)
      val tables = generation(spark, dir, snap, newTag, cf, annAdmitted = None)
      if (fresh) {
        AdmissionLog.append(spark, AdmissionLog.DocKind, newSfx, snap)
        AdmissionLog.markTrained(spark, AdmissionLog.DocKind, newSfx, snap.count())
      }
      tables
    }.getOrElse(Map.empty[String, Seq[String]])
    val annTables = annSnap.map { case (_, cf, _, snap) =>
      val newSfx = IndexStore.suffix(dir, newTag, cf)
      val fresh = !spark.catalog.tableExists("graft_pq_codes_" + newSfx)
      val (booksT, codesT) = Similarity.rolloverPqIndex(spark, dir, snap, newTag, cf)
      if (fresh) {
        AdmissionLog.append(spark, AdmissionLog.VecKind, newSfx, snap)
        AdmissionLog.markTrained(spark, AdmissionLog.VecKind, newSfx, snap.count())
      }
      Map("ann" -> Seq(booksT, codesT))
    }.getOrElse(Map.empty[String, Seq[String]])
    // SWAP-FIRST, catch-up AT promotion. The catch-up prunes the old
    // log to everything NOT YET IN THE NEW GENERATION'S LOG with an
    // id-only bucket-local anti-join BEFORE any expensive work — at
    // scale the log holds a whole generation's admissions, and
    // shingling/encoding all of it inside the promotion batch would
    // stall the live stream to land a handful of rows. Diffing against
    // the new LOG rather than the build-time snapshot makes a retried
    // cutover exact: whatever a crashed earlier attempt did or did not
    // fold, the delta is precisely the rows the new generation has not
    // absorbed (merge-then-append below keeps the log ⊆ index, and the
    // index merges' own novelty anti-joins keep the fold idempotent
    // under batch replay regardless).
    docSnap.foreach { case (g, cf, oldSfx, _) =>
      g.requestSwap(newTag, cf) { () =>
        foldMissing(spark, AdmissionLog.DocKind, oldSfx,
          IndexStore.suffix(dir, newTag, cf))(
          d => Dedup.mergeBatchIntoBandIndex(spark, dir, d, newTag, cf))
      }
    }
    annSnap.foreach { case (g, cf, oldSfx, _) =>
      g.requestSwap(newTag, cf) { () =>
        foldMissing(spark, AdmissionLog.VecKind, oldSfx,
          IndexStore.suffix(dir, newTag, cf))(
          d => Similarity.mergeBatchIntoPqIndex(spark, dir, d, newTag, cf))
      }
    }
    docTables ++ annTables
  }

  /** Default rotation threshold for [[admissionPressure]]: retrain
    * when admissions reach 10% of the training corpus. */
  val RotatePressureMilli = 100L

  /** The WHEN of a rollover — admission pressure on a generation:
    * how far the standing corpus has outgrown the artifacts trained
    * on it. Every persisted model and codebook is FROZEN between
    * generations (the staleness contract), so the count of log rows
    * the generation's artifacts were NOT trained on is the staleness
    * measure a deployment polls: `(n_untrained, n_corpus,
    * pressure_milli)`, rotate when `pressure_milli >=
    * RotatePressureMilli` (or the caller's own threshold). The
    * trained mark matters because logs CARRY FORWARD across cutovers
    * (the next rebuild must see every admission): a cutover-built
    * generation's log is seeded with the very snapshot its models
    * trained on, and counting that seed would leave pressure
    * permanently above the gate — a monitor would rotate forever on
    * identical data. Cost: one locked metadata-cheap count of the
    * bucketed log (the lock closes the race against a live gate's
    * drop-and-recreate compaction) plus one corpus count; an absent
    * log reads as zero pressure, and an empty corpus predicate
    * reports full pressure rather than dividing by zero. */
  def admissionPressure(spark: SparkSession, dir: String, tag: String = "",
      corpusFilter: Column = lit(true)): (Long, Long, Long) =
    pressureOf(spark, AdmissionLog.DocKind,
      IndexStore.suffix(dir, tag, corpusFilter),
      graft.Tables.documents(spark, dir).filter(corpusFilter).count())

  /** [[admissionPressure]]'s twin for the ANN gate's vector log —
    * same trained-mark subtraction, same locked count, ratio against
    * the vector corpus under the gate's own predicate. */
  def annAdmissionPressure(spark: SparkSession, dir: String, tag: String = "",
      vecFilter: Column = lit(true)): (Long, Long, Long) =
    pressureOf(spark, AdmissionLog.VecKind,
      IndexStore.suffix(dir, tag, vecFilter),
      graft.Tables.embeddings(spark, dir).filter(vecFilter).count())

  /** The one pressure formula both kinds share — a change to the
    * clamp or the zero-corpus convention cannot diverge the doc and
    * ANN rotation triggers. */
  private def pressureOf(spark: SparkSession, kind: String, sfx: String,
      nCorpus: Long): (Long, Long, Long) = {
    val nAdm = math.max(0L,
      AdmissionLog.count(spark, kind, sfx) -
        AdmissionLog.trainedCount(spark, kind, sfx))
    // zero untrained admissions is zero pressure REGARDLESS of corpus
    // size — a monitor polling an empty corpus predicate must not
    // rotate forever on no data. The full-pressure (1000) convention
    // for an empty corpus is reserved for nAdm > 0, where the ratio
    // would otherwise divide by zero with real staleness present.
    val pm = if (nAdm == 0L) 0L
      else if (nCorpus == 0L) 1000L
      else 1000L * nAdm / nCorpus
    (nAdm, nCorpus, pm)
  }

  /** Ops inventory of one generation — what exists, how big, how
    * fragmented: one row per family table present under the tag's
    * suffix(es), with row and file counts. files/bucket tells an
    * operator whether the every-N compaction is keeping up; a missing
    * family in a supposedly-finished generation is the partial-build
    * (crashed-rollover) signal, and [[generation]]'s check-then-build
    * resume is the fix. Driver-side loop over ≤17 tiny catalog
    * lookups; row counts ride parquet footers.
    *
    * A LIVE gate's every-N compaction rewrites its log and index
    * through a drop-and-recreate — a read landing in that window sees
    * a missing table or deleted files. The report tolerates the race
    * by retrying each table once after a short pause (a compaction
    * rewrite is milliseconds); a family absent on BOTH looks is
    * genuinely absent, not mid-rewrite, so the partial-build signal
    * stays trustworthy without the report taking every family's own
    * maintenance lock. */
  def generationReport(spark: SparkSession, dir: String, tag: String = "",
      corpusFilter: Column = lit(true),
      annFilter: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val doc = Families.map(p => (p.stripSuffix("_"), p + IndexStore.suffix(dir, tag, corpusFilter)))
    val ann = annFilter.toSeq.flatMap { af =>
      AnnFamilies.map(p => (p.stripSuffix("_"), p + IndexStore.suffix(dir, tag, af)))
    }
    def look(t: String): Option[(Long, Long)] =
      if (!spark.catalog.tableExists(t)) None
      else {
        val df = spark.table(t)
        Some((df.count(), df.inputFiles.length.toLong))
      }
    // a CLEAN None (tableExists false, no throw) is the genuinely-absent
    // signal and pays no sleep — only a THROW (deleted files mid-rewrite)
    // buys the pause-and-relook, and that relook is itself guarded so a
    // second failure (a rewrite longer than the pause, a transient FS
    // error) folds to None instead of crashing the whole report
    def robust(t: String): Option[(Long, Long)] =
      scala.util.Try(look(t)).getOrElse {
        Thread.sleep(100)
        scala.util.Try(look(t)).getOrElse(None)
      }
    (doc ++ ann).distinct
      .flatMap { case (fam, t) =>
        robust(t).map { case (n, f) => (fam, t, n, f) }
      }
      .toDF("family", "table", "n_rows", "n_files")
  }

  /** Retire one generation completely: drop every family table that
    * exists under the tag's suffix (tables + files; missing families
    * are skipped, so partial generations drop cleanly too). When the
    * generation's ANN tables were built under a separate vector
    * predicate ([[generation]]'s `annAdmitted` — the normal case),
    * pass it as `annFilter` so the books/codes drop too; they live
    * under that filter's suffix, which the doc-side sweep never
    * visits. Call only after probes have swapped off the tag.
    *
    * `foldInto` is the STRAGGLER BACKSTOP for topologies with more
    * than one admitting stream on a generation: [[cutover]]'s
    * promotion runs inside ONE stream's micro-batch, so another
    * stream's batch that read the old generation before the flip can
    * still admit into it afterwards — rows in the old log the
    * promotion delta never saw. Passing the successor tag folds
    * `old log − successor log` into the successor's band index (and,
    * under `annFilter`, its codes) and log before anything drops, so
    * retiring the generation cannot lose an admission. Call it after
    * every admitting stream has completed a batch past the promotion
    * (their in-flight old-generation batches have then committed). */
  def dropGeneration(spark: SparkSession, dir: String, tag: String,
      corpusFilter: Column = lit(true),
      annFilter: Option[Column] = None,
      foldInto: Option[String] = None): Unit = {
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    foldInto.foreach { succ =>
      foldMissing(spark, AdmissionLog.DocKind, sfx,
        IndexStore.suffix(dir, succ, corpusFilter))(
        d => Dedup.mergeBatchIntoBandIndex(spark, dir, d, succ, corpusFilter))
      annFilter.foreach { af =>
        foldMissing(spark, AdmissionLog.VecKind,
          IndexStore.suffix(dir, tag, af), IndexStore.suffix(dir, succ, af))(
          d => Similarity.mergeBatchIntoPqIndex(spark, dir, d, succ, af))
      }
    }
    Families.foreach(p => IndexStore.drop(spark, p + sfx))
    annFilter.foreach { af =>
      val asfx = IndexStore.suffix(dir, tag, af)
      AnnFamilies.foreach(p => IndexStore.drop(spark, p + asfx))
    }
  }

  /** Retire ONLY the vector families of one generation — the ANN-side
    * twin of [[dropGeneration]] for deployments where the ANN gate
    * rotates independently of doc gates that may SHARE its tag: sweeps
    * the PQ books/codes and the vec admission log under the tag's
    * VECTOR suffix and touches no doc family, so an ANN rotation can
    * never take down a doc generation still serving under the same
    * tag. `foldInto` is the same straggler backstop as
    * [[dropGeneration]]'s, folding `old vec log − successor vec log`
    * into the successor's codes (and log) before anything drops. */
  def dropAnnGeneration(spark: SparkSession, dir: String, tag: String,
      vecFilter: Column = lit(true), foldInto: Option[String] = None): Unit = {
    val sfx = IndexStore.suffix(dir, tag, vecFilter)
    foldInto.foreach { succ =>
      foldMissing(spark, AdmissionLog.VecKind, sfx,
        IndexStore.suffix(dir, succ, vecFilter))(
        d => Similarity.mergeBatchIntoPqIndex(spark, dir, d, succ, vecFilter))
    }
    AnnFamilies.foreach(p => IndexStore.drop(spark, p + sfx))
  }
}

/** The WHEN and the HOW of rotation finally joined — the production
  * loop an operator runs against ONE live admitting doc gate (one
  * handle, one monitor: the [[graft.streaming.GenerationRef]]
  * one-stream contract). Each [[poll]] advances the generation
  * lifecycle by at most one step, so an operator (or a scheduler
  * tick) just calls it on a cadence and never calls
  * [[Rollover.cutover]] or [[Rollover.dropGeneration]] by hand:
  *
  *   1. a predecessor awaiting retirement whose successor has
  *      promoted (`gen.get()` moved off it) is dropped, with
  *      `foldInto` pointed at the successor as the straggler
  *      backstop;
  *   2. otherwise, when no swap is pending, the gate's current
  *      generation's [[Rollover.admissionPressure]] is polled, and at
  *      or above `thresholdMilli` a [[Rollover.cutover]] to
  *      `nextTag(current)` fires — the build runs inside the poll
  *      (the gate keeps admitting throughout; promotion lands at the
  *      gate's next batch), and the displaced generation is queued
  *      for step 1;
  *   3. a pending unpromoted swap makes the poll a no-op — rotations
  *      never stack (and [[graft.streaming.GenerationRef.requestSwap]]
  *      enforces the same atomically).
  *
  * The monitor is KIND-aware: [[RotationMonitor.Docs]] (the default)
  * rotates the doc-tier families through [[Rollover.admissionPressure]]
  * / `cutover(docGen = …)` / [[Rollover.dropGeneration]];
  * [[RotationMonitor.Vectors]] rotates the ANN gate through
  * [[Rollover.annAdmissionPressure]] / `cutover(annGen = …)` /
  * [[Rollover.dropAnnGeneration]], whose retirement sweeps ONLY the
  * vector families — so an ANN monitor can never take down doc
  * families serving under a shared tag. Run one monitor per gate
  * handle (the doc and ANN gates rotate on independent pressure). */
final class RotationMonitor(spark: SparkSession, dir: String,
    gen: graft.streaming.GenerationRef,
    thresholdMilli: Long = Rollover.RotatePressureMilli,
    nextTag: String => String = RotationMonitor.bumpTag,
    kind: RotationMonitor.Kind = RotationMonitor.Docs) {

  private var retiring: Option[(String, Column)] = None

  /** The generation queued for retirement, if promotion has not been
    * observed yet — exposed for ops dashboards and drills. */
  def awaitingRetirement: Option[String] = retiring.map(_._1)

  private def pressureMilli(tag: String, cf: Column): Long = kind match {
    case RotationMonitor.Docs =>
      Rollover.admissionPressure(spark, dir, tag, cf)._3
    case RotationMonitor.Vectors =>
      Rollover.annAdmissionPressure(spark, dir, tag, cf)._3
  }

  private def rotate(succ: String): Unit = {
    kind match {
      case RotationMonitor.Docs =>
        Rollover.cutover(spark, dir, succ, docGen = Some(gen))
      case RotationMonitor.Vectors =>
        Rollover.cutover(spark, dir, succ, annGen = Some(gen))
    }
    ()
  }

  private def retire(oldTag: String, cf: Column, succ: String): Unit =
    kind match {
      case RotationMonitor.Docs =>
        Rollover.dropGeneration(spark, dir, oldTag, cf, foldInto = Some(succ))
      case RotationMonitor.Vectors =>
        Rollover.dropAnnGeneration(spark, dir, oldTag, cf, foldInto = Some(succ))
    }

  /** One monitor tick; returns what it did (`retired:<tag>`,
    * `rotated:<tag>`, `awaiting-promotion`, or `idle:<milli>`). */
  def poll(): String = {
    retiring match {
      case Some((oldTag, cf)) if gen.pendingTag.isEmpty && gen.get()._1 != oldTag =>
        retire(oldTag, cf, gen.get()._1)
        retiring = None
        s"retired:$oldTag"
      case _ =>
        if (gen.pendingTag.nonEmpty) "awaiting-promotion"
        else {
          val (tag, cf) = gen.get()
          val milli = pressureMilli(tag, cf)
          if (milli >= thresholdMilli) {
            val succ = nextTag(tag)
            rotate(succ)
            retiring = Some((tag, cf))
            s"rotated:$succ"
          } else s"idle:$milli"
        }
    }
  }
}

object RotationMonitor {
  /** Which artifact tier a monitor instance rotates — see the class
    * doc. The retirement paths differ on purpose: a Vectors monitor
    * must sweep only vector families under a possibly-shared tag. */
  sealed trait Kind
  case object Docs extends Kind
  case object Vectors extends Kind

  /** Default tag succession: bump a trailing integer (`gen7` →
    * `gen8`), or append `1` to a tag without one. */
  def bumpTag(tag: String): String = {
    val i = tag.lastIndexWhere(!_.isDigit) + 1
    val digits = tag.drop(i)
    if (digits.isEmpty) tag + "1" else tag.take(i) + (digits.toLong + 1L)
  }
}
