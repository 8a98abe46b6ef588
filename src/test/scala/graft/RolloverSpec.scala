package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotProduct
import graft.operators.{Dedup, IndexStore, Retrieval, Similarity}
import graft.streaming.{GenerationRef, StreamingIngestGate}

/** Generation ROLLOVER across the persisted index families — the step
  * the merge contract defers to: after an admitting run folds batches
  * into generation G, generation G+1 is rebuilt (band/span/text) or
  * RETRAINED (ANN books) from corpus + admitted, probes swap over, and
  * G drops. These drills pin the full lifecycle:
  *   (a) the rolled-over generation's probe is identical to the
  *       incrementally merged G (untrained families) or to the fresh
  *       full-corpus recompute twin (ANN — training arithmetic is
  *       order-independent exact-integer sums, so retraining on
  *       corpus ∪ admitted equals training on the equivalent frame),
  *   (b) G keeps serving until the swap,
  *   (c) G is droppable afterwards — the new generation's probes are
  *       self-contained,
  *   (d) the ANN drift contract becomes an assertion: books retrained
  *       on the merged set quantize it no worse than G's frozen books,
  *   (e) an admitting STREAM hands off G → G+1 at a batch boundary
  *       with one-verdict-per-doc totality — nothing dropped, nothing
  *       double-judged, and admissions since the retrain snapshot are
  *       caught up before the swap. */
class RolloverSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private val drill = Dedup.drillCorpusFilter
  // lang rides along for the DSIR family's target counts — the full-
  // corpus parity assertions need the admitted quarter labeled the way
  // the documents table labels it (unlabeled admissions count raw-only)
  private def batchDocs: DataFrame =
    Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("lang"), col("text"))

  test("band family: rollover equals merged G, probes swap, G drops") {
    val (b0, s0) = Dedup.ensureBandIndex(spark, sf0001, "rollg0", drill)
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, batchDocs, "rollg0", drill)
    val (b1, s1) = Dedup.rolloverBandIndex(spark, sf0001, batchDocs, "rollg1", drill)

    // (a) rebuilt-from-scratch G+1 is row-identical to incrementally
    // merged G — signatures carry no trained state
    assert(rows(spark.table(b1)) == rows(spark.table(b0)),
      "rolled band table != merged band table")
    assert(rows(spark.table(s1)) == rows(spark.table(s0)),
      "rolled sets table != merged sets table")

    // probe parity on a fresh probe set (docs outside the batch split)
    val probe = Dedup.minHashSignatures(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(7L)) === 1)
    val fromG0 = rows(Dedup.probeBandIndex(spark, probe, b0, s0))
    val fromG1 = rows(Dedup.probeBandIndex(spark, probe, b1, s1))
    assert(fromG0.nonEmpty, "probe set produced no verdicts")
    assert(fromG0 == fromG1, "G+1 probe diverged from G probe")

    // (c) drop G — G+1 serves alone
    IndexStore.drop(spark, b0)
    IndexStore.drop(spark, s0)
    assert(!spark.catalog.tableExists(b0) && !spark.catalog.tableExists(s0))
    assert(rows(Dedup.probeBandIndex(spark, probe, b1, s1)) == fromG1,
      "G+1 probe changed after dropping G")
  }

  test("span family: rollover equals merged G, G drops") {
    val t0 = Dedup.ensureSpanIndex(spark, sf0001, "rollg0", drill)
    Dedup.mergeBatchIntoSpanIndex(spark, sf0001, batchDocs, "rollg0", drill)
    val t1 = Dedup.rolloverSpanIndex(spark, sf0001, batchDocs, "rollg1", drill)
    assert(rows(spark.table(t1)) == rows(spark.table(t0)),
      "rolled span table != merged span table")
    IndexStore.drop(spark, t0)
    assert(!spark.catalog.tableExists(t0))
    assert(spark.table(t1).count() > 0, "G+1 span table empty after drop of G")
  }

  test("text family: rollover equals merged G, BM25 probes swap, G drops") {
    import spark.implicits._
    val (t0, st0) = Retrieval.ensureTextIndex(spark, sf0001, "rollg0", drill)
    Retrieval.mergeBatchIntoTextIndex(spark, sf0001, batchDocs, "rollg0", drill)
    val (t1, st1) = Retrieval.rolloverTextIndex(spark, sf0001, batchDocs, "rollg1", drill)

    assert(rows(spark.table(t1)) == rows(spark.table(t0)),
      "rolled postings != merged postings")
    assert(rows(spark.table(st1)) == rows(spark.table(st0)),
      "rolled stats != merged stats (additivity broken)")

    def topK(tfsT: String, statsT: String): Set[String] = rows(
      Retrieval.topKFromScores(Retrieval.scoresFromTextIndex(spark, tfsT, statsT,
        Retrieval.QueryTerms.toDF("query_id", "token").withColumn("w", lit(1L))),
        Retrieval.K))
    val fromG0 = topK(t0, st0)
    val fromG1 = topK(t1, st1)
    assert(fromG0.nonEmpty && fromG0 == fromG1,
      "G+1 BM25 ranking diverged from merged G")

    IndexStore.drop(spark, t0)
    IndexStore.drop(spark, st0)
    assert(topK(t1, st1) == fromG1, "G+1 ranking changed after dropping G")
  }

  test("ANN family: retrained G+1 equals fresh recompute; drift repaired; G drops") {
    val drillF = pmod(col("vec_id"), lit(4L)) =!= 0
    val (bk0, cd0) = Similarity.ensurePqIndex(spark, sf0001, "rollg0", drillF)
    val admitted = Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(4L)) === 0)
      .select(col("vec_id"), col("embedding"))
    // G admits the batch under FROZEN books (the between-retrains mode)
    Similarity.mergeBatchIntoPqIndex(spark, sf0001, admitted, "rollg0", drillF)

    // G+1 RETRAINS on corpus ∪ admitted = the full vector set; training
    // sums are exact scaled longs, so the retrained generation must be
    // bit-identical to one trained on the full corpus directly — probe
    // parity against the fresh recompute twin (whose DuckDB oracle is
    // green) is therefore EXACT, not approximate
    val (bk1, cd1) = Similarity.rolloverPqIndex(spark, sf0001, admitted,
      "rollg1", drillF)
    val fromG1 = rows(Similarity.adcTopK(
      Similarity.probePqIndex(spark, sf0001, bk1, cd1)))
    assert(fromG1 == rows(Similarity.topKIvfPq(spark, sf0001)),
      "retrained G+1 probe diverged from the fresh full-corpus recompute")

    // (b) G keeps serving while G+1 exists
    assert(rows(Similarity.probePqIndex(spark, sf0001, bk0, cd0)).nonEmpty,
      "G stopped serving before the swap")

    // (d) drift assertion — the StreamingAnnGate contract ("drift is
    // repaired at the next generation's retrain") made checkable:
    // G+1's books, trained on the merged set, must reconstruct it no
    // worse than G's frozen books (trained on 3/4 of it)
    val emb = Tables.embeddings(spark, sf0001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
      .select(col("vec_id"), col("embedding"))
    val (_, books0) = Similarity.loadBooks(spark, bk0)
    val (_, books1) = Similarity.loadBooks(spark, bk1)
    val err0 = Similarity.meanPqQuantError(emb, books0)
    val err1 = Similarity.meanPqQuantError(emb, books1)
    assert(err1 <= err0,
      f"retrained books reconstruct WORSE than frozen books: $err1%.6f > $err0%.6f")

    // (c) drop G — G+1 probes alone
    IndexStore.drop(spark, bk0)
    IndexStore.drop(spark, cd0)
    assert(!spark.catalog.tableExists(bk0) && !spark.catalog.tableExists(cd0))
    assert(rows(Similarity.adcTopK(
      Similarity.probePqIndex(spark, sf0001, bk1, cd1))) == fromG1,
      "G+1 probe changed after dropping G")
  }

  test("whole-generation rollover: all 16 tables build, match the full-corpus build, and drop") {
    import graft.operators.Rollover
    // corpus = the mod-4 drill split, admitted = the held-out quarter
    // (docs for the text-tier families, vectors for ANN) — so the
    // rolled generation covers the FULL corpus and every table must be
    // row-identical to the default full-corpus generation's
    val admittedVecs = Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(4L)) === 0)
      .select(col("vec_id"), col("embedding"))
    val drillV = pmod(col("vec_id"), lit(4L)) =!= 0

    val tables = Rollover.generation(spark, sf0001, batchDocs, "rollall1",
      drill, annAdmitted = Some((admittedVecs, drillV)))
    tables.values.flatten.foreach(t =>
      assert(spark.catalog.tableExists(t), s"family table missing: $t"))

    // every rolled table equals its DEFAULT full-corpus twin
    val defaults = Map(
      "band" -> { val (b, s) = Dedup.ensureBandIndex(spark, sf0001); Seq(b, s) },
      "span" -> Seq(Dedup.ensureSpanIndex(spark, sf0001)),
      "winnow" -> { val (p, s) = Dedup.ensureWinnowIndex(spark, sf0001); Seq(p, s) },
      "text" -> { val (t, s) = Retrieval.ensureTextIndex(spark, sf0001); Seq(t, s) },
      "ann" -> { val (b, c) = Similarity.ensurePqIndex(spark, sf0001); Seq(b, c) },
      "charlm" -> Seq(graft.operators.TextAnalysis.ensureCharLmModel(spark, sf0001)),
      "bpe" -> { val (m, v) = graft.operators.TextAnalysis.ensureBpeModel(spark, sf0001); Seq(m, v) },
      "classifier" -> { val (w, s) = graft.operators.Curation.ensureClassifierModel(spark, sf0001); Seq(w, s) },
      "dsir" -> Seq(graft.operators.Curation.ensureDsirModel(spark, sf0001)),
      "gatecuts" -> Seq(graft.operators.Pipeline.ensureGateCuts(spark, sf0001)))
    defaults.foreach { case (fam, defTables) =>
      tables(fam).zip(defTables).foreach { case (rolled, default) =>
        assert(rows(spark.table(rolled)) == rows(spark.table(default)),
          s"$fam: rolled table $rolled != full-corpus build $default")
      }
    }

    // the ops inventory sees every built table, with sane counts
    val report = Rollover.generationReport(spark, sf0001, "rollall1",
      drill, Some(drillV)).collect()
    val reported = report.map(_.getString(1)).toSet
    tables.values.flatten.foreach(t =>
      assert(reported(t), s"report missing built family table: $t"))
    assert(report.forall(_.getLong(3) >= 1L), "every table must have files")

    // retire the generation: every table + its files go — ONE call,
    // annFilter covering the vector predicate's suffix; a second drop
    // (nothing left) is a clean no-op
    Rollover.dropGeneration(spark, sf0001, "rollall1", drill, Some(drillV))
    tables.values.flatten.foreach(t =>
      assert(!spark.catalog.tableExists(t), s"table survived drop: $t"))
    Rollover.dropGeneration(spark, sf0001, "rollall1", drill, Some(drillV))
    assert(Rollover.generationReport(spark, sf0001, "rollall1",
      drill, Some(drillV)).isEmpty, "report of a dropped generation must be empty")
  }

  test("crashed generation rollover RESUMES: finished families are catalog hits") {
    import graft.operators.Rollover
    // a rollover that died after 4 of 10 families left band, span,
    // winnow, and text built under the new tag; the scaladoc claims
    // re-calling
    // generation() resumes — finished families must be CATALOG HITS
    // (no rebuild), the rest build, and the result equals a clean build
    val admittedVecs = Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(4L)) === 0)
      .select(col("vec_id"), col("embedding"))
    val drillV = pmod(col("vec_id"), lit(4L)) =!= 0

    // partial build = the crash state (each family builder is exactly
    // what generation() sequences, so building 3 directly IS a crash
    // after family 3)
    val (bandT, setsT) = Dedup.rolloverBandIndex(spark, sf0001, batchDocs, "rollcr1", drill)
    val spanT = Dedup.rolloverSpanIndex(spark, sf0001, batchDocs, "rollcr1", drill)
    val (winT, winSetsT) = Dedup.rolloverWinnowIndex(spark, sf0001, batchDocs, "rollcr1", drill)
    val (tfsT, statsT) = Retrieval.rolloverTextIndex(spark, sf0001, batchDocs, "rollcr1", drill)

    def fp(t: String) = tableFileFingerprint(t)
    val prebuilt = Seq(bandT, setsT, winT, winSetsT, spanT, tfsT, statsT)
    val pre = prebuilt.map(t => t -> fp(t)).toMap
    val lloydBefore = Similarity.lloydRuns.get()

    // the RETRY: re-call generation() with the same arguments
    val tables = Rollover.generation(spark, sf0001, batchDocs, "rollcr1",
      drill, annAdmitted = Some((admittedVecs, drillV)))
    tables.values.flatten.foreach(t =>
      assert(spark.catalog.tableExists(t), s"family table missing after resume: $t"))
    prebuilt.foreach(t =>
      assert(fp(t) == pre(t), s"resume REBUILT an already-finished family: $t"))
    val lloydAfterResume = Similarity.lloydRuns.get()
    assert(lloydAfterResume > lloydBefore,
      "resume must train the ANN family it never reached")

    // resumed result ≡ a clean build: the drill split covers the full
    // corpus, so every table must equal the default generation's
    val defaults = Map(
      "band" -> { val (b, s) = Dedup.ensureBandIndex(spark, sf0001); Seq(b, s) },
      "span" -> Seq(Dedup.ensureSpanIndex(spark, sf0001)),
      "text" -> { val (t, s) = Retrieval.ensureTextIndex(spark, sf0001); Seq(t, s) },
      "ann" -> { val (b, c) = Similarity.ensurePqIndex(spark, sf0001); Seq(b, c) },
      "charlm" -> Seq(graft.operators.TextAnalysis.ensureCharLmModel(spark, sf0001)),
      "bpe" -> { val (m, v) = graft.operators.TextAnalysis.ensureBpeModel(spark, sf0001); Seq(m, v) },
      "classifier" -> { val (w, s) = graft.operators.Curation.ensureClassifierModel(spark, sf0001); Seq(w, s) },
      "dsir" -> Seq(graft.operators.Curation.ensureDsirModel(spark, sf0001)),
      "gatecuts" -> Seq(graft.operators.Pipeline.ensureGateCuts(spark, sf0001)))
    defaults.foreach { case (fam, defTables) =>
      tables(fam).zip(defTables).foreach { case (resumed, default) =>
        assert(rows(spark.table(resumed)) == rows(spark.table(default)),
          s"$fam: resumed table $resumed != clean build $default")
      }
    }

    // a SECOND full retry is a pure catalog hit: zero retrains
    val all = tables.values.flatten.map(t => t -> fp(t)).toMap
    Rollover.generation(spark, sf0001, batchDocs, "rollcr1",
      drill, annAdmitted = Some((admittedVecs, drillV)))
    assert(Similarity.lloydRuns.get() == lloydAfterResume,
      "fully-built generation retried Lloyd's")
    all.foreach { case (t, f) =>
      assert(fp(t) == f, s"fully-built generation rewrote table: $t") }

    Rollover.dropGeneration(spark, sf0001, "rollcr1", drill, Some(drillV))
  }

  test("dropGeneration vs in-flight probe: completes correctly or fails cleanly") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the swap→drop contract says probes move off G BEFORE the drop,
    // but a straggler probe may still hold G's file listing when the
    // files vanish. Safety bar: the straggler either completes with
    // CORRECT rows (it read the listing before the delete and the
    // files were still there) or fails cleanly — it must never return
    // wrong/partial rows silently.
    val probeSigs = Dedup.minHashSignatures(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(7L)) === 1)
      .localCheckpoint()
    val expected = {
      val (b, s) = Dedup.ensureBandIndex(spark, sf0001, "dropsafe_ref", drill)
      val r = rows(Dedup.probeBandIndex(spark, probeSigs, b, s))
      IndexStore.drop(spark, b); IndexStore.drop(spark, s)
      r
    }
    assert(expected.nonEmpty)
    (1 to 4).foreach { i =>
      val tag = s"dropsafe$i"
      val (b, s) = Dedup.ensureBandIndex(spark, sf0001, tag, drill)
      val straggler = Future(scala.util.Try(
        rows(Dedup.probeBandIndex(spark, probeSigs, b, s))))
      Thread.sleep(i * 15L) // vary where the drop lands in the probe
      IndexStore.drop(spark, b)
      IndexStore.drop(spark, s)
      Await.result(straggler, 120.seconds) match {
        case scala.util.Success(r) =>
          assert(r == expected,
            s"straggler probe returned WRONG rows under a concurrent drop (iter $i)")
        case scala.util.Failure(_) => () // clean failure is acceptable
      }
    }
  }

  test("drop is catalog-first with a tombstone: no silent-empty window, no orphaned files") {
    import spark.implicits._
    import graft.operators.AdmissionLog
    // drop() removes the catalog entry BEFORE the files (while the
    // entry exists the files are complete — a files-first order lets a
    // still-cataloged table silently list empty), and records the
    // location in a tombstone so a crash between the two cannot orphan
    // the data files behind a tableExists-guarded no-op retry
    val sfx = "dropwin1"
    val t = AdmissionLog.tableName(AdmissionLog.DocKind, sfx)
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"))
    assert(spark.table(t).count() == 2)
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(conf)
    val tomb = new org.apache.hadoop.fs.Path(s"${IndexStore.root}/.drop_tomb_$t")
    // simulate drop() crashing right after its catalog DROP: tombstone
    // written, entry gone, data files still on disk
    val out = fs.create(tomb, true)
    out.write(loc.getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
    spark.sql(s"DROP TABLE `$t`")
    assert(fs.exists(p), "window setup: data files must still be on disk")
    // a straggler resolving the table mid-drop fails CLEANLY (no
    // catalog entry), never silently reads partial or empty rows
    val r = scala.util.Try(spark.table(t).count())
    assert(r.isFailure, s"mid-drop resolution must fail cleanly, got $r")
    // the RETRY — a no-op under a tableExists-only guard — must read
    // the tombstone back and sweep the orphaned files
    IndexStore.drop(spark, t)
    assert(!fs.exists(p), "retried drop must sweep the orphaned data files")
    assert(!fs.exists(tomb), "retried drop must clear the tombstone")
  }

  test("a corrupt tombstone can never aim the sweep outside a table dir") {
    // the tombstone write is temp+rename (atomic), so a truncated
    // location should be impossible — but the sweep still refuses any
    // recorded path that is not exactly one level below the index root,
    // so even a corrupt tombstone cannot recursively delete the root,
    // a nested path, or unrelated data outside the root
    val conf = spark.sparkContext.hadoopConfiguration
    val rootP = new org.apache.hadoop.fs.Path(IndexStore.root)
    val fs = rootP.getFileSystem(conf)
    val t = "graft_corrupt_tomb_drill"
    val tomb = new org.apache.hadoop.fs.Path(s"${IndexStore.root}/.drop_tomb_$t")
    for (bad <- Seq(IndexStore.root, "/tmp",
        s"${IndexStore.root}/sub/deeper",
        s"${IndexStore.root}/.drop_tomb_other")) {
      val out = fs.create(tomb, true)
      out.write(bad.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      val e = intercept[IllegalArgumentException] { IndexStore.drop(spark, t) }
      assert(e.getMessage.contains("refusing to sweep"), s"$bad: $e")
      assert(fs.exists(rootP), s"index root deleted by corrupt tombstone '$bad'")
    }
    fs.delete(tomb, false)
  }

  test("a failed catch-up keeps the swap pending; the replayed batch retries it") {
    val gen = new GenerationRef("g0", lit(true))
    var calls = 0
    gen.requestSwap("g1", lit(true)) { () =>
      calls += 1
      if (calls == 1) sys.error("transient catch-up failure")
    }
    intercept[RuntimeException](gen.advance())
    assert(gen.get()._1 == "g0" && gen.pendingTag.contains("g1"),
      "a failed catch-up must leave the gate on G with the swap still pending")
    assert(gen.advance()._1 == "g1" && gen.pendingTag.isEmpty,
      "the retried promotion must land and clear the pending swap")
    assert(calls == 2)
  }

  test("cutover fails fast over an unpromoted pending swap") {
    val gen = new GenerationRef("g0", lit(true))
    gen.requestSwap("g1", lit(true))(() => ())
    val e = intercept[IllegalStateException](
      graft.operators.Rollover.cutover(spark, sf0001, "g2", docGen = Some(gen)))
    assert(e.getMessage.contains("g1"),
      s"error must name the pending generation: ${e.getMessage}")
  }

  test("cutover RETRY folds admissions made between attempts into G+1") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, Rollover}

    // A cutover that builds G+1 and crashes before scheduling the swap
    // leaves check-then-build catalog hits behind; admissions taken
    // between the crash and the retry exist only in G's log. The
    // promotion delta diffs the old log against G+1's LOG (not the
    // retry's snapshot), so the retry must land those rows in G+1's
    // SERVING index — the failure mode where they sit in G+1's log but
    // never reach its band index is exactly what this pins.
    def text(i: Int): String = (1 to 40).map(j => s"cr${i}y$j").mkString(" ")
    val cf = lit(true)
    val oldTag = "retry0"; val newTag = "retry1"
    Dedup.ensureBandIndex(spark, sf0001, oldTag, cf)
    val oldSfx = IndexStore.suffix(sf0001, oldTag, cf)
    def admit(id: Long, i: Int): Unit = {
      val d = Seq((id, text(i))).toDF("doc_id", "text")
      AdmissionLog.append(spark, AdmissionLog.DocKind, oldSfx, d)
      Dedup.mergeBatchIntoBandIndex(spark, sf0001, d, oldTag, cf)
    }
    admit(2400001L, 1) // A: admitted before attempt 1

    // ATTEMPT 1 — cutover's build step verbatim, crashing before
    // requestSwap: G+1's tables hold corpus ∪ {A}, its log holds {A}
    val snap1 = AdmissionLog.snapshot(spark, AdmissionLog.DocKind, oldSfx)
    Rollover.generation(spark, sf0001, snap1, newTag, cf)
    val newSfx = IndexStore.suffix(sf0001, newTag, cf)
    AdmissionLog.append(spark, AdmissionLog.DocKind, newSfx, snap1)

    admit(2400002L, 2) // B: admitted into G between the attempts

    // RETRY — the real entry point; every family builder catalog-hits,
    // so only the promotion catch-up can carry B
    val gen = new GenerationRef(oldTag, cf)
    Rollover.cutover(spark, sf0001, newTag, docGen = Some(gen))
    assert(gen.advance()._1 == newTag, "promotion did not land")

    assert(spark.table("graft_sets_idx_" + newSfx)
      .filter(col("doc_id") === 2400002L).count() == 1,
      "admission made between cutover attempts missing from G+1's band index")
    val logIds = AdmissionLog.read(spark, AdmissionLog.DocKind, newSfx)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(2400001L, 2400002L).subsetOf(logIds),
      s"G+1's log must carry both admissions forward, got $logIds")

    // with G retired, G+1 ALONE must flag a dup of B
    Rollover.dropGeneration(spark, sf0001, oldTag, cf)
    val (b1, s1) = Dedup.ensureBandIndex(spark, sf0001, newTag, cf)
    val v = StreamingIngestGate.verdictFor(spark,
      Seq((2500002L, text(2))).toDF("doc_id", "text"), b1, s1).collect()
    assert(v.length == 1 && !v.head.getBoolean(3),
      "dup of the in-between admission not flagged by G+1")
  }

  test("gate cuts REFUSE to persist when the training corpus scores no rows") {
    // an empty score frame aggregates to NULL cuts, and a NULL cut falls
    // through every comparison in the gate verdict — the gate would
    // silently admit everything; the build must die, not ship
    import graft.operators.Pipeline
    val e = intercept[Exception] {
      Pipeline.ensureGateCuts(spark, sf0001, "gcutempty", lit(false))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("refusing to persist NULL cuts") ||
        m.contains("empty")), s"expected a loud empty-corpus failure, got $e")
    // nothing half-built may be left behind for a catalog-hit to find
    assert(!spark.catalog.tableExists(
      s"graft_gatecuts_idx_${graft.operators.IndexStore.suffix(sf0001, "gcutempty", lit(false))}"))
  }

  test("gate cuts derive from the training corpus and G+1 judges with G+1 cuts") {
    import spark.implicits._
    import graft.operators.{Curation, Pipeline, Rollover, TextAnalysis}
    // G: cuts derived from the drill corpus's own score distributions
    val c0 = Pipeline.ensureGateCuts(spark, sf0001, "gcut0", drill)
    val r0 = spark.table(c0).head
    // admitted char soup — seen characters in unseen orders, so G+1's
    // retrained LM assigns them low probabilities and the NLL
    // distribution (hence its P90 cut) SHIFTS with the generation
    def soup(i: Int): String =
      (1 to 60).map(j => s"q${(i * 37 + j * 13) % 97}zx${(i + j * 7) % 89}")
        .mkString(" ")
    val admitted = (1 to 120).map(i => (3600000L + i, soup(i)))
      .toDF("doc_id", "text")
    val c1 = Pipeline.rolloverGateCuts(spark, sf0001, admitted, "gcut1", drill)
    val r1 = spark.table(c1).head
    assert(r0.getLong(0) != r1.getLong(0),
      s"LM cut must shift with the training corpus: $r0 vs $r1")

    // the gate judges with ITS generation's persisted cut: the
    // verdict's lm_ppl set equals a recomputation from the verdict's
    // own scores against G+1's persisted cut value
    val lm1 = TextAnalysis.rolloverCharLmModel(
      spark, sf0001, admitted, "gcut1", drill) // catalog hit
    val (w1, st1) = Curation.rolloverClassifierModel(
      spark, sf0001, admitted, "gcut1", drill)
    val d1 = Curation.rolloverDsirModel(spark, sf0001, admitted, "gcut1", drill)
    val (b1, s1) = Dedup.ensureBandIndex(spark, sf0001, "gcut1", drill)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
      .unionByName(admitted.limit(10))
    val verdict = Pipeline.modelGateVerdictOn(
      spark, batch, lm1, w1, st1, d1, c1, b1, s1).collect()
    val gotLmPpl = verdict.filter(_.getString(1) == "lm_ppl")
      .map(_.getLong(0)).toSet
    val lmCut1 = r1.getLong(0)
    val expLmPpl = verdict.filter(r => !r.isNullAt(2) &&
        r.getString(1) != "no_content" &&
        math.round(r.getDouble(2) * 1e6) >= lmCut1)
      .map(_.getLong(0)).toSet
    assert(gotLmPpl == expLmPpl,
      "the gate did not judge with G+1's persisted LM cut")
    assert(gotLmPpl.nonEmpty,
      "drill needs at least one lm_ppl rejection under G+1's cut")
    Rollover.dropGeneration(spark, sf0001, "gcut0", drill)
    Rollover.dropGeneration(spark, sf0001, "gcut1", drill)
  }

  test("admission pressure: zero on a fresh generation, rises with the log, crosses the gate") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, IndexStore, Rollover}
    val tag = "press1"
    Dedup.ensureBandIndex(spark, sf0001, tag, drill)
    val sfx = IndexStore.suffix(sf0001, tag, drill)
    val (a0, c0, p0) = Rollover.admissionPressure(spark, sf0001, tag, drill)
    assert(a0 == 0L && p0 == 0L, s"fresh generation must read zero pressure, got ($a0, $p0)")
    assert(c0 == Tables.documents(spark, sf0001).filter(drill).count())

    // admissions land (the gates' log-then-merge); pressure = milli share
    val adm = batchDocs.select(col("doc_id"), col("text")).limit(40)
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx, adm)
    val (a1, c1, p1) = Rollover.admissionPressure(spark, sf0001, tag, drill)
    assert(a1 == 40L && c1 == c0 && p1 == 1000L * 40L / c0,
      s"pressure must be the exact milli ratio, got ($a1, $c1, $p1)")
    assert(p1 >= Rollover.RotatePressureMilli == (1000L * 40 / c0 >= 100L),
      "rotation gate must be the documented threshold comparison")

    // a cutover-seeded successor: its log CARRIES the training
    // snapshot forward, and the trained mark must zero it out — or a
    // monitor would rotate forever on identical data
    val tag2 = "press2"
    val sfx2 = IndexStore.suffix(sf0001, tag2, drill)
    Dedup.ensureBandIndex(spark, sf0001, tag2, drill)
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx2, adm)
    AdmissionLog.markTrained(spark, AdmissionLog.DocKind, sfx2, 40L)
    val (a2, _, p2) = Rollover.admissionPressure(spark, sf0001, tag2, drill)
    assert(a2 == 0L && p2 == 0L,
      s"trained-on snapshot must not count as pressure, got ($a2, $p2)")
    // fresh post-cutover admissions count from zero
    val adm2 = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id") + 9000000L as "doc_id", col("text")).limit(10)
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx2, adm2)
    val (a3, _, _) = Rollover.admissionPressure(spark, sf0001, tag2, drill)
    assert(a3 == 10L, s"post-mark admissions must count from zero, got $a3")
    // the ANN twin: same mark semantics over the vector log
    val vf = pmod(col("vec_id"), lit(4L)) =!= 0
    val vsfx = IndexStore.suffix(sf0001, tag2, vf)
    val vecs = Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(4L)) === 0)
      .select(col("vec_id"), col("embedding")).limit(20)
    AdmissionLog.append(spark, AdmissionLog.VecKind, vsfx, vecs)
    AdmissionLog.markTrained(spark, AdmissionLog.VecKind, vsfx, 20L)
    val (va, vc, vp) = Rollover.annAdmissionPressure(spark, sf0001, tag2, vf)
    assert(va == 0L && vp == 0L,
      s"trained-on vector snapshot must not count as pressure, got ($va, $vp)")
    assert(vc == Tables.embeddings(spark, sf0001).filter(vf).count())

    Rollover.dropGeneration(spark, sf0001, tag, drill)
    Rollover.dropGeneration(spark, sf0001, tag2, drill, Some(vf))
    assert(!spark.catalog.tableExists(AdmissionLog.trainedTable(AdmissionLog.DocKind, sfx2)),
      "the trained mark must drop with its generation")
    assert(!spark.catalog.tableExists(AdmissionLog.trainedTable(AdmissionLog.VecKind, vsfx)),
      "the vector trained mark must drop with its generation")
  }

  test("dropGeneration(foldInto) sweeps straggler admissions into the successor") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, Rollover}

    // the one-stream-per-handle contract's backstop: a second admitting
    // stream's in-flight batch can land an admission in the OLD
    // generation after the promotion's catch-up read its log; retiring
    // the generation with foldInto must carry that row into the
    // successor's index and log before the files vanish
    def text(i: Int): String = (1 to 40).map(j => s"fs${i}z$j").mkString(" ")
    val cf = lit(true)
    val oldTag = "fold0"; val newTag = "fold1"
    Dedup.ensureBandIndex(spark, sf0001, oldTag, cf)
    val oldSfx = IndexStore.suffix(sf0001, oldTag, cf)
    val a = Seq((2600001L, text(1))).toDF("doc_id", "text")
    AdmissionLog.append(spark, AdmissionLog.DocKind, oldSfx, a)
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, a, oldTag, cf)

    val gen = new GenerationRef(oldTag, cf)
    Rollover.cutover(spark, sf0001, newTag, docGen = Some(gen))
    assert(gen.advance()._1 == newTag)

    // straggler X admits into the retired generation post-promotion
    val x = Seq((2600002L, text(2))).toDF("doc_id", "text")
    AdmissionLog.append(spark, AdmissionLog.DocKind, oldSfx, x)
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, x, oldTag, cf)

    Rollover.dropGeneration(spark, sf0001, oldTag, cf, foldInto = Some(newTag))

    val newSfx = IndexStore.suffix(sf0001, newTag, cf)
    assert(!spark.catalog.tableExists("graft_band_idx_" + oldSfx),
      "old generation must be gone after the drop")
    assert(spark.table("graft_sets_idx_" + newSfx)
      .filter(col("doc_id") === 2600002L).count() == 1,
      "straggler admission missing from the successor's band index")
    val logIds = AdmissionLog.read(spark, AdmissionLog.DocKind, newSfx)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(2600001L, 2600002L).subsetOf(logIds))
    val (b1, s1) = Dedup.ensureBandIndex(spark, sf0001, newTag, cf)
    val v = StreamingIngestGate.verdictFor(spark,
      Seq((2700002L, text(2))).toDF("doc_id", "text"), b1, s1).collect()
    assert(v.length == 1 && !v.head.getBoolean(3),
      "dup of the swept straggler not flagged by the successor")
  }

  test("ANN cutover RETRY and foldInto cover the vector side too") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, Rollover}

    // twin of the doc-side retry + foldInto drills over the PQ family:
    // the fresh-build latch, the promotion delta, and the straggler
    // sweep all run through the vec-kind code paths here
    val drillF = Similarity.annDrillFilter
    val baseVecs = Tables.embeddings(spark, sf0001)
      .filter(drillF).select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(baseVecs.length == 3)
    def vec(base: Long, i: Int) = Seq((base, baseVecs(i)._2))
      .toDF("vec_id", "embedding")

    val oldTag = "vretry0"; val newTag = "vretry1"
    Similarity.ensurePqIndex(spark, sf0001, oldTag, drillF)
    val oldSfx = IndexStore.suffix(sf0001, oldTag, drillF)
    def admit(df: org.apache.spark.sql.DataFrame): Unit = {
      AdmissionLog.append(spark, AdmissionLog.VecKind, oldSfx, df)
      Similarity.mergeBatchIntoPqIndex(spark, sf0001, df, oldTag, drillF)
    }
    admit(vec(9100001L, 0)) // A: admitted before attempt 1

    // ATTEMPT 1 — cutover's ANN build step verbatim, crash before swap
    val snap1 = AdmissionLog.snapshot(spark, AdmissionLog.VecKind, oldSfx)
    Similarity.rolloverPqIndex(spark, sf0001, snap1, newTag, drillF)
    val newSfx = IndexStore.suffix(sf0001, newTag, drillF)
    AdmissionLog.append(spark, AdmissionLog.VecKind, newSfx, snap1)

    admit(vec(9100002L, 1)) // B: admitted between the attempts

    val gen = new GenerationRef(oldTag, drillF)
    Rollover.cutover(spark, sf0001, newTag, annGen = Some(gen))
    assert(gen.advance()._1 == newTag, "promotion did not land")
    assert(spark.table("graft_pq_codes_" + newSfx)
      .filter(col("vec_id") === 9100002L).count() == 1,
      "in-between ANN admission missing from G+1's codes")

    // straggler X admits into the retired generation post-promotion;
    // the foldInto sweep must carry it before the files drop
    admit(vec(9100003L, 2))
    Rollover.dropGeneration(spark, sf0001, oldTag,
      annFilter = Some(drillF), foldInto = Some(newTag))
    assert(!spark.catalog.tableExists("graft_pq_codes_" + oldSfx),
      "old ANN generation must be gone after the drop")
    assert(spark.table("graft_pq_codes_" + newSfx)
      .filter(col("vec_id") === 9100003L).count() == 1,
      "straggler ANN admission missing from the successor's codes")
    val logIds = AdmissionLog.read(spark, AdmissionLog.VecKind, newSfx)
      .select("vec_id").as[Long].collect().toSet
    assert(Set(9100001L, 9100002L, 9100003L).subsetOf(logIds),
      s"successor's vec log must carry all three admissions, got $logIds")
  }

  test("cutover under CONTINUOUS arrivals: every admission survives, nothing double-judged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.Rollover

    // the async production topology, no barriers: a feeder keeps
    // pushing micro-batches WHILE cutover snapshots and builds, so
    // arrivals land before the snapshot, during the build, and after
    // the swap request — wherever each one lands, its admission must
    // survive into G+1 (dup re-sent later must flag) and it must be
    // judged exactly once
    def text(i: Int): String = (1 to 40).map(j => s"cw${i}x$j").mkString(" ")
    val docs = (1 to 30).map(i => (2300000L + i, text(i)))

    val g0 = ("cont0", lit(true))
    Dedup.ensureBandIndex(spark, sf0001, g0._1, g0._2)
    val gen = new GenerationRef(g0._1, g0._2)
    val got = mutable.Buffer[Row]()
    val input = MemoryStream[(Long, String)]
    val q = StreamingIngestGate.startAdmittingRollable(spark, sf0001,
      input.toDF().toDF("doc_id", "text"), gen) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      input.addData(docs.take(5): _*); q.processAllAvailable()
      val feeder = new Thread(() => {
        docs.drop(5).grouped(3).foreach { chunk =>
          input.addData(chunk: _*)
          Thread.sleep(30L)
        }
      })
      feeder.start()
      Rollover.cutover(spark, sf0001, "cont1", docGen = Some(gen))
      feeder.join()
      q.processAllAvailable()
      // force a promotion batch if none of the feeder's landed after
      // the swap request
      val trigger = (2300099L, text(99))
      input.addData(trigger); q.processAllAvailable()
      assert(gen.get()._1 == "cont1", "promotion did not land")
      Rollover.dropGeneration(spark, sf0001, "cont0")
      // G is gone: a dup of EVERY doc — wherever its original landed
      // in the race — must flag against G+1 alone
      val dups = docs.map { case (id, t) => (id + 1000L, t) }
      input.addData(dups: _*); q.processAllAvailable()

      val ids = got.synchronized(got.map(_.getLong(0)))
      assert(ids.distinct.size == ids.size, "a doc was judged twice")
      assert(ids.size == docs.size + 1 + dups.size,
        s"expected ${docs.size + 1 + dups.size} verdicts, got ${ids.size}")
      val keep = got.synchronized(
        got.map(r => r.getLong(0) -> r.getBoolean(3)).toMap)
      docs.foreach { case (id, _) =>
        assert(keep(id), s"novel doc $id wrongly flagged") }
      val lost = dups.filter { case (id, _) => keep(id) }.map(_._1 - 1000L)
      assert(lost.isEmpty,
        s"admissions LOST across the live cutover (dups not flagged): $lost")
    } finally q.stop()
  }

  test("pressure-triggered rotation: the MONITOR fires the cutover under live arrivals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Rollover, RotationMonitor}

    // the production loop end-to-end: gate admits -> monitor polls ->
    // pressure crosses the threshold -> the MONITOR (never this test)
    // fires the cutover -> promotion lands at the gate's next batch ->
    // the monitor retires the predecessor -> pressure reads back under
    // the threshold. No call to cutover or dropGeneration below.
    def text(i: Int): String = (1 to 40).map(j => s"mon${i}q$j").mkString(" ")
    val docs = (1 to 24).map(i => (2700000L + i, text(i)))
    val corpusN = Tables.documents(spark, sf0001).count() // 500 at sf0.001
    val thresholdMilli = 1000L * 15 / corpusN // crosses at 15 admissions

    Dedup.ensureBandIndex(spark, sf0001, "mon0", lit(true))
    val gen = new GenerationRef("mon0", lit(true))
    val monitor = new RotationMonitor(spark, sf0001, gen, thresholdMilli)
    val polls = mutable.Buffer[String]()
    val got = mutable.Buffer[Row]()
    val input = MemoryStream[(Long, String)]
    val q = StreamingIngestGate.startAdmittingRollable(spark, sf0001,
      input.toDF().toDF("doc_id", "text"), gen) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      // under the threshold: the monitor must NOT rotate yet
      input.addData(docs.take(8): _*); q.processAllAvailable()
      polls += monitor.poll()
      assert(polls.last.startsWith("idle:"),
        s"monitor rotated below the threshold: $polls")
      // cross it, then keep arrivals flowing WHILE the monitor's poll
      // runs the whole cutover build
      input.addData(docs.slice(8, 16): _*); q.processAllAvailable()
      val feeder = new Thread(() => {
        docs.drop(16).grouped(2).foreach { chunk =>
          input.addData(chunk: _*); Thread.sleep(30L)
        }
      })
      feeder.start()
      polls += monitor.poll() // pressure >= threshold -> fires the cutover
      feeder.join()
      q.processAllAvailable()
      if (gen.get()._1 == "mon0") { // ensure a promotion batch ran
        input.addData((2700099L, text(99))); q.processAllAvailable()
      }
      assert(gen.get()._1 == "mon1",
        s"monitor-driven promotion did not land, polls: $polls")
      // polls after promotion retire mon0 (fold-into backstop inside)
      polls ++= (1 to 3).map(_ => monitor.poll())
      assert(polls.exists(_.startsWith("rotated:mon1")),
        s"monitor never fired the rotation, polls: $polls")
      assert(polls.contains("retired:mon0"),
        s"monitor never retired the predecessor, polls: $polls")
      assert(!spark.catalog.tableExists(
        "graft_band_idx_" + IndexStore.suffix(sf0001, "mon0", lit(true))),
        "retired generation's tables must be gone")
      // pressure is back under the gate (the trained mark zeroes the
      // seeded snapshot; only post-snapshot admissions count)
      val (_, _, pm) = Rollover.admissionPressure(spark, sf0001, "mon1", lit(true))
      assert(pm < thresholdMilli,
        s"post-rotation pressure must sit under the threshold, got $pm")
      // nothing lost across the monitor's rotation: a dup of every doc
      // must flag against mon1 alone; nothing judged twice
      val dups = docs.map { case (id, t) => (id + 1000L, t) }
      input.addData(dups: _*); q.processAllAvailable()
      val ids = got.synchronized(got.map(_.getLong(0)))
      assert(ids.distinct.size == ids.size, "a doc was judged twice")
      val keep = got.synchronized(
        got.map(r => r.getLong(0) -> r.getBoolean(3)).toMap)
      val lost = dups.filter { case (id, _) => keep(id) }.map(_._1 - 1000L)
      assert(lost.isEmpty,
        s"admissions LOST across the monitor-driven rotation: $lost")
    } finally q.stop()
    Rollover.dropGeneration(spark, sf0001, "mon1")
  }

  test("ANN pressure-triggered rotation: the Vectors MONITOR runs the whole lifecycle") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Rollover, RotationMonitor}

    // the ANN twin of the doc monitor drill above: gate admits ->
    // monitor polls ANN pressure -> crosses the threshold -> the
    // MONITOR (never this test) fires cutover(annGen) -> promotion
    // lands at the gate's next batch -> the monitor retires the
    // predecessor through dropAnnGeneration, which must sweep ONLY
    // vector families — a doc family sharing the tag survives. No call
    // to cutover, dropGeneration, or dropAnnGeneration below.
    val drillF = Similarity.annDrillFilter
    val keptIds = Similarity.annIngestGate(spark, sf0001)
      .filter(col("keep") && !col("no_content"))
      .select("batch_id").as[Long].collect().toSet
    val keptVecs = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(keptIds.toSeq: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(keptVecs.length >= 3, s"drill needs >=3 admittable vectors")
    val base = keptVecs.take(6)
    def reId(b: Long) = base.map { case (id, v) => (b + id, v) }
    val b1 = reId(21000000L)     // novel: all admitted, crosses the threshold
    val b2 = reId(22000000L).take(1) // novel: the promotion batch (folds at catch-up)
    val b3 = reId(23000000L)     // re-sent copies of b1: must flag vs G+1 alone

    val corpusN = Tables.embeddings(spark, sf0001).filter(drillF).count()
    val thresholdMilli = 1000L * b1.length / corpusN
    assert(thresholdMilli >= 1, s"corpus too large for the drill threshold")

    // a DOC family under the SAME tag — the ANN retirement must not touch it
    val (docBandT, _) = Dedup.ensureBandIndex(spark, sf0001, "vmon0", lit(true))
    Similarity.ensurePqIndex(spark, sf0001, "vmon0", drillF)
    val oldPqSfx = IndexStore.suffix(sf0001, "vmon0", drillF)
    val gen = new graft.streaming.GenerationRef("vmon0", drillF)
    val monitor = new RotationMonitor(spark, sf0001, gen, thresholdMilli,
      kind = RotationMonitor.Vectors)
    val polls = mutable.Buffer[String]()
    val got = mutable.Buffer[Row]()
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.StreamingAnnGate.startAdmittingRollable(spark, sf0001,
      input.toDF().toDF("vec_id", "embedding"), gen) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      polls += monitor.poll()
      assert(polls.last == "idle:0",
        s"monitor must idle with no admissions: $polls")
      input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      // arrivals keep flowing WHILE the poll runs the cutover build —
      // re-sent dups, so the old log does not grow past the drill's
      // threshold arithmetic
      val feeder = new Thread(() => {
        (1 to 3).foreach { i =>
          input.addData(reId(24000000L + i * 100000L).take(1).toIndexedSeq: _*)
          Thread.sleep(30L)
        }
      })
      feeder.start()
      polls += monitor.poll() // ANN pressure >= threshold -> fires the cutover
      feeder.join()
      q.processAllAvailable()
      assert(polls.last == "rotated:vmon1",
        s"monitor did not fire the ANN rotation: $polls")
      input.addData(b2.toIndexedSeq: _*); q.processAllAvailable() // promotion batch
      assert(gen.get()._1 == "vmon1",
        s"monitor-driven ANN promotion did not land, polls: $polls")
      polls ++= (1 to 2).map(_ => monitor.poll())
      assert(polls.contains("retired:vmon0"),
        s"monitor never retired the ANN predecessor, polls: $polls")
      // the retirement swept ONLY vector families: PQ tables gone,
      // the doc band index under the shared tag untouched
      assert(!spark.catalog.tableExists("graft_pq_codes_" + oldPqSfx) &&
        !spark.catalog.tableExists("graft_pq_books_" + oldPqSfx),
        "retired ANN generation's PQ tables must be gone")
      assert(spark.catalog.tableExists(docBandT),
        "ANN retirement must NOT sweep a doc family sharing the tag")
      // post-rotation pressure sits under the threshold (the trained
      // mark zeroes the seeded snapshot; only the folded promotion
      // batch counts)
      val (_, _, pm) = Rollover.annAdmissionPressure(spark, sf0001, "vmon1", drillF)
      assert(pm < thresholdMilli,
        s"post-rotation ANN pressure must sit under the threshold, got $pm")
      // G is gone: re-sent copies of the b1 admissions probe G+1 alone
      input.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val byId = got.synchronized(got.map(r => r.getLong(0) -> r.getBoolean(3)).toMap)
    assert(b1.forall { case (id, _) => byId(id) },
      "batch-1 novel vectors wrongly flagged")
    val flagged3 = b3.count { case (id, _) => !byId(id) }
    assert(flagged3 * 2 >= b3.length && flagged3 >= 1,
      s"only $flagged3/${b3.length} re-sent vectors flagged after the " +
        "monitor-driven rotation (admissions lost?)")
    Rollover.dropAnnGeneration(spark, sf0001, "vmon1", drillF)
    Rollover.dropGeneration(spark, sf0001, "vmon0")
  }

  test("chained cutovers: admissions survive across TWO generation hops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.Rollover

    // the carry-forward claim made checkable: G+1 is built from
    // corpus ∪ LOG, and the corpus table never grows — so a doc
    // admitted into G0 appears in G2's tables ONLY if each cutover
    // copied the log forward. Two hops with G0 and G1 both dropped
    // before the final probe prove it.
    def novel(seed: Char): String = (1 to 40).map(i => s"ch$seed$i").mkString(" ")
    val e1 = (2100001L, novel('a')) // admitted into G0
    val e2 = (2100002L, novel('b')) // promotion batch for G0->G1, admits into G1
    val e3 = (2100003L, novel('c')) // promotion batch for G1->G2, admits into G2
    val e4 = (2100004L, novel('a')) // dup of the G0 admission — must flag in G2
    val e5 = (2100005L, novel('b')) // dup of the G1 admission — must flag in G2

    val g0 = ("chain0", lit(true))
    val gen = new GenerationRef(g0._1, g0._2)
    val got = mutable.Buffer[Row]()
    val input = MemoryStream[(Long, String)]
    val q = StreamingIngestGate.startAdmittingRollable(spark, sf0001,
      input.toDF().toDF("doc_id", "text"), gen) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      input.addData(e1); q.processAllAvailable()
      Rollover.cutover(spark, sf0001, "chain1", docGen = Some(gen))
      input.addData(e2); q.processAllAvailable() // promotes to chain1
      assert(gen.get()._1 == "chain1")
      Rollover.dropGeneration(spark, sf0001, "chain0")
      Rollover.cutover(spark, sf0001, "chain2", docGen = Some(gen))
      input.addData(e3); q.processAllAvailable() // promotes to chain2
      assert(gen.get()._1 == "chain2")
      Rollover.dropGeneration(spark, sf0001, "chain1")
      // G0 and G1 are both GONE; G2 must still flag dups of their
      // admissions, two hops later
      input.addData(e4, e5); q.processAllAvailable()
    } finally q.stop()

    val ids = got.map(_.getLong(0))
    assert(ids.size == 5 && ids.distinct.size == 5,
      s"expected 5 unique verdicts across two hops, got $ids")
    val keep = got.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(keep(e1._1) && keep(e2._1) && keep(e3._1),
      s"novel docs wrongly dropped: $keep")
    assert(!keep(e4._1),
      s"dup of a G0 admission NOT flagged two generations later: $keep")
    assert(!keep(e5._1),
      s"dup of a G1 admission NOT flagged one generation later: $keep")
  }

  test("ANN streaming handoff: cutover swaps to RETRAINED books with no hand-merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // the drill's KEPT vectors are novel vs the held-out-split index;
    // re-sent copies land within quantization error of their admitted
    // twins (the StreamingAnnGateSpec construction)
    val drillF = Similarity.annDrillFilter
    val keptIds = Similarity.annIngestGate(spark, sf0001)
      .filter(col("keep") && !col("no_content"))
      .select("batch_id").as[Long].collect().toSet
    assert(keptIds.nonEmpty)
    val keptVecs = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(keptIds.toSeq: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def reId(base: Long) = keptVecs.map { case (id, v) => (base + id, v) }
    val b1 = reId(6000000L)
    val b2 = reId(7000000L)
    val b3 = reId(8000000L)
    val b4 = reId(9000000L)

    val (bk0, cd0) = Similarity.ensurePqIndex(spark, sf0001, "rollsann0", drillF)
    val gen = new graft.streaming.GenerationRef("rollsann0", drillF)
    val got = mutable.Buffer[Row]()
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.StreamingAnnGate.startAdmittingRollable(spark, sf0001,
      input.toDF().toDF("vec_id", "embedding"), gen) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      // batch 1: novel -> admitted into G under its frozen books (and
      // into G's admission log — nothing is hand-carried from here on)
      input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      // cutover: snapshot G's log, RETRAIN G+1 books on corpus ∪
      // admitted; batch 2 lands AFTER the snapshot (admitted into G) —
      // the race the hand-merged handoff could not close
      graft.operators.Rollover.cutover(spark, sf0001, "rollsann1",
        annGen = Some(gen),
        afterSnapshot = () => {
          input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
        })
      assert(gen.get()._1 == "rollsann0", "swap must wait for a batch boundary")
      // batch 3 promotes: the catch-up folds batch 2's admissions into
      // G+1 (encoded with the RETRAINED books), the gate flips, and the
      // re-sent b1 copies probe G+1 — most must flag
      input.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
      assert(gen.get()._1 == "rollsann1", "promotion did not land")
      // promotion observed -> retire G completely (tables + files + log)
      graft.operators.Rollover.dropGeneration(spark, sf0001, "rollsann0",
        annFilter = Some(drillF))
      assert(!spark.catalog.tableExists(bk0) && !spark.catalog.tableExists(cd0))
      // batch 4 probes G+1 ALONE (G is GONE): re-sent copies of the
      // post-snapshot batch-2 admissions must flag — proof the
      // promotion-time catch-up actually folded them
      input.addData(b4.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val ids = got.map(_.getLong(0))
    assert(ids.size == 4 * keptVecs.length && ids.distinct.size == ids.size,
      s"expected ${4 * keptVecs.length} unique verdicts across the swap, got ${ids.size}")
    val byId = got.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(b1.forall { case (id, _) => byId(id) },
      "batch-1 verdicts diverged from the drill (self-flagged pre-admission?)")
    val flagged3 = b3.count { case (id, _) => !byId(id) }
    assert(flagged3 * 2 >= b3.length && flagged3 >= 1,
      s"only $flagged3/${b3.length} re-sent vectors flagged by the retrained generation")
    val flagged4 = b4.count { case (id, _) => !byId(id) }
    assert(flagged4 * 2 >= b4.length && flagged4 >= 1,
      s"only $flagged4/${b4.length} re-sent vectors flagged after G dropped " +
        "(post-snapshot admissions not caught up?)")
  }

  test("one cutover drives BOTH gates: doc and ANN swap at their own batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.Rollover

    // the whole-deployment form: one cutover call snapshots both logs,
    // builds all seven families, and schedules both swaps — each gate
    // promotes at ITS next batch, independently
    def novel(seed: Char): String = (1 to 40).map(i => s"bj$seed$i").mkString(" ")
    val d1 = (2200001L, novel('a'))
    val d2 = (2200002L, novel('x')) // promotion batch (doc side)
    val d3 = (2200003L, novel('a')) // dup of d1, judged by G+1 alone

    val drillF = Similarity.annDrillFilter
    val keptVecs = {
      val keptIds = Similarity.annIngestGate(spark, sf0001)
        .filter(col("keep") && !col("no_content"))
        .select("batch_id").as[Long].collect().toSet
      Tables.embeddings(spark, sf0001)
        .filter(col("vec_id").isin(keptIds.toSeq: _*))
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    }
    def reId(base: Long) = keptVecs.map { case (id, v) => (base + id, v) }
    val v1 = reId(16000000L)
    val v2 = reId(17000000L) // promotion batch (ANN side)

    val docGen = new GenerationRef("both0", lit(true))
    val annGen = new GenerationRef("both0", drillF)
    Dedup.ensureBandIndex(spark, sf0001, "both0", lit(true))
    Similarity.ensurePqIndex(spark, sf0001, "both0", drillF)

    val gotD = mutable.Buffer[Row]()
    val gotV = mutable.Buffer[Row]()
    val inD = MemoryStream[(Long, String)]
    val inV = MemoryStream[(Long, Array[Float])]
    val qD = StreamingIngestGate.startAdmittingRollable(spark, sf0001,
      inD.toDF().toDF("doc_id", "text"), docGen) { (v, _) =>
      gotD.synchronized { gotD ++= v.collect() }
    }
    val qV = graft.streaming.StreamingAnnGate.startAdmittingRollable(spark, sf0001,
      inV.toDF().toDF("vec_id", "embedding"), annGen) { (v, _) =>
      gotV.synchronized { gotV ++= v.collect() }
    }
    try {
      inD.addData(d1); qD.processAllAvailable()
      inV.addData(v1.toIndexedSeq: _*); qV.processAllAvailable()
      Rollover.cutover(spark, sf0001, "both1",
        docGen = Some(docGen), annGen = Some(annGen))
      // each gate flips at its own next batch — and only then
      assert(docGen.get()._1 == "both0" && annGen.get()._1 == "both0")
      inD.addData(d2); qD.processAllAvailable()
      assert(docGen.get()._1 == "both1", "doc gate did not promote")
      assert(annGen.get()._1 == "both0", "ANN gate promoted without a batch")
      inV.addData(v2.toIndexedSeq: _*); qV.processAllAvailable()
      assert(annGen.get()._1 == "both1", "ANN gate did not promote")
      Rollover.dropGeneration(spark, sf0001, "both0", annFilter = Some(drillF))
      inD.addData(d3); qD.processAllAvailable()
    } finally { qD.stop(); qV.stop() }

    val keepD = gotD.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(keepD(d1._1) && keepD(d2._1), s"novel docs wrongly dropped: $keepD")
    assert(!keepD(d3._1), s"dup of a both0 admission not flagged by both1: $keepD")
    val keepV = gotV.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v1.forall { case (id, _) => keepV(id) }, "v1 self-flagged pre-admission")
    val flagged2 = v2.count { case (id, _) => !keepV(id) }
    assert(flagged2 * 2 >= v2.length && flagged2 >= 1,
      s"only $flagged2/${v2.length} re-sent vectors flagged across the joint cutover")
  }

  test("streaming handoff: cutover swaps G -> G+1 with tracked catch-up, no hand-merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def novel(seed: Char): String = (1 to 40).map(i => s"rv$seed$i").mkString(" ")
    val d1 = (2000001L, novel('a'))
    val d2 = (2000002L, novel('b'))
    val d3 = (2000003L, novel('c'))
    val d4 = (2000004L, "x") // unshingleable -> no_content, never admitted
    val d5 = (2000005L, novel('a')) // dup of d1 (admitted pre-cutover snapshot)
    val d6 = (2000006L, novel('c')) // dup of d3 (admitted AFTER the snapshot)
    val d7 = (2000007L, novel('e')) // fresh
    val d8 = (2000008L, novel('f')) // fresh — the promotion batch

    val g0 = ("rollsg0", lit(true))
    val (b0, s0) = Dedup.ensureBandIndex(spark, sf0001, g0._1, g0._2)
    val gen = new GenerationRef(g0._1, g0._2)
    val got = mutable.Buffer[Row]()
    val input = MemoryStream[(Long, String)]
    val q = StreamingIngestGate.startAdmittingRollable(spark, sf0001,
      input.toDF().toDF("doc_id", "text"), gen) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      // batch 1 admits d1, d2 into G (and into G's admission log —
      // the test body never hand-carries a frame from here on)
      input.addData(d1, d2); q.processAllAvailable()
      // cutover: snapshot G's log -> build G+1 from corpus ∪ {d1,d2};
      // batch 2 lands AFTER the snapshot (d3 admitted into G, d4
      // no_content) — exactly the race plain swap could not close
      graft.operators.Rollover.cutover(spark, sf0001, "rollsg1",
        docGen = Some(gen),
        afterSnapshot = () => {
          input.addData(d3, d4); q.processAllAvailable()
        })
      assert(gen.get()._1 == "rollsg0", "swap must wait for a batch boundary")
      // batch 3 promotes: the catch-up folds d3 into G+1 inside the
      // gate's own serialization, the gate flips, d8 admits into G+1
      input.addData(d8); q.processAllAvailable()
      assert(gen.get()._1 == "rollsg1", "promotion did not land")
      // promotion observed -> retire G completely (tables + files + log)
      graft.operators.Rollover.dropGeneration(spark, sf0001, "rollsg0")
      assert(!spark.catalog.tableExists(b0) && !spark.catalog.tableExists(s0))
      // batch 4 probes G+1 ALONE (G is GONE — these verdicts prove the
      // swap actually took): dups of both pre- and post-snapshot
      // admissions must flag, fresh content must admit
      input.addData(d5, d6, d7); q.processAllAvailable()
    } finally q.stop()

    // totality across the handoff: every arrival exactly one verdict
    val ids = got.map(_.getLong(0))
    assert(ids.size == 8 && ids.distinct.size == 8,
      s"expected 8 unique verdicts across the swap, got $ids")
    val byId = got.map(r => r.getLong(0) ->
      ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap // keep, no_content, admit
    assert(byId(2000001L)._3 && byId(2000002L)._3 && byId(2000003L)._3,
      s"novel pre-swap docs not admitted: $byId")
    assert(byId(2000004L)._2 && !byId(2000004L)._3,
      s"unshingleable doc must be no_content and unadmitted: $byId")
    assert(byId(2000008L)._1 && byId(2000008L)._3,
      s"promotion-batch doc wrongly dropped: $byId")
    assert(!byId(2000005L)._1,
      s"dup of a pre-snapshot admission not flagged by G+1: $byId")
    assert(!byId(2000006L)._1,
      s"dup of a post-snapshot (caught-up) admission not flagged by G+1: $byId")
    assert(byId(2000007L)._1 && byId(2000007L)._3,
      s"fresh post-swap doc wrongly dropped: $byId")

    // the LIVE cutover wrote the trained mark: pressure on G+1 reads
    // exactly the admissions its models were NOT trained on — the
    // caught-up d3 plus the post-swap d8 and d7, never the {d1, d2}
    // snapshot the build consumed
    val (untrained, _, _) =
      graft.operators.Rollover.admissionPressure(spark, sf0001, "rollsg1")
    assert(untrained == 3L,
      s"G+1 pressure must count the 3 untrained admissions, got $untrained")
  }
}
