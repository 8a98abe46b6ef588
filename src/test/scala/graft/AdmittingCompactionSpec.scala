package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamingIngestGate

/** Auto-compaction cadence in the admitting gates: a long-running
  * admitting stream appends one file per bucket per accepted batch, so
  * without a schedule the index accretes files without bound (thousands
  * of batches → thousands of files per bucket). The gate now compacts
  * every `compactEvery` merges; this drill runs 3× that many batches
  * and pins the two halves of the contract:
  *   (a) files-per-bucket stays bounded by `compactEvery` at every
  *       batch boundary for the life of the stream,
  *   (b) verdicts are IDENTICAL to a never-compacting twin fed the
  *       same batches — the schedule changes when the rewrite runs,
  *       never what any probe sees (the merge→compact drills in
  *       PersistedIndexSpec prove the rewrite is row-identical; this
  *       proves the cadence composes with admission). */
class AdmittingCompactionSpec extends SparkSpec {

  private def bucketFileCounts(table: String): Map[String, Int] = {
    val loc = java.nio.file.Paths.get(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
    val re = "_(\\d{5})\\.".r
    java.nio.file.Files.list(loc).toArray.map(_.toString.split('/').last)
      .filter(f => f.endsWith(".parquet") && !f.startsWith(".") && !f.startsWith("_"))
      .flatMap(f => re.findFirstMatchIn(f).map(_.group(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length }
  }

  test("admitting gate compacts every N merges: bounded files, identical verdicts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val N = 2
    def novel(b: Int, i: Int): String =
      (1 to 40).map(k => s"ac${b}x${i}w$k").mkString(" ")
    // 3N batches of novel (admitted) docs, plus a final dup probe of
    // the very first admission — it must still flag after 3 compactions
    val batches: Seq[Seq[(Long, String)]] =
      (1 to 3 * N).map(b => Seq(
        (3000000L + b * 10, novel(b, 0)),
        (3000001L + b * 10, novel(b, 1)))) :+
        Seq((3999999L, novel(1, 0)))

    def runGate(tag: String, compactEvery: Int,
        observe: Int => Unit): Seq[Row] = {
      val (bandsT, _) = Dedup.ensureBandIndex(spark, sf0001, tag,
        Dedup.drillCorpusFilter)
      val input = MemoryStream[(Long, String)]
      val got = mutable.Buffer[Row]()
      val q = StreamingIngestGate.startAdmitting(spark, sf0001,
        input.toDF().toDF("doc_id", "text"), tag,
        Dedup.drillCorpusFilter, compactEvery) { (verdict, _) =>
        got.synchronized { got ++= verdict.collect() }
      }
      try batches.foreach { b =>
        input.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        observe(bucketFileCounts(bandsT).values.max)
      } finally q.stop()
      got.toSeq
    }

    val maxSeen = mutable.Buffer[Int]()
    val compacted = runGate("autocomp", N, maxSeen += _)
    val baseline = runGate("autocompoff", Int.MaxValue, _ => ())

    // (a) the bound holds at EVERY batch boundary, not just the end
    assert(maxSeen.forall(_ <= N),
      s"files-per-bucket exceeded the compactEvery=$N bound: $maxSeen")
    // the never-compacting twin actually accretes — the drill would be
    // vacuous if batches didn't add files
    val offBands = s"graft_band_idx_${graft.operators.IndexStore.suffix(
      sf0001, "autocompoff", Dedup.drillCorpusFilter)}"
    assert(bucketFileCounts(offBands).values.max > N,
      "baseline gate never accreted files; drill proves nothing")

    // (b) verdicts identical under either schedule
    def keyed(rs: Seq[Row]): Set[Seq[String]] =
      rs.map(_.toSeq.map(String.valueOf)).toSet
    assert(keyed(compacted) == keyed(baseline),
      "compaction cadence changed a verdict")
    // the dup of the first admission still flags after 3 compactions
    val dupRow = compacted.find(_.getLong(0) == 3999999L).get
    assert(!dupRow.getBoolean(3),
      "dup of an early admission not flagged on the compacted index")
    // totality: one verdict per arriving doc
    assert(compacted.map(_.getLong(0)).distinct.size == batches.flatten.size)

    // the fixed-tag gate RECORDS its admissions: the generation's
    // admission log holds exactly the novel docs (the dup probe is
    // absent), so a later Rollover.cutover from this generation can
    // retrain G+1 without the caller hand-carrying admitted frames —
    // and the log's own compaction cadence didn't lose a row
    import graft.operators.{AdmissionLog, IndexStore}
    val logIds = AdmissionLog.read(spark, AdmissionLog.DocKind,
      IndexStore.suffix(sf0001, "autocomp", Dedup.drillCorpusFilter))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val admittedIds = batches.flatten.map(_._1).toSet - 3999999L
    assert(logIds == admittedIds,
      s"admission log diverged from admitted set: ${logIds.size} logged, " +
        s"${admittedIds.size} admitted")
  }

  test("a gate that admits nothing never materializes the admission log") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // the steady production state is mostly rejects: a batch whose every
    // doc duplicates the standing corpus admits nothing, and the
    // maintenance pass must skip the log append AND the index merge —
    // not pay a lock + anti-join + insert job per batch for an empty
    // frame, and not create a log table for a generation that never
    // admitted anything
    val corpusDups = Tables.documents(spark, sf0001)
      .filter(Dedup.drillCorpusFilter)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(2)
      .collect().map(r => (5000000L + r.getLong(0), r.getString(1)))

    Dedup.ensureBandIndex(spark, sf0001, "emptyskip", Dedup.drillCorpusFilter)
    val input = MemoryStream[(Long, String)]
    val got = mutable.Buffer[Row]()
    val q = StreamingIngestGate.startAdmitting(spark, sf0001,
      input.toDF().toDF("doc_id", "text"), "emptyskip",
      Dedup.drillCorpusFilter) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try { input.addData(corpusDups.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()

    assert(got.size == corpusDups.length && got.forall(!_.getBoolean(3)),
      "exact corpus duplicates must all be rejected")
    val sfx = graft.operators.IndexStore.suffix(
      sf0001, "emptyskip", Dedup.drillCorpusFilter)
    assert(!spark.catalog.tableExists("graft_admlog_doc_" + sfx),
      "an all-reject batch still materialized the admission log")
  }
}
