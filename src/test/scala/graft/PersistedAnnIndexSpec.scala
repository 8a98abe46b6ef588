package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The persisted ANN index lifecycle (mirror of PersistedIndexSpec for
  * dedup): PQ/IVF codebooks and the encoded corpus are written ONCE per
  * generation as parquet tables (codes bucketed by coarse cell), and
  * every later probe serves from the artifact — no Lloyd's retrain, no
  * corpus re-encode, no corpus re-scan. These tests pin:
  *   (a) the persisted probe's verdict is IDENTICAL to the recompute
  *       path's (same rows, same float bits),
  *   (b) the probe plan never re-reads the raw embeddings source and
  *       consumes the cell-bucketed codes scan IN PLACE — zero
  *       exchanges on the corpus path (only the tiny LUT side
  *       broadcasts, which is the production probe shape),
  *   (c) the between-generations merge (encode an accepted batch with
  *       the FROZEN books, append into the bucketed table) equals
  *       encoding everything with the standing books — the production
  *       contract between retrains. */
class PersistedAnnIndexSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def indexScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table.startsWith("graft_")) => f
    }

  private def pathTo(root: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] =
    if (root eq target) Some(List(root))
    else root.children.view.flatMap(c => pathTo(c, target)).headOption.map(root :: _)

  /** AQE off for plan inspection only (AdaptiveSparkPlanExec hides its
    * subtree from collect). Broadcast stays ON: the LUT side is tiny by
    * construction (queries × 4 codebook tables) and its broadcast IS
    * the production probe shape — the corpus side must show zero
    * exchanges under it. */
  private def staticPlan[A](body: => A): A = {
    val k = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, old)
  }

  /** Exchanges sitting on the path from the root to `scan` — the
    * corpus side of the probe; must be empty (the only exchange in the
    * whole scored plan is the LUT side's BroadcastExchange). */
  private def exchangesAbove(p: SparkPlan, scan: SparkPlan): Seq[SparkPlan] =
    pathTo(p, scan).toList.flatten.filter(_.isInstanceOf[Exchange])

  private def assertProbeShape(plan: SparkPlan): Unit = {
    val scans = indexScans(plan)
    assert(scans.nonEmpty, s"expected the codes index scan in the probe plan:\n$plan")
    scans.foreach { scan =>
      assert(scan.relation.bucketSpec.exists(_.bucketColumnNames == Seq("cell")),
        s"codes table lost its cell bucket spec:\n$plan")
      assert(exchangesAbove(plan, scan).isEmpty,
        s"corpus codes moved through an exchange at probe time:\n$plan")
    }
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  /** Files per bucket id of a bucketed table's location — bucketed
    * file names carry the bucket as the `_NNNNN` suffix before .c000. */
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

  test("persisted IVF-PQ probe: verdict identical to the recompute path") {
    val a = rows(Similarity.topKIvfPq(spark, sf0001))
    val b = rows(Similarity.topKIvfPqPersisted(spark, sf0001))
    assert(a == b, "persisted IVF-PQ top-k diverged from recompute")
    assert(a.nonEmpty)
    val ar = rows(Similarity.topKIvfPqRerank(spark, sf0001))
    val br = rows(Similarity.topKIvfPqRerankPersisted(spark, sf0001))
    assert(ar == br, "persisted IVF-PQ rerank diverged from recompute")
    assert(ar.nonEmpty)
  }

  test("probe plan: no embeddings re-scan, corpus consumed in place") {
    val (booksT, codesT) = Similarity.ensurePqIndex(spark, sf0001)
    staticPlan {
      val plan = executedPlan(
        Similarity.probePqIndex(spark, sf0001, booksT, codesT))
      // the only file scan in the scored frame is the codes table —
      // books are already on the driver, the embeddings source is never
      // re-read at probe time
      val embScans = plan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("embeddings")) => f
      }
      assert(embScans.isEmpty,
        s"persisted probe re-scanned the embeddings source:\n$plan")
      assertProbeShape(plan)
    }
  }

  test("between generations: frozen-book batch merge equals a full re-encode") {
    import graft.functions.VectorFunctions.dotProduct
    // isolated generation whose corpus is the mod-4 held-out split
    val drillFilter = pmod(col("vec_id"), lit(4L)) =!= 0
    val (booksT, codesT) = Similarity.ensurePqIndex(spark, sf0001,
      tag = "mergedrill", corpusFilter = drillFilter)
    val batch = Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(4L)) === 0)
      .select(col("vec_id"), col("embedding"))
    // two ingest merges (disjoint halves), then compact back to one
    // file per cell bucket — every assertion below runs on the
    // compacted artifact, so compaction provably changed no code row
    Similarity.mergeBatchIntoPqIndex(spark, sf0001,
      batch.filter(pmod(col("vec_id"), lit(8L)) === 0),
      tag = "mergedrill", corpusFilter = drillFilter)
    Similarity.mergeBatchIntoPqIndex(spark, sf0001,
      batch.filter(pmod(col("vec_id"), lit(8L)) === 4),
      tag = "mergedrill", corpusFilter = drillFilter)
    assert(bucketFileCounts(codesT).values.max >= 2,
      "expected multi-file buckets after two merges (merge appends)")
    Similarity.compactPqIndex(spark, sf0001,
      tag = "mergedrill", corpusFilter = drillFilter)
    assert(bucketFileCounts(codesT).values.max == 1,
      s"codes index not compacted: ${bucketFileCounts(codesT)}")

    // reference: EVERY nonzero vector encoded with the generation's
    // standing (partial-corpus-trained) codebooks — the production
    // contract: new vectors take the frozen quantizers as-is
    val (cents, books) = Similarity.loadBooks(spark, booksT)
    val allEmb = Tables.embeddings(spark, sf0001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
      .select(col("vec_id"), col("embedding"))
    assert(rows(spark.table(codesT)) ==
      rows(Similarity.encodeWith(allEmb, cents, books)),
      "merged codes index != full re-encode with the standing books")

    // and the merged table still probes with the corpus in place
    staticPlan {
      assertProbeShape(executedPlan(
        Similarity.probePqIndex(spark, sf0001, booksT, codesT)))
    }
  }

  test("PQ merge replay is idempotent: re-merging an admitted batch appends nothing") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // foreachBatch is at-least-once: a crashed ANN admitting stream
    // re-runs its last batch; the merge's anti-join on the codes table
    // must make the replay a no-op (duplicate codes rows would inflate
    // every later probe's candidate multiset).
    val drillFilter = pmod(col("vec_id"), lit(4L)) =!= 0
    val (booksT, codesT) = Similarity.ensurePqIndex(spark, sf0001,
      tag = "replaydrill", corpusFilter = drillFilter)
    val batch = Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(4L)) === 0)
      .select(col("vec_id"), col("embedding"))
    val half = batch.filter(pmod(col("vec_id"), lit(8L)) === 0)
    Similarity.mergeBatchIntoPqIndex(spark, sf0001, half,
      tag = "replaydrill", corpusFilter = drillFilter)
    val once = rows(spark.table(codesT))
    val n = spark.table(codesT).count()

    // exact replay: nothing may land
    Similarity.mergeBatchIntoPqIndex(spark, sf0001, half,
      tag = "replaydrill", corpusFilter = drillFilter)
    assert(spark.table(codesT).count() == n, "replayed merge appended rows")
    assert(rows(spark.table(codesT)) == once, "replayed merge changed the index")

    // superset replay admits exactly the never-seen vectors, once each
    Similarity.mergeBatchIntoPqIndex(spark, sf0001, batch,
      tag = "replaydrill", corpusFilter = drillFilter)
    assert(spark.table(codesT).count() ==
      spark.table(codesT).select(col("vec_id")).distinct().count(),
      "codes table holds duplicate vec_ids after superset replay")
    import graft.functions.VectorFunctions.dotProduct
    val (cents, books) = Similarity.loadBooks(spark, booksT)
    val allEligible = Tables.embeddings(spark, sf0001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
      .select(col("vec_id"), col("embedding"))
    assert(rows(spark.table(codesT)) ==
      rows(Similarity.encodeWith(allEligible, cents, books)),
      "post-replay index != full re-encode with the standing books")
  }
}
