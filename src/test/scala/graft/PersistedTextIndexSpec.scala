package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval}

/** The persisted TEXT retrieval index lifecycle (third family after
  * the dedup band index and the ANN codes): the inverted index
  * persists bucketed by token, the corpus stats persist in their
  * ADDITIVE form (n_docs, sum_dl), and probes serve from the artifact
  * with zero corpus re-scan. Pins: probe parity with the recompute
  * ranking (integer scores — bit equality), plan hygiene, and the
  * merge contract — because the stats are additive, probe-after-merge
  * equals a full rebuild EXACTLY, no stale-stats window. */
class PersistedTextIndexSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def staticPlan[A](body: => A): A = {
    val k = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, old)
  }

  private def pathTo(root: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] =
    if (root eq target) Some(List(root))
    else root.children.view.flatMap(c => pathTo(c, target)).headOption.map(root :: _)

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

  test("persisted bm25 probe: ranking identical to the recompute path") {
    val a = rows(Retrieval.bm25TopK(spark, sf0001))
    val b = rows(Retrieval.bm25TopKPersisted(spark, sf0001))
    assert(a == b, "persisted bm25 ranking diverged from recompute")
    assert(a.nonEmpty)
  }

  test("probe plan: no corpus re-scan; postings consumed in on-disk layout") {
    import spark.implicits._
    val (tfsT, statsT) = Retrieval.ensureTextIndex(spark, sf0001)
    staticPlan {
      val plan = executedPlan(Retrieval.scoresFromTextIndex(spark, tfsT, statsT,
        Retrieval.QueryTerms.toDF("query_id", "token").withColumn("w", lit(1L))))
      val docScans = plan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
      }
      assert(docScans.isEmpty,
        s"persisted probe re-tokenized the corpus source:\n$plan")
      val tfsScans = plan.collect {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table.startsWith("graft_tfs_idx")) => f
      }
      assert(tfsScans.nonEmpty, s"expected the postings table scan:\n$plan")
      tfsScans.foreach { scan =>
        assert(scan.relation.bucketSpec.exists(_.bucketColumnNames == Seq("token")),
          s"postings table lost its token bucket spec:\n$plan")
        // every join against the postings is broadcast (query terms,
        // dfs, the 1-row stats — all bounded, broadcasting them IS the
        // shape): the corpus-sized side never SHUFFLES — the only
        // shuffle on the scan's root path is the final scoring
        // aggregate's, which moves per-(query, doc) contributions,
        // never corpus rows. Notably the per-term df aggregate runs
        // exchange-free off the token bucketing.
        val shufflesBelow = pathTo(plan, scan).toList.flatten.filter {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
          case _ => false
        }
        assert(shufflesBelow.size <= 1,
          s"postings moved through unexpected shuffles:\n$plan")
      }
    }
  }

  test("between generations: additive stats make merge ≡ rebuild, then compact") {
    val drill = Dedup.drillCorpusFilter
    val (tfsT, statsT) = Retrieval.ensureTextIndex(spark, sf0001,
      tag = "mergedrill", corpusFilter = drill)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(4L)) === 0)
      .select(col("doc_id"), col("text"))
    Retrieval.mergeBatchIntoTextIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 0),
      tag = "mergedrill", corpusFilter = drill)
    Retrieval.mergeBatchIntoTextIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 4),
      tag = "mergedrill", corpusFilter = drill)

    val allDocs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    assert(rows(spark.table(tfsT)) == rows(Retrieval.tfsOf(allDocs)),
      "merged postings != full rebuild")
    assert(rows(spark.table(statsT)) == rows(Retrieval.statsRawOf(allDocs)),
      "merged additive stats != full-corpus stats")

    // probe of the merged index == scores computed fresh over the full
    // corpus — df AND avgdl both exact, no stale-stats window
    import spark.implicits._
    val qterms = Retrieval.QueryTerms
      .toDF("query_id", "token").withColumn("w", lit(1L))
    assert(rows(Retrieval.scoresFromTextIndex(spark, tfsT, statsT, qterms)) ==
      rows(Retrieval.bm25ScoresWeighted(allDocs, qterms)),
      "merged-index probe diverged from full-corpus recompute")

    assert(bucketFileCounts(tfsT).values.max >= 2,
      "expected multi-file buckets after two merges")
    Retrieval.compactTextIndex(spark, sf0001,
      tag = "mergedrill", corpusFilter = drill)
    assert(bucketFileCounts(tfsT).values.max == 1,
      s"postings not compacted: ${bucketFileCounts(tfsT)}")
    assert(rows(Retrieval.scoresFromTextIndex(spark, tfsT, statsT, qterms)) ==
      rows(Retrieval.bm25ScoresWeighted(allDocs, qterms)),
      "compaction changed the probe result")
  }
}
