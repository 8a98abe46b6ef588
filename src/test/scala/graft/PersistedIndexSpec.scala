package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import graft.operators.Dedup

/** The persisted-index generation drill: the production dedup lifecycle
  * writes the corpus band/sets/span-code indexes as bucketed parquet
  * ONCE per generation, and every later ingest probes them bucket-
  * locally with zero corpus recompute. These tests execute that
  * lifecycle end-to-end and pin both halves of the claim:
  *   (a) the persisted probe computes the IDENTICAL verdict to the
  *       recompute path, and
  *   (b) with broadcast disabled (the 100 TB shape — a corpus index
  *       never broadcasts), no exchange sits BETWEEN an index-table
  *       scan and the join that consumes it: the corpus side of every
  *       probe join is a bucketed scan consumed in place, so only the
  *       ingest batch (and batch-sized candidate frames) shuffle.
  */
class PersistedIndexSpec extends SparkSpec {

  private def indexScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table.startsWith("graft_")) => f
    }

  private def pathTo(root: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] =
    if (root eq target) Some(List(root))
    else root.children.view.flatMap(c => pathTo(c, target)).headOption.map(root :: _)

  /** Index scans with an Exchange between them and the join that
    * consumes them — must be empty: such an exchange means the on-disk
    * bucketing was thrown away and the corpus side reshuffled.
    * (Exchanges ABOVE the consuming join — candidate re-keying,
    * post-join aggregates — are the ingest batch's own, and legitimate:
    * they move candidate/batch-sized frames, never the corpus.) */
  private def reshuffledIndexScans(p: SparkPlan): Seq[FileSourceScanExec] =
    indexScans(p).filter { scan =>
      pathTo(p, scan).exists { path =>
        val belowJoin = path.reverse.takeWhile {
          case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
          case _ => true
        }
        belowJoin.exists(_.isInstanceOf[Exchange])
      }
    }

  private def executedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  /** Static-plan inspection mode: AQE off (AdaptiveSparkPlanExec hides
    * its subtree from collect) and broadcast off (a corpus-scale index
    * never broadcasts — the SMJ shape is the one that matters). The
    * probe frame must be CONSTRUCTED inside the block so its plan is
    * compiled under these confs. */
  private def staticNoBroadcast[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val old = keys.map { case (k, _) => k -> spark.conf.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("persisted minhash index: verdict identical to the recompute path") {
    val a = rows(Dedup.incrementalDedup(spark, sf0001))
    val b = rows(Dedup.incrementalDedupPersisted(spark, sf0001))
    assert(a == b, "persisted-index ingest verdict diverged from recompute")
    assert(a.nonEmpty)
  }

  test("persisted span index: verdict identical to the recompute path") {
    val a = rows(Dedup.incrementalSpanRemoval(spark, sf0001))
    val b = rows(Dedup.incrementalSpanRemovalPersisted(spark, sf0001))
    assert(a == b, "persisted span-index ingest verdict diverged from recompute")
    assert(a.nonEmpty)
  }

  test("band+sets probe joins are bucket-local: no exchange above either index scan") {
    staticNoBroadcast {
      val plan = executedPlan(Dedup.incrementalDedupPersisted(spark, sf0001))
      val scans = indexScans(plan)
      assert(scans.size >= 2,
        s"expected band + sets index scans in the probe plan:\n$plan")
      assert(scans.forall(_.bucketedScan),
        s"index scans must read bucketed (one task per on-disk bucket):\n$plan")
      val bad = reshuffledIndexScans(plan)
      assert(bad.isEmpty,
        s"corpus index reshuffled between scan and join:\n$plan")
    }
  }

  test("span probe semi-join is bucket-local: no exchange above the span index scan") {
    staticNoBroadcast {
      val plan = executedPlan(Dedup.incrementalSpanRemovalPersisted(spark, sf0001))
      val scans = indexScans(plan)
      assert(scans.nonEmpty, s"expected the span index scan in the plan:\n$plan")
      assert(scans.forall(_.bucketedScan),
        s"span index scan must read bucketed:\n$plan")
      val bad = reshuffledIndexScans(plan)
      assert(bad.isEmpty,
        s"span index reshuffled between scan and join:\n$plan")
    }
  }

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

  test("between generations: merged index equals a full rebuild, stays bucket-local") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // isolated tag so the drill cannot poison the shared index the
    // other tests (and the Verify queries) probe
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, sf0001,
      tag = "mergedrill", corpusFilter = Dedup.drillCorpusFilter)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
    // TWO ingest merges (disjoint halves of the held-out split) — each
    // appends a file per touched bucket...
    Dedup.mergeBatchIntoBandIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 0),
      tag = "mergedrill", corpusFilter = Dedup.drillCorpusFilter)
    Dedup.mergeBatchIntoBandIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 4),
      tag = "mergedrill", corpusFilter = Dedup.drillCorpusFilter)
    assert(bucketFileCounts(bandsT).values.max >= 2,
      "expected multi-file buckets after two merges (merge appends)")
    // ...and compaction rewrites back to ONE file per bucket; every
    // assertion below (equality, re-probe, plan shape) runs on the
    // compacted artifact, so compaction provably changed no verdict
    Dedup.compactBandIndex(spark, sf0001, tag = "mergedrill",
      corpusFilter = Dedup.drillCorpusFilter)
    assert(bucketFileCounts(bandsT).values.max == 1,
      s"band index not compacted: ${bucketFileCounts(bandsT)}")
    assert(bucketFileCounts(setsT).values.max == 1,
      s"sets index not compacted: ${bucketFileCounts(setsT)}")

    // reference: the index a full rebuild over ALL documents would hold
    val allSh = Dedup.signaturesOnSh(
      Dedup.shingledOn(Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text"))))
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(rows(spark.table(bandsT)) ==
      rows(Dedup.bandsOf(allSh)), "merged band index != full rebuild")
    assert(rows(spark.table(setsT).select(col("doc_id"), col("sz"))) ==
      rows(allSh.select(col("doc_id"), col("sz"))),
      "merged sets index != full rebuild")

    // the folded batch is now KNOWN: re-probing it must flag every doc
    // (each matches at least itself at jaccard 1)
    val verdict = Dedup.probeBandIndex(spark,
      Dedup.signaturesOnSh(Dedup.shingledOn(batch)), bandsT, setsT)
    val unknown = verdict.filter(col("keep")).count()
    assert(unknown == 0, s"$unknown folded docs not recognized after merge")

    // and the merged table still probes bucket-locally
    staticNoBroadcast {
      val plan = executedPlan(Dedup.probeBandIndex(spark,
        Dedup.signaturesOnSh(Dedup.shingledOn(batch)), bandsT, setsT))
      assert(indexScans(plan).forall(_.bucketedScan),
        s"merged index lost its bucketed scan:\n$plan")
      assert(reshuffledIndexScans(plan).isEmpty,
        s"merged index reshuffled between scan and join:\n$plan")
    }
  }

  test("band merge replay is idempotent: re-merging an admitted batch appends nothing") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // foreachBatch is at-least-once: a crashed admitting stream re-runs
    // its last batch and re-merges the same kept docs. A blind append
    // would duplicate sets rows and double-count n_dups in every later
    // probe — the merge's anti-join must make the replay a no-op.
    val (bandsT, setsT) = Dedup.ensureBandIndex(spark, sf0001,
      tag = "replaydrill", corpusFilter = Dedup.drillCorpusFilter)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
    val half = batch.filter(pmod(col("doc_id"), lit(8L)) === 0)
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, half,
      tag = "replaydrill", corpusFilter = Dedup.drillCorpusFilter)
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val bandsOnce = rows(spark.table(bandsT))
    val setsOnce = rows(spark.table(setsT))
    // counts too: set equality alone would mask exact-duplicate rows
    val (nb, ns) = (spark.table(bandsT).count(), spark.table(setsT).count())

    // exact replay: nothing may land
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, half,
      tag = "replaydrill", corpusFilter = Dedup.drillCorpusFilter)
    assert(spark.table(setsT).count() == ns && spark.table(bandsT).count() == nb,
      "replayed merge appended rows")
    assert(rows(spark.table(setsT)) == setsOnce &&
      rows(spark.table(bandsT)) == bandsOnce, "replayed merge changed the index")

    // superset replay (crash mid-stream: re-merge covers old + new docs)
    // admits exactly the never-seen docs
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, batch,
      tag = "replaydrill", corpusFilter = Dedup.drillCorpusFilter)
    val expected = Dedup.signaturesOnSh(Dedup.shingledOn(batch))
      .select(col("doc_id"), col("sz"))
    val afterAll = spark.table(setsT).select(col("doc_id"), col("sz"))
      .join(expected, Seq("doc_id", "sz"), "left_semi")
    assert(rows(afterAll) == rows(expected),
      "superset replay did not admit exactly the novel docs once each")
    assert(spark.table(setsT).count() ==
      spark.table(setsT).select(col("doc_id")).distinct().count(),
      "sets table holds duplicate doc_ids after superset replay")
  }

  test("span index merge keeps the distinct invariant: merged ≡ rebuild, then compact") {
    import org.apache.spark.sql.functions.{col, explode, lit, pmod}
    val t = Dedup.ensureSpanIndex(spark, sf0001,
      tag = "mergedrill", corpusFilter = Dedup.drillCorpusFilter)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
    // two merges; overlapping codes between batches and corpus must
    // NOT duplicate (the anti-join is the invariant keeper)
    Dedup.mergeBatchIntoSpanIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 0),
      tag = "mergedrill", corpusFilter = Dedup.drillCorpusFilter)
    Dedup.mergeBatchIntoSpanIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 4),
      tag = "mergedrill", corpusFilter = Dedup.drillCorpusFilter)
    def allCodes = Tables.documents(spark, sf0001)
      .select(explode(
        graft.functions.TextFunctions.spanCodes(col("text"), Dedup.SpanW)).as("code"))
      .distinct()
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(spark.table(t).count() == spark.table(t).distinct().count(),
      "merge introduced duplicate span codes")
    assert(rowsOf(spark.table(t)) == rowsOf(allCodes),
      "merged span index != full rebuild")
    Dedup.compactSpanIndex(spark, sf0001,
      tag = "mergedrill", corpusFilter = Dedup.drillCorpusFilter)
    assert(bucketFileCounts(t).values.max == 1,
      s"span index not compacted: ${bucketFileCounts(t)}")
    assert(rowsOf(spark.table(t)) == rowsOf(allCodes),
      "compaction changed the span index content")
  }

  test("ingest probes never re-scan the corpus source") {
    // the probe's only parquet inputs are the index tables; the batch
    // side reads the session's materialized shingle frame (in
    // production, the ingest's own source) — documents.parquet itself
    // must not appear in the probe plan.
    val plan = staticNoBroadcast {
      executedPlan(Dedup.incrementalDedupPersisted(spark, sf0001))
    }
    val docScans = plan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }
    assert(docScans.isEmpty,
      s"persisted probe re-scanned the corpus source:\n$plan")
  }

  test("winnow family: merged index equals full rebuild, compacts, rollover matches, folded batch recognized") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val (postsT, setsT) = Dedup.ensureWinnowIndex(spark, sf0001,
      tag = "winmergedrill", corpusFilter = Dedup.drillCorpusFilter)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
    // two ingest merges (disjoint halves: %4==0 splits into %8∈{0,4})
    Dedup.mergeBatchIntoWinnowIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 0),
      tag = "winmergedrill", corpusFilter = Dedup.drillCorpusFilter)
    Dedup.mergeBatchIntoWinnowIndex(spark, sf0001,
      batch.filter(pmod(col("doc_id"), lit(8L)) === 4),
      tag = "winmergedrill", corpusFilter = Dedup.drillCorpusFilter)
    assert(bucketFileCounts(postsT).values.max >= 2,
      "expected multi-file buckets after two merges (merge appends)")
    Dedup.compactWinnowIndex(spark, sf0001, tag = "winmergedrill",
      corpusFilter = Dedup.drillCorpusFilter)
    assert(bucketFileCounts(postsT).values.max == 1,
      s"winnow postings not compacted: ${bucketFileCounts(postsT)}")
    assert(bucketFileCounts(setsT).values.max == 1,
      s"winnow sets not compacted: ${bucketFileCounts(setsT)}")

    // merged ≡ the index a full rebuild over ALL documents would hold
    val allDocs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(rows(spark.table(postsT)) ==
      rows(Dedup.winnowSelectedOn(allDocs)
        .select(col("doc_id"), col("h")).distinct()),
      "merged winnow postings != full rebuild")
    assert(rows(spark.table(setsT).select(col("doc_id"), col("sz"))) ==
      rows(Dedup.shingledOn(allDocs).select(col("doc_id"), col("sz"))),
      "merged winnow sets != full rebuild")

    // the folded batch is now KNOWN: every doc matches at least itself
    val verdict = Dedup.probeWinnowIndex(spark, batch, postsT, setsT)
    val unknown = verdict.filter(col("keep")).count()
    assert(unknown == 0, s"$unknown folded docs not recognized after merge")

    // rollover rebuild ≡ merge (fingerprints carry no trained state)
    val (rpT, rsT) = Dedup.rolloverWinnowIndex(spark, sf0001, batch,
      "winrollg1", Dedup.drillCorpusFilter)
    assert(rows(spark.table(rpT)) == rows(spark.table(postsT)),
      "rolled-over winnow postings != merged")
    assert(rows(spark.table(rsT).select(col("doc_id"), col("sz"))) ==
      rows(spark.table(setsT).select(col("doc_id"), col("sz"))),
      "rolled-over winnow sets != merged")
  }

  test("winnow merge replay is idempotent: re-merging an admitted batch appends nothing") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val (postsT, setsT) = Dedup.ensureWinnowIndex(spark, sf0001,
      tag = "winreplaydrill", corpusFilter = Dedup.drillCorpusFilter)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
    val half = batch.filter(pmod(col("doc_id"), lit(8L)) === 0)
    Dedup.mergeBatchIntoWinnowIndex(spark, sf0001, half,
      tag = "winreplaydrill", corpusFilter = Dedup.drillCorpusFilter)
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val postsOnce = rows(spark.table(postsT))
    val setsOnce = rows(spark.table(setsT))
    val (np, ns) = (spark.table(postsT).count(), spark.table(setsT).count())

    // exact replay: nothing may land
    Dedup.mergeBatchIntoWinnowIndex(spark, sf0001, half,
      tag = "winreplaydrill", corpusFilter = Dedup.drillCorpusFilter)
    assert(spark.table(setsT).count() == ns && spark.table(postsT).count() == np,
      "replayed winnow merge appended rows")
    assert(rows(spark.table(setsT)) == setsOnce &&
      rows(spark.table(postsT)) == postsOnce,
      "replayed winnow merge changed the index")

    // superset replay admits exactly the never-seen docs
    Dedup.mergeBatchIntoWinnowIndex(spark, sf0001, batch,
      tag = "winreplaydrill", corpusFilter = Dedup.drillCorpusFilter)
    val expectSets = Dedup.shingledOn(batch).count() +
      (ns - Dedup.shingledOn(half).count())
    assert(spark.table(setsT).count() == expectSets,
      "superset replay did not admit exactly the novel docs")
  }

  test("cdc chunk family: persisted twin identical, merge equals rebuild and replays idempotently") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    // persisted probe == recompute twin
    assert(rows(Dedup.incrementalCdcDedupPersisted(spark, sf0001)) ==
      rows(Dedup.incrementalCdcDedup(spark, sf0001)),
      "persisted CDC verdict diverged from the recompute path")

    // merged index == full rebuild; replay appends nothing
    val hashT = Dedup.ensureCdcIndex(spark, sf0001,
      tag = "cdcmergedrill", corpusFilter = Dedup.drillCorpusFilter)
    val batch = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
    Dedup.mergeBatchIntoCdcIndex(spark, sf0001, batch,
      tag = "cdcmergedrill", corpusFilter = Dedup.drillCorpusFilter)
    val once = spark.table(hashT).count()
    val allH = Dedup.cdcChunksOn(
      Tables.documents(spark, sf0001).select(col("doc_id"), col("text")))
      .select(col("chash")).distinct()
    assert(rows(spark.table(hashT)) == rows(allH),
      "merged CDC index != full-corpus distinct chash set")
    Dedup.mergeBatchIntoCdcIndex(spark, sf0001, batch,
      tag = "cdcmergedrill", corpusFilter = Dedup.drillCorpusFilter)
    assert(spark.table(hashT).count() == once,
      "replaying an admitted batch must append nothing (chash-grain anti-join)")
  }
}
