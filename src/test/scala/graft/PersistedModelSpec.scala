package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import graft.operators.{Curation, TextAnalysis}

/** The persisted MODEL family (fourth index family, after dedup
  * band/span, ANN books/codes, text postings): the char-bigram LM, the
  * hashed quality classifier (weights + threshold + calibration
  * range), and the BPE tokenizer (merges + vocabulary) persist as
  * write-once generation tables under the IndexStore discipline —
  * DirMemo memos die with the JVM; a deployed gate LOADS its models.
  * These drills pin:
  *   (a) every persisted probe is row-identical to its recompute twin
  *       (they also share DuckDB oracles verbatim in SparkEntry),
  *   (b) probing retrains nothing — the BPE train probe touches ZERO
  *       corpus files, the LM probe scans the corpus exactly once (the
  *       scoring pass, which is the query's job) and reads the model
  *       from its table. */
class PersistedModelSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def docScans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }

  private def modelScans(plan: SparkPlan, prefix: String): Seq[FileSourceScanExec] =
    plan.collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table.startsWith(prefix)) => f
    }

  /** AQE off so collect sees the whole plan. */
  private def staticPlan[A](body: => A): A = {
    val k = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, old)
  }

  test("char-bigram LM: persisted probe identical to recompute; one corpus scan") {
    val fresh = rows(TextAnalysis.charLmScore(spark, sf0001))
    assert(fresh.nonEmpty &&
      rows(TextAnalysis.charLmScorePersisted(spark, sf0001)) == fresh,
      "persisted char-LM diverged from recompute")
    staticPlan {
      // fresh frame: an AQE-final plan hides its subtrees from collect;
      // the FRESH seam, because the registered probe serves a memoized
      // lineage-truncated frame whose plan shows no scans at all
      val plan = TextAnalysis.charLmScorePersistedFresh(spark, sf0001)
        .queryExecution.executedPlan
      assert(docScans(plan).size == 1,
        s"LM probe must scan the corpus exactly once (scoring):\n$plan")
      assert(modelScans(plan, "graft_charlm").nonEmpty,
        s"LM probe must read the persisted model table:\n$plan")
      // the registered query serves a memoized lineage-truncated frame
      // (an RDD-scan row in the corpus-wide PLANS audit, like its
      // memoized recompute twin), so THIS pin is the probe's only
      // plan-shape guard — cover the accident class here too
      assert(!plan.toString.contains("CartesianProduct"),
        s"LM probe plans a cartesian:\n$plan")
    }
  }

  test("CCNet perplexity filter served from the persisted LM") {
    val fresh = rows(Curation.pplFilter(spark, sf0001))
    assert(fresh.nonEmpty &&
      rows(Curation.pplFilterPersisted(spark, sf0001)) == fresh,
      "persisted ppl filter diverged from recompute")
  }

  test("quality classifier: persisted weights+threshold reproduce both reports") {
    val q = rows(Curation.classifierQuality(spark, sf0001))
    assert(q.nonEmpty &&
      rows(Curation.classifierQualityPersisted(spark, sf0001)) == q,
      "persisted classifier quality diverged from recompute")
    val c = rows(Curation.classifierCalibration(spark, sf0001))
    assert(c.nonEmpty &&
      rows(Curation.classifierCalibrationPersisted(spark, sf0001)) == c,
      "persisted classifier calibration diverged from recompute")
    staticPlan {
      val plan = Curation.classifierQualityPersisted(spark, sf0001)
        .queryExecution.executedPlan
      assert(modelScans(plan, "graft_clsw").nonEmpty,
        s"classifier probe must read the persisted weight table:\n$plan")
    }
  }

  test("BPE tokenizer: persisted merges+vocab reproduce train and apply") {
    val train = rows(TextAnalysis.bpeTrain(spark, sf0001))
    val trainP = TextAnalysis.bpeTrainPersisted(spark, sf0001)
    assert(train.nonEmpty && rows(trainP) == train,
      "persisted BPE merges diverged from training")
    val apply = rows(TextAnalysis.bpeApplyCounts(spark, sf0001))
    assert(apply.nonEmpty &&
      rows(TextAnalysis.bpeApplyCountsPersisted(spark, sf0001)) == apply,
      "persisted BPE apply diverged from recompute")
    staticPlan {
      // the train probe is a pure table read — no corpus file anywhere
      // in its plan, no training rounds
      val plan = TextAnalysis.bpeTrainPersisted(spark, sf0001)
        .queryExecution.executedPlan
      assert(docScans(plan).isEmpty,
        s"BPE train probe re-scanned the corpus:\n$plan")
      assert(modelScans(plan, "graft_bpem").nonEmpty,
        s"BPE train probe must read the merges table:\n$plan")
    }
    val fert = rows(TextAnalysis.bpeFertility(spark, sf0001))
    assert(fert.nonEmpty &&
      rows(TextAnalysis.bpeFertilityPersisted(spark, sf0001)) == fert,
      "persisted BPE fertility diverged from recompute")
  }

  test("DSIR model: persisted counts reproduce the weights; one corpus scan") {
    val fresh = rows(Curation.dsirWeights(spark, sf0001))
    assert(fresh.nonEmpty &&
      rows(Curation.dsirWeightsPersisted(spark, sf0001)) == fresh,
      "persisted DSIR diverged from recompute")
    staticPlan {
      val plan = Curation.dsirWeightsPersisted(spark, sf0001)
        .queryExecution.executedPlan
      assert(docScans(plan).size == 1,
        s"DSIR probe must scan the corpus exactly once (scoring):\n$plan")
      assert(modelScans(plan, "graft_dsirm").nonEmpty,
        s"DSIR probe must read the persisted count table:\n$plan")
    }
  }

  test("DSIR resample from the persisted model: identical sample, no training aggregate") {
    val fresh = rows(Curation.dsirResample(spark, sf0001))
    assert(fresh.nonEmpty &&
      rows(Curation.dsirResamplePersisted(spark, sf0001)) == fresh,
      "persisted resample diverged from recompute")
    staticPlan {
      val plan = Curation.dsirResamplePersisted(spark, sf0001)
        .queryExecution.executedPlan
      assert(docScans(plan).size == 1,
        s"persisted resample must scan the corpus exactly once:\n$plan")
      assert(modelScans(plan, "graft_dsirm").nonEmpty,
        s"persisted resample must read the count table:\n$plan")
      assert(plan.toString.contains("TakeOrderedAndProject"),
        s"resample must stay a bounded TakeOrdered:\n$plan")
    }
  }

  test("frozen-between-generations: admission merges leave models at generation G") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.operators.{Dedup, Rollover}
    // the staleness contract (ensureCharLmModel scaladoc): an admitting
    // gate folds accepted docs into the BAND index only — the persisted
    // models score every later arrival with generation-G weights until
    // the next rollover retrains them
    val before = rows(TextAnalysis.charLmScorePersisted(spark, sf0001))
    val dsirBefore = rows(Curation.dsirWeightsPersisted(spark, sf0001))
    val lmT = TextAnalysis.ensureCharLmModel(spark, sf0001)
    val dsirT = Curation.ensureDsirModel(spark, sf0001)
    def fp(t: String) = tableFileFingerprint(t)
    val pre = fp(lmT)
    val dsirPre = fp(dsirT)
    // an admitting batch lands (the exact merge the gates run)
    val novel = Seq((5000001L, (1 to 40).map(i => s"stale$i").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, novel, "modelstale1", lit(true))
    assert(fp(lmT) == pre,
      "an admission merge rewrote the frozen model table")
    assert(rows(TextAnalysis.charLmScorePersisted(spark, sf0001)) == before,
      "post-admission probe no longer scores with generation-G weights")
    assert(fp(dsirT) == dsirPre,
      "an admission merge rewrote the frozen DSIR count table")
    assert(rows(Curation.dsirWeightsPersisted(spark, sf0001)) == dsirBefore,
      "post-admission DSIR probe no longer scores with generation-G counts")
    Rollover.dropGeneration(spark, sf0001, "modelstale1")
  }
}
