package graft

import org.apache.spark.sql.functions._
import graft.operators.AdmissionLog

class AdmissionLogSpec extends SparkSpec {
  test("admission log: create, novelty append, read") {
    import spark.implicits._
    val sfx = "dbgsfx1"
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"))
    assert(AdmissionLog.read(spark, AdmissionLog.DocKind, sfx).count() == 2)
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx,
      Seq((2L, "b"), (3L, "c")).toDF("doc_id", "text"))
    val rows = AdmissionLog.read(spark, AdmissionLog.DocKind, sfx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")), s"got $rows")
    // replay append: nothing changes
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx,
      Seq((3L, "c")).toDF("doc_id", "text"))
    assert(AdmissionLog.read(spark, AdmissionLog.DocKind, sfx).count() == 3)
    AdmissionLog.compact(spark, AdmissionLog.DocKind, sfx)
    assert(AdmissionLog.read(spark, AdmissionLog.DocKind, sfx).count() == 3)
    graft.operators.IndexStore.drop(spark,
      AdmissionLog.tableName(AdmissionLog.DocKind, sfx))
  }

  test("synchronous cutover replay: catch-up folds post-snapshot admission") {
    import spark.implicits._
    import graft.operators.{Dedup, IndexStore, Rollover}
    def novel(seed: Char): String = (1 to 40).map(i => s"dg$seed$i").mkString(" ")
    val g0 = ("dbgg0", lit(true))
    val sfx0 = IndexStore.suffix(sf0001, g0._1, g0._2)
    Dedup.ensureBandIndex(spark, sf0001, g0._1, g0._2)
    // batch 1: admit d1, d2
    val b1 = Seq((3000001L, novel('a')), (3000002L, novel('b'))).toDF("doc_id", "text")
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx0, b1)
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, b1, g0._1, g0._2)
    // cutover snapshot
    val snap = AdmissionLog.read(spark, AdmissionLog.DocKind, sfx0).localCheckpoint()
    // batch 2 lands post-snapshot: admit d3
    val b2 = Seq((3000003L, novel('c'))).toDF("doc_id", "text")
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx0, b2)
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, b2, g0._1, g0._2)
    // build G+1 from snapshot
    val (b1T, s1T) = Dedup.rolloverBandIndex(spark, sf0001, snap, "dbgg1", g0._2)
    val sfx1 = IndexStore.suffix(sf0001, "dbgg1", g0._2)
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx1, snap)
    // catch-up at promotion
    val full = AdmissionLog.read(spark, AdmissionLog.DocKind, sfx0)
    assert(full.count() == 3, s"old log should hold 3 docs, got ${full.count()}")
    Dedup.mergeBatchIntoBandIndex(spark, sf0001, full, "dbgg1", g0._2)
    AdmissionLog.append(spark, AdmissionLog.DocKind, sfx1, full)
    // d3 must be in G+1's sets now
    val setsIds = spark.table(s1T).select("doc_id").as[Long].collect().toSet
    assert(setsIds.contains(3000003L), "catch-up did not fold d3 into G+1 sets")
    // and a dup of d3 must flag against G+1
    val probe = Dedup.signaturesOnSh(Dedup.shingledOn(
      Seq((3000006L, novel('c'))).toDF("doc_id", "text")))
    val v = Dedup.probeBandIndex(spark, probe, b1T, s1T)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v.get(3000006L).contains(false), s"dup of caught-up d3 not flagged: $v")
    val _ = Rollover
  }
}
