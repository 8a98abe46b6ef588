package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** SemDeDup invariants beyond the oracle parity the driver checks:
  * verdict totality, internal consistency of the dup statistics, the
  * canonical-first keeper rule replayed against an independently
  * collected pair recomputation, and the cell-locality contract (a
  * duplicate relation never crosses a k-means cell by construction —
  * that bound is the operator's O(N²/C) scale story). */
class SemDeDupSpec extends SparkSpec {

  test("verdict is total, internally consistent, and keeps canonical-first") {
    import graft.functions.VectorFunctions.{cosineSim, dotProduct}
    val v = Similarity.semDeDup(spark, sf001).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4)))).toMap
    val nNonzero = Tables.embeddings(spark, sf001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0).count()
    assert(v.size.toLong == nNonzero, "one verdict row per nonzero vector")

    v.foreach { case (id, (_, nDups, best, keep)) =>
      if (nDups == 0L) {
        assert(keep, s"vec $id: zero dups must keep")
        assert(best.isEmpty, s"vec $id: best_sim without dups")
      } else assert(best.exists(_ >= Similarity.SemTauMilli),
        s"vec $id: dup degree ${nDups} but best=$best below tau")
    }

    // independent replay of the pair set THROUGH THE ENGINE's own
    // milli-rounding (collected, then compared pair by pair): the
    // verdict's keep bit must equal "no dup partner with a smaller id"
    val cells = v.map { case (id, (cell, _, _, _)) => id -> cell }
    val emb = Tables.embeddings(spark, sf001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
    val pairSims = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(cosineSim(col("a.embedding"), col("b.embedding"))
          .cast("double") * 1000, 0).cast("long").as("sim"))
      .filter(col("sim") >= Similarity.SemTauMilli)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // restrict the global pair set to same-cell pairs — SemDeDup's dup
    // relation by definition
    val dupPairs = pairSims.filter { case (i, j) => cells(i) == cells(j) }
    val hasSmallerDup = dupPairs.map(_._2).toSet
    v.foreach { case (id, (_, _, _, keep)) =>
      assert(keep == !hasSmallerDup(id),
        s"vec $id: keep=$keep but smaller-id dup present=${hasSmallerDup(id)}")
    }
    assert(hasSmallerDup.nonEmpty, "fixture must exercise the drop path")
    // and cross-cell near-pairs must exist at this tau — otherwise the
    // cell-locality restriction is vacuous and the test proves nothing
    assert(dupPairs.length < pairSims.length,
      "expected some near-pairs to straddle cells (locality must bite)")
  }

  test("cell rollup sums to the verdict frame") {
    val verdict = Similarity.semDeDup(spark, sf001)
    val fromVerdict = verdict
      .agg(count(lit(1)), sum(when(col("keep"), 0L).otherwise(1L)))
      .collect().head
    val rollup = Similarity.semDeDupCells(spark, sf001)
      .agg(sum(col("n_vecs")), sum(col("n_dropped"))).collect().head
    assert(fromVerdict.getLong(0) == rollup.getLong(0))
    assert(fromVerdict.getLong(1) == rollup.getLong(1))
  }

  test("prototype pruning drops exactly the easiest quarter of each cell, no retrain") {
    import graft.functions.VectorFunctions.dotProduct
    // the quantizer is already trained (memoized/persisted) after the
    // tests above — prototype pruning must READ it, never retrain
    Similarity.semDeDup(spark, sf001).count()
    val lloydBefore = Similarity.lloydRuns.get()
    val rows = Similarity.prototypePrune(spark, sf001).collect()
    assert(Similarity.lloydRuns.get() == lloydBefore,
      "prototype pruning retrained the coarse quantizer")

    val nNonzero = Tables.embeddings(spark, sf001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0).count()
    assert(rows.length.toLong == nNonzero, "one verdict row per nonzero vector")

    // per cell: ranks are 1..n_cell, the dropped set is exactly the
    // (n·Num) div Den MOST prototypical (highest cosine, ties to the
    // smaller id — the rank order itself), everything else keeps
    rows.groupBy(_.getAs[Int]("cell")).foreach { case (cell, rs) =>
      val n = rs.length.toLong
      assert(rs.forall(_.getAs[Long]("n_cell") == n), s"cell $cell: n_cell wrong")
      val byRank = rs.sortBy(_.getAs[Long]("rank_in_cell"))
      assert(byRank.map(_.getAs[Long]("rank_in_cell")).toSeq == (1L to n),
        s"cell $cell: ranks not 1..$n")
      val sorted = rs.sortBy(r =>
        (-r.getAs[Long]("proto_milli"), r.getAs[Long]("vec_id")))
      assert(sorted.map(_.getAs[Long]("vec_id")).toSeq ==
        byRank.map(_.getAs[Long]("vec_id")).toSeq,
        s"cell $cell: rank disagrees with (proto desc, id) order")
      val cut = n * Similarity.ProtoPruneNum / Similarity.ProtoPruneDen
      assert(byRank.count(!_.getAs[Boolean]("keep")).toLong == cut,
        s"cell $cell: drop count != (n*Num) div Den")
      assert(byRank.takeWhile(!_.getAs[Boolean]("keep")).length.toLong == cut,
        s"cell $cell: dropped rows are not the rank prefix")
    }
  }

  test("semantic decontam: total, flag=threshold, and a ZERO-shuffle scan plan") {
    import graft.functions.VectorFunctions.dotProduct
    val rows = Similarity.semanticDecontam(spark, sf001).collect()
    val nNonEval = Tables.embeddings(spark, sf001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
      .filter(col("vec_id") >= Similarity.NumQueries).count()
    assert(rows.length.toLong == nNonEval,
      "one verdict row per nonzero non-eval vector")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("contaminated") ==
        (r.getAs[Long]("max_eval_sim_milli") >= Similarity.SemTauMilli))
    }
    assert(rows.exists(_.getAs[Boolean]("contaminated")) &&
      rows.exists(!_.getAs[Boolean]("contaminated")),
      "threshold must genuinely split the drill corpus")
    // the scale claim IS the plan: eval vectors are literals in the
    // scan projection — no Exchange anywhere
    val k = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val plan = Similarity.semanticDecontam(spark, sf001)
        .queryExecution.executedPlan
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, s"semantic decontam must be a zero-shuffle scan:\n$plan")
    } finally spark.conf.set(k, old)
  }

  test("k-center seeds: greedy argmax replayed, radius non-increasing") {
    import graft.functions.VectorFunctions.dotProduct
    val picks = Similarity.kcenterSeeds(spark, sf001).collect()
      .sortBy(_.getAs[Long]("pick"))
    assert(picks.length == Similarity.KCenterK.toInt)
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length == picks.length,
      "picks must be distinct")
    // coverage radius shrinks (weakly) as picks accumulate — the
    // greedy property a budget decision reads off the trace
    val radii = picks.drop(1).map(_.getAs[Long]("min_dist_micro"))
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"radius trace must be non-increasing: $a -> $b")
    }
    // brute-force replay of every greedy step off the collected corpus
    val all = Tables.embeddings(spark, sf001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
      .filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def d2(a: Array[Double], b: Array[Double]): Long = {
      var sa = 0.0; var sb = 0.0; var ab = 0.0; var i = 0
      while (i < a.length) { sa += a(i) * a(i); sb += b(i) * b(i); ab += a(i) * b(i); i += 1 }
      math.round((sa + sb - 2.0 * ab) * 1e6)
    }
    assert(picks.head.getAs[Long]("vec_id") == all.map(_._1).min,
      "first pick must be the lowest-id non-eval vector")
    var chosen = Vector(all.toMap.apply(picks.head.getAs[Long]("vec_id")))
    picks.drop(1).foreach { p =>
      val best = all
        .map { case (id, v) => (id, chosen.map(c => d2(v, c)).min) }
        .maxBy { case (id, dm) => (dm, -id) }
      assert(p.getAs[Long]("vec_id") == best._1 &&
        p.getAs[Long]("min_dist_micro") == best._2,
        s"pick ${p.getAs[Long]("pick")} diverged from the greedy argmax")
      chosen = chosen :+ all.toMap.apply(best._1)
    }

    // facility assignment: total, self-covering, and bounded by the
    // greedy trace (the residual radius after K picks is what pick
    // K+1 would have scored — it cannot exceed pick K's)
    val asg = Similarity.kcenterAssign(spark, sf001).collect()
    assert(asg.length == picks.length)
    assert(asg.map(_.getAs[Long]("n_assigned")).sum == all.length.toLong,
      "every vector must be assigned to exactly one facility")
    assert(asg.forall(_.getAs[Long]("n_assigned") >= 1L),
      "each facility covers at least its own seed")
    val pickIds = picks.map(_.getAs[Long]("vec_id")).toSet
    assert(asg.map(_.getAs[Long]("seed_vec_id")).toSet == pickIds)
    assert(asg.map(_.getAs[Long]("max_dist_micro")).max <=
      picks.last.getAs[Long]("min_dist_micro"),
      "residual coverage radius must not exceed the last greedy pick's")
  }

  test("D4 composes the stages: dedup verdict first, survivors re-ranked") {
    val sem = Similarity.semDeDup(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val rows = Similarity.d4Prune(spark, sf001).collect()
    assert(rows.length == sem.size, "one D4 row per SemDeDup verdict")
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Boolean]("keep_dedup") == sem(id),
        s"vec $id: keep_dedup diverged from SemDeDup")
      if (!sem(id)) {
        assert(r.isNullAt(r.fieldIndex("rank_in_cell")) &&
          !r.getAs[Boolean]("keep"),
          s"vec $id: dedup-dropped vector ranked or kept")
      }
    }
    // survivor ranking: within each cell the SURVIVORS carry ranks
    // 1..n_survivors in (proto desc, id) order, and the final keep is
    // the integer-fraction cut over that survivor count
    rows.filter(_.getAs[Boolean]("keep_dedup"))
      .groupBy(_.getAs[Int]("cell")).foreach { case (cell, rs) =>
        val n = rs.length.toLong
        assert(rs.forall(_.getAs[Long]("n_cell") == n),
          s"cell $cell: n_cell is not the survivor count")
        val byRank = rs.sortBy(_.getAs[Long]("rank_in_cell"))
        assert(byRank.map(_.getAs[Long]("rank_in_cell")).toSeq == (1L to n),
          s"cell $cell: survivor ranks not 1..$n")
        val cut = n * Similarity.ProtoPruneNum / Similarity.ProtoPruneDen
        byRank.foreach { r =>
          assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("rank_in_cell") > cut),
            s"cell $cell: keep != rank > cut")
        }
      }
    // composing after dedup must prune FEWER-OR-EQUAL vectors per cell
    // than pruning the raw frame (the survivors' quarter ≤ the full
    // cell's quarter) — the reason D4 orders the stages this way
    val rawDropped = Similarity.prototypePrune(spark, sf001).collect()
      .count(!_.getAs[Boolean]("keep"))
    val d4ProtoDropped = rows.count(r =>
      r.getAs[Boolean]("keep_dedup") && !r.getAs[Boolean]("keep"))
    assert(d4ProtoDropped <= rawDropped)
  }
}
