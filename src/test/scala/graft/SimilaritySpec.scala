package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine_sim: orthogonal, identical, scaled vectors") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        VectorFunctions.cosineSim(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 0.0)
    assert(math.abs(pairs((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(pairs((0L, 3L)) - 1.0) < 1e-12) // scale-invariant
    assert(math.abs(pairs((0L, 2L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("cosine_sim codegen agrees with interpreted eval") {
    // wholestage off forces the interpreted path; results must be identical bits
    val q = vecs.as("a").crossJoin(vecs.as("b"))
      .select(VectorFunctions.cosineSim(col("a.embedding"), col("b.embedding")).as("c"))
    val on = q.collect().map(_.getDouble(0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try q.collect().map(_.getDouble(0)).toSeq
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(on.map(java.lang.Double.doubleToLongBits) ==
      off.map(java.lang.Double.doubleToLongBits))
  }

  test("cosine_sim is registered for the SQL surface") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_tmp")
    val r = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM vecs_tmp a JOIN vecs_tmp b ON b.vec_id = 0 WHERE a.vec_id = 3""".stripMargin)
      .collect()
    assert(math.abs(r.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("Graft.registerFunctions exposes poly_hash and simhash31 in SQL") {
    Graft.registerFunctions(spark)
    val r = spark.sql(
      "SELECT poly_hash('hello') AS h, simhash31(array(1L, 1L, 2L)) AS s").head()
    val ref = "hello".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483647L)
    assert(r.getLong(0) == ref)
    // bits present in ≥2 of {1,1,2}: bit0 (two 1s vote +1 net)
    assert(r.getLong(1) == 1L)
  }

  test("cosine_sim null propagates") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
    assert(df.collect().head.isNullAt(0))
  }

  test("partial/merge top-k equals the global row_number window formulation") {
    // the Aggregator path must be bit-identical to the window it replaced
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val windowed = broadcast(queries)
      .join(emb, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("qv"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= Similarity.TopK)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toMap
    val agg = Similarity.topKBruteForce(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toMap
    assert(agg.nonEmpty)
    assert(agg == windowed)
  }

  test("k-means centroids are deterministic and means live in the data's hull") {
    val emb = Tables.embeddings(spark, sf0001)
    val c1 = Similarity.kmeansCentroids(emb)
    val c2 = Similarity.kmeansCentroids(emb)
    assert(c1.length > 1 && c1.length <= Similarity.KMeansCells)
    // run-to-run bit determinism — the property the oracle parity rests on
    assert(c1.map(_._1).toSeq == c2.map(_._1).toSeq)
    assert(c1.zip(c2).forall { case ((_, a), (_, b)) =>
      a.map(java.lang.Double.doubleToLongBits).toSeq ==
        b.map(java.lang.Double.doubleToLongBits).toSeq })
    // each centroid component is a mean of member components: bounded by
    // the corpus-wide min/max of that component
    val mm = emb.select(
        org.apache.spark.sql.functions.min(array_min(col("embedding"))),
        org.apache.spark.sql.functions.max(array_max(col("embedding")))).head()
    val (lo, hi) = (mm.getFloat(0).toDouble, mm.getFloat(1).toDouble)
    // fixed-point rounding can nudge a mean by at most 1/KMeansScale
    val eps = 1.0 / Similarity.KMeansScale
    c1.foreach { case (_, cv) =>
      cv.foreach(x => assert(x >= lo - eps && x <= hi + eps)) }
  }

  test("k-center seeded quantizer: opt-in init is deterministic, balance comparable, default untouched") {
    import graft.functions.VectorFunctions.dotProduct
    val emb = Tables.embeddings(spark, sf0001)
      .filter(dotProduct(col("embedding"), col("embedding")) > 0)
      .localCheckpoint()
    val defCents = Similarity.kmeansCentroids(emb)
    val kcCents = Similarity.kmeansCentroidsKcInit(spark, sf0001, emb)
    assert(kcCents.length == defCents.length,
      "opt-in init must train the same number of cells")
    // determinism of the opt-in chain (greedy picks are a pure
    // function of the data, so the seeded Lloyd's is too)
    val kc2 = Similarity.kmeansCentroidsKcInit(spark, sf0001, emb)
    assert(kcCents.zip(kc2).forall { case ((i, a), (j, b)) => i == j &&
      a.map(java.lang.Double.doubleToLongBits).toSeq ==
        b.map(java.lang.Double.doubleToLongBits).toSeq },
      "k-center-seeded Lloyd's must be run-to-run deterministic")
    // cell-occupancy balance under each quantizer — the spread seeds
    // exist to avoid several hashed picks landing in one dense region
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def occupancy(cents: Array[(Int, Array[Double])]): Map[Int, Int] =
      vecs.map { v =>
        cents.map { case (cid, cv) =>
          (cv.map(x => x * x).sum -
            2.0 * cv.zip(v).map { case (a, b) => a * b }.sum, cid)
        }.minBy(t => (t._1, t._2))._2
      }.groupBy(identity).map { case (c, xs) => (c, xs.length) }
    val defOcc = occupancy(defCents)
    val kcOcc = occupancy(kcCents)
    assert(defOcc.values.sum == vecs.length && kcOcc.values.sum == vecs.length)
    assert(kcOcc.values.max <= defOcc.values.max * 2,
      s"k-center-seeded balance regressed: kc=$kcOcc vs default=$defOcc")
    info(s"max-cell occupancy: default=${defOcc.values.max} " +
      s"kcInit=${kcOcc.values.max} (cells: default=${defOcc.size} kc=${kcOcc.size})")
  }

  test("k-means IVF top-k carries brute-force-identical cosines and full rank lists") {
    val km = Similarity.topKIvfKmeans(spark, sf0001)
      .select("query_id", "rnk", "vec_id", "cosine")
      .as[(Long, Int, Long, Double)].collect()
    assert(km.nonEmpty)
    val bf = Similarity.topKBruteForce(spark, sf0001)
      .select("query_id", "vec_id", "cosine").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    km.foreach { case (q, _, v, c) =>
      bf.get((q, v)).foreach(bfc =>
        assert(java.lang.Double.doubleToLongBits(bfc) == java.lang.Double.doubleToLongBits(c)))
    }
    // ranks are 1..n consecutive per query (cell smaller than k is legal)
    km.groupBy(_._1).values.foreach { rows =>
      val rnks = rows.map(_._2).sorted.toSeq
      assert(rnks == (1 to rnks.max))
      assert(rnks.max <= Similarity.IvfTopK)
    }
  }

  test("multi-probe IVF recall dominates single-probe per query") {
    // candidates(single) ⊆ candidates(multi) — the argmin cell is probe
    // rank 1 — and any true-top-k member in a candidate set ranks ≤ k
    // there (at most k−1 vectors beat it ANYWHERE), so per-query hits
    // vs the exact truth can only grow with probes
    val truth = Similarity.topKBruteForce(spark, sf0001)
      .filter(col("rnk") <= Similarity.IvfTopK)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] = df
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .filter(truth).groupBy(_._1).view.mapValues(_.length).toMap
      .withDefaultValue(0)
    val single = hits(Similarity.topKIvfKmeans(spark, sf0001))
    val multi = hits(Similarity.topKIvfMultiprobe(spark, sf0001))
    val queries = Similarity.topKIvfMultiprobe(spark, sf0001)
      .select("query_id").as[Long].collect().distinct
    assert(queries.nonEmpty)
    queries.foreach(q => assert(multi(q) >= single(q),
      s"query $q: multi-probe hits ${multi(q)} < single-probe ${single(q)}"))
    // and the cosines it reports are the exact ones (no quantized scores)
    val bf = Similarity.topKBruteForce(spark, sf0001)
      .select("query_id", "vec_id", "cosine").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    Similarity.topKIvfMultiprobe(spark, sf0001)
      .select("query_id", "vec_id", "cosine").as[(Long, Long, Double)]
      .collect().foreach { case (q, v, c) =>
        bf.get((q, v)).foreach(b =>
          assert(java.lang.Double.doubleToLongBits(b) ==
            java.lang.Double.doubleToLongBits(c)))
      }
  }

  test("IVF-PQ is well-formed and agrees with plain PQ on shared pairs") {
    import graft.operators.Similarity
    val ivfpq = Similarity.topKIvfPq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
    assert(ivfpq.nonEmpty)
    // full 1..k rank list per query, never the query itself
    ivfpq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length))
      assert(rows.forall(_._3 != q))
      // ADC ascending along the rank order
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    // same codebooks ⇒ identical ADC for any (query, vec) pair both
    // indexes ranked (IVF only prunes candidates, never rescores)
    val pq = Similarity.topKPq(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    ivfpq.foreach { case (q, _, v, adc) =>
      pq.get((q, v)).foreach(other => assert(other == adc, s"($q,$v)"))
    }
    // deterministic across runs
    val again = Similarity.topKIvfPq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
    assert(ivfpq.toSeq == again.toSeq)
  }

  test("range search returns exactly the brute-force cosines at or above tau") {
    import graft.operators.Similarity
    val got = Similarity.rangeSearch(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, v, c) =>
      assert(c >= Similarity.RangeTau)
      assert(q != v) // never the query itself
    }
    // cross-check against the brute-force scorer: every top-scored pair
    // above tau must appear in the range result with the same bits
    val bf = Similarity.topKBruteForce(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine")))
      .filter(_._3 >= Similarity.RangeTau)
    val gotSet = got.map(t => (t._1, t._2) -> t._3).toMap
    bf.foreach { case (q, v, c) =>
      assert(gotSet.get((q, v)).contains(c), s"missing ($q,$v)")
    }
  }

  test("IVF results are a subset of brute-force candidates per query") {
    val bf = Similarity.topKBruteForce(spark, sf0001)
      .select("query_id", "vec_id", "cosine").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val ivf = Similarity.topKIvf(spark, sf0001)
      .select("query_id", "vec_id", "cosine").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    // any IVF hit that brute force also ranked must carry the same cosine
    ivf.foreach { case (q, v, c) =>
      bf.get((q, v)).foreach(bfc =>
        assert(java.lang.Double.doubleToLongBits(bfc) == java.lang.Double.doubleToLongBits(c)))
    }
  }

  test("PQ-ADC top-k is well-formed and recalls true neighbors") {
    val pq = Similarity.topKPq(spark, sf0001)
      .select("query_id", "rnk", "vec_id", "adc")
      .as[(Long, Int, Long, Double)].collect()
    assert(pq.nonEmpty)
    pq.groupBy(_._1).values.foreach { rows =>
      // full rank lists, ADC non-decreasing with rank (distance, not score)
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      val adcs = sorted.map(_._4).toSeq
      assert(adcs == adcs.sorted)
      // a query's own vector is never its own neighbor
      assert(!rows.exists(r => r._3 == r._1))
    }
    // quantized recall: each query's PQ top-10 must overlap the exact
    // brute-force top-10 (weak bound on purpose — 4×16 PQ at 10
    // centroids is coarse; zero overlap would mean broken codebooks)
    val bf = Similarity.topKBruteForce(spark, sf0001)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    pq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).count(bf(q)) >= 1, s"query $q: zero PQ recall")
    }
  }

  test("hard negatives carry a different label and rank by true cosine") {
    val labels = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val hn = Similarity.hardNegatives(spark, sf0001)
      .select("query_id", "rnk", "vec_id", "cosine")
      .as[(Long, Int, Long, Double)].collect()
    assert(hn.nonEmpty)
    hn.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), "full rank list")
      val cos = sorted.map(_._4).toSeq
      assert(cos == cos.sorted.reverse, "cosine descends with rank")
      rows.foreach { r =>
        assert(labels(r._3) != labels(q),
          s"query $q: vec ${r._3} shares the query's label — not a negative")
      }
    }
  }

  test("exact re-rank restores true cosine order over the ADC shortlist") {
    val rr = Similarity.topKIvfPqRerank(spark, sf0001)
      .select("query_id", "rnk", "vec_id", "cosine")
      .as[(Long, Int, Long, Double)].collect()
    assert(rr.nonEmpty)
    // the same cell-pruned candidates scored exactly (the IVF k-means
    // top-k carries brute-force-identical cosines for its cell)
    val ivf = Similarity.topKIvfKmeans(spark, sf0001)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    rr.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), "full rank list")
      // exact cosines DESCEND with rank — the re-rank's whole point;
      // ADC order (sim_topk_ivfpq) need not be cosine-monotone
      val cos = sorted.map(_._4).toSeq
      assert(cos == cos.sorted.reverse, "re-ranked by exact cosine")
      assert(!rows.exists(r => r._3 == r._1), "never its own neighbor")
    }
    // where the re-rank keeps a vector the plain IVF also scored, the
    // exact cosine must agree bit-for-bit with the IVF path's
    rr.foreach { case (q, _, v, c) =>
      ivf.get(q).flatMap(_.get(v)).foreach(expected =>
        assert(c == expected, s"query $q vec $v: cosine drifted"))
    }
  }

  test("pc1 projection is deterministic and captures above-average variance") {
    val a = Similarity.pcaProject(spark, sf0001)
      .as[(Long, Double)].collect().sortBy(_._1)
    val b = Similarity.pcaProject(spark, sf0001)
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(a.nonEmpty && a.sameElements(b), "bit-identical across runs")
    val scores = a.map(_._2)
    // sample variance of the projections = the Rayleigh quotient of the
    // (unit) component; the leading eigendirection must capture at
    // least the MEAN per-axis variance (trace/d bounds the top
    // eigenvalue from below) — 1% slack covers the milli quantization
    // of the covariance pass vs the raw-float projection
    val n = scores.length
    val mean = scores.sum / n
    val svar = scores.map(s => (s - mean) * (s - mean)).sum / (n - 1)
    val diag = Similarity.covariance(spark, sf0001)
      .filter(col("dim_i") === col("dim_j"))
      .select("cov").as[Double].collect()
    assert(diag.length == Similarity.EmbDim)
    val meanVar = diag.sum / diag.length
    assert(svar >= 0.99 * meanVar,
      s"pc1 variance $svar below mean axis variance $meanVar")
  }

  test("covariance moments equal a direct fold and are split-invariant") {
    val d = 3
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Array.fill(d)(rnd.nextInt(2001).toLong - 1000))
    val agg = new graft.functions.CovarianceSums(d)
    def run(rs: Seq[Array[Long]]) = rs.foldLeft(agg.zero)(agg.reduce)
    val whole = agg.finish(run(rows))
    // partition-split then merge must be bit-identical to one pass
    val (l, r) = rows.splitAt(17)
    val merged = agg.finish(agg.merge(run(l), run(r)))
    assert(whole == merged)
    // every moment equals the direct per-cell fold
    whole.foreach { c =>
      assert(c.n == rows.length)
      assert(c.sum_i == rows.map(_(c.dim_i)).sum)
      assert(c.sum_j == rows.map(_(c.dim_j)).sum)
      assert(c.s_ij == rows.map(x => x(c.dim_i) * x(c.dim_j)).sum)
    }
    assert(whole.size == d * (d + 1) / 2)
  }

  test("embedding covariance diagonal is nonnegative with full upper triangle") {
    val cells = Similarity.covariance(spark, sf0001).collect()
    assert(cells.length == Similarity.EmbDim * (Similarity.EmbDim + 1) / 2)
    cells.filter(r => r.getLong(0) == r.getLong(1)).foreach { r =>
      assert(r.getAs[Double]("cov") >= 0.0, s"negative variance at $r")
    }
    // the exchange must carry one merged buffer, not exploded rows: the
    // plan's only shuffle is the two-phase aggregate
    val plan = Similarity.covariance(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.toLowerCase.contains("cartesian"))
  }

  test("SQ8 scores are exact small integers and recall true neighbors") {
    val sq = Similarity.sq8TopK(spark, sf0001)
      .select("query_id", "rnk", "vec_id", "score")
      .as[(Long, Int, Long, Long)].collect()
    assert(sq.nonEmpty)
    sq.groupBy(_._1).values.foreach { rows =>
      // dense 1..k ranks, distinct neighbors, never the query itself
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
      assert(rows.map(_._3).distinct.length == rows.length)
      rows.foreach { case (q, _, v, s) =>
        assert(v != q)
        // signed codes in [-127, 127] bound the integer dot product
        val cap = Similarity.EmbDim.toLong * 127L * 127L
        assert(s >= -cap && s <= cap)
      }
      // ranks are ordered by descending score (vec_id breaks ties)
      val byRnk = rows.sortBy(_._2).map(_._4)
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a >= b })
    }
    // the 8-bit grid must still find most true top-k neighbors
    val bf = Similarity.topKBruteForce(spark, sf0001)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val overlap = sq.count(r => bf.contains((r._1, r._3)))
    assert(overlap >= sq.length / 2,
      s"SQ8 recall collapsed: $overlap of ${sq.length} match brute force")
  }

  test("JL projection replays exactly driver-side; recall audit is bounded and non-degenerate") {
    import org.apache.spark.sql.functions.col
    // exact replay: milli-quantize, signed integer sums, descale
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val expected = emb.flatMap { case (id, e) =>
      val m = e.map(x => math.round(x.toDouble * 1000))
      Similarity.rpSigns.zipWithIndex.map { case (row, i) =>
        val s = m.indices.map(j => m(j) * row(j)).sum
        (id, i.toLong, BigDecimal(s.toDouble / 1000.0 / 4.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
    val got = Similarity.rpProject(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, "RP projection diverged from the driver replay")

    // the native fused kernel equals the composed HOF formulation
    import org.apache.spark.sql.functions.{round => sround, transform => stransform}
    val nat = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), graft.functions.VectorFunctions
        .rpMilliProject(col("embedding"), Similarity.rpSigns).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val hof = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), stransform(col("embedding"),
        x => sround(x.cast("double") * 1000, 0).cast("long")).as("m"))
      .select(col("vec_id"), Similarity.rpSumsCol.as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(nat == hof, "native RP kernel diverged from the HOF formulation")

    val rows = Similarity.topKRpRecall(spark, sf0001).collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= Similarity.TopK)
      assert(r.getAs[Double]("recall") == h.toDouble / Similarity.TopK)
    }
    // JL with k=16 of 64 preserves neighbourhoods far better than chance:
    // mean recall must beat the random-baseline tail decisively
    val mean = rows.map(_.getAs[Long]("n_hits")).sum.toDouble /
      (rows.length * Similarity.TopK)
    assert(mean >= 0.2, s"RP recall collapsed to $mean")
  }
}
