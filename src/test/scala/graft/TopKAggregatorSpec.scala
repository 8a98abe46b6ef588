package graft

import graft.functions.{LongScoredId, ScoredId, TopKByLongScore, TopKByScore}

/** Direct unit coverage of the bounded top-k aggregators' total order —
  * the edge cases a corpus never exercises: signed zeros at the rank-k
  * boundary, scores past a double's 2^53 exact-integer range, and
  * merge/reduce equivalence under arbitrary partition splits. */
class TopKAggregatorSpec extends SparkSpec {

  // compare through finish(): the buffer's internal order is
  // worst-first since r16 (O(1) full-reject); finish() emits the
  // best-first ranking the queries consume
  private def runD(k: Int, xs: Seq[ScoredId]): Seq[ScoredId] = {
    val agg = new TopKByScore(k)
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
  }

  private def refD(k: Int, xs: Seq[ScoredId]): Seq[ScoredId] =
    // the window/oracle order the aggregator must reproduce: score DESC
    // with ±0.0 EQUAL (as in Spark's sort and SQL), id ASC tiebreak
    xs.sortBy(s => (-(s.cosine + 0.0), s.vec_id)).take(k)

  test("signed zeros tie at the rank-k boundary and fall to the id tiebreak") {
    // ids 1..4 score -0.0, ids 5..8 score +0.0; k=4 must keep ids
    // 1,2,3,4 — an aggregator ordering -0.0 < 0.0 would keep 5,6,7,8
    val xs = Seq(5L, 1L, 6L, 2L, 7L, 3L, 8L, 4L).map(id =>
      ScoredId(id, if (id <= 4) -0.0 else 0.0))
    assert(runD(4, xs).map(_.vec_id) == Seq(1L, 2L, 3L, 4L))
    assert(runD(4, xs) == refD(4, xs))
    // and merge order cannot change that
    val agg = new TopKByScore(4)
    val (a, b) = xs.splitAt(3)
    val m = agg.finish(agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce)))
    assert(m.map(_.vec_id) == Seq(1L, 2L, 3L, 4L))
  }

  test("double top-k equals the reference sort on random splits (property)") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val xs = Seq.fill(40)(ScoredId(rnd.nextInt(1000).toLong,
        (rnd.nextInt(9) - 4) / 4.0 * (if (rnd.nextBoolean()) 1 else -1)))
        .distinctBy(_.vec_id)
      val k = rnd.nextInt(10) + 1
      val agg = new TopKByScore(k)
      val cut = rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.finish(agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == refD(k, xs))
    }
  }

  test("long top-k keeps exact order where doubles collapse (scores past 2^53)") {
    val big = 1L << 53
    // big and big+1 are the SAME double; the long aggregator must rank
    // big+1 strictly ahead
    val xs = Seq(LongScoredId(10L, big), LongScoredId(20L, big + 1),
      LongScoredId(30L, big - 1))
    val agg = new TopKByLongScore(2)
    val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(got.map(_.vec_id) == Seq(20L, 10L))
    // double rounding would tie 10 and 20 and wrongly keep id 10 first
    assert((big + 1).toDouble == big.toDouble)
  }

  test("long top-k equals the reference sort on random splits (property)") {
    val rnd = new scala.util.Random(11)
    (0 until 50).foreach { _ =>
      val xs = Seq.fill(40)(LongScoredId(rnd.nextInt(1000).toLong,
        (1L << 53) + rnd.nextInt(20) - 10))
        .distinctBy(_.vec_id)
      val k = rnd.nextInt(10) + 1
      val agg = new TopKByLongScore(k)
      val cut = rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.finish(agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == xs.sortBy(s => (-s.score, s.vec_id)).take(k))
    }
  }
}
