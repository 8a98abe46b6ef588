package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{OhlcvAggregator, TradePoint}

/** Property tests for the typed OHLCV Aggregator: partition-order
  * independence is what makes it safe under Spark's partial/final
  * aggregation (SURVEY.md §5.4). Seeded Gen sampling stands in for
  * forAll (scalatestplus bridge is not on the classpath). */
class OhlcvAggregatorSpec extends SparkSpec {

  private val agg = new OhlcvAggregator

  private val tradeGen = for {
    ts <- Gen.choose(0L, 50L)
    price <- Gen.choose(1, 1000).map(_.toDouble)
    qty <- Gen.choose(1L, 100L)
    tb <- Gen.choose(0L, 1000000L)
  } yield TradePoint(ts, price, qty, tb)

  private def sample(seed: Long): List[TradePoint] = {
    val n = 1 + (seed % 97).toInt
    Gen.listOfN(n, tradeGen).pureApply(Gen.Parameters.default, Seed(seed))
  }

  private def fold(ts: Seq[TradePoint]) = ts.foldLeft(agg.zero)(agg.reduce)

  test("reduce+merge is independent of partitioning and order") {
    for (seed <- 0L until 200L) {
      val trades = sample(seed)
      val direct = agg.finish(fold(trades))
      val shuffled = new scala.util.Random(seed).shuffle(trades)
      val chunk = math.max(1, shuffled.size / (1 + (seed % 5).toInt + 1) + 1)
      val merged = agg.finish(shuffled.grouped(chunk).map(fold).reduce(agg.merge))
      assert(direct == merged, s"seed=$seed")
    }
  }

  test("bar invariants: low <= min(open,close) <= max(open,close) <= high; volume = sum qty") {
    for (seed <- 200L until 400L) {
      val trades = sample(seed)
      val b = agg.finish(fold(trades))
      assert(b.low <= math.min(b.open, b.close))
      assert(b.high >= math.max(b.open, b.close))
      assert(b.volume == trades.map(_.qty).sum)
    }
  }

  test("open/close follow (ts, tiebreak) order, not arrival order") {
    val trades = Seq(
      TradePoint(5L, 50.0, 1L, 0L), // arrives first but ts later
      TradePoint(1L, 10.0, 1L, 1L),
      TradePoint(1L, 11.0, 1L, 0L), // same ts, smaller tiebreak → true open
      TradePoint(9L, 90.0, 1L, 2L))
    val b = agg.finish(fold(trades))
    assert(b.open == 11.0)
    assert(b.close == 90.0)
    assert(b.high == 90.0 && b.low == 10.0 && b.volume == 4L)
  }

  test("typed udaf path matches the min_by/max_by plan on real data") {
    // explicit test-side ordering: the queries no longer carry a
    // presentation sort (the driver comparator canonicalizes row order)
    val typed = operators.Ohlcv.bars1mTyped(spark, sf0001)
      .orderBy("window_start", "event_type").collect()
    val native = operators.Ohlcv.bars1m(spark, sf0001)
      .orderBy("window_start", "event_type").collect()
    assert(typed.length == native.length)
    typed.zip(native).foreach { case (a, b) => assert(a == b) }
  }
}
