package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}
import graft.model.Schemas
import graft.operators.RichTrades
import graft.sources.JsonSource

/** The rich 13-field trade pipeline (/root/reference/old/kfk.py:60-183):
  * declared-schema JSON with nullable counterparty/OTC fields, strict
  * missing-field semantics, and the nested ROW sink shape. */
class RichTradesSpec extends SparkSpec {
  import spark.implicits._

  test("wire JSON omits unset nullable fields entirely") {
    val rows = RichTrades.wire(spark, sf0001).collect().map(_.getString(0))
    assert(rows.nonEmpty)
    val without = rows.filterNot(_.contains("\"DirectAskCounterparty\""))
    val withCp = rows.filter(_.contains("\"DirectAskCounterparty\""))
    assert(without.nonEmpty && withCp.nonEmpty,
      "corpus must exercise both present and ABSENT counterparty fields")
    rows.foreach(r => assert(r.contains("\"Timestamp\""), "required field always on the wire"))
  }

  test("absent nullable fields parse to null; present ones survive") {
    val p = RichTrades.parsed(spark, sf0001)
      .select(col("Id").cast("long").as("id"), col("DirectAskCounterparty"),
        col("OTCTradeType"), col("IsOtc"))
      .collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      val id = r.getLong(0)
      assert(r.isNullAt(1) == (id % 3 != 0), s"ask counterparty null-ness for $id")
      assert(r.isNullAt(2) == (id % 5 != 0), s"OTCTradeType null-ness for $id")
      assert(r.getBoolean(3) == (id % 5 == 0))
    }
  }

  test("strict mode drops records missing a non-nullable field") {
    val mixed = Seq(
      """{"Timestamp": 1000000, "Product": "A", "Price": 1.5, "Qty": 1, "Id": "1"}""",
      """{"Product": "B", "Price": 2.5, "Qty": 1, "Id": "2"}""" // no Timestamp
    ).toDF("data")
    val strict = JsonSource.parseJson(mixed, "data", Schemas.richTrade, failOnMissing = true)
    assert(strict.count() == 1L)
    assert(strict.select("Product").as[String].collect().toSeq == Seq("A"))
    val lax = JsonSource.parseJson(mixed, "data", Schemas.richTrade, failOnMissing = false)
    assert(lax.count() == 2L)
    assert(lax.filter(col("Timestamp").isNull).count() == 1L)
  }

  test("rich OHLCV invariants: low <= open/close <= high, volume positive") {
    val bars = RichTrades.ohlcv1m(spark, sf0001).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (o, h, l, c) = (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(l <= o && o <= h && l <= c && c <= h)
      assert(r.getLong(7) > 0L)
      assert(r.getLong(8) <= r.getLong(7)) // n_ask_cp bounded by events in window
    }
  }

  test("nested bars match the declared nestedBar sink schema") {
    val df = RichTrades.nestedBars1m(spark, sf0001)
    assert(df.schema.fieldNames.toSeq == Seq("window_start", "ohlc"))
    assert(df.schema("window_start").dataType == LongType)
    val ohlc = df.schema("ohlc").dataType.asInstanceOf[StructType]
    assert(ohlc.fieldNames.toSeq == Seq("open", "high", "low", "close"))
    val declared = Schemas.nestedBar("ohlc").dataType.asInstanceOf[StructType]
    assert(ohlc.fieldNames.toSeq == declared.fieldNames.toSeq)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 60000L == 0L, "window_start must be minute-aligned epoch ms")
      val s = r.getStruct(1)
      assert(s.getDouble(2) <= s.getDouble(1)) // low <= high
    }
  }

  test("OHLC values stay inside the cross-engine JSON format-stable zone") {
    // Spark goes scientific at |x| >= 1e7 or (0, 1e-3); DuckDB never
    // does — the rich_trade_nested oracle hash relies on this domain
    val bad = RichTrades.nestedBars1m(spark, sf001)
      .select(col("ohlc.*"))
      .select(Seq("open", "high", "low", "close").map(c =>
        (abs(col(c)) >= 1e7 || (abs(col(c)) > 0 && abs(col(c)) < 1e-3)).as(c)): _*)
      .filter(col("open") || col("high") || col("low") || col("close"))
    assert(bad.isEmpty,
      "OHLC magnitude left the zone where Spark and DuckDB JSON agree")
  }

  test("JSON verify twin is the nested producer, value-identically") {
    val nested = RichTrades.nestedBars1m(spark, sf0001)
    val twin = RichTrades.nestedBars1mJson(spark, sf0001)
    assert(twin.schema.fieldNames.toSeq == Seq("window_start", "ohlc_json"))
    // parse the wire string back through the declared struct type: the
    // round trip must reproduce the nested rows bit-for-bit
    val ohlcType = nested.schema("ohlc").dataType
    val back = twin.select(col("window_start"),
      from_json(col("ohlc_json"), ohlcType).as("ohlc"))
    assert(back.exceptAll(nested).isEmpty && nested.exceptAll(back).isEmpty)
    // key order on the wire is the struct field order, fixed
    val one = twin.select("ohlc_json").as[String].head()
    assert("\"open\".*\"high\".*\"low\".*\"close\"".r.findFirstIn(one).isDefined)
  }
}
