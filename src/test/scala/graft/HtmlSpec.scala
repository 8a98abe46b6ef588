package graft

import org.apache.spark.sql.functions._
import graft.operators.Html

/** Extraction invariants for the HTML/boilerplate family, beyond the
  * oracle parity the driver checks: the gate must be lossless for real
  * content and total for chrome, and the whole family must stay a
  * map-side scan. */
class HtmlSpec extends SparkSpec {

  test("extraction is lossless for content: main_text == trimmed source text") {
    // the synthetic wrap puts the whole document in one content block;
    // for any doc long enough to pass the length gate, the extractor
    // must return it byte-identically (boilerplate removal never eats
    // content)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), trim(col("text")).as("t"))
      .filter(length(col("t")) >= Html.MinBlockChars)
    val joined = Html.extract(spark, sf0001)
      .join(docs, "doc_id")
      .select(col("doc_id"), col("main_text"), col("t"))
    val bad = joined.filter(col("main_text") =!= col("t")).count()
    assert(bad == 0, s"$bad docs whose extracted main text differs from source")
    assert(joined.count() > 0)
  }

  test("chrome never leaks: no nav/promo/footer text in any main_text") {
    val leaks = Html.extract(spark, sf0001)
      .filter(col("main_text").contains("Terms of Service") ||
        col("main_text").contains("Deal of the day") ||
        col("main_text").contains("Home About Contact"))
      .count()
    assert(leaks == 0, s"$leaks docs leaked page chrome into main_text")
  }

  test("promo docs count one more dropped block than plain docs") {
    val byPromo = Html.extract(spark, sf0001)
      .withColumn("dropped", col("n_blocks") - col("n_kept"))
      .groupBy(pmod(col("doc_id"), lit(3)) === 0)
      .agg(min(col("dropped")).as("mn"), max(col("dropped")).as("mx"))
      .collect().map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // plain docs drop nav-head + footer (2); promo docs also drop the
    // link farm (3) — uniformly, since both gates are deterministic
    assert(byPromo(false) == ((2L, 2L)), s"plain docs: ${byPromo(false)}")
    assert(byPromo(true) == ((3L, 3L)), s"promo docs: ${byPromo(true)}")
  }

  test("per-doc html queries plan zero shuffles (pure scan projections)") {
    Seq(Html.extract(spark, sf0001), Html.boilerplate(spark, sf0001)).foreach { df =>
      // string form prints through the AQE wrapper, so a plain
      // substring check sees the whole tree
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"html scan projection plans a shuffle:\n$p")
    }
  }
}
