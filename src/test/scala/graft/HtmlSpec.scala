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

  test("generated corpora: extraction and accounting invariants hold on edge cases") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // markup-free generated texts (raw '<' is invalid in HTML text and
    // absent from the corpus contract) plus the edge shapes the real
    // corpus never exercises
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val textG = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
      .flatMap(s => Gen.oneOf(s, s" $s ", s.replace(" ", "  ")))
    val texts = (0L until 200L).map(seed =>
      textG.pureApply(Gen.Parameters.default, Seed(seed))) ++
      Seq("", " ", "a", "a b c", "x" * 29, "x" * 30, "y" * 500)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val ext = Html.extractOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val acct = Html.boilerplateOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val e = ext(i.toLong); val a = acct(i.toLong)
      val trimmed = t.trim
      if (trimmed.length >= Html.MinBlockChars)
        assert(e.getAs[String]("main_text") == trimmed, s"doc $i lossy")
      else {
        assert(e.getAs[String]("main_text") == "", s"doc $i short-not-dropped")
        assert(e.getAs[Long]("n_kept") == 0L)
      }
      // accounting identities: total text splits exactly into main +
      // boilerplate, fraction in range, promo adds one dropped block
      val (tc, mc, bc) = (a.getAs[Long]("text_chars"),
        a.getAs[Long]("main_chars"), a.getAs[Long]("boiler_chars"))
      assert(tc == mc + bc && bc >= 0, s"doc $i accounting")
      val bm = a.getAs[Long]("boiler_milli")
      assert(bm >= 0 && bm <= 1000, s"doc $i boiler_milli=$bm")
      val dropped = e.getAs[Long]("n_blocks") - e.getAs[Long]("n_kept")
      // chrome blocks (head+nav, footer, promo on every 3rd doc) plus
      // the content block itself when it is nonempty but below the
      // length gate
      val shortMain = trimmed.nonEmpty && trimmed.length < Html.MinBlockChars
      val expectDropped = (if (i % 3 == 0) 3L else 2L) + (if (shortMain) 1L else 0L)
      assert(dropped == expectDropped, s"doc $i dropped=$dropped")
    }
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
