package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho-Corasick automaton (Aho & Corasick 1975) for
  * multi-phrase scanning: one pass over the document counts EVERY
  * occurrence of every dictionary term — including nested and
  * overlapping matches — in O(n + matches), independent of dictionary
  * size. This is the right shape for blocklist/PII-phrase filtering at
  * corpus scale, where a production dictionary holds 10³–10⁵ phrases
  * and the per-term `contains` alternative costs |dict| scans per row.
  *
  * The automaton is built ONCE on the driver (goto table completed
  * through the BFS fail links, match counts propagated down them —
  * so the hot loop is exactly two array reads per input byte, no fail
  * chasing) and ships to executors as a codegen reference object, the
  * same broadcast-small-state pattern as [[BloomMightContain]].
  *
  * Matching is over UTF-8 BYTES: valid UTF-8 is self-synchronizing, so
  * a byte-level match can only start on a character boundary — exact
  * for any dictionary, with no per-row String decode.
  *
  * Memory: the completed goto table is |nodes|×256 ints (~1 MB per
  * thousand dictionary characters) — the classic dense-automaton
  * trade: pay bounded driver/executor memory once, keep the scan loop
  * branch-free.
  */
final class AcAutomaton(val terms: Seq[String]) extends Serializable {
  require(terms.nonEmpty && terms.forall(_.nonEmpty), "terms must be non-empty")

  private val (gotoTab: Array[Array[Int]], outCnt: Array[Int]) = {
    import scala.collection.mutable
    val bytes = terms.map(_.getBytes("UTF-8"))
    // trie
    val children = mutable.ArrayBuffer(mutable.Map.empty[Int, Int])
    val ends = mutable.ArrayBuffer(0)
    for (t <- bytes) {
      var s = 0
      for (b <- t) {
        val c = b & 0xFF
        s = children(s).getOrElseUpdate(c, {
          children += mutable.Map.empty[Int, Int]
          ends += 0
          children.length - 1
        })
      }
      ends(s) += 1
    }
    val n = children.length
    val fail = new Array[Int](n)
    val g = Array.ofDim[Int](n, 256)
    val out = ends.toArray
    // BFS: complete the goto function and fold fail-state matches in,
    // so the scan never walks fail chains
    val q = mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      children(0).get(c) match {
        case Some(ch) => g(0)(c) = ch; fail(ch) = 0; q += ch
        case None => g(0)(c) = 0
      }
    }
    while (q.nonEmpty) {
      val s = q.dequeue()
      out(s) += out(fail(s))
      for (c <- 0 until 256) {
        children(s).get(c) match {
          case Some(ch) => g(s)(c) = ch; fail(ch) = g(fail(s))(c); q += ch
          case None => g(s)(c) = g(fail(s))(c)
        }
      }
    }
    (g, out)
  }

  /** Total occurrences of all terms in `s`, counting every match end
    * position (nested and overlapping matches each count). */
  def count(s: UTF8String): Long = {
    val b = s.getBytes
    var st = 0
    var total = 0L
    var i = 0
    while (i < b.length) {
      st = gotoTab(st)(b(i) & 0xFF)
      total += outCnt(st)
      i += 1
    }
    total
  }
}

/** blocklist_hits(text): total dictionary-phrase occurrences in the
  * document, via a broadcast [[AcAutomaton]] — one fused byte loop per
  * row inside whole-stage codegen. */
case class BlocklistHits(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "blocklist_hits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  @transient private lazy val ac = new AcAutomaton(terms)

  override protected def nullSafeEval(input: Any): Any =
    ac.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac,
      "graft.functions.AcAutomaton")
    defineCodeGen(ctx, ev, a => s"$ref.count($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)
}
