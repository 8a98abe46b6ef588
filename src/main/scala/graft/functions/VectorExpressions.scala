package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over embedding
  * columns (`array<float>` / `array<double>`).
  *
  * Why a custom Expression and not `zip_with` + `aggregate`: Spark's
  * higher-order functions evaluate their lambda per element through the
  * interpreter — fine for one pass over 500 docs, hostile at 10^8×64
  * dims per executor. This expression is a single fused whole-stage
  * codegen loop: three running sums in registers, no per-element
  * virtual calls, no intermediate arrays. The preference ladder of
  * SURVEY.md §7.3 (compose > custom Expression > custom plan) lands on
  * (b) here because the built-ins can't give a fused loop.
  *
  * Determinism contract (what the DuckDB oracle replays): dot and the
  * two squared norms are accumulated in array-index order as doubles,
  * then cos = dot / (sqrt(na)·sqrt(nb)). Identical IEEE operation
  * order ⇒ identical result bits in both engines.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "cosine_sim"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$getL($i);
         |  double $yi = (double) $b.$getR($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b): the fused-loop dot without the norms — for
  * sign-bucket LSH, where the raw dot's sign must be tested directly
  * (cosine is NaN for a zero vector, and NaN comparisons differ
  * between engines: IEEE false in Spark, NaN-greatest in DuckDB's
  * total order — the dot is 0.0 in both). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dot_product"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$getL($i) * (double) $b.$getR($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** rp_milli_project(embedding): the fused Johnson–Lindenstrauss
  * kernel — milli-quantize an `array<float>` once, then k signed
  * integer sums against a plan-literal ±1 matrix, producing
  * `array<bigint>`.
  *
  * Why native: the composed `transform` + k×(`zip_with`+`aggregate`)
  * form dispatches an interpreted lambda per (out-dim × element) —
  * k·d virtual calls per row. This is one quantize pass into a local
  * array plus a fused k·d long multiply-add loop. The quantization
  * replays Spark's own `round(x·1000, 0)` semantics exactly
  * (BigDecimal HALF_UP — see [[RpMilliProject.milli]]), so the native
  * and composed forms are bit-identical (pinned by spec), and the
  * DuckDB oracle replays the same integers. */
case class RpMilliProject(child: Expression, signs: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "rp_milli_project"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input")
  }

  override protected def nullSafeEval(a: Any): Any =
    RpMilliProject.project(a.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("rpSigns", signs, "long[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RpMilliProject.project($a, $s);")
  }

  override protected def withNewChildInternal(newChild: Expression): RpMilliProject =
    copy(child = newChild)
}

object RpMilliProject {
  /** Spark's `round(x·1000, 0).cast("long")` bit-for-bit: double
    * multiply, BigDecimal.valueOf (canonical decimal), HALF_UP. */
  def milli(x: Float): Long =
    java.math.BigDecimal.valueOf(x.toDouble * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def project(a: ArrayData, signs: Array[Array[Long]]): ArrayData = {
    val d = a.numElements()
    val m = new Array[Long](d)
    var j = 0
    while (j < d) { m(j) = milli(a.getFloat(j)); j += 1 }
    val k = signs.length
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val row = signs(i)
      val n = math.min(d, row.length)
      var acc = 0L
      var jj = 0
      while (jj < n) { acc += m(jj) * row(jj); jj += 1 }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-API and SQL-surface entry points for the vector expressions. */
object VectorFunctions {
  /** cosine_sim(a, b) as a Column (DataFrame API). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** dot_product(a, b) as a Column (DataFrame API). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** rp_milli_project(a) as a Column — the ±1 matrix rides the plan
    * as a literal reference object. */
  def rpMilliProject(a: Column, signs: Array[Array[Long]]): Column =
    ColumnBridge.column(RpMilliProject(ColumnBridge.expression(a), signs))

  /** The ONE registry of (name, class, builder) — both registration
    * paths (per-session and spark.sql.extensions) read from here, so
    * the SQL surface cannot diverge between them. */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSimilarity],
      (c: Seq[Expression]) => CosineSimilarity(c.head, c(1))),
    ("dot_product", classOf[DotProduct],
      (c: Seq[Expression]) => DotProduct(c.head, c(1))),
    ("poly_hash", classOf[PolyHash],
      (c: Seq[Expression]) => PolyHash(c.head, 31L, 0L)),
    ("simhash31", classOf[SimHash31],
      (c: Seq[Expression]) => SimHash31(c.head)),
    ("zorder2", classOf[ZOrder2],
      (c: Seq[Expression]) => ZOrder2(c.head, c(1))),
    // hilbert2(x, y[, n]) — n a literal power-of-two grid width,
    // default the 1024 grid the layout statistics use
    ("hilbert2", classOf[Hilbert2],
      (c: Seq[Expression]) => {
        val n = if (c.length <= 2) 1024L
          else integralLiteral(c(2), "hilbert2's grid width")
        Hilbert2(c.head, c(1), n)
      }),
    // zorder_n(array(d0, d1, ...)) — k-way Morton interleave
    ("zorder_n", classOf[ZOrderN],
      (c: Seq[Expression]) => ZOrderN(c.head)),
    // hilbert_n(array(d0, d1, ...)[, b]) — b bits per dimension
    // (literal), default 10 (the 1024-wide grid hilbert2 defaults to)
    ("hilbert_n", classOf[HilbertN],
      (c: Seq[Expression]) => {
        val b = if (c.length <= 1) 10L
          else integralLiteral(c(1), "hilbert_n's bits-per-dimension")
        HilbertN(c.head, b.toInt)
      }))

  /** Fold one SQL-surface plan-time parameter to a Long — the shared
    * extraction every literal-typed builder argument goes through, so
    * accepting a new literal kind (or improving the error) happens in
    * exactly one place. */
  private def integralLiteral(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case s: java.lang.Short => s.longValue
      case b: java.lang.Byte => b.longValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integral literal, got $other")
    }
  }

  /** Make every graft expression callable from spark.sql on a live
    * session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` wiring — the
  * idiomatic deployment path: functions AND planner strategies
  * available in every session of the cluster without per-session
  * registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.builders.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushLimitThroughAsOfJoin)
    ext.injectTableFunction((FunctionIdentifier("gen_trades"),
      new ExpressionInfo(classOf[graft.sources.GenTradesSource].getName, "gen_trades"),
      graft.sources.GenTradesSource.tableFunctionBuilder _))
  }
}
