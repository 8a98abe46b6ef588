package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension for the backward as-of join — tier
  * (c) of SURVEY.md §7.3's preference ladder (compose > custom
  * Expression > custom LogicalPlan + Strategy + SparkPlan), used here
  * because the as-of is a genuinely missing WHOLE-OPERATOR semantic:
  * the composed form (operators/AsOfJoin.asOfLast — union + side
  * marker + running `last` window) is correct and one-shuffle, but it
  * must materialize the union and run a window operator; the native
  * plan below is the sort-merge shape a dedicated engine (DuckDB's
  * ASOF JOIN, the oracle) uses — one streaming merge pass per
  * partition, zero buffering beyond one candidate row.
  *
  * Semantics (LEFT ASOF, `>=`): for every left row, append the right
  * row with the greatest `rightTs <= leftTs` in the same key group;
  * right columns are null when no right row precedes. Matches
  * DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`
  * (/root/reference has no as-of; the operator completes the
  * trade↔quote domain the reference's pipelines imply — see
  * operators/AsOfJoin).
  *
  * Scale shape: EnsureRequirements plants one hash exchange per side
  * (ClusteredDistribution on the key) plus partition-local sorts on
  * (key, ts) — identical distribution requirements to SortMergeJoin,
  * so AQE, co-partitioning reuse, and skew handling all apply. The
  * merge itself is O(|L| + |R|) per partition with O(1) state: ONE
  * copied candidate row — no per-key buffering, no window frame, no
  * right-side materialization. 1000-executor parallelism is
  * key-hash-wide, same as any shuffle join.
  *
  * Null contract (mirrors SQL equality + ASOF): null left keys or
  * timestamps match nothing; null right keys/timestamps are skipped.
  * Both sort NULLS FIRST, so skipping them is a prefix scan, and the
  * merge never compares a null.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical candidate, the merge exec. Registered via
  * both `GraftPlans.install` (live session) and
  * functions.GraftExtensions (spark.sql.extensions deployment). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Partition-local backward merge over two (key, ts)-sorted children.
  *
  * EnsureRequirements satisfies `requiredChildDistribution` /
  * `requiredChildOrdering` exactly as it does for SortMergeJoinExec:
  * hash exchange on the key per side (same numPartitions, co-hashed)
  * and an in-partition sort — so `zipPartitions` pairs the matching
  * key ranges.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through in order, one output row each
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val boundLK = BindReferences.bindReference(leftKey, left.output)
    val boundLT = BindReferences.bindReference(leftTs, left.output)
    val boundRK = BindReferences.bindReference(rightKey, right.output)
    val boundRT = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)

      new Iterator[InternalRow] {
        // lookahead right row — still backed by the iterator's reused
        // buffer, valid only until the next advance
        private var rHead: InternalRow = advance()
        // candidate = latest right row with ts <= current left ts for
        // the current key; a COPY (the buffer behind rHead is reused)
        private var cand: InternalRow = _
        private var candKey: Any = _

        private def advance(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = boundLK.eval(l)
          val lTs = boundLT.eval(l)
          if (lKey == null || lTs == null) {
            // SQL equality: null joins nothing. Null-key left rows sort
            // first, before any right consumption — cand is still null.
            toUnsafe(joined(l, nullRight))
          } else {
            var scanning = true
            while (scanning && rHead != null) {
              val rKey = boundRK.eval(rHead)
              if (rKey == null) rHead = advance() // nulls-first prefix, no match
              else {
                val kc = keyOrd.compare(rKey, lKey)
                if (kc < 0) rHead = advance() // bygone key group
                else if (kc > 0) scanning = false
                else {
                  val rTs = boundRT.eval(rHead)
                  if (rTs == null) rHead = advance() // null ts never matches
                  else if (tsOrd.compare(rTs, lTs) <= 0) {
                    cand = rHead.copy() // survives buffer reuse
                    candKey = boundRK.eval(cand)
                    rHead = advance()
                  } else scanning = false
                }
              }
            }
            if (cand != null && keyOrd.compare(candKey, lKey) != 0) {
              cand = null; candKey = null // candidate from an older key group
            }
            toUnsafe(joined(l, if (cand != null) cand else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom node — the Rule[LogicalPlan] tier of
  * the extension quartet. Catalyst's built-in LimitPushDown knows the
  * built-in join types (it pushes a limit into a LEFT OUTER join's left
  * side); it cannot know AsOfJoinPlan, so the same sound rewrite is
  * supplied here: the as-of join emits EXACTLY one row per left row,
  * so any-n-of(join(L)) ≡ join(any-n-of(L)) — and a limit without an
  * order is an any-n contract by definition. The pushed LocalLimit
  * lands BELOW the left side's hash exchange: at 100 TB that is the
  * difference between shuffling n rows and shuffling the table. */
object PushLimitThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, Project}
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // guards keep the rewrite one-shot under fixed-point iteration
    case LocalLimit(expr, j: AsOfJoinPlan)
        if !j.left.isInstanceOf[LocalLimit] =>
      LocalLimit(expr, j.copy(left = LocalLimit(expr, j.left)))
    // a Project over the join (e.g. the __asof_key drop) is row-count
    // preserving — push through it too
    case LocalLimit(expr, p @ Project(_, j: AsOfJoinPlan))
        if !j.left.isInstanceOf[LocalLimit] =>
      LocalLimit(expr, p.copy(child = j.copy(left = LocalLimit(expr, j.left))))
  }
}

/** Session wiring for the custom plans (the expression twin is
  * functions.VectorFunctions.register). */
object GraftPlans {
  /** Idempotently add the graft planner strategies + optimizer rules to
    * a live session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushLimitThroughAsOfJoin))
      spark.experimental.extraOptimizations = opts :+ PushLimitThroughAsOfJoin
  }
}
