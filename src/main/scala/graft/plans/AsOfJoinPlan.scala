package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator as-of join as a first-class Catalyst citizen: a
  * logical node, a planner strategy, and a streaming physical operator
  * — tier (c) of the custom-operator ladder (SURVEY §4), used when
  * composition genuinely can't express the plan shape we want. The
  * composed forms exist too ([[graft.operators.AsOf]] cogroup,
  * `e03_asof_join` rank-filter); this one lets SPARK place the
  * exchanges and sorts:
  *
  *  - `requiredChildDistribution` = ClusteredDistribution(key) per side
  *    -> EnsureRequirements co-partitions both inputs (or reuses an
  *    existing partitioning — a bucketed/pre-shuffled child plans NO
  *    exchange, which the cogroup form can never express);
  *  - `requiredChildOrdering` = (key, time [, tiebreak]) per side ->
  *    Spark plans the sorts, spilling via UnsafeExternalSorter instead
  *    of the cogroup's in-memory per-group array;
  *  - `doExecute` then streams ONE two-pointer merge per partition:
  *    no group materialization, no pair blowup, output exactly |left|.
  *
  * Semantics (backward as-of): each left row joins the right row with
  * equal key and the greatest rightTime <= leftTime, ties on rightTime
  * broken by greatest rightTie; unmatched left rows keep nulls.
  * Key/time/tie expressions must be LongType (cast timestamps to epoch
  * first); null keys or times never match.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  require(Seq(leftKey, rightKey, leftTime, rightTime, rightTie)
    .forall(_.dataType == LongType), "as-of columns must be LongType")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Registered via
  * [[GraftExtensions]] or `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

/** Streaming physical as-of merge join. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val nRight = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // bind against the NULLABLE output attrs, not the children's:
      // the right child declares non-nullable columns, and a projection
      // bound to those elides the null checks — the all-null unmatched
      // row would render as zeros instead of nulls
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var curKey = Long.MinValue
      var haveKey = false
      var best: InternalRow = null
      lIter.map { l =>
        val kAny = lKeyB.eval(l)
        val tAny = lTimeB.eval(l)
        if (kAny == null || tAny == null) {
          proj(joiner(l, nullRight))
        } else {
          val k = kAny.asInstanceOf[Long]
          val lt = tAny.asInstanceOf[Long]
          if (!haveKey || k != curKey) { curKey = k; haveKey = true; best = null }
          // drop right rows before this key (null right keys sort first)
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head)
            if (rk == null || rk.asInstanceOf[Long] < k) { rBuf.next(); () }
            else advance = false
          }
          // consume this key's right rows up to lt; remember the last
          var consume = true
          while (consume && rBuf.hasNext) {
            val h = rBuf.head
            val rk = rKeyB.eval(h)
            if (rk != null && rk.asInstanceOf[Long] == k) {
              val rt = rTimeB.eval(h)
              if (rt == null) {
                // null times sort FIRST (Ascending nulls-first): skip
                // them, or they'd block every valid row behind them
                rBuf.next(); ()
              } else if (rt.asInstanceOf[Long] <= lt) {
                best = rBuf.next().copy() // iterator reuses rows
              } else consume = false
            } else consume = false
          }
          proj(joiner(l, if (best == null) nullRight else best))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}
