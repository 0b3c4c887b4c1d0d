package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, BindReferences,
  Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The full custom-operator ladder for the as-of join (SURVEY §4.3 path
  * (c)): a logical node, a planner strategy, and a physical operator,
  * registered through `SparkSessionExtensions` — used where composing
  * built-ins (the union+window formulation in [[graft.ops.AsOfJoin]])
  * leaves real money on the table.
  *
  * What the physical operator buys over union+window at 100 TB:
  *   - the shuffle carries each side's OWN columns only — the union must
  *     widen every left row with null right-columns and every right row
  *     with a null-packed struct of the entire left payload before the
  *     exchange, roughly doubling shuffled bytes on wide tables;
  *   - no window buffering: `WindowExec` materializes each partition's
  *     frame buffer, while this merge holds exactly ONE right value;
  *   - no post-filter: the union plan shuffles right rows through the
  *     window only to discard them afterwards.
  * Same partitioning price as any equi join (one `ClusteredDistribution`
  * per side, sort by (key, time) within partitions — EnsureRequirements
  * inserts the exchanges/sorts and AQE coalesces them like any
  * sort-merge join), then a streaming O(n) two-pointer merge per
  * partition with O(1) state.
  *
  * Null semantics match SQL joins and [[graft.ops.AsOfJoin.asOfTime]]:
  * null keys/times never match; left rows always survive.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    matchOut: AttributeReference
) extends BinaryNode {
  require(leftKey.dataType == rightKey.dataType,
    s"key type mismatch: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"time type mismatch: ${leftTime.dataType} vs ${rightTime.dataType}")
  override def output: Seq[Attribute] = left.output :+ matchOut
  override def producedAttributes: AttributeSet = AttributeSet(matchOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in [[GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, m) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, m) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    matchOut: AttributeReference
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchOut
  override def producedAttributes: AttributeSet = AttributeSet(matchOut)

  /** Both sides hash-cluster on their key — the planner co-partitions them
    * exactly as it would a shuffled equi join. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, time) ascending within partitions; nulls-first (Spark default)
    * is what the merge loop assumes. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Rows stream out in the left child's partitioning and (key, time)
    * order — downstream keyed operators reuse the exchange and sort. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val inAttrs = leftOut :+ matchOut
    // keys/times are attributes of the child outputs — resolve ordinals for
    // the primitive fast path
    val lkOrd = leftOut.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = leftOut.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = rightOut.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = rightOut.indexWhere(_.exprId == rightTime.exprId)
    val longFast = leftKey.dataType == org.apache.spark.sql.types.LongType &&
      leftTime.dataType == org.apache.spark.sql.types.LongType &&
      lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0

    if (longFast) {
      val outRows = longMetric("numOutputRows")
      val matchedRows = longMetric("numMatched")
      // primitive long merge — no boxing, no interpreted compare, the
      // common (id, epoch-time) shape at scan speed
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val project = UnsafeProjection.create(outAttrs, inAttrs)
        val matchRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val rBuf = rIter.buffered
        var hasLast = false
        var lastKey = 0L
        var lastTime = 0L
        lIter.map { lRow =>
          var isMatch = false
          if (!lRow.isNullAt(lkOrd) && !lRow.isNullAt(ltOrd)) {
            val lk = lRow.getLong(lkOrd)
            val lt = lRow.getLong(ltOrd)
            var advance = true
            while (advance && rBuf.hasNext) {
              val rRow = rBuf.head
              if (rRow.isNullAt(rkOrd) || rRow.isNullAt(rtOrd)) rBuf.next()
              else {
                val rk = rRow.getLong(rkOrd)
                if (rk < lk) rBuf.next()
                else if (rk == lk && rRow.getLong(rtOrd) <= lt) {
                  lastKey = rk; lastTime = rRow.getLong(rtOrd); hasLast = true
                  rBuf.next()
                } else advance = false
              }
            }
            isMatch = hasLast && lastKey == lk
          }
          outRows += 1
          if (isMatch) { matchedRows += 1; matchRow.update(0, lastTime) }
          else matchRow.update(0, null)
          project(joined(lRow, matchRow))
        }
      }
    } else {
      genericExecute(leftOut, rightOut, outAttrs, inAttrs)
    }
  }

  /** Interpreted-ordering merge for any orderable key/time type. */
  private def genericExecute(
      leftOut: Seq[Attribute], rightOut: Seq[Attribute],
      outAttrs: Seq[Attribute], inAttrs: Seq[Attribute]): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyB = BindReferences.bindReference(leftKey: Expression, leftOut)
    val lTimeB = BindReferences.bindReference(leftTime: Expression, leftOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rightOut)
    val rTimeB = BindReferences.bindReference(rightTime: Expression, rightOut)
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outAttrs, inAttrs)
      val matchRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) merge state: the last right (key, time) seen with time <= the
      // current left row's time. Values are copied out of the (reused)
      // unsafe row buffers.
      var lastKey: Any = null
      var lastTime: Any = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        var matched: Any = null
        if (lk != null && lt != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val rRow = rBuf.head
            val rk = rKeyB.eval(rRow)
            val rt = rTimeB.eval(rRow)
            if (rk == null || rt == null) {
              rBuf.next() // null key/time never matches — skip
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rBuf.next() // right row's key already passed
              else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                lastKey = InternalRow.copyValue(rk)
                lastTime = InternalRow.copyValue(rt)
                rBuf.next()
              } else advance = false // right row is in this left row's future
            }
          }
          if (lastKey != null && keyOrd.compare(lastKey, lk) == 0)
            matched = lastTime
        }
        outRows += 1
        if (matched != null) matchedRows += 1
        matchRow.update(0, matched)
        project(joined(lRow, matchRow))
      }
    }
  }
}
