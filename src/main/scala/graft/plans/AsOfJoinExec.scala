package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical as-of join: for each left row, the single latest right row with
  * equal key and right timestamp <= left timestamp (LEFT semantics — left
  * rows without a match keep NULL payload).
  *
  * This is the whole-operator custom-plan path of the preference order:
  * the composed range-join + argmax formulation fans out every left row ×
  * every earlier right row of the same key before the aggregate collapses
  * them — quadratic per hot key. The exec below is a single-pass sort-merge
  * over key-clustered, time-sorted partitions: per key it keeps ONE
  * buffered candidate row, so cost is |left| + |right| regardless of key
  * heat. Planned by [[AsOfJoinStrategy]] (registered through
  * [[GraftExtensions]]).
  *
  * `rightTiebreaks` completes (rightTs, tiebreaks...) to a deterministic
  * total order; "latest" is the maximum under that order. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTiebreaks: Seq[Expression],
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
case class AsOfJoinStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.rightTiebreaks, p.rightPayload) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on their keys (the
  * same co-partitioning contract SortMergeJoinExec uses) and sorted by
  * (keys, ts [, tiebreaks]); the merge walks both sides once per partition.
  *
  * Within one key group the left timestamps ascend, so right rows are
  * consumed monotonically: every consumed in-range row REPLACES the single
  * buffered best (sort order makes the last consumed the argmax of
  * (rightTs, tiebreaks)). Per-key state is one copied payload row — there
  * is no per-key fan-out, no wide aggregation, and memory is O(1).
  *
  * Null semantics match the composed formulation (SQL equality + `<=`):
  * null-keyed left rows and null left timestamps take NULL payload;
  * null-keyed or null-timestamp right rows never match. Both sort NULLS
  * FIRST, so the merge consumes them before any live comparison. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTiebreaks: Seq[Expression],
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of key types must match exactly")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of timestamp types must match exactly, got ${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: rightTiebreaks.map(SortOrder(_, Ascending))))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nPayload = rightPayload.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val payloadProj = UnsafeProjection.create(rightPayload, rOut)
      val lTsExpr = BindReferences.bindReference(leftTs, lOut)
      val rTsExpr = BindReferences.bindReference(rightTs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)
      val rBuf = rIter.buffered
      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = _
        private var best: UnsafeRow = _ // copied payload, latest in-range so far

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (lk.anyNull) return outProj(joined(l, nullPayload))
          if (curKey == null || keyOrd.compare(lk, curKey) != 0) {
            best = null
            curKey = lk.copy()
          }
          val lts = lTsExpr.eval(l)
          if (lts == null) return outProj(joined(l, nullPayload))
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val h = rBuf.head
            val rk = rKeyProj(h)
            if (rk.anyNull) rBuf.next() // null keys never match; sorted first
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rBuf.next() // keys with no left rows left behind
              else if (c > 0) scanning = false
              else {
                val rts = rTsExpr.eval(h)
                if (rts == null) rBuf.next() // nulls-first, never in range
                else if (tsOrd.compare(rts, lts) <= 0) {
                  best = payloadProj(rBuf.next()).copy()
                } else scanning = false
              }
            }
          }
          outProj(joined(l, if (best == null) nullPayload else best))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
