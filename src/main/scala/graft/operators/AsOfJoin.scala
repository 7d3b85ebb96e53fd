package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinPlan

/** As-of join: for each left row, attach the latest right row with matching
  * key and right-timestamp <= left-timestamp (LEFT semantics — unmatched
  * left rows keep NULL payload).
  *
  * Two implementations:
  *  - [[asOf]] — a dedicated sort-merge exec (graft.plans.AsOfJoinExec):
  *    children hash-clustered on key and sorted by (key, ts), merged in one
  *    pass with a single buffered candidate per key. Cost |L| + |R| per
  *    partition regardless of key heat.
  *  - [[asOfComposed]] — range equi-join + max_by argmax from built-ins.
  *    Correct, but fans out |matches per left row| before aggregating —
  *    quadratic per hot key. Kept as the cross-check reference.
  */
object AsOfJoin {

  private def resolve(df: DataFrame, name: String, what: String): Attribute =
    df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"$what column '$name' not found in [${df.columns.mkString(", ")}]"))

  /** Sort-merge as-of join via the custom plan. `rightTiebreak` completes
    * (rightTs, tiebreak...) to a deterministic total order; "latest" is its
    * maximum among in-range rows. The right timestamp is cast to the left
    * timestamp's type up front (the exec requires identical types, like any
    * sort-merge key). */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           rightCols: Seq[String], rightTiebreak: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    val ltsType = resolve(left, leftTs, "leftTs").dataType
    // cast into a scratch column so a payload column keeps its own type
    val (r0, rtsName) =
      if (resolve(right, rightTs, "rightTs").dataType == ltsType) (right, rightTs)
      else (right.withColumn("__asof_rts", col(rightTs).cast(ltsType)), "__asof_rts")
    // prune the right side to what the exec consumes — an unknown logical
    // node is opaque to ColumnPruning, so prune explicitly
    val rPruned = r0.select((Seq(rightKey, rtsName) ++ rightTiebreak ++ rightCols)
      .distinct.map(col): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rPruned.queryExecution.analyzed
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys = Seq(resolve(left, leftKey, "leftKey")),
      rightKeys = Seq(resolve(rPruned, rightKey, "rightKey")),
      leftTs = resolve(left, leftTs, "leftTs"),
      rightTs = resolve(rPruned, rtsName, "rightTs"),
      rightTiebreaks = rightTiebreak.map(resolve(rPruned, _, "rightTiebreak")),
      rightPayload = rightCols.map(resolve(rPruned, _, "rightCol"))))
  }

  /** Composed-from-built-ins reference implementation (range equi-join +
    * argmax). `rightOrd` must be a deterministic total order (include a
    * unique tiebreak column). Left rows must be unique (they are the group
    * key of the argmax aggregate). */
  def asOfComposed(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTs: Column, rightTs: Column,
                   rightCols: Seq[String], rightOrd: Seq[Column]): DataFrame = {
    val leftCols = left.columns.toSeq
    val joined = left.join(right, leftKey === rightKey && rightTs <= leftTs, "left")
    val payload = struct(rightCols.map(col): _*)
    // max_by ignores null-ordered rows, so unmatched (all-null right side)
    // groups surface a NULL payload — LEFT semantics preserved.
    val aggs = max_by(payload, struct(rightOrd: _*)).as("_best")
    joined
      .groupBy(leftCols.map(col): _*)
      .agg(aggs)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"_best.$c").as(c)): _*)
  }
}
