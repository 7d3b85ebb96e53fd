package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with matching
  * key and right-timestamp <= left-timestamp.
  *
  * Built per the custom-operator preference order: the semantics ARE
  * expressible by composing built-ins (range equi-join + max_by per left
  * row), so no custom LogicalPlan/Strategy is needed — Catalyst plans the
  * key join as hash/sort-merge and the per-row argmax as a partial+final
  * aggregate. A dedicated sort-merge AsOfJoinExec (zipPartitions over
  * key-sorted sides) is the upgrade path if the range join's fan-out ever
  * dominates at scale; the API here would not change.
  */
object AsOfJoin {

  /** Left rows with no matching right row are kept with NULLs (LEFT as-of).
    * `rightCols` are the right-side payload columns to surface, taken from
    * the latest matching right row; `rightOrd` must be a deterministic
    * total order (include a unique tiebreak column). Left rows must be
    * unique (they are the group key of the argmax aggregate). */
  def asOf(left: DataFrame, right: DataFrame,
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
