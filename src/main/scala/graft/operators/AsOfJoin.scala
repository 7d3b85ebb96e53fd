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

  private def resolve(df: DataFrame, name: String, what: String): Attribute = {
    val matches = df.queryExecution.analyzed.output.filter(_.name == name)
    matches match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"$what column '$name' not found in [${df.columns.mkString(", ")}]")
      // e.g. a self-join or a prior join leaving two columns named `name`:
      // first-match binding would silently pick a side (ADVICE r2) — fail
      // like Spark's own ambiguous-reference error instead
      case many => throw new IllegalArgumentException(
        s"$what column '$name' is ambiguous: ${many.size} attributes match " +
          s"(${many.map(a => s"$name#${a.exprId.id}").mkString(", ")})")
    }
  }

  /** When the two timestamp types differ, both sides must meet at the type
    * SQL comparison coercion would pick — the FINER one — or the `<=` flips
    * meaning: casting a right TIMESTAMP down to a left DATE truncates
    * 10:00 to midnight and matches rows plain SQL (and asOfComposed) would
    * not. Date meets timestamp at the timestamp type; anything else must
    * already match. */
  private def meetTsType(l: org.apache.spark.sql.types.DataType,
                         r: org.apache.spark.sql.types.DataType) = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    (l, r) match {
      case _ if l == r => l
      case (DateType, t @ (TimestampType | TimestampNTZType)) => t
      case (t @ (TimestampType | TimestampNTZType), DateType) => t
      // mixed LTZ/NTZ comparisons coerce to the session-zoned timestamp
      case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) => TimestampType
      case _ => throw new IllegalArgumentException(
        s"as-of timestamp types $l and $r are not comparable")
    }
  }

  /** Sort-merge as-of join via the custom plan. `rightTiebreak` completes
    * (rightTs, tiebreak...) to a deterministic total order; "latest" is its
    * maximum among in-range rows. Mismatched timestamp types are promoted
    * to their SQL-coercion meet in scratch columns (the exec requires
    * identical types, like any sort-merge key; payload columns keep their
    * own types). */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           rightCols: Seq[String], rightTiebreak: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    val ltsType = resolve(left, leftTs, "leftTs").dataType
    val rtsType = resolve(right, rightTs, "rightTs").dataType
    val meet = meetTsType(ltsType, rtsType)
    val (l0, ltsName) =
      if (ltsType == meet) (left, leftTs)
      else (left.withColumn("__asof_lts", col(leftTs).cast(meet)), "__asof_lts")
    val (r0, rtsName) =
      if (rtsType == meet) (right, rightTs)
      else (right.withColumn("__asof_rts", col(rightTs).cast(meet)), "__asof_rts")
    // prune the right side to what the exec consumes — an unknown logical
    // node is opaque to ColumnPruning, so prune explicitly
    val rPruned = r0.select((Seq(rightKey, rtsName) ++ rightTiebreak ++ rightCols)
      .distinct.map(col): _*)
    val lPlan = l0.queryExecution.analyzed
    val rPlan = rPruned.queryExecution.analyzed
    val out = GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys = Seq(resolve(l0, leftKey, "leftKey")),
      rightKeys = Seq(resolve(rPruned, rightKey, "rightKey")),
      leftTs = resolve(l0, ltsName, "leftTs"),
      rightTs = resolve(rPruned, rtsName, "rightTs"),
      rightTiebreaks = rightTiebreak.map(resolve(rPruned, _, "rightTiebreak")),
      rightPayload = rightCols.map(resolve(rPruned, _, "rightCol"))))
    if (ltsName == leftTs) out else out.drop(ltsName)
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
