package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — "of the users who
  * did A, how many then did B, then C, within H hours of entering?" —
  * the conversion question every event-analytics engine answers, and a
  * shape worth getting right at scale because the naive formulation is
  * k sequential shuffles (one aggregate+join per step).
  *
  * This implementation is ONE exchange for any number of steps: events
  * are filtered to the step types in the scan (predicate pushdown),
  * hash-aggregated once per user into per-step timestamp arrays, and
  * the sequential-reachability recurrence
  *
  *   t₁ = min ts of step 1
  *   tᵢ = min { ts of step i : ts ≥ tᵢ₋₁ and ts ≤ t₁ + H }   (i ≥ 2)
  *
  * is evaluated per user as a chain of `array_min(filter(...))`
  * expressions in the aggregate's output projection — codegen'd, no
  * second shuffle, no window. A user's state is bounded by their own
  * step-type event count (funnel steps are a small subset of the event
  * vocabulary); for pathological heavy users the sequential-join
  * formulation (the oracle's shape) bounds memory instead at the cost
  * of k shuffles — same recurrence, same result.
  *
  * `≥` (not `>`) lets a single event timestamp satisfy consecutive
  * steps when ties occur, and the horizon is anchored at FUNNEL ENTRY
  * (t₁), the standard attribution-window semantics. */
object Funnel {

  /** Per-user earliest completion time of each step: columns
    * (user, ts_1 .. ts_k), null from the first uncompleted step on.
    * Users with no step-1 event are absent. */
  def userSteps(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, steps: Seq[String],
                horizonHours: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, s"duplicate step types: $steps")
    horizonHours.foreach(h => require(h > 0, s"horizonHours must be > 0: $h"))
    val arrs = steps.zipWithIndex.map { case (st, i) =>
      // collect_list drops the nulls the when() leaves on other types
      collect_list(when(col(typeCol) === st, col(tsCol))).as(s"_a${i + 1}")
    }
    val perUser = events
      .filter(col(typeCol).isin(steps: _*) &&
        col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("user"))
      .agg(arrs.head, arrs.tail: _*)
    val deadline: Column => Column = t1 => horizonHours match {
      case Some(h) => t1 + expr(s"INTERVAL $h HOURS")
      case None    => lit(null).cast("timestamp")
    }
    // fold the recurrence left-to-right; each tᵢ references tᵢ₋₁ by name
    val withT1 = perUser.withColumn("ts_1", array_min(col("_a1")))
    val out = steps.indices.drop(1).foldLeft(withT1) { case (df, i) =>
      val prev = col(s"ts_$i")
      val dl = deadline(col("ts_1"))
      df.withColumn(s"ts_${i + 1}", array_min(filter(col(s"_a${i + 1}"),
        t => t >= prev && (dl.isNull || t <= dl))))
    }
    out.filter(col("ts_1").isNotNull)
      .select(col("user") +: steps.indices.map(i => col(s"ts_${i + 1}")): _*)
  }

  /** Step-level conversion report: one row per step with the user count
    * reaching it and conversion vs the first and previous steps. */
  def report(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             horizonHours: Option[Int] = None): DataFrame = {
    val per = userSteps(events, userCol, typeCol, tsCol, steps, horizonHours)
    // count(when(...)), not sum(when(...)): over an EMPTY per-user frame
    // sum() is null while the oracle's sequential-join counts are 0 —
    // count() gives the 0 both sides agree on
    val counts = per.agg(
      count(when(col("ts_1").isNotNull, 1)).as("u_1"),
      steps.indices.drop(1).map(i =>
        count(when(col(s"ts_${i + 1}").isNotNull, 1)).as(s"u_${i + 1}")): _*)
    // 1-row frame → explode into one row per step; divisions guarded so
    // an empty cohort yields nulls, not an engine-dependent 0/0
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val u = col(s"u_${i + 1}")
      val first = col("u_1")
      val prevU = if (i == 0) col("u_1") else col(s"u_$i")
      struct(
        lit(i + 1).cast("int").as("step_idx"), lit(st).as("step"),
        u.as("users"),
        when(first > 0, round(u.cast("double") / first, 4)).as("conv_vs_first"),
        when(prevU > 0, round(u.cast("double") / prevU, 4)).as("conv_vs_prev"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy(col("step_idx"))
  }
}
