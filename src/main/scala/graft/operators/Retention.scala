package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — users grouped by the day of their FIRST
  * event, activity tracked in week offsets from that personal start:
  * the "do users come back?" matrix every product-analytics engine
  * ships, and the engagement-weighting signal a training-data pipeline
  * uses to upweight sources whose consumers return.
  *
  * Three hash aggregates, no windows, nothing driver-side:
  *   1. first-touch: min(ts) per user (one exchange on user)
  *   2. activity: distinct (user, day) (exchange on the pair; the
  *      distinct collapses per-day event multiplicity BEFORE the join,
  *      so the join input is bounded by user-days, not events)
  *   3. join activity to first-touch on user (co-partitioned with #1's
  *      output partitioning) and aggregate by (cohort_day, week_offset)
  * Cohort sizes ride along via a count over #1 — a cohort-day-sized
  * frame, broadcast into the final result. At 100 TB of events the
  * cost is the two key exchanges; the final (cohort, offset) grid is
  * tiny by construction (days × weeks). */
object Retention {

  /** (cohort_day, week_offset, active_users, cohort_size, retention):
    * distinct users of cohort_day active in week `week_offset` after
    * their first event. Row (d, 0) always exists with retention 1.0's
    * numerator ≤ cohort (exactly the cohort when offset-0 activity is
    * the first event itself, which it is by construction). */
  def cohortWeekly(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val evts = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val first = evts.groupBy(col(userCol).as("user"))
      .agg(to_date(min(col(tsCol))).as("cohort_day"))
    val sizes = first.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    val activity = evts
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    activity.join(first, Seq("user"))
      .select(col("user"), col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7.0)
          .cast("bigint").as("week_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("week_offset"), col("active_users"),
        col("cohort_size"),
        round(col("active_users").cast("double") / col("cohort_size"), 4)
          .as("retention"))
  }
}
