package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming: gap-based sessionization of the events stream
  * with `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the
  * engine exposes for semantics no built-in window covers (SURVEY §2.8
  * extension beyond the reference's per-day bucketing).
  *
  * A session closes when no event arrives for `gap` (event-time, enforced
  * via EventTimeTimeout + watermark). State per user is O(1) (bounds, count,
  * value sum) — safe at any key cardinality.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, nEvents: Long, totalValue: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                     n_events: Long, total_value: Double)

  def sessions(events: Dataset[Event], gap: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    // Spark's own interval→duration conversion, so the in-state gap uses
    // the SAME length as the withWatermark/EventTimeTimeout delay below
    // (.microseconds alone reads 0 for "1 day"; a hand-rolled 30-day month
    // would disagree with Spark's 31-day month in the watermark).
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .getDuration(iv, java.util.concurrent.TimeUnit.MILLISECONDS)
    require(gapMs > 0, s"session gap must be positive, got '$gap'")

    events
      .withWatermark("ts", gap)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastTs), s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
                    nEvents = s.nEvents + 1, totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastTs), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch gap-sessionization — the window-function analog of [[sessions]]
    * (lag to flag gap breaks, running sum to number sessions, then one
    * hash aggregate per (user, session)). Same semantics on a static
    * table, ANSI-expressible, and therefore the oracle-checkable
    * verification of the streaming form: session structure depends only on
    * the per-user timestamp MULTISET (equal-timestamp peers land in the
    * same RANGE frame in every engine), so batch and stream agree run to
    * run. One shuffle on the user key serves both windows and the final
    * aggregate. */
  def batchSessions(events: org.apache.spark.sql.DataFrame, userCol: String,
                    tsCol: String, valueCol: String,
                    gap: String = "30 minutes"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .getDuration(iv, java.util.concurrent.TimeUnit.MICROSECONDS)
    require(gapUs > 0, s"session gap must be positive, got '$gap'")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
    events
      .withColumn("_us", us)
      .withColumn("_prev", lag(col("_us"), 1).over(w))
      .withColumn("_brk",
        when(col("_prev").isNull || col("_us") - col("_prev") > gapUs, 1L).otherwise(0L))
      .withColumn("_sess", sum(col("_brk")).over(w))
      .groupBy(col(userCol), col("_sess"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("total_value"))
      .drop("_sess")
  }
}
