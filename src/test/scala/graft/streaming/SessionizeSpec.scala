package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap sessionization closes sessions on inactivity and merges bursts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(mem.toDS(), gap = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: burst of 3 events within gaps, then silence; user 2: single event
    mem.addData(
      Sessionize.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Sessionize.Event(1L, ts("2024-01-01 10:10:00"), 2.0),
      Sessionize.Event(1L, ts("2024-01-01 10:20:00"), 3.0),
      Sessionize.Event(2L, ts("2024-01-01 10:00:00"), 9.0))
    q.processAllAvailable()
    // advance event time far past the gap so the sessions time out
    mem.addData(Sessionize.Event(3L, ts("2024-01-01 12:00:00"), 0.0))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(3L, ts("2024-01-01 14:00:00"), 0.0))
    q.processAllAvailable()

    val sessions = spark.sql("SELECT * FROM sessions").as[Sessionize.Session]
      .collect().toSeq
    q.stop()
    val u1 = sessions.filter(_.user_id == 1L)
    assert(u1.size == 1)
    assert(u1.head.n_events == 3 && u1.head.total_value == 6.0)
    assert(u1.head.session_start == ts("2024-01-01 10:00:00"))
    assert(u1.head.session_end == ts("2024-01-01 10:20:00"))
    val u2 = sessions.filter(_.user_id == 2L)
    assert(u2.size == 1 && u2.head.n_events == 1)
  }

  test("day-granularity gaps parse to a positive duration (not microseconds-only)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    // would throw require(gapMs > 0) before the fix ("1 day" lives in the
    // interval's days field, microseconds-only parsing read 0)
    val out = Sessionize.sessions(mem.toDS(), gap = "1 day")
    assert(out.isStreaming)
  }

  test("events split by more than the gap form separate sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(mem.toDS(), gap = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    mem.addData(
      Sessionize.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Sessionize.Event(1L, ts("2024-01-01 10:30:00"), 2.0)) // > 10 min later
    q.processAllAvailable()
    mem.addData(Sessionize.Event(9L, ts("2024-01-01 13:00:00"), 0.0))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(9L, ts("2024-01-01 15:00:00"), 0.0))
    q.processAllAvailable()
    val sessions = spark.sql("SELECT * FROM sessions2 WHERE user_id = 1")
      .as[Sessionize.Session].collect().toSeq
    q.stop()
    assert(sessions.size == 2, s"expected 2 sessions, got $sessions")
  }

  test("batchSessions agrees with the streaming sessionizer") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 10:20:00"), 3.0),
      (1L, ts("2024-01-01 11:30:00"), 4.0), // > 30 min after 10:20 — new session
      (2L, ts("2024-01-01 10:00:00"), 9.0),
      (3L, ts("2024-01-01 09:00:00"), 5.0),
      (3L, ts("2024-01-01 09:00:00"), 6.0)) // equal-ts peers: one session
      .toDF("user_id", "ts", "value")
    val out = Sessionize.batchSessions(events, "user_id", "ts", "value", "30 minutes")
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 3L, 6.0),
      (1L, ts("2024-01-01 11:30:00"), ts("2024-01-01 11:30:00"), 1L, 4.0),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 1L, 9.0),
      (3L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 2L, 11.0)))
  }

  test("batchSessions single shuffle: both windows and the aggregate share one exchange") {
    val events = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("user_id", "ts", "value")
    val plan = Sessionize.batchSessions(events, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash exchange, got $exchanges:\n$plan")
  }
}
