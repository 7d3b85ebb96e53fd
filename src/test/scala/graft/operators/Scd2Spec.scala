package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def log = Seq(
    (1L, ts("2024-01-01 00:00:00"), 101L, "O"),
    (1L, ts("2024-01-05 00:00:00"), 102L, "O"), // consecutive dup — collapsed
    (1L, ts("2024-02-01 00:00:00"), 103L, "F"),
    (1L, ts("2024-03-01 00:00:00"), 104L, "O"), // back to O = NEW segment
    (2L, ts("2024-01-02 00:00:00"), 201L, "P")
  ).toDF("k", "ts", "tie", "v")

  private def history = Scd2.fromChangeLog(log, "k", "ts", "tie", Seq("v"))

  test("collapses consecutive duplicates, reopens on value return") {
    val h = history.orderBy("k", "valid_from")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Int)].collect().toSeq
    assert(h == Seq(
      (1L, "O", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), 0),
      (1L, "F", ts("2024-02-01 00:00:00"), Some(ts("2024-03-01 00:00:00")), 0),
      (1L, "O", ts("2024-03-01 00:00:00"), None, 1),
      (2L, "P", ts("2024-01-02 00:00:00"), None, 1)))
  }

  test("validity intervals tile each key's timeline without gaps") {
    val segs = history.orderBy("k", "valid_from")
      .select("k", "valid_from", "valid_to")
      .as[(Long, Timestamp, Option[Timestamp])].collect().toSeq
    segs.groupBy(_._1).values.foreach { ss =>
      ss.sliding(2).foreach {
        case Seq((_, _, Some(end)), (_, from, _)) => assert(end == from)
        case _ => ()
      }
      assert(ss.last._3.isEmpty) // exactly the last segment is open
      assert(ss.init.forall(_._3.nonEmpty))
    }
  }

  test("a first row with all-null attributes is kept as a real segment") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), 1L, Option.empty[String]),
      (1L, ts("2024-02-01 00:00:00"), 2L, Option("x"))).toDF("k", "ts", "tie", "v")
    val h = Scd2.fromChangeLog(l, "k", "ts", "tie", Seq("v"))
      .orderBy("valid_from").select("v", "is_current")
      .as[(Option[String], Int)].collect().toSeq
    assert(h == Seq((None, 0), (Some("x"), 1)))
  }

  test("same-timestamp changes are ordered by the tie-break, reproducibly") {
    val l = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "A")).toDF("k", "ts", "tie", "v")
    val h = Scd2.fromChangeLog(l, "k", "ts", "tie", Seq("v"))
      .orderBy("valid_from", "v").select("v", "is_current")
      .as[(String, Int)].collect().toSeq
    assert(h == Seq(("A", 0), ("B", 1))) // tie=1 first, tie=2 current
  }

  test("asOf returns the segment in force at a point in time") {
    val at = Scd2.asOf(history, lit(ts("2024-02-15 00:00:00")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(at == Set((1L, "F"), (2L, "P")))
    val before = Scd2.asOf(history, lit(ts("2023-12-31 00:00:00")))
    assert(before.count() == 0)
  }

  test("plan has ONE exchange and ONE sort (second window reuses the first's layout)") {
    val plan = history.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 key exchange, plan:\n$plan")
    assert(sorts == 1, s"expected 1 per-key sort, plan:\n$plan")
  }
}
