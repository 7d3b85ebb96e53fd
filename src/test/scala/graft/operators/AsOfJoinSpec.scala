package graft.operators

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before the left timestamp") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "C", ts("2024-01-01 10:00:10"))  // no quotes for C
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:03"), 101.0),
      ("A", ts("2024-01-01 10:00:07"), 102.0), // after trade 1 — must not match
      ("B", ts("2024-01-01 09:59:00"), 50.0)
    ).toDF("qsym", "qt", "price")

    val df = AsOfJoin.asOf(trades, quotes,
      leftKey = "sym", rightKey = "qsym",
      leftTs = "t", rightTs = "qt",
      rightCols = Seq("qt", "price"),
      rightTiebreak = Seq("price"))
    val out = df
      .select($"trade_id", $"price")
      .as[(Long, Option[Double])].collect().toMap

    assert(out(1L).contains(101.0)) // latest quote <= 10:00:05
    assert(out(2L).contains(100.0)) // exactly at-or-before 10:00:00
    assert(out(3L).contains(50.0))
    assert(out(4L).isEmpty, "no matching right rows -> NULL payload")
  }

  test("duplicate column names fail loudly instead of binding an arbitrary side") {
    val left = Seq((1L, "A", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    // a prior join leaving TWO columns named `t`
    val dupT = left.crossJoin(Seq(ts("2024-01-01 09:00:00")).toDF("t"))
    val right = Seq(("A", ts("2024-01-01 09:30:00"), 1.0)).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(dupT, right, "k", "rk", "t", "rt", Seq("v"), Seq("v"))
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("asOf plans as the sort-merge AsOfJoinExec, not a range join") {
    val left = Seq((1L, "A", ts("2024-01-01 00:00:10"))).toDF("id", "k", "t")
    val right = Seq(("A", ts("2024-01-01 00:00:01"), 7L)).toDF("rk", "rt", "pid")
    val plan = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
      Seq("pid"), Seq("pid")).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not fan out through a generic join:\n$plan")
  }

  test("ties on the timestamp break deterministically via the tiebreak") {
    val left = Seq((1L, "A", ts("2024-01-01 00:00:10"))).toDF("id", "k", "t")
    val right = Seq(
      ("A", ts("2024-01-01 00:00:01"), 7L),
      ("A", ts("2024-01-01 00:00:01"), 9L)
    ).toDF("rk", "rt", "payload_id")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
      Seq("payload_id"), Seq("payload_id"))
      .select("payload_id").as[Long].collect()
    assert(out.toSeq == Seq(9L), "max tiebreak must pick the larger payload_id")
  }

  test("coarser LEFT timestamp promotes up — a later-in-day right row must not match") {
    // left DATE 2024-01-02 coerces to midnight; right 10:00 the same day is
    // AFTER it. Casting right down to DATE instead would truncate and match.
    val left = Seq((1L, "A", java.sql.Date.valueOf("2024-01-02"))).toDF("id", "k", "d")
    val right = Seq(
      ("A", ts("2024-01-02 10:00:00"), 9L),  // after left midnight: no match
      ("A", ts("2024-01-01 23:00:00"), 5L)   // before: the latest valid row
    ).toDF("rk", "rt", "pid")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "d", "rt",
      Seq("pid"), Seq("pid"))
      .select("pid").as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(5L)),
      "SQL coercion promotes DATE to timestamp-at-midnight; 10:00 must not match")
  }

  test("right timestamp of a different type is cast without touching payload") {
    val left = Seq((1L, "A", ts("2024-01-02 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(("A", java.sql.Date.valueOf("2024-01-01"), 5L))
      .toDF("rk", "rd", "pid")
    val df = AsOfJoin.asOf(left, right, "k", "rk", "t", "rd",
      Seq("rd", "pid"), Seq("pid"))
    assert(df.schema("rd").dataType == org.apache.spark.sql.types.DateType,
      "payload column must keep its original type")
    val out = df.select("pid").as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(5L)))
  }
}
