package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def olds = Seq(
    (1L, Option("a"), Option(10L)),
    (2L, Option("b"), Option(20L)),
    (3L, Option("c"), Option(30L)),   // deleted in new
    (4L, None, Option(40L)),          // null → value = update
    (5L, Option("e"), None)           // unchanged (null payload survives <=>)
  ).toDF("k", "s", "v")

  private def news = Seq(
    (1L, Option("a"), Option(10L)),   // unchanged → dropped
    (2L, Option("B"), Option(20L)),   // payload change = update
    (4L, Option("d"), Option(40L)),   // null→'d' = update
    (5L, Option("e"), None),          // unchanged incl. null = dropped
    (6L, Option("f"), Option(60L))    // insert
  ).toDF("k", "s", "v")

  private def result = SnapshotDiff.diff(olds, news, Seq("k"))
    .select("k", "change_type", "old_s", "new_s")
    .as[(Long, String, Option[String], Option[String])].collect()
    .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("classifies insert/update/delete and drops unchanged rows") {
    assert(result.keySet == Set(2L, 3L, 4L, 6L)) // 1 and 5 unchanged
    assert(result(2L) == (("update", Some("b"), Some("B"))))
    assert(result(3L) == (("delete", Some("c"), None)))
    assert(result(4L) == (("update", None, Some("d"))))
    assert(result(6L) == (("insert", None, Some("f"))))
  }

  test("null-to-null payload is NOT a change; null-to-value is") {
    assert(!result.contains(5L))
    assert(result(4L)._1 == "update")
  }

  test("null keys join null-safely (one null-key row per side = same entity)") {
    val o = Seq((Option(1L), "x"), (None, "y")).toDF("k", "s")
    val n = Seq((Option(1L), "x"), (None, "z")).toDF("k", "s")
    val diff = SnapshotDiff.diff(o, n, Seq("k"))
      .select("change_type").as[String].collect().toSeq
    assert(diff == Seq("update")) // null key matched null key; payload changed
  }

  test("plan is a shuffle join on the key, not a nested loop or broadcast") {
    val plan = SnapshotDiff.diff(olds, news, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("diff feeds Upsert.merge: applying the diff to old reproduces new (minus deletes)") {
    val changes = SnapshotDiff.diff(olds, news, Seq("k"))
    val batch = changes.filter($"change_type" =!= "delete")
      .select($"k", $"new_s".as("s"), $"new_v".as("v"))
    val applied = Upsert.merge(olds, batch, Seq("k"))
    val deleted = changes.filter($"change_type" === "delete").select("k")
    val reconciled = applied.join(deleted, Seq("k"), "left_anti")
      .orderBy("k").as[(Long, Option[String], Option[Long])].collect().toSeq
    val expected = news.orderBy("k")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(reconciled == expected)
  }

  test("reserved marker/output column names are rejected (ADVICE r7 #4)") {
    val bad = olds.withColumn("change_type", lit("x"))
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(bad, news, Seq("k"))
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // case-insensitive, matching the default resolver
    val bad2 = news.withColumn("_Present_New", lit(true))
    intercept[IllegalArgumentException] { SnapshotDiff.diff(olds, bad2, Seq("k")) }
  }
}
