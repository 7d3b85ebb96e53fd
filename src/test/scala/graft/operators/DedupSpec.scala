package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    // (id, key1, key2, payload) — id is arrival order
    (1L, "a", "x", 10.0),
    (2L, "a", "x", 20.0),   // dup of (a,x) — must lose to id=1
    (3L, "b", "x", 30.0),
    (4L, null.asInstanceOf[String], "x", 40.0), // null key part
    (5L, null.asInstanceOf[String], "x", 50.0), // null key part — kept too
    (6L, "b", null.asInstanceOf[String], 60.0)  // null key part — kept
  ).toDF("id", "k1", "k2", "v")

  test("firstWins keeps the lowest-order row per key") {
    val out = Dedup.firstWins(sample.filter($"k1".isNotNull && $"k2".isNotNull),
      Seq("k1", "k2"), "id")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("firstWins is idempotent") {
    val once = Dedup.firstWins(sample, Seq("k1"), "id")
    val twice = Dedup.firstWins(once, Seq("k1"), "id")
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("compositeKeyDedup bypasses rows with any null key part (ref :538-540)") {
    val out = Dedup.compositeKeyDedup(sample, Seq("k1", "k2"), "id")
    // dedup drops id=2 only; ids 4,5,6 bypass dedup despite colliding nulls
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("distinctRows removes exact duplicate rows") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("x", "y")
    assert(Dedup.distinctRows(df).count() == 2)
  }
}
