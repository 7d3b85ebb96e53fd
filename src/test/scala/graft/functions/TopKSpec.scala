package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps k best by (score desc, id asc) with deterministic ties") {
    val df = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.9), (1L, 13L, 0.1),
      (2L, 20L, 0.5)
    ).toDF("g", "id", "score")
    val out = df.groupBy($"g").agg(TopK.topK(2)($"id", $"score").as("tk"))
      .select($"g", $"tk").as[(Long, Seq[(Long, Double)])].collect().toMap
    // tie on 0.9 broken by id asc: 10 before 12
    assert(out(1L) == Seq((10L, 0.9), (12L, 0.9)))
    assert(out(2L) == Seq((20L, 0.5)))
  }

  test("topTerms equals the window row_number formulation") {
    val df = Seq(
      ("a", "x", 5L), ("a", "y", 5L), ("a", "z", 9L), ("a", "w", 1L),
      ("b", "x", 2L)
    ).toDF("g", "term", "cnt")
    val out = df.groupBy($"g").agg(TopK.topTerms(2)($"term", $"cnt").as("tk"))
      .select($"g", $"tk").as[(String, Seq[(String, Long)])].collect().toMap
    // (cnt desc, term asc): z(9) first, then the 5-tie broken x before y
    assert(out("a") == Seq(("z", 9L), ("x", 5L)))
    assert(out("b") == Seq(("x", 2L)))
  }

  test("aggregator merge respects bound and order across partitions") {
    val big = spark.range(0, 10000).select(
      (col("id") % 7).as("g"), col("id").as("id"),
      (col("id") % 1000).cast("double").as("score"))
      .repartition(8)
    val out = big.groupBy($"g").agg(TopK.topK(3)($"id", $"score").as("tk"))
      .select($"g", $"tk").as[(Long, Seq[(Long, Double)])].collect()
    out.foreach { case (_, tk) =>
      assert(tk.size == 3)
      assert(tk == tk.sortBy(p => (-p._2, p._1)), "output must be sorted (score desc, id asc)")
      assert(tk.head._2 == 999.0)
    }
  }
}
