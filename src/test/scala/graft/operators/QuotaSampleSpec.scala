package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuotaSampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 300L)
    .map(i => (i, if (i <= 280) s"g${i % 4}" else "tiny")) // 'tiny' has 20 rows
    .toDF("id", "g")

  test("exactly n per stratum; undersized strata keep everything") {
    val got = QuotaSample.perGroup(docs, "g", "id", 25, "s1")
    val counts = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts == Map("g0" -> 25L, "g1" -> 25L, "g2" -> 25L, "g3" -> 25L,
      "tiny" -> 20L))
  }

  test("bounded aggregator selects the identical sample as the window formulation") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy(concat(md5(concat(lit("s1/"), $"id".cast("string"))),
        lit("/"), $"id".cast("string")))
    val viaWindow = docs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 25).select($"g", $"id".cast("string").as("id_str"))
      .as[(String, String)].collect().toSet
    val viaAgg = QuotaSample.perGroup(docs, "g", "id", 25, "s1")
      .as[(String, String)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("deterministic in the seed, different across seeds") {
    def s(seed: String) = QuotaSample.perGroup(docs, "g", "id", 10, seed)
      .as[(String, String)].collect().toSet
    assert(s("a") == s("a"))
    assert(s("a") != s("b"))
  }

  test("plan is a hash aggregate, not a per-group sort window") {
    val plan = QuotaSample.perGroup(docs, "g", "id", 5, "s1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window would ship full groups:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
  }
}
