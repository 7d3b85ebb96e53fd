package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingShardsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 400L)
    .map(i => (i, Seq.fill((i % 37 + 3).toInt)("w").mkString(" "), "web"))
    .toDF("doc_id", "text", "source")

  private def planned =
    TrainingShards.plan(docs, "doc_id", "text", lit(100), "s1", 64, shardChars = 1)

  test("every doc is planned exactly once; packs start below their budget boundary") {
    val p = planned.select("doc_id", "toks", "pack", "shard").cache()
    assert(p.count() == 400L) // rate 100% keeps everything
    assert(p.select("doc_id").distinct().count() == 400L)
    // a doc's pack is determined by its START offset: start < (pack+1)*budget
    val bad = planned
      .withColumn("start",
        sum(col("toks")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("_hk", "doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .filter(coalesce(col("start"), lit(0L)) < col("pack") * 64L ||
        coalesce(col("start"), lit(0L)) >= (col("pack") + 1L) * 64L)
    assert(bad.count() == 0L)
    p.unpersist()
  }

  test("manifest is deterministic in the seed and changes with it") {
    def m(seed: String) = TrainingShards.manifest(
      TrainingShards.plan(docs, "doc_id", "text", lit(100), seed, 64, 1))
      .orderBy("shard", "pack").collect().toSeq
    assert(m("s1") == m("s1"))
    assert(m("s1") != m("s2"))
  }

  test("mix rate excludes documents reproducibly (q47 arithmetic)") {
    val kept = TrainingShards.plan(docs, "doc_id", "text", lit(50), "s1", 64, 1)
      .select("doc_id").as[Long].collect().toSet
    val expected = (1L to 400L).filter(i => ((i % 100000007L) * 2654435761L) % 100L < 50L).toSet
    assert(kept == expected)
  }

  test("raising shardChars multiplies packing parallelism without losing docs") {
    val wide = TrainingShards.plan(docs, "doc_id", "text", lit(100), "s1", 64, 2)
    assert(wide.count() == 400L)
    assert(wide.select("shard").distinct().count() > planned.select("shard").distinct().count())
  }

  test("the packing window is hash-partitioned by shard — no global window") {
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.toLowerCase.contains("singlepartition"), plan)
  }
}
