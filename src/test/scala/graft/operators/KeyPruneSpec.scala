package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The guard joins' id-span pruning (VERDICT r10's scale-killer fix):
  * the span predicate must reach the parquet scan as pushed filters —
  * that is the entire mechanism by which an append guard stops paying
  * an O(corpus) codes pass — and the span semantics must be exact
  * (equality joins lose nothing to the pruning). */
class KeyPruneSpec extends SparkSpec {
  import spark.implicits._

  test("span predicate reaches the parquet scan as pushed filters") {
    val wh = java.nio.file.Files.createTempDirectory("graft_kp").toString
    (1L to 1000L).map(i => (i, s"p$i")).toDF("id", "payload")
      .sortWithinPartitions($"id").write.parquet(s"$wh/t")
    val stored = spark.read.parquet(s"$wh/t")
    val batch = Seq(2001L, 2002L, 2003L).toDF("id")
    val pruned = KeyPrune.toKeySpan(stored, "id", batch, "id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(id,2001)") &&
      plan.contains("LessThanOrEqual(id,2003)"),
      s"span must be pushed to the scan:\n$plan")
    // the all-new-monotone-ids shape: nothing survives the span
    assert(pruned.isEmpty)
  }

  test("pruning is exact for equality joins: pruned-join ≡ unpruned-join") {
    val wh = java.nio.file.Files.createTempDirectory("graft_kp2").toString
    (1L to 500L).map(i => (i, i * 10)).toDF("id", "v")
      .write.parquet(s"$wh/t")
    val stored = spark.read.parquet(s"$wh/t")
    // re-delivery mix: some existing (interleaved), some new, a null
    val batch = (Seq(7L, 123L, 499L, 9999L).map(Option(_)) :+ None)
      .toDF("id")
    val viaPrune = KeyPrune.toKeySpan(stored, "id", batch, "id")
      .join(batch, Seq("id")).select($"id", $"v")
      .as[(Long, Long)].collect().toSet
    val direct = stored.join(batch, Seq("id")).select($"id", $"v")
      .as[(Long, Long)].collect().toSet
    assert(viaPrune == direct && viaPrune == Set((7L, 70L), (123L, 1230L), (499L, 4990L)))
  }

  test("empty and all-null batches prune everything") {
    val wh = java.nio.file.Files.createTempDirectory("graft_kp3").toString
    (1L to 10L).map(i => (i, i)).toDF("id", "v").write.parquet(s"$wh/t")
    val stored = spark.read.parquet(s"$wh/t")
    assert(KeyPrune.toKeySpan(stored, "id",
      spark.emptyDataset[Long].toDF("id"), "id").isEmpty)
    assert(KeyPrune.toKeySpan(stored, "id",
      Seq(Option.empty[java.lang.Long]).toDF("id"), "id").isEmpty)
  }
}
