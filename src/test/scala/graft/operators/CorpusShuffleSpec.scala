package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 500L).toDF("id")

  test("shuffled order is deterministic and seed-dependent") {
    val a = CorpusShuffle.shuffled(docs, "id", "s1", 8).select("id").as[Long].collect().toSeq
    val b = CorpusShuffle.shuffled(docs, "id", "s1", 8).select("id").as[Long].collect().toSeq
    val c = CorpusShuffle.shuffled(docs, "id", "s2", 8).select("id").as[Long].collect().toSeq
    assert(a == b, "same seed must reproduce the same permutation")
    assert(a != c, "different seed must produce a different permutation")
    assert(a.sorted == (1L to 500L), "permutation must preserve the corpus")
  }

  test("order equals sorting by the md5 permutation key") {
    val expected = docs.withColumn("h", CorpusShuffle.shuffleKey($"id", "s1"))
      .orderBy("h", "id").select("id").as[Long].collect().toSeq
    val got = CorpusShuffle.shuffled(docs, "id", "s1", 8).select("id").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("output schema equals the input schema (no internal column leaks into shards)") {
    assert(CorpusShuffle.shuffled(docs, "id", "s1", 8).schema == docs.schema)
  }

  test("plan is a range partition + local sort, never a global window or single partition") {
    val plan = CorpusShuffle.shuffled(docs, "id", "s1", 8)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(!plan.contains("Window"), s"global window would single-task the corpus:\n$plan")
    assert(!plan.toLowerCase.contains("singlepartition"), plan)
  }

  test("shardStats partitions the corpus exactly (counts sum, boundaries ordered)") {
    val stats = CorpusShuffle.shardStats(docs, "id", "s1")
      .orderBy("shard")
      .select("shard", "n_docs", "min_key", "max_key")
      .as[(String, Long, String, String)].collect().toSeq
    assert(stats.map(_._2).sum == 500L)
    stats.foreach { case (shard, _, lo, hi) =>
      assert(lo.startsWith(shard) && hi.startsWith(shard) && lo <= hi)
    }
    // shard of a doc is re-derivable standalone: audit one id
    val one = docs.filter($"id" === 7L)
      .select(CorpusShuffle.shardOf($"id", "s1")).as[String].head()
    assert(stats.exists(_._1 == one))
  }
}
