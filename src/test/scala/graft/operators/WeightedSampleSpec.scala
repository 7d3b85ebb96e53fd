package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("sample: equals the window formulation it replaces (exact ranking)") {
    val df = (1L to 500L).map(i => (i, (i % 17 + 1).toDouble)).toDF("id", "w")
    val got = WeightedSample.sample(df, "id", "w", k = 25, seed = "s1")
      .as[(Int, Long, Double)].collect().toSeq
    // reference: full-sort window over the same priority formula
    val denom = 4503599627370496.0
    val u = (conv(substring(md5(concat(lit("s1/"), col("id").cast("string"))),
      1, 13), 16, 10).cast("long") + 1).cast("double") / lit(denom)
    val ref = df.withColumn("_key", log(u) / col("w"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("_key").desc, col("id").asc)))
      .filter(col("rank") <= 25)
      .select(col("rank"), col("id"), round(col("_key"), 6).as("key"))
      .as[(Int, Long, Double)].collect().toSeq
    assert(got === ref)
  }

  test("sample: deterministic in seed; different seeds differ") {
    val df = (1L to 300L).map(i => (i, 1.0 + (i % 5))).toDF("id", "w")
    val a = WeightedSample.sample(df, "id", "w", 20, "seedA").collect()
    val b = WeightedSample.sample(df, "id", "w", 20, "seedA").collect()
    val c = WeightedSample.sample(df, "id", "w", 20, "seedB")
      .select("id").as[Long].collect().toSet
    assert(a.toSeq === b.toSeq)
    assert(c !== a.map(_.getLong(1)).toSet)
  }

  test("sample: weights bias inclusion (100x weight dominates)") {
    // 50 heavy rows (w=100) among 950 light rows (w=1): heavies should
    // take a large majority of a k=50 sample (each heavy beats each
    // light w.p. 100/101)
    val df = ((1L to 50L).map(i => (i, 100.0)) ++
      (51L to 1000L).map(i => (i, 1.0))).toDF("id", "w")
    val ids = WeightedSample.sample(df, "id", "w", 50, "bias")
      .select("id").as[Long].collect().toSet
    val heavies = ids.count(_ <= 50L)
    assert(heavies >= 35, s"expected heavy majority, got $heavies/50")
  }

  test("sample: null/non-positive weights and null ids excluded") {
    val df = Seq((Some(1L), Some(5.0)), (Some(2L), Some(0.0)),
      (Some(3L), None), (None, Some(4.0)), (Some(5L), Some(-1.0)),
      (Some(6L), Some(2.0))).toDF("id", "w")
    val ids = WeightedSample.sample(df, "id", "w", 10, "x")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 6L))
  }

  test("perGroup: k per group, no window in the plan") {
    val df = (1L to 400L).map(i => (s"g${i % 4}", i, 1.0 + (i % 7)))
      .toDF("g", "id", "w")
    val rpt = WeightedSample.perGroup(df, "g", "id", "w", 5, "pg")
    val rows = rpt.as[(String, Int, Long, Double)].collect().toSeq
    assert(rows.groupBy(_._1).forall(_._2.size == 5))
    assert(rows.groupBy(_._1).keySet === Set("g0", "g1", "g2", "g3"))
    // per-group ranks are 1..5 and keys descend within each group
    rows.groupBy(_._1).values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      assert(sorted.map(_._2) === (1 to 5))
      assert(sorted.map(_._4) === sorted.map(_._4).sorted.reverse)
    }
    val windows = rpt.queryExecution.executedPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, "bounded aggregator, not a window, must plan the top-k")
  }

  test("perGroup: short groups return all members") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 3L, 1.0))
      .toDF("g", "id", "w")
    val rows = WeightedSample.perGroup(df, "g", "id", "w", 10, "s")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(rows.map(r => (r._1, r._3)).toSet === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("reservoir fold: maintained sample ≡ batch sample; replay no-ops; id overlap dedups") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("graft_ws_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val rows = (1L to 200L).map(i => (i, (i % 17 + 1).toDouble))
    val all = rows.toDF("id", "w")
    def fold(p: Seq[(Long, Double)], bid: Long): Unit =
      WeightedSample.foldIntoStore(store, "ws", p.toDF("id", "w"),
        "id", "w", k = 12, seed = "sX", bid, "e1")
    fold(rows.take(70), 0L)
    fold(rows.slice(70, 140), 1L)
    fold(rows.slice(70, 140), 1L) // replay: must no-op
    // overlap: batch 2 re-contains some of batch 1's rows — the seeded
    // hash gives them identical priorities, so dedup-by-id absorbs them
    fold(rows.drop(120), 2L)
    val maintained = WeightedSample.sampleFromState(
      store.read("ws").get.drop("_last_batch", "_epoch"), "id")
      .as[(Int, Long, Double)].collect().toSeq
    val batch = WeightedSample.sample(all, "id", "w", 12, "sX")
      .as[(Int, Long, Double)].collect().toSeq
    assert(maintained == batch,
      s"maintained reservoir diverged from the batch draw:\n$maintained\nvs\n$batch")
    assert(maintained.map(_._2).distinct.size == 12, "duplicate ids in reservoir")
  }

  test("grouped fold: per-group maintained ≡ per-group batch; group absent from a batch survives") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("graft_wsg_fold").toString
    val store = new ParquetTableStore(spark, wh)
    // group "c" appears ONLY in batch 0 — the grouped merge must pass it
    // through every later fold untouched
    val rows = (1L to 180L).map(i =>
      (if (i <= 20) "c" else if (i % 2 == 0) "a" else "b", i, (i % 13 + 1).toDouble))
    val all = rows.toDF("g", "id", "w")
    def fold(p: Seq[(String, Long, Double)], bid: Long): Unit =
      WeightedSample.foldIntoStorePerGroup(store, "wsg", p.toDF("g", "id", "w"),
        "g", "id", "w", k = 7, seed = "sG", bid, "e1")
    fold(rows.take(60), 0L)
    fold(rows.slice(60, 120), 1L)
    fold(rows.slice(60, 120), 1L) // replay: must no-op
    fold(rows.drop(110), 2L)      // deliberate id overlap with batch 1
    val maintained = WeightedSample.perGroupFromState(
      store.read("wsg").get.drop("_last_batch", "_epoch"), "g", "id")
      .orderBy("g", "rank").as[(String, Int, Long, Double)].collect().toSeq
    val batch = WeightedSample.perGroup(all, "g", "id", "w", 7, "sG")
      .orderBy("g", "rank").as[(String, Int, Long, Double)].collect().toSeq
    assert(maintained == batch,
      s"grouped maintained reservoir diverged:\n$maintained\nvs\n$batch")
    assert(maintained.count(_._1 == "c") == 7, "batch-0-only group lost by later folds")
  }
}
