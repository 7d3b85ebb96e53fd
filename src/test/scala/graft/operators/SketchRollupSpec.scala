package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1 to 3000).map(i => (s"d${i % 7}", (i % 450).toLong))
    .toDF("day", "uid")

  test("union of per-day sketches estimates the cross-day distinct exactly like one-shot") {
    val merged = SketchRollup.unionEstimate(
      SketchRollup.distinctSketches(rows, Seq("day"), "uid"))
      .select("est_distinct").as[Long].head()
    val oneshot = rows
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(uid, 12))"))
      .as[Long].head()
    assert(merged == oneshot,
      s"register merge must be exact, got $merged vs $oneshot")
  }

  test("estimate is within HLL tolerance of the exact distinct") {
    val est = SketchRollup.unionEstimate(
      SketchRollup.distinctSketches(rows, Seq("day"), "uid"))
      .select("est_distinct").as[Long].head()
    assert(math.abs(est - 450.0) / 450.0 <= 0.05, s"estimate $est vs exact 450")
  }

  test("partition-subset rollup: estimate over a day subset needs only its sketches") {
    val sketches = SketchRollup.distinctSketches(rows, Seq("day"), "uid")
    val subset = SketchRollup.unionEstimate(sketches.filter($"day".isin("d0", "d1")))
      .select("est_distinct").as[Long].head()
    val exact = rows.filter($"day".isin("d0", "d1"))
      .agg(countDistinct($"uid")).as[Long].head()
    assert(math.abs(subset - exact.toDouble) / exact <= 0.05, s"$subset vs $exact")
  }

  test("n_rows carries through the state merge") {
    val n = SketchRollup.unionEstimate(
      SketchRollup.distinctSketches(rows, Seq("day"), "uid"))
      .select("n_rows").as[Long].head()
    assert(n == 3000L)
  }

  test("mergeStates coarsens per-day sketch states without rescanning rows") {
    val daily = SketchRollup.distinctSketches(rows, Seq("day"), "uid")
    val coarse = SketchRollup.mergeStates(Seq.empty, daily)
    val est = coarse.select(expr("hll_sketch_estimate(_sketch)")).as[Long].head()
    val oneshot = rows.agg(expr("hll_sketch_estimate(hll_sketch_agg(uid, 12))"))
      .as[Long].head()
    assert(est == oneshot, s"coarsened state estimate $est != one-shot $oneshot")
    assert(coarse.select("_rows").as[Long].head() == 3000L)
  }

  test("foldIntoStore: streamed sketch state equals batch recompute; replay no-ops; epoch mismatch is loud") {
    val wh = java.nio.file.Files.createTempDirectory("graft_hll_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val (h1, h2) = (rows.filter($"uid" % 2 === 0), rows.filter($"uid" % 2 =!= 0))
    def fold(b: org.apache.spark.sql.DataFrame, id: Long, epoch: String = "e1"): Unit =
      SketchRollup.foldIntoStore(store, "sk", b, Seq("day"), "uid", 12, id, epoch)
    fold(h1, 0L)
    fold(h2, 1L)
    def est = SketchRollup.unionEstimate(
      store.read("sk").get.drop("_last_batch", "_epoch"))
      .as[(Long, Long)].head()
    val direct = SketchRollup.unionEstimate(
      SketchRollup.distinctSketches(rows, Seq("day"), "uid"))
      .as[(Long, Long)].head()
    assert(est == direct, s"streamed $est != batch recompute $direct")
    // replay of the last batch: registers would tolerate it, _rows would
    // NOT — the marker must no-op the whole fold
    fold(h2, 1L)
    assert(est == direct, "replayed batch changed the stored state")
    // new batch applies
    fold(Seq(("dX", 9999L)).toDF("day", "uid"), 2L)
    assert(est._2 == direct._2 + 1)
    // fresh-checkpoint epoch fails loudly
    val e = intercept[RuntimeException] { fold(h1, 0L, epoch = "other") }
    assert(e.getMessage.contains("epoch"))
  }

  test("foldIntoStore recovers a sketch state stranded mid whole-table swap") {
    val wh = java.nio.file.Files.createTempDirectory("graft_hll_swap").toString
    val store = new ParquetTableStore(spark, wh)
    def fold(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      SketchRollup.foldIntoStore(store, "sk", b, Seq("day"), "uid", 12, id, "e1")
    fold(Seq(("d1", 1L), ("d1", 2L)).toDF("day", "uid"), 0L)
    assert(new java.io.File(s"$wh/sk").renameTo(new java.io.File(s"$wh/_swap_sk")))
    fold(Seq(("d1", 3L)).toDF("day", "uid"), 1L)
    val got = SketchRollup.unionEstimate(
      store.read("sk").get.drop("_last_batch", "_epoch"))
      .as[(Long, Long)].head()
    assert(got == ((3L, 3L)), s"recovered sketch fold wrong: $got")
  }
}
