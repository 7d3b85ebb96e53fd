package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinnedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  // 100 uniform values 1..100 in one group: quantiles are analytic
  private def rows = (1 to 100).map(v => ("g", v.toDouble)).toDF("g", "v")

  test("interpolated quantiles land within one bin width of the exact value") {
    val state = BinnedQuantiles.binState(rows, Seq("g"), "v", 0.0, 10.0, 10)
    val est = BinnedQuantiles.quantiles(state, Seq("g"),
      Seq("p50" -> 0.5, "p90" -> 0.9), 0.0, 10.0)
      .select("p50", "p90", "n").as[(Double, Double, Long)].head()
    assert(est._3 == 100L)
    assert(math.abs(est._1 - 50.0) <= 10.0, s"p50 ${est._1}")
    assert(math.abs(est._2 - 90.0) <= 10.0, s"p90 ${est._2}")
  }

  test("merged delta states reproduce the whole-table state exactly") {
    val whole = BinnedQuantiles.binState(rows, Seq("g"), "v", 0.0, 10.0, 10)
    val merged = BinnedQuantiles.merge(Seq("g"),
      BinnedQuantiles.binState(rows.filter($"v" <= 40), Seq("g"), "v", 0.0, 10.0, 10),
      BinnedQuantiles.binState(rows.filter($"v" > 40), Seq("g"), "v", 0.0, 10.0, 10))
    assert(merged.orderBy("bin").collect().toSeq ==
      whole.orderBy("bin").collect().toSeq)
  }

  test("out-of-range values clamp into edge bins; nulls and NaN are dropped") {
    val df = Seq(("g", Some(-50.0)), ("g", Some(1e9)), ("g", None),
      ("g", Some(Double.NaN))).toDF("g", "v")
    val st = BinnedQuantiles.binState(df, Seq("g"), "v", 0.0, 10.0, 10)
      .orderBy("bin").select("bin", "cnt").as[(Long, Long)].collect().toSeq
    // NaN must be dropped, not binned: Spark's double→long cast would
    // silently send it to bin 0 while DuckDB's equivalent cast errors
    assert(st == Seq((0L, 1L), (9L, 1L)))
  }

  test("quantile at an exact bin boundary picks the covering bin deterministically") {
    // 10 values in bin 0, 10 in bin 1: q=0.5 sits exactly at the boundary;
    // cb < 5? bin0: cb=0, cnt=10 -> 0+10 >= 10*0.5=5 and 0 < 5 -> covers.
    val df = ((1 to 10).map(_ => ("g", 5.0)) ++ (1 to 10).map(_ => ("g", 15.0)))
      .toDF("g", "v")
    val st = BinnedQuantiles.binState(df, Seq("g"), "v", 0.0, 10.0, 10)
    val p50 = BinnedQuantiles.quantiles(st, Seq("g"), Seq("p50" -> 0.5), 0.0, 10.0)
      .select("p50").as[Double].head()
    assert(p50 == 10.0, s"boundary quantile: $p50") // (0 + 10/10) * 10
  }

  test("state window is bounded by nBins per group (not corpus-sized)") {
    val state = BinnedQuantiles.binState(rows, Seq("g"), "v", 0.0, 10.0, 10)
    assert(state.count() <= 10)
  }

  test("foldIntoStore: streamed histogram state equals batch recompute; replay no-ops; epoch mismatch is loud") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bq_fold").toString
    val store = new ParquetTableStore(spark, wh)
    def fold(vs: Seq[Double], id: Long, epoch: String = "e1"): Unit =
      BinnedQuantiles.foldIntoStore(store, "h",
        vs.map(("g", _)).toDF("g", "v"), Seq("g"), "v", 0.0, 10.0, 10,
        id, epoch)
    fold(Seq(1.0, 15.0, 22.0), 0L)
    fold(Seq(35.0, 8.0), 1L)
    def state = store.read("h").get.drop("_last_batch", "_epoch")
      .orderBy("g", "bin").as[(String, Long, Long)].collect().toSeq
    val direct = BinnedQuantiles.binState(
      Seq(1.0, 15.0, 22.0, 35.0, 8.0).map(("g", _)).toDF("g", "v"),
      Seq("g"), "v", 0.0, 10.0, 10)
      .orderBy("g", "bin").as[(String, Long, Long)].collect().toSeq
    assert(state == direct, s"streamed $state != recompute $direct")
    // at-least-once replay of the last batch: must not double-count
    fold(Seq(35.0, 8.0), 1L)
    assert(state == direct, "replayed batch double-counted")
    // a genuinely new batch still applies
    fold(Seq(99.0), 2L)
    assert(state != direct)
    // fresh-checkpoint epoch must fail loudly
    val e = intercept[RuntimeException] { fold(Seq(1.0), 0L, epoch = "other") }
    assert(e.getMessage.contains("epoch"))
  }

  test("foldIntoStore recovers a state table stranded mid whole-table swap") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bq_swap").toString
    val store = new ParquetTableStore(spark, wh)
    def fold(vs: Seq[Double], id: Long): Unit =
      BinnedQuantiles.foldIntoStore(store, "h",
        vs.map(("g", _)).toDF("g", "v"), Seq("g"), "v", 0.0, 10.0, 10,
        id, "e1")
    fold(Seq(5.0, 15.0), 0L)
    // simulate replace() dying between rename(dst->backup) and
    // rename(tmp->dst): the state exists ONLY at _swap_h
    assert(new java.io.File(s"$wh/h").renameTo(new java.io.File(s"$wh/_swap_h")))
    fold(Seq(25.0), 1L) // must fold into the RECOVERED state, not restart
    val got = store.read("h").get.drop("_last_batch", "_epoch")
      .orderBy("bin").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 0L, 1L), ("g", 1L, 1L), ("g", 2L, 1L)),
      s"recovered fold wrong: $got")
  }
}
