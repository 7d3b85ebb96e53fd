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
}
