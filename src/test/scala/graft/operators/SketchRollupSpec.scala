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
}
