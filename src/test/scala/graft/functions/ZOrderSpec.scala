package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def z(a: Long, b: Long): Long =
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.interleave16($"a", $"b")).as[Long].head()

  test("interleave16 matches hand-computed Morton codes") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)        // a bits on even positions
    assert(z(0, 1) == 2L)        // b bits on odd positions
    assert(z(3, 2) == 13L)       // 0b1101
    assert(z(65535, 0) == 0x55555555L)
    assert(z(0, 65535) == 0xAAAAAAAAL)
    assert(z(65535, 65535) == 0xFFFFFFFFL)
  }

  test("interleave16 is injective over the bucket domain (sampled)") {
    val n = (0L until 64L)
    val all = n.flatMap(a => n.map(b => (a, b))).toDF("a", "b")
      .select(ZOrder.interleave16($"a", $"b")).as[Long].collect()
    assert(all.distinct.length == all.length)
  }

  test("z-sorted partitions span bounded rectangles in BOTH dims; lex sort does not") {
    val grid = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y").withColumn("id", $"x" * 64 + $"y")
    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val withPid = df.withColumn("pid", spark_partition_id())
      withPid.groupBy("pid")
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .select("sx", "sy").as[(Long, Long)].collect().toSeq
    }
    val zParts = spans(ZOrder.zSorted(grid, $"x", $"y", $"id", 16))
    // Assert the property STATISTICALLY, not per-partition: range-exchange
    // boundaries come from sampling, and a boundary that misses a z-quad
    // seam by a few values legitimately gives ONE partition a full-width
    // span in one dimension. What z-ordering guarantees is that partitions
    // bound both dimensions ON THE WHOLE — most partitions tight, both
    // dims' mean spans far below the global 63.
    assert(zParts.count { case (sx, sy) => sx <= 31 && sy <= 31 } >= 12,
      s"z spans: $zParts")
    assert(zParts.map(_._1).sum / zParts.size <= 40 &&
      zParts.map(_._2).sum / zParts.size <= 40, s"z spans: $zParts")
    val lexParts = spans(grid.repartitionByRange(16, $"x", $"y")
      .sortWithinPartitions($"x", $"y"))
    // the lexicographic layout leaves y unbounded in (nearly) every partition
    assert(lexParts.count { case (_, sy) => sy >= 60 } >= 12,
      s"lex spans: $lexParts")
  }
}
