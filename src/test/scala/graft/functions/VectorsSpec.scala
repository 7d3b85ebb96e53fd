package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: codes bounded, error <= scale/2, zero vector safe") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(100.0f, -100.0f, 3.0f, 0.1f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero: scale floors, codes all 0
    ).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".as("e"),
        Vectors.int8Scale($"embedding").as("scale"))
      .select($"vec_id", $"e", $"scale",
        Vectors.int8Quantize($"e", $"scale").as("q"))

    val rows = df.select($"vec_id", $"scale", $"q",
        aggregate(
          zip_with($"e", Vectors.int8Dequantize($"q", $"scale"),
            (x, y) => abs(x.cast("double") - y)),
          lit(0.0), (a, v) => greatest(a, v)).as("max_err"))
      .as[(Long, Double, Seq[Int], Double)].collect()

    rows.foreach { case (id, scale, codes, maxErr) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id codes out of range: $codes")
      assert(maxErr <= scale / 2 + 1e-12, s"vec $id err $maxErr > scale/2 ${scale / 2}")
    }
    val zero = rows.find(_._1 == 3L).get
    assert(zero._3.forall(_ == 0) && zero._4 == 0.0)
    // a max-magnitude element maps to exactly +/-127
    val big = rows.find(_._1 == 2L).get
    assert(big._3.contains(127) && big._3.contains(-127))
  }
}
