package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def asg(rows: (Long, String)*) = rows.toSeq.toDF("u", "v")
  private def conv(us: Long*) = us.toSeq.toDF("u")

  test("hand-computed z on a clear winner") {
    // A: 4 users, 3 convert; B: 4 users, 1 converts
    val a = asg((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (5L, "B"), (6L, "B"), (7L, "B"), (8L, "B"))
    val r = Experiment.abReadout(a, "u", "v", conv(1L, 2L, 3L, 5L), "u")
      .collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) == ((4L, 4L)))
    assert((r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b")) == ((3L, 1L)))
    assert(r.getAs[Double]("rate_a") == 0.75 && r.getAs[Double]("rate_b") == 0.25)
    val pp = 0.5
    val z = (0.75 - 0.25) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getAs[Double]("z") - math.rint(z * 1e4) / 1e4) < 1e-9)
    assert(!r.getAs[Boolean]("significant"), "z ≈ 1.41 < 1.96")
  }

  test("degenerate pooled rates give null z, not ±Infinity") {
    val a = asg((1L, "A"), (2L, "B"))
    val none = Experiment.abReadout(a, "u", "v", conv(), "u").collect().head
    assert(none.isNullAt(none.fieldIndex("z")))
    assert(!none.getAs[Boolean]("significant"))
    val all = Experiment.abReadout(a, "u", "v", conv(1L, 2L), "u")
      .collect().head
    assert(all.isNullAt(all.fieldIndex("z")))
  }

  test("duplicate assignment rows and duplicate conversions dedupe") {
    val a = asg((1L, "A"), (1L, "A"), (2L, "B"))
    val r = Experiment.abReadout(a, "u", "v", conv(1L, 1L), "u")
      .collect().head
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("conv_a") == 1L)
  }

  test("a user assigned BOTH variants is a loud error, not a double count") {
    val corrupt = asg((1L, "A"), (1L, "B"), (2L, "A"), (3L, "B"))
    val e = intercept[IllegalArgumentException] {
      Experiment.abReadout(corrupt, "u", "v", conv(), "u")
    }
    assert(e.getMessage.contains("more than one variant"))
  }

  test("not-exactly-two variants fails loudly") {
    intercept[IllegalArgumentException] {
      Experiment.abReadout(asg((1L, "A")), "u", "v", conv(), "u")
    }
    intercept[IllegalArgumentException] {
      Experiment.abReadout(asg((1L, "A"), (2L, "B"), (3L, "C")),
        "u", "v", conv(), "u")
    }
  }

  test("significance flips on an extreme split") {
    // 50 vs 50 users, 40/50 vs 10/50 convert → |z| ≈ 6 > 1.96
    val a = ((1L to 50L).map(_ -> "A") ++ (51L to 100L).map(_ -> "B"))
    val c = (1L to 40L) ++ (51L to 60L)
    val r = Experiment.abReadout(a.toDF("u", "v"), "u", "v",
      c.toDF("u"), "u").collect().head
    assert(r.getAs[Boolean]("significant"), r.toString)
  }
}
