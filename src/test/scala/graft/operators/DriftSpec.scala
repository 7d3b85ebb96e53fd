package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(xs: Seq[Double]) = xs.toDF("v")

  test("identical distributions score ~0") {
    val ref = df((1 to 100).map(_.toDouble))
    val r = Drift.psiReport(ref, ref, Seq("v")).collect().head
    assert(r.getAs[Double]("psi") == 0.0)
    assert(r.getAs[Long]("n_ref") == 100L && r.getAs[Long]("n_cur") == 100L)
  }

  test("hand-computed two-bin PSI") {
    // ref: 8 low + 2 high; cur: 2 low + 8 high over the same range
    val ref = df(Seq.fill(8)(0.0) ++ Seq.fill(2)(10.0))
    val cur = df(Seq.fill(2)(0.0) ++ Seq.fill(8)(10.0))
    val r = Drift.psiReport(ref, cur, Seq("v"), bins = 2).collect().head
    // smoothed shares with bins=2: (cnt+0.5)/(10+1)
    val (prLo, prHi) = (8.5 / 11, 2.5 / 11)
    val (pcLo, pcHi) = (2.5 / 11, 8.5 / 11)
    val expect = (pcLo - prLo) * math.log(pcLo / prLo) +
      (pcHi - prHi) * math.log(pcHi / prHi)
    assert(r.getAs[Double]("psi") == math.rint(expect * 1e4) / 1e4 ||
      math.abs(r.getAs[Double]("psi") - expect) < 1e-4)
  }

  test("out-of-range current mass clamps into end bins and alarms") {
    val ref = df((1 to 100).map(_.toDouble))
    val cur = df(Seq.fill(100)(1000.0)) // far beyond the reference max
    val r = Drift.psiReport(ref, cur, Seq("v")).collect().head
    assert(r.getAs[Double]("psi") > 1.0,
      s"off-range shift must alarm hard: $r")
  }

  test("constant reference column never alarms spuriously") {
    val ref = df(Seq.fill(50)(7.0))
    val r = Drift.psiReport(ref, ref, Seq("v")).collect().head
    assert(r.getAs[Double]("psi") == 0.0)
  }

  test("multi-column: shifted and stable columns report independently") {
    val ref = (1 to 200).map(i => (i.toDouble, (i % 10).toDouble))
      .toDF("a", "b")
    val cur = (1 to 200).filter(_ > 150)
      .map(i => (i.toDouble, (i % 10).toDouble)).toDF("a", "b")
    val m = Drift.psiReport(ref, cur, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(m("a") > 0.25, s"filter column must show major drift: $m")
    assert(m("b") < 0.1, s"i%10 survives the tail filter near-uniform: $m")
  }

  test("nulls are excluded from both sides' totals") {
    val ref = Seq[Option[Double]](Some(1.0), Some(2.0), None)
      .toDF("v")
    val r = Drift.psiReport(ref, ref, Seq("v")).collect().head
    assert(r.getAs[Long]("n_ref") == 2L)
  }

  test("randomized: PSI ≡ a plain-Scala replay of the formula") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val refV = Seq.fill(200)(rnd.nextDouble() * 100)
      val curV = Seq.fill(150)(rnd.nextDouble() * 130 - 10) // off-range mass
      val r = Drift.psiReport(df(refV), df(curV), Seq("v"), bins = 10)
        .collect().head
      val (mn, mx) = (refV.min, refV.max)
      val w = (mx - mn) / 10.0
      def bin(x: Double) =
        math.max(math.min(math.floor((x - mn) / w), 9), 0).toInt
      val cr = refV.groupBy(bin).view.mapValues(_.size).toMap
      val cc = curV.groupBy(bin).view.mapValues(_.size).toMap
      val psi = (0 until 10).map { b =>
        val pr = (cr.getOrElse(b, 0) + 0.5) / (refV.size + 5.0)
        val pc = (cc.getOrElse(b, 0) + 0.5) / (curV.size + 5.0)
        (pc - pr) * math.log(pc / pr)
      }.sum
      assert(math.abs(r.getAs[Double]("psi") - psi) < 1e-3,
        s"seed $seed: ${r.getAs[Double]("psi")} vs $psi")
      assert(r.getAs[Long]("n_ref") == 200L && r.getAs[Long]("n_cur") == 150L)
    }
  }

  test("an all-null reference column ALARMS on current data (broken extractor)") {
    val ref = Seq[Option[Double]](None, None).toDF("v")
    val cur = df((1 to 50).map(_.toDouble))
    val r = Drift.psiReport(ref, cur, Seq("v")).collect().head
    assert(r.getAs[Long]("n_ref") == 0L)
    assert(r.getAs[Long]("n_cur") == 50L,
      s"current rows must not vanish into null bins: $r")
    assert(r.getAs[Double]("psi") > 1.0,
      s"all current mass vs an empty reference must alarm hard: $r")
  }

  test("invalid bins fail loudly") {
    intercept[IllegalArgumentException] {
      Drift.psiReport(df(Seq(1.0)), df(Seq(1.0)), Seq("v"), bins = 1)
    }
    intercept[IllegalArgumentException] {
      Drift.refStats(df(Seq(1.0)), Seq.empty)
    }
  }
}
