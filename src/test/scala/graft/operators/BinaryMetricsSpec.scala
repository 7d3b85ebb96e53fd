package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): Option[Double] =
    BinaryMetrics.aucRoc(rows.toDF("s", "y"), "s", "y")
      .select("auc").as[Option[Double]].head()

  test("hand-computed midrank AUC with a tie") {
    // scores 1F 2F 2T 3T: the tied (2,2) pair contributes the half
    val got = auc(Seq((1.0, false), (2.0, false), (2.0, true), (3.0, true)))
    assert(got.contains(0.875))
  }

  test("perfect separation is 1.0, inverted separation is 0.0, all-tied is 0.5") {
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true)))
      .contains(1.0))
    assert(auc(Seq((4.0, false), (3.0, false), (2.0, true), (1.0, true)))
      .contains(0.0))
    assert(auc(Seq.fill(6)((7.0, true)) ++ Seq.fill(4)((7.0, false)))
      .contains(0.5))
  }

  test("single-class input returns null auc, never 0/0") {
    assert(auc(Seq((1.0, true), (2.0, true))).isEmpty)
    assert(auc(Seq((1.0, false))).isEmpty)
    val counts = BinaryMetrics.aucRoc(
        Seq((1.0, true), (2.0, true)).toDF("s", "y"), "s", "y")
      .select("n_pos", "n_neg").as[(Long, Long)].head()
    assert(counts == ((2L, 0L)))
  }

  test("null scores and null labels are excluded from both ranks and counts") {
    val df = Seq((Some(1.0), Some(false)), (Some(2.0), Some(true)),
      (None, Some(true)), (Some(9.0), None)).toDF("s", "y")
    val row = BinaryMetrics.aucRoc(df, "s", "y")
      .select("n_pos", "n_neg", "auc")
      .as[(Long, Long, Option[Double])].head()
    assert(row == ((1L, 1L, Some(1.0))))
  }

  test("grouped AUC ≡ the pairwise Mann–Whitney definition per group (random)") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 3}"
      // group-dependent signal strength so the three AUCs differ
      val y = rnd.nextBoolean()
      val s = (if (y) (i % 3) * 0.4 else 0.0) + rnd.nextInt(8).toDouble
      (g, s, y)
    }
    val got = BinaryMetrics.aucRocPerGroup(
        rows.toDF("g", "s", "y"), Seq("g"), "s", "y")
      .select("g", "auc").as[(String, Option[Double])]
      .collect().toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      val pairs = for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
      val expect = math.rint(pairs.sum / (pos.size * neg.size) * 1e6) / 1e6
      assert(got(g).contains(expect), s"group $g")
    }
  }

  private def ap(rows: Seq[(Double, Boolean)]): Option[Double] =
    BinaryMetrics.averagePrecision(rows.toDF("s", "y"), "s", "y")
      .select("ap").as[Option[Double]].head()

  test("hand-computed average precision, with and without ties") {
    // untied [3T 2F 1T]: P@1=1 (R .5), P@3=2/3 (R 1) → AP = 5/6
    assert(ap(Seq((3.0, true), (2.0, false), (1.0, true)))
      .contains(0.833333))
    // tied [2T 2F 1T]: threshold 2 has tp=1 fp=1 → .5·.5 + .5·(2/3)
    assert(ap(Seq((2.0, true), (2.0, false), (1.0, true)))
      .contains(0.583333))
  }

  test("AP: perfect ranking is 1.0; no positives is null; all-positives is 1.0") {
    assert(ap(Seq((3.0, true), (2.0, true), (1.0, false))).contains(1.0))
    assert(ap(Seq((1.0, false), (2.0, false))).isEmpty)
    assert(ap(Seq((1.0, true), (2.0, true))).contains(1.0))
  }

  test("grouped AP ≡ the sklearn step-interpolated definition per group (random)") {
    val rnd = new scala.util.Random(43)
    val rows = (1 to 300).map { i =>
      val g = s"g${i % 2}"
      val y = rnd.nextBoolean()
      val s = (if (y) (i % 2) * 0.7 else 0.0) + rnd.nextInt(6).toDouble
      (g, s, y)
    }
    val got = BinaryMetrics.averagePrecisionPerGroup(
        rows.toDF("g", "s", "y"), Seq("g"), "s", "y")
      .select("g", "ap").as[(String, Option[Double])].collect().toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val nPos = rs.count(_._3)
      val byScore = rs.groupBy(_._2).toSeq.sortBy(-_._1)
        .map { case (s, xs) => (xs.count(_._3), xs.count(!_._3)) }
      var (tp, fp, apSum) = (0, 0, 0.0)
      byScore.foreach { case (p, n) =>
        tp += p; fp += n
        apSum += p.toDouble * (tp.toDouble / (tp + fp).toDouble)
      }
      val expect = math.rint(apSum / nPos * 1e6) / 1e6
      assert(got(g).contains(expect), s"group $g")
    }
  }

  test("fold-maintained readout ≡ one-shot, through a real store with replay") {
    val store = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_bm_fold").toString)
    val rnd = new scala.util.Random(47)
    val rows = (1 to 500).map { i =>
      val y = rnd.nextBoolean()
      (i.toLong, s"g${i % 2}", (if (y) 1.5 else 0.0) + rnd.nextInt(7), y)
    }
    val df = rows.toDF("id", "g", "s", "y")
    def fold(m: Long, id: Long): Unit =
      BinaryMetrics.foldIntoStore(store, "bm",
        df.filter($"id" % 3 === m), Seq("g"), "s", "y", id, epoch = "t")
    fold(0L, 0L); fold(1L, 1L); fold(1L, 1L); fold(2L, 2L) // one replay
    val st = store.read("bm").get.drop("_last_batch", "_epoch")
    val gotAuc = BinaryMetrics.aucFromState(st, Seq("g"))
      .collect().map(_.toSeq).toSet
    val gotAp = BinaryMetrics.apFromState(st, Seq("g"))
      .collect().map(_.toSeq).toSet
    assert(gotAuc == BinaryMetrics.aucRocPerGroup(df, Seq("g"), "s", "y")
      .collect().map(_.toSeq).toSet)
    assert(gotAp == BinaryMetrics.averagePrecisionPerGroup(df, Seq("g"), "s", "y")
      .collect().map(_.toSeq).toSet)
  }

  test("the ranking window runs over the grouped score frame, not the rows") {
    // 10k rows but only 5 distinct scores: the window input must be the
    // per-score aggregate (5 rows per group), which the plan shows as an
    // Aggregate BELOW the Window
    val df = (1 to 10000).map(i => (i % 5 * 1.0, i % 3 == 0)).toDF("s", "y")
    val plan = BinaryMetrics.aucRoc(df, "s", "y")
      .queryExecution.optimizedPlan.toString()
    val winIdx = plan.indexOf("Window")
    val aggBelow = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      s"expected Aggregate below Window in:\n$plan")
  }
}
