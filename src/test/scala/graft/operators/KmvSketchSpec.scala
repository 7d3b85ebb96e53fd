package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("unsaturated sketch is EXACT: estimate equals the distinct count") {
    val df = (1L to 40L).flatMap(i => Seq(i, i)).toDF("id") // dups collapse
    val st = KmvSketch.state(df, "id", k = 64, seed = "t")
    val est = KmvSketch.estimateFromState(st, 64).head().getDouble(0)
    assert(est == 40.0, s"exact-mode estimate $est != 40")
  }

  test("saturated estimate lands near the truth and is deterministic") {
    val df = (1L to 5000L).toDF("id")
    val st = KmvSketch.state(df, "id", k = 256, seed = "t")
    val est = KmvSketch.estimateFromState(st, 256).head().getDouble(0)
    assert(math.abs(est - 5000) < 5000 * 0.2, s"estimate $est too far from 5000")
    val est2 = KmvSketch.estimateFromState(
      KmvSketch.state(df.orderBy($"id".desc).repartition(7), "id", 256, "t"),
      256).head().getDouble(0)
    assert(est == est2, "estimate depends on row order/partitioning")
  }

  test("merge of split sketches equals the one-shot sketch (exact mergeability)") {
    val df = (1L to 3000L).toDF("id")
    val whole = KmvSketch.state(df, "id", 128, "t").head().getSeq[Long](0)
    val merged = KmvSketch.mergeStates(128,
        KmvSketch.state(df.filter($"id" % 3 === 0), "id", 128, "t"),
        KmvSketch.state(df.filter($"id" % 3 === 1), "id", 128, "t"),
        KmvSketch.state(df.filter($"id" % 3 === 2), "id", 128, "t"))
      .head().getSeq[Long](0)
    assert(merged == whole, "merged sketch diverges from one-shot")
  }

  test("intersection estimate tracks the true overlap; HLL cannot do this") {
    // A = 1..4000, B = 3001..7000 -> |A ∩ B| = 1000, |A ∪ B| = 7000
    val a = KmvSketch.state((1L to 4000L).toDF("id"), "id", 256, "t")
    val b = KmvSketch.state((3001L to 7000L).toDF("id"), "id", 256, "t")
    val r = KmvSketch.setEstimates(a, b, 256).head()
    val (inter, union, jac) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs(inter - 1000) < 1000 * 0.5, s"est_inter $inter vs 1000")
    assert(math.abs(union - 7000) < 7000 * 0.2, s"est_union $union vs 7000")
    assert(jac > 0.05 && jac < 0.35, s"jaccard $jac vs 1/7")
  }

  test("disjoint populations estimate a (near-)zero intersection") {
    val a = KmvSketch.state((1L to 3000L).toDF("id"), "id", 256, "t")
    val b = KmvSketch.state((100001L to 103000L).toDF("id"), "id", 256, "t")
    val r = KmvSketch.setEstimates(a, b, 256).head()
    assert(r.getDouble(2) == 0.0, s"disjoint est_inter ${r.getDouble(2)}")
    assert(r.getDouble(4) == 0.0, s"disjoint jaccard ${r.getDouble(4)}")
  }

  test("two exact-mode sketches produce EXACT set estimates") {
    val a = KmvSketch.state((1L to 50L).toDF("id"), "id", 256, "t")
    val b = KmvSketch.state((31L to 80L).toDF("id"), "id", 256, "t")
    val r = KmvSketch.setEstimates(a, b, 256).head()
    assert(r.getDouble(0) == 50.0 && r.getDouble(1) == 50.0)
    assert(r.getDouble(2) == 20.0, s"exact-mode est_inter ${r.getDouble(2)}")
    assert(r.getDouble(3) == 80.0, s"exact-mode est_union ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.25, s"exact-mode jaccard ${r.getDouble(4)}")
  }

  test("fold through a store: maintained sketch ≡ one-shot; replay no-ops") {
    val wh = java.nio.file.Files.createTempDirectory("graft_kmv_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val rows = (1L to 2000L).toDF("id")
    def fold(p: Long => Boolean, bid: Long): Unit =
      KmvSketch.foldIntoStore(store, "km", rows.filter(udf(p).apply($"id")),
        "id", 128, "t", bid, "e1")
    fold(_ % 3 == 0, 0L)
    fold(_ % 3 == 1, 1L)
    fold(_ % 3 == 1, 1L) // replay: must no-op
    fold(_ % 3 == 2, 2L)
    val maintained = store.read("km").get.drop("_last_batch", "_epoch")
      .head().getSeq[Long](0)
    val oneShot = KmvSketch.state(rows, "id", 128, "t").head().getSeq[Long](0)
    assert(maintained == oneShot, "fold-maintained sketch diverged")
  }
}
