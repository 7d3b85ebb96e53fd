package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-group KMV/theta sketch (VERDICT r9 item 4): the per-stratum
  * distinct sketch completes the fold family's per-group symmetry. */
class KmvGroupedSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups with overlapping key populations of known distinct sizes
  private def rows = (
    (1 to 400).map(k => ("a", k.toLong)) ++
    (200 to 500).map(k => ("b", k.toLong)) ++
    (1 to 30).map(k => ("c", k.toLong))
  ).toDF("g", "k")

  test("per-group state folds to the one-shot grouped sketch; unsaturated groups are exact") {
    val k = 64
    val oneShot = KmvSketch.statePerGroup(rows, "g", "k", k, "s1")
    val est = KmvSketch.estimatePerGroup(oneShot, "g", k)
      .as[(String, Double)].collect().toMap
    // group c has 30 < k distinct keys: exact
    assert(est("c") == 30.0, s"unsaturated group must be exact: ${est("c")}")
    // saturated groups: within 25% of truth at k=64
    assert(math.abs(est("a") - 400) / 400.0 < 0.25, s"est a=${est("a")}")
    assert(math.abs(est("b") - 301) / 301.0 < 0.25, s"est b=${est("b")}")

    // 3-way split + merge == one-shot, bit-equal per group
    val parts = Seq(0, 1, 2).map(r =>
      KmvSketch.statePerGroup(rows.filter($"k" % 3 === r), "g", "k", k, "s1"))
    val merged = KmvSketch.mergeStatesGrouped(k, "g", parts: _*)
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    val direct = oneShot.orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(merged == direct, "grouped merge diverges from one-shot state")
  }

  test("foldIntoStorePerGroup is replay-idempotent and matches the one-shot state") {
    val k = 32
    val wh = java.nio.file.Files.createTempDirectory("graft_kmvg").toString
    val store = new ParquetTableStore(spark, wh)
    def fold(r: Int, id: Long): Unit =
      KmvSketch.foldIntoStorePerGroup(store, "kg",
        rows.filter($"k" % 3 === r), "g", "k", k, "s2", id, "e1")
    fold(0, 0L); fold(1, 1L); fold(1, 1L) /* replay */; fold(2, 2L)
    val stored = store.read("kg").get.drop("_last_batch", "_epoch")
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    val oneShot = KmvSketch.statePerGroup(rows, "g", "k", k, "s2")
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(stored == oneShot, "maintained grouped sketch diverges from one-shot")
  }

  test("setEstimatesAcrossGroups estimates pairwise overlap from the state alone") {
    val k = 512 // above every group's distinct count: all EXACT -> exact set algebra
    val st = KmvSketch.statePerGroup(rows, "g", "k", k, "s3")
    val got = KmvSketch.setEstimatesAcrossGroups(st, "g", k)
      .orderBy("group_a", "group_b")
      .as[(String, String, Double, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = got.head
    assert(ab._3 == 201.0 && ab._4 == 500.0, s"a∩b/a∪b exact-mode mismatch: $ab")
    assert(math.abs(ab._5 - 201.0 / 500.0) < 1e-3)
    val ac = got(1)
    assert(ac._3 == 30.0 && ac._4 == 400.0, s"a∩c exact-mode mismatch: $ac")
    val bc = got(2)
    assert(bc._3 == 0.0 && bc._4 == 331.0, s"b∩c must be empty: $bc")
  }
}
