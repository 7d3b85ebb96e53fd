package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val stream = (
    Seq.fill(200)("hot") ++ Seq.fill(50)("warm") ++
      (0 until 300).map(i => s"tail_$i")
  ).toDF("term")

  private def truth = Map("hot" -> 200L, "warm" -> 50L) ++
    (0 until 300).map(i => s"tail_$i" -> 1L)

  test("estimates never undercount, and overcount stays within the collision bound") {
    val st = CountMin.state(stream, "term", d = 4, wChars = 3)
    val q = truth.keys.toSeq.toDF("term")
    val est = CountMin.estimate(st, q, "term", d = 4, wChars = 3)
      .as[(String, Long)].collect().toMap
    val n = 550L
    truth.foreach { case (t, f) =>
      assert(est(t) >= f, s"'$t' undercounted: ${est(t)} < $f — the one-sided guarantee broke")
      // e·n/w with w=4096 ≈ 0.37; any real overcount is a (rare) full
      // collision, so allow a small absolute slack rather than 0
      assert(est(t) - f <= 8, s"'$t' overcounted beyond plausible collisions: ${est(t)} vs $f")
    }
  }

  test("an absent term estimates 0 and null terms are ignored") {
    val withNulls = stream.unionByName(Seq.fill(5)(Option.empty[String]).toDF("term"))
    val st = CountMin.state(withNulls, "term")
    val est = CountMin.estimate(st, Seq("never_seen_term").toDF("term"), "term")
      .as[(String, Long)].collect().toMap
    assert(est("never_seen_term") == 0L, est.toString)
    val total = CountMin.state(withNulls, "term")
      .filter($"j" === 0).agg(sum($"cnt")).as[Long].head()
    assert(total == 550L, s"nulls must not be counted: $total")
  }

  test("merged shard sketches equal the one-shot sketch exactly") {
    val parts = stream.randomSplit(Array(0.5, 0.5), seed = 7)
    val merged = CountMin.merge(
      CountMin.state(parts(0), "term"), CountMin.state(parts(1), "term"))
      .as[(Int, String, Long)].collect().toSet
    val oneShot = CountMin.state(stream, "term")
      .as[(Int, String, Long)].collect().toSet
    assert(merged == oneShot)
  }

  test("joinSizeEstimate: one-sided for the equi-join and the F2 self-moment") {
    val r = stream
    val s = (Seq.fill(30)("hot") ++ Seq.fill(10)("cold")).toDF("term")
    val stR = CountMin.state(r, "term")
    val stS = CountMin.state(s, "term")
    val est = CountMin.joinSizeEstimate(stR, stS)
      .as[Long].collect().head
    val exact = r.join(s, Seq("term")).count() // 200·30 hot pairs
    assert(exact === 6000L)
    assert(est >= exact, s"one-sided bound violated: est=$est exact=$exact")
    val estF2 = CountMin.joinSizeEstimate(stR, stR).as[Long].collect().head
    val exactF2 = truth.values.map(c => c * c).sum
    assert(estF2 >= exactF2)
    // collision excess bounded: ||R||1·||S||1 / 4096 per hash row
    assert(est - exact <= 550L * 40L, s"excess ${est - exact} implausibly large")
  }

  test("joinSizeEstimate: disjoint vocabularies estimate 0 via the absent-row guard") {
    val stR = CountMin.state(Seq("aaa", "bbb").toDF("term"), "term")
    val stS = CountMin.state(Seq("zzz9").toDF("term"), "term")
    val est = CountMin.joinSizeEstimate(stR, stS).as[Long].collect().head
    assert(est === 0L)
  }

  test("joinSizeEstimate: geometry mismatch is a loud error") {
    val stR = CountMin.state(stream, "term", d = 4, wChars = 3)
    val stS = CountMin.state(stream, "term", d = 4, wChars = 2)
    intercept[IllegalArgumentException] {
      CountMin.joinSizeEstimate(stR, stS)
    }
  }

  test("foldIntoStore is replay-idempotent and matches the full recompute") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cms_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val b1 = stream.limit(300)
    val b2 = stream.exceptAll(b1)
    CountMin.foldIntoStore(store, "cms", b1, "term", batchId = 0L, epoch = "e1")
    CountMin.foldIntoStore(store, "cms", b2, "term", batchId = 1L, epoch = "e1")
    CountMin.foldIntoStore(store, "cms", b2, "term", batchId = 1L, epoch = "e1") // replay
    val folded = store.read("cms").get.drop("_last_batch", "_epoch")
      .as[(Int, String, Long)].collect().toSet
    val full = CountMin.state(stream, "term").as[(Int, String, Long)].collect().toSet
    assert(folded == full, "folded state diverged from full recompute (replay double-count?)")
  }

  test("empty states merge as identity and estimate 0 (no NPE)") {
    val empty = CountMin.state(
      Seq(Option.empty[String]).toDF("term"), "term")
    assert(empty.isEmpty)
    // merge(empty, real) ≡ real; merge(empty, empty) is empty
    val real = CountMin.state(stream, "term")
    val merged = CountMin.merge(empty, real).as[(Int, String, Long)]
      .collect().toSet
    assert(merged == real.as[(Int, String, Long)].collect().toSet)
    assert(CountMin.merge(empty, empty).isEmpty)
    // estimating against an empty state returns the documented zeros
    val est = CountMin.estimate(empty, Seq("hot").toDF("term"), "term")
      .collect().head
    assert(est.getLong(1) == 0L)
  }
}
