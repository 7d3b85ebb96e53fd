package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish stream with vocabulary >> capacity: 2 genuinely heavy terms,
  // a warm band, and a long tail of singletons.
  private def stream = (
    Seq.fill(500)("hot") ++ Seq.fill(300)("warm") ++
      (0 until 120).flatMap(i => Seq.fill(3)(s"mid_$i")) ++
      (0 until 400).map(i => s"tail_$i")
  ) // n = 500 + 300 + 360 + 400 = 1560

  test("exact() returns precisely the true heavy-hitter set on a skewed stream") {
    val df = stream.toDF("term").repartition(7) // arbitrary partitioning
    val cap = 5 // share bar n/6 = 260: hot and warm clear it, mid_* (3) don't
    val got = HeavyHitters.exact(df, "term", cap)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 500L, "warm" -> 300L), got.toString)
  }

  test("every term above the share bar is a sketch candidate, under adversarial orderings") {
    val cap = 5
    // worst case for decrements: heavy terms first, then the flood
    val orderings = Seq(
      stream,
      stream.reverse,
      stream.sorted)
    orderings.foreach { s =>
      val row = HeavyHitters.sketch(s.toDF("term").coalesce(1), "term", cap).head()
      val n = row.getLong(0)
      val cands = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)).toSet
      Seq("hot", "warm").foreach { t =>
        assert(cands.contains(t),
          s"term '$t' (share > 1/${cap + 1} of $n) missing from candidates $cands")
      }
    }
  }

  test("no overcount, and undercount bounded by n/(capacity+1) across merge trees") {
    val cap = 8
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 3, 13).foreach { parts =>
      val row = HeavyHitters.sketch(
        stream.toDF("term").repartition(parts), "term", cap).head()
      val n = row.getLong(0)
      assert(n == stream.size.toLong)
      row.getSeq[org.apache.spark.sql.Row](1).foreach { r =>
        val (t, est) = (r.getString(0), r.getLong(1))
        val f = truth(t)
        assert(est <= f, s"overcounted '$t': est $est > true $f (parts=$parts)")
        assert(f - est <= n / (cap + 1),
          s"undercount of '$t' exceeds n/(cap+1): $f - $est > ${n / (cap + 1)} (parts=$parts)")
      }
    }
  }

  test("null terms are ignored entirely (not counted in n)") {
    val df = (Seq("a", "a", "b").map(Option(_)) ++ Seq(None, None))
      .toDF("term")
    val row = HeavyHitters.sketch(df, "term", 4).head()
    assert(row.getLong(0) == 3L, s"n should exclude nulls: ${row.getLong(0)}")
  }

  test("per-group sketches are independent") {
    val df = (Seq.fill(40)(("g1", "x")) ++ Seq.fill(5)(("g1", "y")) ++
      Seq.fill(30)(("g2", "y")) ++ (0 until 10).map(i => ("g2", s"z$i")))
      .toDF("g", "term")
    val got = HeavyHitters.sketchPerGroup(df, "g", "term", 2)
      .select(col("g"), col("n_total"), col("candidates")(0)("term").as("top"))
      .as[(String, Long, String)].collect().toMap2
    assert(got("g1") == (45L, "x"), got.toString)
    assert(got("g2") == (40L, "y"), got.toString)
  }

  test("exactPerGroup returns each group's true set independently, with no driver collect") {
    // different HH sets per group; g2's heavy term is g1's tail noise
    val rows =
      Seq.fill(60)(("g1", "alpha")) ++ Seq.fill(40)(("g1", "beta")) ++
        (0 until 20).map(i => ("g1", s"noise_$i")) ++      // g1: n=120, bar 40
        Seq.fill(9)(("g2", "noise_3")) ++
        (0 until 6).map(i => ("g2", s"z$i"))               // g2: n=15, bar 5
    val got = HeavyHitters.exactPerGroup(
      rows.toDF("g", "term").repartition(5), "g", "term", capacity = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("g1", "alpha", 60L), ("g2", "noise_3", 9L)), got.toString)
  }

  test("mergeStates obeys the PODS'12 bound and keeps every true heavy hitter") {
    val cap = 5
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    // arbitrary 3-way split merged pairwise — a deeper tree than any
    // single-aggregate run exercises
    val parts = stream.grouped((stream.size + 2) / 3).toSeq
    val states = parts.map(p => HeavyHitters.state(p.toDF("term"), "term", cap))
    val merged = HeavyHitters.mergeStates(cap,
      HeavyHitters.mergeStates(cap, states(0), states(1)), states(2))
    val row = merged.select(col("_n"), col("_cands")).head()
    assert(row.getLong(0) == n, s"merged n ${row.getLong(0)} != $n")
    val cands = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(cands.size <= cap, s"capacity violated: $cands")
    cands.foreach { case (t, est) =>
      assert(est <= truth(t), s"overcounted '$t': $est > ${truth(t)}")
      assert(truth(t) - est <= n / (cap + 1),
        s"undercount of '$t' exceeds n/(cap+1): ${truth(t)} - $est")
    }
    Seq("hot", "warm").foreach(t => assert(cands.exists(_._1 == t),
      s"true heavy hitter '$t' lost in merge: $cands"))
  }

  test("foldIntoStore: maintained state yields the exact set; replay no-ops; epoch mismatch is loud") {
    val wh = java.nio.file.Files.createTempDirectory("graft_hh_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val cap = 5
    val parts = stream.grouped((stream.size + 2) / 3).toSeq
    def fold(p: Seq[String], id: Long, epoch: String = "e1"): Unit =
      HeavyHitters.foldIntoStore(store, "hh", p.toDF("term"), "term", cap,
        id, epoch)
    fold(parts(0), 0L)
    fold(parts(1), 1L)
    fold(parts(1), 1L) // at-least-once replay: must not double-count
    fold(parts(2), 2L)
    def exactNow = HeavyHitters.exactFromState(
      store.read("hh").get.drop("_last_batch", "_epoch"),
      stream.toDF("term"), "term", cap)
      .as[(String, Long)].collect().toMap
    assert(exactNow == Map("hot" -> 500L, "warm" -> 300L), exactNow.toString)
    // the replay must not have inflated _n either (it feeds the share bar)
    val nStored = store.read("hh").get.select(col("_n")).head().getLong(0)
    assert(nStored == stream.size.toLong, s"replay inflated n: $nStored")
    val e = intercept[RuntimeException] { fold(Seq("x"), 0L, epoch = "other") }
    assert(e.getMessage.contains("epoch"))
  }

  test("per-group fold: maintained per-group state yields each group's exact set; replay no-ops") {
    val wh = java.nio.file.Files.createTempDirectory("graft_hhg_fold").toString
    val store = new ParquetTableStore(spark, wh)
    // distinct per-group heavy terms; g2's heavy term is g1 tail noise
    val rows =
      Seq.fill(60)(("g1", "alpha")) ++ Seq.fill(40)(("g1", "beta")) ++
        (0 until 20).map(i => ("g1", s"noise_$i")) ++
        Seq.fill(9)(("g2", "noise_3")) ++
        (0 until 6).map(i => ("g2", s"z$i"))
    val shuffled = new scala.util.Random(5).shuffle(rows)
    val parts = shuffled.grouped((shuffled.size + 2) / 3).toSeq
    def fold(p: Seq[(String, String)], id: Long): Unit =
      HeavyHitters.foldIntoStorePerGroup(store, "hhg",
        p.toDF("g", "term"), "g", "term", capacity = 2, id, "e1")
    fold(parts(0), 0L)
    fold(parts(1), 1L)
    fold(parts(1), 1L) // replay: must no-op per group too
    fold(parts(2), 2L)
    val st = store.read("hhg").get.drop("_last_batch", "_epoch")
    val got = HeavyHitters.exactFromStatePerGroup(st,
      shuffled.toDF("g", "term"), "g", "term", capacity = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("g1", "alpha", 60L), ("g2", "noise_3", 9L)), got.toString)
    // per-group _n survived the replay exactly
    val ns = st.select(col("g"), col("_n")).as[(String, Long)].collect().toMap
    assert(ns == Map("g1" -> 120L, "g2" -> 15L), ns.toString)
  }

  test("foldIntoStore recovers a state table stranded mid whole-table swap") {
    val wh = java.nio.file.Files.createTempDirectory("graft_hh_swap").toString
    val store = new ParquetTableStore(spark, wh)
    def fold(p: Seq[String], id: Long): Unit =
      HeavyHitters.foldIntoStore(store, "hh", p.toDF("term"), "term", 3, id, "e1")
    fold(Seq("a", "a", "b"), 0L)
    assert(new java.io.File(s"$wh/hh").renameTo(new java.io.File(s"$wh/_swap_hh")))
    fold(Seq("a", "c"), 1L) // must fold into the RECOVERED state, not restart
    val row = store.read("hh").get.select(col("_n"), col("_cands")).head()
    assert(row.getLong(0) == 5L, s"recovered n wrong: ${row.getLong(0)}")
    val cands = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cands == Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
      s"recovered counters wrong: $cands")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
