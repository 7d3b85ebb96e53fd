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

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
