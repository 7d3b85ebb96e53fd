package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def graph(es: (Long, Long)*) = es.toSeq.toDF("src", "dst")

  private def count(es: (Long, Long)*): (Long, Long, Long, Long, Double) = {
    val r = Triangles.globalCount(graph(es: _*), "src", "dst").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("a single triangle") {
    assert(count((1L, 2L), (2L, 3L), (1L, 3L)) == ((3L, 3L, 3L, 1L, 1.0)))
  }

  test("K4 has four triangles and clustering 1.0") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(count(k4: _*) == ((4L, 6L, 12L, 4L, 1.0)))
  }

  test("a path has wedges but no triangles") {
    assert(count((1L, 2L), (2L, 3L), (3L, 4L)) == ((4L, 3L, 2L, 0L, 0.0)))
  }

  test("an empty / edge-free graph yields the zero row") {
    val r = Triangles.globalCount(graph(), "src", "dst").collect().head
    assert((r.getLong(0), r.getLong(3), r.getDouble(4)) == ((0L, 0L, 0.0)))
  }

  test("orientation, duplicates and self-loops are normalized away") {
    // the same triangle given with reversed edges, dups and a loop
    assert(count((2L, 1L), (1L, 2L), (3L, 2L), (3L, 1L), (2L, 2L)) ==
      ((3L, 3L, 3L, 1L, 1.0)))
  }

  test("hub graph: star + one closing edge — exactly one triangle") {
    // hub 1 connects to 2..7; only (2,3) closes
    val star = (2L to 7L).map(1L -> _) :+ (2L, 3L)
    val (n, e, w, t, _) = count(star: _*)
    assert((n, e, t) == ((7L, 7L, 1L)))
    // wedges: hub C(6,2)=15, plus nodes 2 and 3 with deg 2 → 1 each
    assert(w == 17L)
  }

  test("matches the brute-force id-ordered count on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val got = Triangles.globalCount(es.toDF("src", "dst"), "src", "dst")
      .collect().head.getLong(3)
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val nodes = canon.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if canon((a, b)) && canon((b, c)) && canon((a, c))
    } yield 1).size.toLong
    assert(got == brute)
  }
}
