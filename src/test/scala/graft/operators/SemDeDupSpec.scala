package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private def norm(xs: Double*): Seq[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat)
  }
  private def vecs(rows: (Long, Seq[Float])*) = rows.toDF("id", "v")
  private def cents(rows: (Int, Seq[Float])*) =
    rows.toDF("cell", "centroid")

  // two orthogonal cluster directions
  private val e1 = norm(1, 0, 0, 0)
  private val e2 = norm(0, 1, 0, 0)
  private val twoCells = cents(0 -> e1, 1 -> e2)

  test("an exact twin drops in favor of the lower id (tie-break), originals kept") {
    val df = vecs(1L -> e1, 2L -> e2, 100L -> e1)
    val got = SemDeDup.verdicts(df, "id", "v", twoCells, 0.9)
      .select("id", "dropped").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false, 100L -> true), got.toString)
    val kept = SemDeDup.dedup(df, "id", "v", twoCells, 0.9)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("the paper's keep rule: the vector FARTHER from its centroid survives") {
    // u is nearly on the centroid, v is tilted away; cos(u, v) is high
    val u = norm(1, 0.05, 0, 0)  // cs ≈ 0.9988
    val v = norm(1, 0.35, 0, 0)  // cs ≈ 0.9437, cos(u,v) ≈ 0.96
    val got = SemDeDup.verdicts(vecs(1L -> u, 2L -> v), "id", "v", twoCells, 0.9)
      .select("id", "dropped").as[(Long, Boolean)].collect().toMap
    // v (lower centroid_sim) ranks better: u is dominated, v survives
    assert(got == Map(1L -> true, 2L -> false), got.toString)
  }

  test("no cross-cluster drops: similar vectors in different cells both survive") {
    // both 45°-ish between e1 and e2, on opposite sides: cos(u,w) ≈ 1 but
    // u assigns to cell 0, w to cell 1
    val u = norm(1, 0.95, 0, 0)
    val w = norm(0.95, 1, 0, 0)
    val got = SemDeDup.verdicts(vecs(1L -> u, 2L -> w), "id", "v", twoCells, 0.9)
      .select("id", "cell", "dropped").as[(Long, Int, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((0, false)), got.toString)
    assert(got(2L) == ((1, false)), got.toString)
  }

  test("assignment tie-breaks to the lowest cell deterministically") {
    val mid = norm(1, 1, 0, 0) // equidistant from e1 and e2
    val got = SemDeDup.verdicts(vecs(1L -> mid), "id", "v", twoCells, 0.9)
      .select("cell").as[Int].head()
    assert(got == 0)
  }

  test("maxCluster cap removes the mega-cluster's pair space but keeps its rows") {
    val boiler = (0L until 20L).map(i => i -> e1)
    val pair = Seq(100L -> e2, 101L -> e2)
    val df = vecs((boiler ++ pair): _*)
    val capped = SemDeDup.verdicts(df, "id", "v", twoCells, 0.9, maxCluster = 10)
      .select("id", "dropped").as[(Long, Boolean)].collect().toMap
    assert(capped.size == 22, s"verdict rows must survive the cap: ${capped.size}")
    assert((0L until 20L).forall(!capped(_)), "over-cap cluster members must all be kept")
    assert(!capped(100L) && capped(101L), "the selective cell still dedups")
    val uncapped = SemDeDup.verdicts(df, "id", "v", twoCells, 0.9)
      .filter(col("dropped")).select("id").as[Long].collect().toSet
    assert(uncapped == (1L until 20L).toSet + 101L, uncapped.toString)
  }
}
