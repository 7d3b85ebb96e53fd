package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // (id, name, block): a 3-chain in block 1 (a~b~c transitively, a!~c
  // directly), a pair in block 2, a cross-block near-name that must NOT
  // match, and singletons
  private lazy val recs = Seq(
    (1L, "smith", 1), (2L, "smyth", 1), (3L, "smythe", 1),
    (10L, "jones", 2), (11L, "janes", 2),
    (20L, "smith", 2), // same name as id 1 but different block
    (30L, "zzzzz", 1)
  ).toDF("id", "name", "blk")

  test("chains close transitively; blocking separates identical names") {
    val labels = EntityResolution.resolve(recs, "id", "name", Seq("blk"),
      maxEditDist = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L,
      s"smith~smyth~smythe must chain into one entity: $labels")
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert(labels(20L) == 20L,
      "identical name in another block must stay unmatched (blocking recall trade)")
    assert(labels(30L) == 30L)
  }

  test("clusters roll-up: survivor id, sizes, name span") {
    val rows = EntityResolution.clusters(recs, "id", "name", Seq("blk"),
      maxEditDist = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3))))
      .toMap
    assert(rows == Map(
      1L -> ((3L, "smith", "smythe")),
      10L -> ((2L, "janes", "jones"))))
  }

  test("matchPairs carries the distance and respects the threshold") {
    val pairs = EntityResolution.matchPairs(recs, "id", "name", Seq("blk"),
      maxEditDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 1)
    assert(pairs((1L, 3L)) == 2, "smith→smythe is 2 edits and now matches")
    assert(!pairs.contains((1L, 20L)), "cross-block pairs are never compared")
  }

  test("null ids, names or block keys are excluded") {
    val withNulls = recs.unionByName(Seq(
      (Option.empty[Long], Option("smith"), 1),
      (Option(40L), Option.empty[String], 1))
      .toDF("id", "name", "blk"))
    val pairs = EntityResolution.matchPairs(withNulls, "id", "name",
      Seq("blk"), maxEditDist = 1)
    assert(pairs.filter(col("id_a").isNull || col("id_b").isNull).isEmpty)
  }

  test("over-cap blocks are dropped wholesale") {
    val big = (1 to 50).map(i => (i.toLong, f"n$i%03d", 1))
      .toDF("id", "name", "blk")
    val pairs = EntityResolution.matchPairs(big, "id", "name", Seq("blk"),
      maxEditDist = 3, maxBlock = 10)
    assert(pairs.isEmpty, "a block over the cap must produce no candidates")
  }

  test("deletion neighborhood ≡ unblocked brute force at distance 1") {
    // random short strings over a 3-letter alphabet: dense dist-1 space
    val rnd = new scala.util.Random(13)
    val names = Seq.fill(120)(Seq.fill(2 + rnd.nextInt(4))(
      ('a' + rnd.nextInt(3)).toChar).mkString)
    val recsR = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val got = EntityResolution.matchPairsDeletion1(recsR, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = (for {
      i <- names.indices; j <- names.indices if i < j
      d = levenshteinRef(names(i), names(j)) if d <= 1
    } yield (i.toLong, j.toLong) -> d).toMap
    assert(got == brute,
      s"missing ${brute.keySet -- got.keySet}, extra ${got.keySet -- brute.keySet}")
    assert(brute.nonEmpty, "fixture must contain dist-<=1 pairs")
  }

  test("deletion neighborhood covers all three edit kinds and no more") {
    val recsR = Seq((1L, "smith"), (2L, "smyth"), // substitution
      (3L, "smiths"),                             // insertion vs 1
      (4L, "smit"),                               // deletion vs 1
      (5L, "smith"),                              // exact dup name
      (6L, "psmith"),                             // prepend-insertion vs 1
      (7L, "smythe")                              // dist 2 from smith
    ).toDF("id", "name")
    val got = EntityResolution.matchPairsDeletion1(recsR, "id", "name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.get((1L, 2L)) == Some(1))
    assert(got.get((1L, 3L)) == Some(1))
    assert(got.get((1L, 4L)) == Some(1))
    assert(got.get((1L, 5L)) == Some(0), "equal names on distinct ids are dist 0")
    assert(got.get((1L, 6L)) == Some(1))
    assert(!got.contains((1L, 7L)), "dist-2 pair must be verified away")
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("invalid arguments fail loudly") {
    intercept[IllegalArgumentException] {
      EntityResolution.matchPairs(recs, "id", "name", Seq.empty, 1)
    }
    intercept[IllegalArgumentException] {
      EntityResolution.matchPairs(recs, "id", "name", Seq("blk"), -1)
    }
  }
}
