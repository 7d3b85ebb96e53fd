package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[SetSimJoin]] — exact prefix-filtered similarity joins. The load-bearing
  * property is COMPLETENESS: the prefix-filter candidate join must lose no
  * pair with true similarity ≥ t, so the operator's output must equal the
  * brute-force all-pairs computation exactly. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  // unigram (n = 1) fixtures make gram sets equal token sets, so expected
  // similarities are controlled arithmetic: J(A,B) = |A∩B| / |A∪B|
  private val handDocs = Seq(
    (1L, "a b c d"),     // A = {a,b,c,d}
    (2L, "a b c e"),     // J(1,2) = 3/5 = 0.6 exactly (boundary)
    (3L, "a b c d"),     // J(1,3) = 1.0
    (4L, "x y z w"),     // disjoint from 1-3
    (5L, "a x q r s t u v")) // low overlap with everything

  test("allPairsJaccard: hand-computed pairs, boundary J = t retained") {
    val docs = handDocs.toDF("doc_id", "text")
    val got = SetSimJoin.allPairsJaccard(docs, "doc_id", "text",
        n = 1, threshold = 0.6)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 0.6), (1L, 3L, 1.0), (2L, 3L, 0.6)))
  }

  /** Brute-force all-pairs truth over any doc frame (crossJoin — test only). */
  private def bruteJaccard(docs: org.apache.spark.sql.DataFrame, n: Int,
                           t: Double): Seq[(Long, Long, Double)] = {
    val g = docs.select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("_w"))
      .select(col("doc_id"), Similarity.shingleHashesOf(col("_w"), n).as("grams"))
    val a = g.select(col("doc_id").as("id_a"), col("grams").as("ga"))
    val b = g.select(col("doc_id").as("id_b"), col("grams").as("gb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("_j", size(array_intersect(col("ga"), col("gb"))).cast("double") /
        size(array_union(col("ga"), col("gb"))).cast("double"))
      .filter(col("_j") >= t)
      .select(col("id_a"), col("id_b"), round(col("_j"), 4).as("j"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
  }

  test("allPairsJaccard: completeness — equals brute force on a deterministic random corpus") {
    // 60 docs over a 30-token vocab with skewed frequencies (token t has
    // weight ~ 1/(t+1)), lengths 6..18 — plenty of sharing, heavy-df heads
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"w$i")
    def draw(): String = vocab(math.min(29, (math.pow(rnd.nextDouble(), 2) * 30).toInt))
    val docs = (1 to 60).map { i =>
      (i.toLong, (0 until (6 + rnd.nextInt(13))).map(_ => draw()).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val got = SetSimJoin.allPairsJaccard(docs, "doc_id", "text", n = 1, threshold = t)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got === bruteJaccard(docs, 1, t), s"threshold $t")
    }
  }

  test("allPairsJaccard: trigram completeness on the real fixture subset") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
    val got = SetSimJoin.allPairsJaccard(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === bruteJaccard(docs, 3, 0.6))
    assert(got.nonEmpty) // fixture has near-dup replicas in this residue class
  }

  test("allPairsJaccard: maxBucket documents the exactness trade") {
    // every pair shares ONLY the boilerplate tokens h1/h2 (df = 4 each,
    // the corpus's most frequent); the third token is unique per doc.
    // J = 2/4 = 0.5 for every pair. Each doc's prefix (p = 2) is its
    // unique token plus ONE h-token whose bucket has occupancy 4, so
    // cap = 3 prunes the only shared prefix bucket → the capped join
    // loses the pairs the uncapped one proves.
    val docs = Seq(
      (1L, "h1 h2 u1"), (2L, "h1 h2 u2"),
      (3L, "h1 h2 u3"), (4L, "h1 h2 u4")).toDF("doc_id", "text")
    val exact = SetSimJoin.allPairsJaccard(docs, "doc_id", "text", n = 1, threshold = 0.5)
    assert(exact.count() === 6)
    val capped = SetSimJoin.allPairsJaccard(docs, "doc_id", "text", n = 1,
      threshold = 0.5, maxBucket = 3)
    assert(capped.count() === 0)
  }

  test("containmentJoin: planted substring is found; Jaccard would miss it") {
    val corpus = Seq(
      (10L, "a b c d e f g h i j k l m n o p"),
      (11L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    // probe = tokens 3..7 of doc 10: every trigram of the probe is a
    // trigram of doc 10 → containment 1.0; J ≈ 3/14 ≪ any threshold
    val probes = Seq((900L, "c d e f g")).toDF("doc_id", "text")
    val got = SetSimJoin.containmentJoin(probes, corpus, "doc_id", "text",
        n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((900L, 10L, 1.0)))
    // sanity: the symmetric join at the same threshold finds nothing
    val all = probes.unionByName(corpus)
    assert(SetSimJoin.allPairsJaccard(all, "doc_id", "text", n = 3,
      threshold = 0.8).count() === 0)
  }

  test("containmentJoin: self-join (probes eq corpus) excludes a = b and is direction-correct") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // superset doc
      (2L, "c d e f g"),       // contained in 1 (trigrams subset)
      (3L, "q r s t u")).toDF("doc_id", "text")
    val got = SetSimJoin.containmentJoin(docs, docs, "doc_id", "text",
        n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // 2 ⊆ 1 but not 1 ⊆ 2: containment is directed
    assert(got === Seq((2L, 1L, 1.0)))
  }

  test("containmentJoin: completeness vs brute force on the fixture") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 7 === 0)
    val probes = corpus.select((col("doc_id") + 5000000L).as("doc_id"),
      array_join(slice(split(col("text"), " "), lit(1),
        ceil(size(split(col("text"), " ")) * 0.3).cast("int")), " ").as("text"))
    val got = SetSimJoin.containmentJoin(probes, corpus, "doc_id", "text",
        n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val gp = probes.select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("_w"))
      .select(col("doc_id").as("id_a"), Similarity.shingleHashesOf(col("_w"), 3).as("ga"))
    val gc = corpus.select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("_w"))
      .select(col("doc_id").as("id_b"), Similarity.shingleHashesOf(col("_w"), 3).as("gb"))
    val brute = gp.crossJoin(gc)
      .withColumn("_c", size(array_intersect(col("ga"), col("gb"))).cast("double") /
        size(col("ga")).cast("double"))
      .filter(col("_c") >= 0.8)
      .select(col("id_a"), col("id_b"), round(col("_c"), 4).as("c"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === brute)
    assert(got.nonEmpty)
  }
}
