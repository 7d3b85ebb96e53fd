package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  // training corpus: "a b" ×3, "a c" ×1 → c(a b)=3, c(a c)=1, c(a·)=4,
  // V = 3 (a, b, c)
  private val ref = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
    .toDF("doc_id", "text")

  test("train: counts, derived left contexts, vocab size") {
    val m = BigramLm.train(ref, "text")
    assert(m.bigrams.as[(String, Long)].collect().toMap ===
      Map("a b" -> 3L, "a c" -> 1L))
    assert(m.lefts.as[(String, Long)].collect().toMap === Map("a" -> 4L))
    assert(m.vocab.as[Long].collect().head === 3L)
  }

  test("scoreDocs: hand-computed smoothed probabilities") {
    val m = BigramLm.train(ref, "text")
    val docs = Seq(
      (10L, "a b"),      // P = (3+1)/(4+3) = 4/7
      (11L, "a c"),      // P = (1+1)/(4+3) = 2/7
      (12L, "a z"),      // unseen bigram, seen left: (0+1)/(4+3) = 1/7
      (13L, "z q"),      // unseen left: (0+1)/(0+3) = 1/3
      (14L, "a b c"),    // bigrams: "a b" (4/7), "b c" unseen left b -> 1/3
      (15L, "solo"))     // 1 token: no score
    .toDF("doc_id", "text")
    val got = BigramLm.scoreDocs(docs, "doc_id", "text", m)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def lp(ps: Double*): Double =
      BigDecimal(ps.map(math.log10).sum / ps.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(
      10L -> (1L, lp(4.0 / 7)), 11L -> (1L, lp(2.0 / 7)),
      12L -> (1L, lp(1.0 / 7)), 13L -> (1L, lp(1.0 / 3)),
      14L -> (2L, lp(4.0 / 7, 1.0 / 3))))
  }

  test("scoreDocs: transition-improbable doc scores below fluent doc with same unigrams") {
    // fluent corpus of "x y" transitions vs a scrambled doc "y x": same
    // unigram profile, reversed transitions
    val corpus = (1L to 50L).map(i => (i, "x y")).toDF("doc_id", "text")
    val m = BigramLm.train(corpus, "text")
    val got = BigramLm.scoreDocs(
        Seq((100L, "x y"), (101L, "y x")).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(100L) > got(101L))
  }

  test("scoreDocs: keep columns ride along for rollups") {
    val m = BigramLm.train(ref, "text")
    val docs = Seq((1L, "a b", "web"), (2L, "a c", "book"))
      .toDF("doc_id", "text", "source")
    val got = BigramLm.scoreDocs(docs, "doc_id", "text", m, keep = Seq("source"))
    assert(got.columns.toSeq === Seq("doc_id", "source", "n_bigrams", "doc_lp"))
    assert(got.select("source").as[String].collect().toSet === Set("web", "book"))
  }
}
