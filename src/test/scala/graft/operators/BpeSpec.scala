package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. 2016 worked example (no end-of-word marker):
  // low×5, lower×2, newest×6, widest×3
  private def sennrichVocab =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")

  test("train reproduces the hand-computed Sennrich merge sequence") {
    val merges = Bpe.train(sennrichVocab, rounds = 4)
    assert(merges.map(m => (m.rank, m.lft, m.rgt, m.merged, m.cnt)) == Seq(
      (1, "e", "s", "es", 9L),   // es: 6 (newest) + 3 (widest)
      (2, "es", "t", "est", 9L), // est
      (3, "l", "o", "lo", 7L),   // lo beats ow 7=7 on the lexicographic tie
      (4, "lo", "w", "low", 7L)))
  }

  test("train is deterministic across runs") {
    val a = Bpe.train(sennrichVocab, rounds = 4)
    val b = Bpe.train(sennrichVocab, rounds = 4)
    assert(a == b)
  }

  test("applyMerges segments an UNSEEN word by the learned greedy rule") {
    val merges = Bpe.train(sennrichVocab, rounds = 4)
    val got = Seq("lowest").toDF("w")
      .select(Bpe.symbolsOf(Bpe.applyMerges(col("w"), merges)).as("s"))
      .as[Seq[String]].collect().head
    // l o w e s t -> (e,s) -> (es,t) -> (l,o) -> (lo,w) => [low, est]
    assert(got == Seq("low", "est"))
  }

  test("applyMerges on a vocabulary word equals its trained segmentation") {
    val merges = Bpe.train(sennrichVocab, rounds = 4)
    val got = sennrichVocab.select(col("word"),
        Bpe.symbolsOf(Bpe.applyMerges(col("word"), merges)).as("s"))
      .orderBy("word").as[(String, Seq[String])].collect().toSeq
    assert(got == Seq(
      ("low", Seq("low")),
      ("lower", Seq("low", "e", "r")),
      ("newest", Seq("n", "e", "w", "est")),
      ("widest", Seq("w", "i", "d", "est"))))
  }

  test("merge application is greedy left-to-right non-overlapping (a a a a under (a,a))") {
    val merges = Bpe.train(Seq(("aaaa", 2L)).toDF("word", "cnt"), rounds = 2)
    // (a,a) occurs 3 times per word (overlapping count, Sennrich
    // get_stats convention) ×2 words = 6; applying merges the 1st+2nd
    // and 3rd+4th chars -> [aa, aa]; round 2 merges (aa,aa)×2
    assert(merges.map(m => (m.lft, m.rgt, m.cnt)) ==
      Seq(("a", "a", 6L), ("aa", "aa", 2L)))
  }

  test("train stops early when no adjacent pair remains") {
    val merges = Bpe.train(Seq(("ab", 3L)).toDF("word", "cnt"), rounds = 8)
    // round 1 merges (a,b); afterwards every word is one symbol
    assert(merges.map(m => (m.lft, m.rgt)) == Seq(("a", "b")))
  }

  test("wordVocab drops empties and separator-bearing words") {
    val docs = Seq((1L, "ab ab  x|y cd")).toDF("doc_id", "text")
    val got = Bpe.wordVocab(docs, "text").orderBy("word")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 2L), ("cd", 1L)))
  }
}
