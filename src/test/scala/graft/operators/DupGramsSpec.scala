package graft.operators

import graft.SparkSpec

class DupGramsSpec extends SparkSpec {
  import spark.implicits._

  test("dupGramStats counts corpus-duplicated n-grams per document") {
    val docs = Seq(
      (1L, "a b c d e f g h x1 x2"), // grams: [a..h],[b..x1],[c..x2]
      (2L, "z a b c d e f g h"),     // grams: [z..g],[a..h] — shares [a..h]
      (3L, "p q r s t u v w")        // exactly 8 tokens: one unique gram
    ).toDF("doc_id", "text")
    val got = Similarity.dupGramStats(docs, "doc_id", "text", 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L), (2L, 2L, 1L), (3L, 1L, 0L)))
  }

  test("short documents fall back to a whole-text gram (exact-dup detectable)") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other")).toDF("doc_id", "text")
    val got = Similarity.dupGramStats(docs, "doc_id", "text", 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }

  test("repeated gram inside ONE doc does not count as corpus-duplicated") {
    // doc repeats its own 8-gram; distinct-per-doc grams must dedupe it
    val docs = Seq((1L, "a b c d e f g h a b c d e f g h")).toDF("doc_id", "text")
    val got = Similarity.dupGramStats(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.head._3 == 0L, s"self-repetition flagged as corpus dup: $got")
  }
}
