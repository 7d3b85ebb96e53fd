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

  // ---- removeDupSpans (Lee et al. exact-substring REMOVAL half) ----

  private def removed(docs: org.apache.spark.sql.DataFrame) =
    Similarity.removeDupSpans(docs, "doc_id", "text", 8)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("removeDupSpans cuts a shared span from both docs, remainder intact") {
    val docs = Seq(
      (1L, "x1 x2 x3 a b c d e f g h y1 y2 y3"),
      (2L, "z1 z2 a b c d e f g h z3 z4"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8")).toDF("doc_id", "text")
    assert(removed(docs) == Seq(
      (1L, 14L, 8L, "x1 x2 x3 y1 y2 y3"),
      (2L, 12L, 8L, "z1 z2 z3 z4"),
      (3L, 8L, 0L, "p1 p2 p3 p4 p5 p6 p7 p8")))
  }

  test("removeDupSpans removes SELF-repeated spans (positional occurrences, not per-doc df)") {
    // the whole doc is two copies of one 8-gram: both occurrences are cut
    val docs = Seq((1L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"))
      .toDF("doc_id", "text")
    assert(removed(docs) == Seq((1L, 16L, 16L, "")))
  }

  test("removeDupSpans merges overlapping duplicated-gram intervals") {
    // docs 1 and 2 share a 9-token run: two overlapping duplicated
    // 8-grams per doc merge into ONE 9-token cut, not two 8-token cuts
    val docs = Seq(
      (1L, "a b c d e f g h i u1 u2"),
      (2L, "v1 a b c d e f g h i v2")).toDF("doc_id", "text")
    assert(removed(docs) == Seq(
      (1L, 11L, 9L, "u1 u2"),
      (2L, 11L, 9L, "v1 v2")))
  }

  test("removeDupSpans: short exact-duplicate docs are fully removed via the whole-text gram") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other words"))
      .toDF("doc_id", "text")
    assert(removed(docs) == Seq(
      (1L, 2L, 2L, ""), (2L, 2L, 2L, ""), (3L, 2L, 0L, "other words")))
  }

  test("removeDupSpans: untouched docs keep their ORIGINAL text verbatim") {
    // doc 3 has odd spacing that a tokenize/rejoin roundtrip would alter;
    // the no-dup branch must pass the original through
    val docs = Seq(
      (1L, "a b c d e f g h i1"),
      (2L, "a b c d e f g h i2"),
      (3L, "lonely  doubled space")).toDF("doc_id", "text")
    val got = removed(docs)
    assert(got.find(_._1 == 3L).get._4 == "lonely  doubled space")
    // docs 1/2 share only the 8-gram a..h (their 9th token differs):
    // positions 0..7 cut, the differing tail kept
    assert(got.find(_._1 == 1L).get._4 == "i1")
    assert(got.find(_._1 == 2L).get._4 == "i2")
  }

  test("removeDupSpans invariant: every removed span recurs in the corpus, no kept segment does") {
    // generic invariant on a mixed corpus: re-derive duplicated 8-grams
    // from the ORIGINAL corpus; every kept doc segment (maximal run of
    // kept positions) must contain none of them
    val docs = Seq(
      (1L, "x1 x2 x3 a b c d e f g h y1 y2 y3"),
      (2L, "z1 z2 a b c d e f g h z3 z4"),
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"),
      (4L, "m1 m2 m3 m4 m5 m6 m7 m8 q1 q2")).toDF("doc_id", "text")
    val grams = docs.collect().flatMap { r =>
      val w = r.getString(1).split(" ")
      if (w.length >= 8) w.sliding(8).map(_.mkString(" ")).toSeq else Seq(w.mkString(" "))
    }
    val dup = grams.groupBy(identity).filter(_._2.length > 1).keySet
    assert(dup.nonEmpty)
    removed(docs).foreach { case (_, _, _, clean) =>
      // kept segments are what survives; within a doc the join of kept
      // tokens may bridge two segments, but no ORIGINAL duplicated gram
      // may appear as a contiguous run of the original doc inside it —
      // check directly: no duplicated gram is a substring of clean_text
      dup.foreach(g => assert(!clean.contains(g), s"duplicated gram '$g' survived in '$clean'"))
    }
  }
}
