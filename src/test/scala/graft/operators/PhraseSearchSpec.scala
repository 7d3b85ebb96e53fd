package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "quick brown quick brown fox"),
    (3L, "brown quick"),
    (4L, "buffalo buffalo buffalo buffalo"),
    (5L, "the quick")
  ).toDF("doc_id", "text")

  private def occ(phrase: String): Set[(Long, Long)] =
    PhraseSearch.occurrences(docs, "doc_id", "text",
      Seq(("q", phrase)).toDF("qid", "phrase"), "qid", "phrase")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet

  test("verbatim occurrences with exact start positions") {
    assert(occ("quick brown") == Set((1L, 1L), (2L, 0L), (2L, 2L)))
    assert(occ("brown fox") == Set((1L, 2L), (2L, 3L)))
  }

  test("word order matters (the bag-of-words blind spot)") {
    assert(occ("brown quick") == Set((2L, 1L), (3L, 0L)),
      "overlapping alternation must find the interleaved match in doc 2")
  }

  test("repeated-term phrases count correctly, including overlaps") {
    // 'buffalo buffalo' occurs at starts 0,1,2 in doc 4
    assert(occ("buffalo buffalo") == Set((4L, 0L), (4L, 1L), (4L, 2L)))
    assert(occ("buffalo buffalo buffalo buffalo") == Set((4L, 0L)))
  }

  test("no partial-phrase false positives") {
    assert(occ("quick brown fox jumps high").isEmpty,
      "a phrase longer than any match must return nothing")
    assert(occ("the fox").isEmpty,
      "non-adjacent terms must not match")
  }

  test("multi-query batch summarizes per query") {
    val qs = Seq(("a", "quick brown"), ("b", "the quick"), ("c", "zzz"))
      .toDF("qid", "phrase")
    val m = PhraseSearch.search(docs, "doc_id", "text", qs, "qid", "phrase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m("a") == ((2L, 3L, 1L)))
    assert(m("b") == ((2L, 2L, 1L)))
    assert(!m.contains("c"), "no-hit queries are absent by contract")
  }

  test("randomized: occurrences ≡ brute-force substring scan") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("a", "b", "c")
      val corpus = Seq.tabulate(60) { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(10))(
          vocab(rnd.nextInt(3))).mkString(" "))
      }
      val phrase = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(3)))
        .mkString(" ")
      val got = PhraseSearch.occurrences(corpus.toDF("doc_id", "text"),
        "doc_id", "text",
        Seq(("q", phrase)).toDF("qid", "phrase"), "qid", "phrase")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val p = phrase.split(" ").toSeq
      val brute = (for {
        (id, text) <- corpus
        toks = text.split(" ").toSeq
        s <- 0 to toks.length - p.length
        if toks.slice(s, s + p.length) == p
      } yield (id, s.toLong)).toSet
      assert(got == brute,
        s"seed $seed phrase '$phrase': missing ${brute -- got}, extra ${got -- brute}")
    }
  }

  test("postings shuffle only the query vocabulary") {
    val df = PhraseSearch.occurrences(docs, "doc_id", "text",
      Seq(("q", "quick brown")).toDF("qid", "phrase"), "qid", "phrase")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term filter must broadcast, not shuffle:\n$plan")
  }
}
