package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContrastivePairsSpec extends SparkSpec {
  import spark.implicits._

  private def ring(n: Int) = (0 until n).map { i =>
    val th = 2 * math.Pi * i / n
    (i.toLong, Seq(math.cos(th).toFloat, math.sin(th).toFloat, 0.0f, 0.0f))
  }.toDF("id", "v")

  private def mine(corpus: org.apache.spark.sql.DataFrame, tau: Double,
                   kNeg: Int = 3, depth: Int = 10) = {
    val queries = corpus.filter($"id" === 0L)
      .select(($"id" + 1000L).as("id"), $"v")
    val positives = Seq((1000L, 0L)).toDF("query_id", "pos_id")
    ContrastivePairs.mine(queries, positives, corpus, "id", "v",
      kNeg, tau, depth)
  }

  test("the positive comes back at rank 0 with its exact score; negatives never include it") {
    val got = mine(ring(24), tau = 0.99)
      .select("role", "rank", "neighbor_id", "score")
      .as[(String, Long, Long, Double)].collect()
    val pos = got.filter(_._1 == "positive")
    assert(pos.length == 1 && pos.head._2 == 0L && pos.head._3 == 0L &&
      math.abs(pos.head._4 - 1.0) < 1e-6, pos.toSeq.toString)
    val negs = got.filter(_._1 == "negative")
    assert(negs.length == 3)
    assert(!negs.exists(_._3 == 0L), "positive leaked into negatives")
    // hardest negatives on a ring are the immediate neighbors of 0
    assert(negs.map(_._3).toSet == Set(1L, 23L, 2L) || negs.map(_._3).toSet == Set(1L, 23L, 22L),
      negs.toSeq.toString)
  }

  test("false negatives (near-dups of the positive) are excluded, not ranked") {
    // plant an exact copy of the positive under a new id: cos = 1 ≥ tau
    val corpus = ring(24).unionByName(
      ring(24).filter($"id" === 0L).select(($"id" + 500L).as("id"), $"v"))
    val negs = mine(corpus, tau = 0.99)
      .filter($"role" === "negative").select("neighbor_id").as[Long].collect().toSet
    assert(!negs.contains(500L),
      s"the planted near-dup of the positive must be filtered as a false negative: $negs")
    // with a permissive tau it IS the top negative (it ranks first)
    val loose = mine(corpus, tau = 1.1)
      .filter($"role" === "negative").orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    assert(loose.head == 500L, loose.toSeq.toString)
  }

  test("multi-positive queries: no positive leaks into negatives, no duplicate rows") {
    val corpus = ring(24)
    val queries = corpus.filter($"id" === 0L).select(($"id" + 1000L).as("id"), $"v")
    // positives 0 AND 1: candidate 1 must not survive via its pairing
    // with positive 0, and candidates must not duplicate per positive
    val positives = Seq((1000L, 0L), (1000L, 1L)).toDF("query_id", "pos_id")
    val rows = ContrastivePairs.mine(queries, positives, corpus, "id", "v",
        kNegatives = 4, falseNegTau = 1.1, searchDepth = 10)
      .select("role", "neighbor_id").as[(String, Long)].collect()
    val negs = rows.filter(_._1 == "negative").map(_._2)
    assert(!negs.contains(0L) && !negs.contains(1L),
      s"a labeled positive leaked into the negatives: ${negs.toSeq}")
    assert(negs.distinct.length == negs.length,
      s"duplicate negative rows: ${negs.toSeq}")
    assert(rows.count(_._1 == "positive") == 2, "both positives reported")
  }

  test("searchDepth truncates BEFORE filtering (the documented contract)") {
    // depth 4: candidates are ranks 1-4 (ids 1,23,2,22); tau excludes
    // nothing; kNeg 3 keeps the 3 best of those
    val negs = mine(ring(24), tau = 0.99, kNeg = 3, depth = 4)
      .filter($"role" === "negative").orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(negs.length == 3)
    assert(negs.toSet.subsetOf(Set(1L, 23L, 2L, 22L)), negs.toString)
  }
}
