package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple banana"),
    (3L, "durian elderberry fig grape honeydew"),
    (4L, "apple durian"),
    (5L, "banana banana banana banana")
  ).toDF("doc_id", "text")

  private def q(rows: (Long, String)*) = rows.toDF("query_id", "term")

  test("scores match the closed-form BM25 computed by hand") {
    // corpus stats: N=5, dl = 3,3,5,2,4, avgdl = 17/5 = 3.4
    // df(apple)=3 → idf = ln(1 + (5-3+0.5)/(3+0.5)) = ln(1 + 2.5/3.5)
    val got = Bm25.search(docs, "doc_id", "text", q(1L -> "apple"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val idf = math.log(1 + 2.5 / 3.5)
    def bm25(tf: Long, dl: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.4))
    assert(got.keySet == Set(1L, 2L, 4L))
    Seq((1L, 1L, 3L), (2L, 2L, 3L), (4L, 1L, 2L)).foreach { case (id, tf, dl) =>
      val want = math.rint(bm25(tf, dl) * 1e4) / 1e4
      assert(math.abs(got(id) - want) < 1e-9, s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("term saturation and length normalization order the ranking sensibly") {
    val ranked = Bm25.search(docs, "doc_id", "text", q(1L -> "apple"), 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    // doc 2 (tf=2, short) beats doc 4 (tf=1, shortest) beats doc 1 (tf=1, longer)
    assert(ranked == Seq(2L, 4L, 1L), ranked.toString)
  }

  test("a rare term outranks a common one at equal tf (idf discrimination)") {
    val got = Bm25.search(docs, "doc_id", "text",
        q(1L -> "durian", 2L -> "apple"), 10)
      .select("query_id", "doc_id", "score").as[(Long, Long, Double)].collect()
    val rareTop = got.filter(_._1 == 1L).map(_._3).max
    val commonTop = got.filter(_._1 == 2L).map(_._3).max
    assert(rareTop > commonTop,
      s"df=2 'durian' ($rareTop) must outscore df=3 'apple' ($commonTop)")
  }

  test("multi-term queries sum per-term contributions; docs matching no term are absent") {
    val got = Bm25.search(docs, "doc_id", "text",
        q(7L -> "apple", 7L -> "banana"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 5L), got.toString)
    val single = Bm25.search(docs, "doc_id", "text", q(7L -> "apple"), 10)
      .filter($"doc_id" === 2L).select("score").as[Double].head()
    val both = Bm25.search(docs, "doc_id", "text",
        q(7L -> "apple", 7L -> "banana"), 10)
      .filter($"doc_id" === 2L).select("score").as[Double].head()
    assert(both > single, "adding a matching term must not lower the score")
  }

  test("a repeated query term contributes once (BM25 saturates per unique term)") {
    val once = Bm25.search(docs, "doc_id", "text", q(1L -> "apple"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val twice = Bm25.search(docs, "doc_id", "text",
        q(1L -> "apple", 1L -> "apple"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(once == twice, s"duplicate query term changed scores:\n$once\nvs\n$twice")
  }

  test("the scoring plan has no window and broadcasts all query-sized sides") {
    // search() returns a MATERIALIZED frame (so the big stats blocks can
    // be released before returning — ADVICE r14), which collapses its
    // executed plan to an RDD scan; the shape contract lives in the lazy
    // scoring composition, so assert on that directly
    val stats = Bm25.docTermStats(docs, "doc_id", "text")
    val n = stats.select($"id", $"dl").distinct()
      .agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
    val plan = Bm25.scoreStats(stats, n, q(1L -> "apple"), 10, 1.2, 0.75)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in BM25 plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins for query-sized sides:\n$plan")
  }
}
