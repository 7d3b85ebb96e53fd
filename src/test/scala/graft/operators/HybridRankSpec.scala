package graft.operators

import graft.SparkSpec

class HybridRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("fused scores match the closed form and rank correctly") {
    val a = ranking((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val b = ranking((1L, 11L, 1L), (1L, 10L, 2L), (1L, 13L, 3L))
    val got = HybridRank.rrf(Seq(a, b), k = 60, topK = 10)
      .orderBy("rank")
      .select("doc_id", "fused").as[(Long, Double)].collect().toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // 10: 1/61 + 1/62; 11: 1/62 + 1/61 (tie with 10 → doc asc);
    // 12: 1/63; 13: 1/63 (tie → doc asc)
    val both = r4(1.0 / 61 + 1.0 / 62)
    val single = r4(1.0 / 63)
    assert(got == Seq((10L, both), (11L, both), (12L, single), (13L, single)),
      got.toString)
  }

  test("a doc present in one ranking contributes only that ranking's term") {
    val a = ranking((1L, 10L, 1L))
    val b = ranking((1L, 20L, 1L))
    val got = HybridRank.rrf(Seq(a, b), k = 60, topK = 10)
      .select("doc_id", "fused").as[(Long, Double)].collect().toMap
    val one = math.rint(1.0 / 61 * 1e4) / 1e4
    assert(got == Map(10L -> one, 20L -> one), got.toString)
  }

  test("consensus beats a single top hit (the RRF damping property)") {
    // doc 30 is rank 1 in one list only; doc 40 is rank 2 in BOTH
    val a = ranking((1L, 30L, 1L), (1L, 40L, 2L))
    val b = ranking((1L, 50L, 1L), (1L, 40L, 2L))
    val top = HybridRank.rrf(Seq(a, b), k = 60, topK = 1)
      .select("doc_id").as[Long].head()
    assert(top == 40L, s"two rank-2 votes (2/62) must beat one rank-1 (1/61): got $top")
  }

  test("queries fuse independently") {
    val a = ranking((1L, 10L, 1L), (2L, 20L, 1L))
    val got = HybridRank.rrf(Seq(a), k = 60, topK = 5)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }
}
