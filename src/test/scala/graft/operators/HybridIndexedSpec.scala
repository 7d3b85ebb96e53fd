package graft.operators

import graft.{SparkEntry, SparkSpec}

class HybridIndexedSpec extends SparkSpec {

  test("stored-index hybrid fusion ≡ the one-shot q97 fusion, rank for rank") {
    // q154 serves the SAME queries from a Bm25Index (two segments) and an
    // IvfIndex (build + append) probed exhaustively; q97 runs the one-shot
    // scorer + brute-force scan. The lifecycle must not move a fused rank.
    val stored = SparkEntry.q154_hybrid_indexed(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val oneShot = SparkEntry.q97_hybrid_rrf(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty)
    assert(stored == oneShot)
  }
}
