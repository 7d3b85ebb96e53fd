package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * fused(d) = Σ over rankings r of 1/(k + rank_r(d)). The standard way
  * to combine heterogeneous retrieval signals — lexical BM25 and
  * embedding ANN chiefly — without calibrating their incomparable score
  * scales: only RANKS enter, so a BM25 log-count and a cosine in [-1,1]
  * fuse cleanly, and k (default 60, the paper's constant) damps the
  * head so one system's top hit cannot dominate alone.
  *
  * Scale shape: each input ranking is already top-N per query (bounded
  * rows); fusion is a union + one (query, doc) hash aggregate + a TopK
  * hash aggregate — no window, no join against corpus-sized frames.
  * Determinism: each doc contributes at most one rank per ranking, and
  * the gate fuses two rankings, so the per-doc double sum is two-operand
  * and order-independent; final ties break (score desc, doc asc) in
  * both engines.
  */
object HybridRank {

  /** Fuse rankings — each (query_id, doc_id, rank) with rank 1-based —
    * into (query_id, rank, doc_id, fused·4dp). Docs absent from a
    * ranking simply contribute nothing (the RRF convention). */
  def rrf(rankings: Seq[DataFrame], k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(k.toDouble) + col("rank"))).as("contrib")))
      .reduce(_.unionByName(_))
    val fused = contribs
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("score"))
    Similarity.takeTopK(fused, topK)
      .withColumnRenamed("neighbor_id", "doc_id")
      .withColumnRenamed("score", "fused")
  }
}
