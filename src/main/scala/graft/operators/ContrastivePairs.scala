package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Hard-negative mining for contrastive / embedding training (the DPR
  * recipe — Karpukhin et al., EMNLP 2020): for each (query, positive)
  * pair, the informative negatives are the corpus items the retriever
  * currently ranks HIGHEST that are not the positive — random negatives
  * are too easy and teach nothing. The subtlety this operator makes
  * first-class is FALSE-negative filtering: a candidate that is a
  * near-duplicate of the positive (cosine ≥ `falseNegTau`) is very
  * likely an unlabeled positive, and training against it as a negative
  * actively damages the model — so such candidates are excluded, not
  * sampled.
  *
  * Candidate generation is top-`searchDepth` retrieval per query (the
  * brute-force form here — at corpus scale swap in [[IvfIndex]]/
  * [[IvfPq]] probes; the mining logic downstream is identical), then:
  * drop the positive itself, drop false negatives, keep the top
  * `kNegatives` by retrieval score. Both truncations (searchDepth
  * before filtering, kNegatives after) are part of the deterministic
  * contract an oracle replays.
  *
  * Output: (query_id, role ∈ positive|negative, rank, neighbor_id,
  * score·4dp) — rank 0 for the positive, 1..kNegatives for negatives.
  */
object ContrastivePairs {

  def mine(queries: DataFrame, positives: DataFrame, corpus: DataFrame,
           idCol: String, vecCol: String, kNegatives: Int,
           falseNegTau: Double, searchDepth: Int = 20): DataFrame = {
    require(kNegatives >= 1 && searchDepth > kNegatives,
      s"need searchDepth ($searchDepth) > kNegatives ($kNegatives)")
    val cand = Similarity.annBruteForce(queries, corpus, idCol, vecCol, searchDepth)
    val vecs = corpus.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
    // positives is (query_id, pos_id) — query-sized, broadcast everywhere.
    // Multi-positive queries are legal (the DPR labeling), which forces
    // ALL-positives semantics below: a candidate is excluded if it IS any
    // of the query's positives (anti-join, not a per-pair =!= which would
    // let positive p1 survive via its (p1, pos=p2) row), and the false-
    // negative test is against the MOST similar positive (max dot) —
    // near-dup of ANY labeled positive means likely-unlabeled-positive.
    val posPairs = positives.select(col("query_id"), col("pos_id"))
    val notPositive = cand.join(broadcast(posPairs
        .select(col("query_id"), col("pos_id").as("neighbor_id"))),
      Seq("query_id", "neighbor_id"), "left_anti")
    val negCand = notPositive
      .join(vecs.withColumnRenamed("_vid", "neighbor_id")
        .withColumnRenamed("_v", "_nv"), Seq("neighbor_id"))
      .join(broadcast(posPairs
        .join(vecs.withColumnRenamed("_vid", "pos_id")
          .withColumnRenamed("_v", "_pv"), Seq("pos_id"))), Seq("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(Vectors.dotNative(col("_nv"), col("_pv"))).as("_maxPosSim"),
        first(col("score")).as("score"))
      .filter(col("_maxPosSim") < falseNegTau)
      .select(col("query_id"), col("neighbor_id"), col("score"))
    val negatives = Similarity.takeTopK(negCand, kNegatives)
      .select(col("query_id"), lit("negative").as("role"), col("rank"),
        col("neighbor_id"), col("score"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val positiveRows = positives
      .join(broadcast(q), Seq("query_id"))
      .join(vecs.withColumnRenamed("_vid", "pos_id"), Seq("pos_id"))
      .select(col("query_id"), lit("positive").as("role"),
        lit(0L).as("rank"), col("pos_id").as("neighbor_id"),
        round(Vectors.dotNative(col("_qv"), col("_v")), 4).as("score"))
    positiveRows.unionByName(negatives)
  }
}
