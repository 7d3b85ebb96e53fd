package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Semantic deduplication (SemDeDup — Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space coarsely, then within
  * each cluster drop every vector that has a near-semantic twin
  * (cosine ≥ tau) ranked ahead of it. The clustering bounds the pair
  * space exactly the way LSH bands bound MinHash candidate generation —
  * pairs are only formed inside a cluster, never across the corpus — so
  * the engine-wide invariant (candidate generation is always a bucketed
  * equi-join, never an all-pairs product) carries over to embedding
  * space.
  *
  * Keep rule (the paper's): within a duplicate relation, keep the vector
  * LESS similar to its cluster centroid — semantic outliers carry more
  * training signal than prototypical near-center examples — with id as
  * the deterministic tie-break. A vector is dropped iff SOME
  * better-ranked cluster-mate sits within tau of it; rank = (centroid
  * similarity asc, id asc). Pairwise dominance, not connected
  * components: deterministic, one self-join + one aggregation, and it
  * matches the paper's per-pair formulation (a kept vector may itself
  * have dropped near-twins — that is SemDeDup's semantics, not a bug).
  *
  * Centroids are a parameter (same contract as [[Similarity.annIvf]]):
  * production passes [[Similarity.trainIvfCentroids]] output (trained on
  * a bounded sample); the oracle-gated variant passes deterministic
  * seeds so the full computation — assignment, pairs, ranks, dominance —
  * replays in ANSI SQL with no recall caveat.
  *
  * `maxCluster` caps cluster occupancy before the self-join
  * ([[Similarity.capBuckets]] semantics: a pathological cluster carries
  * little signal and its members still dedup through other relations);
  * <= 0 disables (the gated variant).
  */
object SemDeDup {

  /** Per-vector verdict: (id, cell, centroid_sim, kept). */
  def verdicts(vectors: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, tau: Double,
               maxCluster: Int = 0): DataFrame = {
    // Assign to the max-dot cell; deterministic tie-break on lowest cell.
    // The assignment's winning dot IS the centroid similarity the keep
    // rule ranks by — one pass produces both.
    val assigned0 = vectors
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("cell"),
        Vectors.dotNative(col("v"), col("centroid")).as("cd"))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cell"), col("v"), col("cd")),
        struct(col("cd"), (-col("cell")).as("nc"))).as("b"))
      .select(col("id"), col("b.cell").as("cell"), col("b.v").as("v"),
        col("b.cd").as("centroid_sim"))
    val assigned = Checkpoints.materialize(assigned0)
    // The occupancy cap shrinks only the PAIR SPACE: members of an
    // over-cap cluster are all kept (their verdict rows remain), they
    // just form no pairs — same "a mega-bucket carries no signal"
    // semantics as capBuckets in the MinHash path.
    val pairSpace = Similarity.capBuckets(assigned, Seq("cell"), maxCluster)
    // Within-cluster dominance: u beats v iff (cs, id) < (cs, id) lexic.
    val u = pairSpace.select(col("cell"), col("id").as("id_u"),
      col("v").as("vu"), col("centroid_sim").as("cs_u"))
    val v = pairSpace.select(col("cell"), col("id").as("id_v"),
      col("v").as("vv"), col("centroid_sim").as("cs_v"))
    val dropped = u.join(v, Seq("cell"))
      .filter(col("cs_u") < col("cs_v") ||
        (col("cs_u") === col("cs_v") && col("id_u") < col("id_v")))
      .filter(Vectors.dotNative(col("vu"), col("vv")) >= tau)
      .select(col("id_v").as("id")).distinct()
      .withColumn("__dropped", lit(true))
    // NOTE: `assigned` stays materialized while the returned frame is
    // live (it feeds both join sides and the verdict attach) — the same
    // lifetime contract as minhashNearDup's signature checkpoint.
    assigned.join(dropped, Seq("id"), "left_outer")
      .select(col("id"), col("cell"),
        round(col("centroid_sim"), 4).as("centroid_sim"),
        coalesce(col("__dropped"), lit(false)).as("dropped"))
  }

  /** The surviving rows of `vectors` (the paper's output shape). */
  def dedup(vectors: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, tau: Double,
            maxCluster: Int = 0): DataFrame = {
    val drop = verdicts(vectors, idCol, vecCol, centroids, tau, maxCluster)
      .filter(col("dropped"))
      .select(col("id").as(idCol))
    vectors.join(drop, Seq(idCol), "left_anti")
  }
}
