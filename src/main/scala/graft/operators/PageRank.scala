package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank (Brin & Page 1998) over an edge frame — the
  * link-authority signal web-curation pipelines rank domains with
  * (harvest quality weights from a crawl graph, downweight link farms)
  * and the engine's representative of the ITERATIVE-graph shape: a
  * driver loop over joins, like [[Similarity.dedupClusters]]' label
  * propagation, but with per-round floating mass instead of min-id
  * convergence.
  *
  * Per iteration, every plan is a bounded equi-join or aggregate —
  * nothing quadratic, nothing windowed:
  *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) / outdeg(u)     (edge join + agg)
  *   dangling   = Σ_{outdeg(u) = 0} rank(u)             (anti-ish 1-row agg)
  *   rank'(v)   = (1−d)/N + d·(contrib(v) + dangling/N)
  * Dangling mass is carried as a 1-ROW FRAME cross-joined in (not a
  * driver collect per round); each iteration's rank frame is
  * materialized ([[Checkpoints]]) to cut the growing lineage — the
  * q62 pattern. Rank mass is conserved at every step (Σ rank = 1),
  * which the spec asserts to 1e-9.
  *
  * Node ids must be unique across the src/dst universe (offset one side
  * if two id spaces can collide). Fixed iteration count: rank vectors
  * are geometric-decay mixtures, so K iterations is the replayable
  * contract (an ε-convergence loop is the production variant — same
  * body, driver-checked delta, [[Similarity.dedupClusters]]' loop
  * precedent). */
object PageRank {

  /** (node, rank) after `iters` damped iterations from the uniform
    * start; every node of src ∪ dst appears. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          damping: Double = 0.85, iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = Checkpoints.materialize(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val outdeg = Checkpoints.materialize(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg")))
    // N as a 1-row frame: stays in-plan, broadcast everywhere it's used
    val nFrame = nodes.agg(count(lit(1)).cast("double").as("n"))

    var ranks = Checkpoints.materialize(
      nodes.crossJoin(broadcast(nFrame))
        .select(col("node"), (lit(1.0) / col("n")).as("rank")))

    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      val dangling = withDeg
        .agg(sum(when(col("outdeg").isNull, col("rank"))
          .otherwise(lit(0.0))).as("dm"))
        .na.fill(0.0, Seq("dm"))
      val contrib = e
        .join(withDeg.filter(col("outdeg").isNotNull)
          .select(col("node").as("src"), col("rank"), col("outdeg")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg").cast("double")).as("contrib"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .na.fill(0.0, Seq("contrib"))
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nFrame))
        .select(col("node"),
          (lit((1 - damping)) / col("n") +
            lit(damping) * (col("contrib") + col("dm") / col("n"))).as("rank"))
      val prev = ranks
      ranks = Checkpoints.materialize(next)
      Checkpoints.release(prev)
    }
    ranks
  }
}
