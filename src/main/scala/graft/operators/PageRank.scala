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
  * if two id spaces can collide). Two loop contracts over the SAME
  * iteration body:
  *   - [[run]] — fixed K iterations, the replayable gate contract
  *     (rank vectors are geometric-decay mixtures, so K pins the
  *     result bit-for-bit across runs);
  *   - [[runToConvergence]] — the production variant: iterate until
  *     the L1 rank delta falls below `eps` (one scalar read per round,
  *     the [[Similarity.dedupClusters]] loop precedent), throwing if
  *     `maxIters` is exhausted first — a truncated rank vector would
  *     silently misrank, the engine's loud-error convention. The
  *     damped iteration is a contraction with factor ≤ d, so the L1
  *     delta shrinks geometrically and the fixed point is unique —
  *     which is why the ε-loop and a sufficiently long fixed-K run
  *     agree (spec-asserted). */
object PageRank {

  /** One shared setup: cleaned edges, node universe, out-degrees, N. */
  private case class Graph(e: DataFrame, nodes: DataFrame,
                           outdeg: DataFrame, nFrame: DataFrame)

  private def setup(edges: DataFrame, srcCol: String, dstCol: String): Graph = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = Checkpoints.materialize(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val outdeg = Checkpoints.materialize(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg")))
    // N as a 1-row frame: stays in-plan, broadcast everywhere it's used
    val nFrame = nodes.agg(count(lit(1)).cast("double").as("n"))
    Graph(e, nodes, outdeg, nFrame)
  }

  /** One damped iteration: ranks → next ranks (un-materialized). */
  private def step(g: Graph, ranks: DataFrame, damping: Double): DataFrame = {
    val withDeg = ranks.join(g.outdeg, Seq("node"), "left")
    val dangling = withDeg
      .agg(sum(when(col("outdeg").isNull, col("rank"))
        .otherwise(lit(0.0))).as("dm"))
      .na.fill(0.0, Seq("dm"))
    val contrib = g.e
      .join(withDeg.filter(col("outdeg").isNotNull)
        .select(col("node").as("src"), col("rank"), col("outdeg")), Seq("src"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("rank") / col("outdeg").cast("double")).as("contrib"))
    g.nodes
      .join(contrib, Seq("node"), "left")
      .na.fill(0.0, Seq("contrib"))
      .crossJoin(broadcast(dangling))
      .crossJoin(broadcast(g.nFrame))
      .select(col("node"),
        (lit((1 - damping)) / col("n") +
          lit(damping) * (col("contrib") + col("dm") / col("n"))).as("rank"))
  }

  private def uniformStart(g: Graph): DataFrame =
    Checkpoints.materialize(
      g.nodes.crossJoin(broadcast(g.nFrame))
        .select(col("node"), (lit(1.0) / col("n")).as("rank")))

  /** (node, rank) after `iters` damped iterations from the uniform
    * start; every node of src ∪ dst appears. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          damping: Double = 0.85, iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val g = setup(edges, srcCol, dstCol)
    var ranks = uniformStart(g)
    for (_ <- 1 to iters) {
      val prev = ranks
      ranks = Checkpoints.materialize(step(g, prev, damping))
      Checkpoints.release(prev)
    }
    ranks
  }

  /** (node, rank) iterated until Σ|rank' − rank| < eps — the production
    * loop the fixed-K gate variant pins down. Per round it adds exactly
    * one join (prev ⋈ next on node, both rank-frame-sized) and one
    * scalar read over [[run]]'s body; the frames themselves are never
    * collected. Throws after `maxIters` un-converged rounds: the
    * contraction bound says ‖Δ_k‖₁ ≤ 2·d^k, so a loud failure here
    * means eps/maxIters are mutually impossible (e.g. eps < double ulp
    * noise), not that more silent rounds would have helped. */
  def runToConvergence(edges: DataFrame, srcCol: String, dstCol: String,
                       damping: Double = 0.85, eps: Double = 1e-8,
                       maxIters: Int = 60): DataFrame =
    runToConvergenceStats(edges, srcCol, dstCol, damping, eps, maxIters)._1

  /** [[runToConvergence]] plus the round count it took — the number a
    * capacity plan or a NOTES scale table wants next to the timing. */
  def runToConvergenceStats(edges: DataFrame, srcCol: String, dstCol: String,
                            damping: Double = 0.85, eps: Double = 1e-8,
                            maxIters: Int = 60): (DataFrame, Int) = {
    require(eps > 0, s"eps must be > 0: $eps")
    require(maxIters >= 1, "maxIters must be >= 1")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val g = setup(edges, srcCol, dstCol)
    var ranks = uniformStart(g)
    var round = 0
    var delta = Double.MaxValue
    while (delta >= eps && round < maxIters) {
      val next = Checkpoints.materialize(step(g, ranks, damping))
      delta = next.as("b")
        .join(ranks.as("a"), Seq("node"))
        .agg(sum(abs(col("b.rank") - col("a.rank"))).as("d"))
        .head().getDouble(0)
      Checkpoints.release(ranks)
      ranks = next
      round += 1
    }
    if (delta >= eps) throw new IllegalStateException(
      s"PageRank did not converge in $maxIters rounds (last L1 delta " +
        s"$delta >= eps $eps): a truncated rank vector would silently " +
        "misrank. Raise maxIters or loosen eps — the damped iteration " +
        s"contracts by <= $damping per round, so delta ~ 2*$damping^k.")
    (ranks, round)
  }
}
