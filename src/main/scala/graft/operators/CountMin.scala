package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
  * state table: d hash rows × 16^wChars cells, each cell a plain count —
  * (j, cell, cnt) rows instead of an opaque binary blob. Answers "how
  * often does term t occur" for EVERY term in bounded memory
  * (d · 16^wChars counters, independent of vocabulary size), with the
  * classic one-sided guarantee: est(t) ≥ true(t) always (counters only
  * ever add), and over-estimation is bounded by colliding mass (w.h.p.
  * ≤ e·n/16^wChars per row, and the MIN over d rows is what's
  * answered).
  *
  * Why relational state instead of a sketch blob: the table merges by
  * (j, cell) SUM — so it composes with everything the engine already
  * has. Per-partition partial aggregation builds it in one exchange of
  * d·16^wChars rows; two sketches union+re-aggregate; and the
  * generalized replay-idempotent fold ([[IncrementalAgg.foldStateIntoStore]])
  * stream-maintains it exactly like the histogram and HLL states —
  * counters are additive, so the marker protocol is what makes
  * at-least-once delivery safe.
  *
  * Cells are hex-string keyed (first `wChars` chars of
  * md5("<j>/<term>")): lowercase hex compares and groups identically in
  * any engine, which is what lets an oracle replay the whole sketch —
  * build, merge, and estimate — in ANSI SQL. Complement of
  * [[HeavyHitters]]: MG answers "which terms are frequent" exactly in
  * O(capacity); this answers "how frequent is ANY given term"
  * approximately in O(d·16^wChars).
  */
object CountMin {

  private def cellOf(term: Column, j: Column, wChars: Int): Column =
    substring(md5(concat(j.cast("string"), lit("/"), term)), 1, wChars)

  /** Build the (j, cell, cnt) state from a term stream — ONE scan: the
    * d hash rows come from an exploded sequence column, not a d-way
    * union of selects (which would scan the source d times; Spark does
    * not dedup identical scan subtrees). Null terms are ignored
    * (absence of a term, consistent with [[HeavyHitters]]). */
  def state(df: DataFrame, termCol: String, d: Int = 4,
            wChars: Int = 3): DataFrame = {
    require(d >= 1 && wChars >= 1 && wChars <= 8, s"bad geometry d=$d wChars=$wChars")
    df.select(col(termCol).as("term")).filter(col("term").isNotNull)
      .select(col("term"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .select(col("j"), cellOf(col("term"), col("j"), wChars).as("cell"))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** (d, wChars) recovered from a state frame — one action on the
    * counter-sized table. None for an EMPTY state: a sketch of zero
    * observations has all-zero counters under ANY geometry, so it is
    * vacuously compatible everywhere (an all-null batch folds to an
    * empty state — it must merge and probe, not NPE). */
  private def geometryOf(state: DataFrame): Option[(Int, Int)] = {
    val r = state.agg(max(col("j")), max(length(col("cell")))).head()
    if (r.isNullAt(0) || r.isNullAt(1)) None
    else Some((r.getInt(0) + 1, r.getInt(1)))
  }

  private def requireGeometry(state: DataFrame, d: Int, wChars: Int,
                              what: String): Unit =
    geometryOf(state).foreach { case (sd, sw) =>
      require(sd == d && sw == wChars,
        s"$what: state has geometry d=$sd wChars=$sw but was called with " +
          s"d=$d wChars=$wChars — mismatched probes hit empty cells and " +
          "SILENTLY return underestimates, breaking the one-sided guarantee")
    }

  /** Merge sketch states built with the SAME geometry: union + re-sum.
    * Geometry agreement is checked — summing a 3-char-cell state into a
    * 4-char-cell state would interleave two incompatible counter
    * spaces. Empty states merge as identity. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val defined = states.flatMap(geometryOf).distinct
    require(defined.size <= 1,
      s"CountMin.merge: mismatched geometries ${defined.mkString(", ")} — " +
        "summing incompatible counter spaces interleaves them silently")
    states.reduce(_.unionByName(_))
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for `queries` (a one-column frame of terms):
    * (term, est) where est = min over the d rows of the term's cell
    * counter — the count-min answer. Terms whose cells were never
    * touched estimate 0 (true count is 0 by the one-sided guarantee).
    * The probe geometry is validated against the state's — a mismatch
    * would silently underestimate. Probes are the PRESERVED left side
    * of the outer join (a broadcast hint on the preserved side of an
    * outer join is unsatisfiable and would be silently ignored);
    * size-based selection broadcasts the counter-sized state when it
    * fits, and falls back to a shuffle keyed on (j, cell) — tiny probe
    * side — when it does not. */
  def estimate(state: DataFrame, queries: DataFrame, termCol: String,
               d: Int = 4, wChars: Int = 3): DataFrame = {
    requireGeometry(state, d, wChars, "CountMin.estimate")
    val probes = queries.select(col(termCol).as("term")).distinct()
      .select(col("term"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .select(col("term"), col("j"), cellOf(col("term"), col("j"), wChars).as("cell"))
    probes.join(state, Seq("j", "cell"), "left_outer")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join SIZE estimate from two sketch states (Cormode &
    * Muthukrishnan 2005 §4.2, the inner-product estimator; the
    * AMS-lineage answer a cost-based planner wants before committing to
    * a join strategy at 100 TB — broadcast vs shuffle vs skew-salt —
    * without scanning either table again): for each hash row j,
    * IP_j = Σ_cell cntR(j,cell)·cntS(j,cell); the estimate is
    * min_j IP_j. One-sided like the point estimate: every true joining
    * pair lands in the same cell in every row, so IP_j ≥ |R ⋈ S| always,
    * and collisions only ADD cross-terms (expected excess ≤
    * ‖R‖₁·‖S‖₁/16^wChars per row). Self-estimate (stateR = stateS)
    * yields the F2 second-moment estimate — the self-join size that
    * decides whether a key distribution needs skew handling.
    *
    * Cost: one (j, cell)-keyed join of two counter-sized tables
    * (d·16^wChars rows each — broadcastable) and two tiny aggregates;
    * the source tables are never touched. A hash row with NO overlapping
    * cells has true inner product 0, which forces the min to 0 — the
    * count(j) < d guard supplies those absent-row zeros (an inner join
    * produces no row to min over). */
  def joinSizeEstimate(stateR: DataFrame, stateS: DataFrame,
                       d: Int = 4, wChars: Int = 3): DataFrame = {
    requireGeometry(stateR, d, wChars, "CountMin.joinSizeEstimate (left)")
    requireGeometry(stateS, d, wChars, "CountMin.joinSizeEstimate (right)")
    stateR.select(col("j"), col("cell"), col("cnt").as("_cr"))
      .join(stateS.select(col("j"), col("cell"), col("cnt").as("_cs")),
        Seq("j", "cell"))
      .groupBy(col("j"))
      .agg(sum(col("_cr") * col("_cs")).as("_ip"))
      .agg(min(col("_ip")).as("_m"), count(lit(1)).as("_nj"))
      .select(when(col("_nj") < d, lit(0L)).otherwise(col("_m"))
        .as("est_join_size"))
  }

  /** Stream-maintain a sketch state table through the shared
    * replay-idempotent fold protocol — counters are additive, so a
    * replayed micro-batch would double every estimate without the
    * marker skip. Same contract as
    * [[BinnedQuantiles.foldIntoStore]] / [[SketchRollup.foldIntoStore]]. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    termCol: String, batchId: Long, epoch: String,
                    d: Int = 4, wChars: Int = 3): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, termCol, d, wChars),
      (prev, delta) => merge(prev, delta), batchId, epoch)
}
