package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable approximate-distinct rollups via HLL sketches (Spark's
  * Apache DataSketches `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate` SQL functions): store one small sketch per
  * partition (day, source, shard), then answer COUNT DISTINCT over ANY
  * combination of partitions by unioning sketches — without rescanning
  * rows. This is the only shape exact distinct cannot take at 100 TB
  * (distinct is not distributive), and the reason the state table of
  * [[IncrementalAgg]] excludes it.
  *
  * The load-bearing algebraic fact, gated in q77: HLL register merge is
  * a pointwise max — associative, commutative, idempotent — so
  * `estimate(union(per-partition sketches)) ≡ estimate(one-shot sketch)`
  * EXACTLY (not approximately): both paths produce identical registers
  * for identical input sets at the same lgK. Estimation error exists
  * only between estimate and TRUTH (~1.04/√2^lgK relative), never
  * between the merged and one-shot paths.
  *
  * Scale shape: per-partition sketching is one hash aggregate with
  * map-side partial sketches; the union aggregate moves only
  * sketch-sized state (KBs per group), never rows.
  */
object SketchRollup {

  /** One HLL sketch (+ row count) of `keyCol` per `groups`. */
  def distinctSketches(df: DataFrame, groups: Seq[String], keyCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(groups.map(col): _*)
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("_sketch"),
        count(lit(1)).as("_rows"))

  /** Distinct estimate over the UNION of a sketch frame's groups —
    * answers "distinct keys across this partition subset" from state
    * alone. */
  def unionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      expr("hll_sketch_estimate(hll_union_agg(_sketch))").as("est_distinct"),
      sum(col("_rows")).as("n_rows"))

  /** Fold sketch-state frames into one at `groups` granularity (which
    * may be coarser): registers union by pointwise max — associative,
    * commutative, IDEMPOTENT — and row counts re-sum. */
  def mergeStates(groups: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy(groups.map(col): _*)
      .agg(expr("hll_union_agg(_sketch)").as("_sketch"),
        sum(col("_rows")).as("_rows"))
  }

  /** Stream-maintain a sketch state table: fold one micro-batch's
    * per-group sketches into `name` under the epoch-scoped
    * replay-idempotent protocol of [[IncrementalAgg.foldIntoStore]]
    * (same marker columns, same loud epoch mismatch, same atomic
    * `replace` publish). Distinct-count rollups then come from
    * [[unionEstimate]] over the stored state — current at every
    * trigger, never rescanning rows. (Register max would even tolerate
    * a double-fold for the sketch itself, but `_rows` would not —
    * the marker protocol guards both.) */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    groups: Seq[String], keyCol: String, lgK: Int,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      distinctSketches(batch, groups, keyCol, lgK),
      (p, d) => mergeStates(groups, p, d), batchId, epoch)
}
