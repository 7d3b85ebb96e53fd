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
}
