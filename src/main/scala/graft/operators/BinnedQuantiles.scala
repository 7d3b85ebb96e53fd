package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGEABLE approximate quantiles via fixed-bin histogram state — the
  * companion to [[IncrementalAgg]] for the one common measure its
  * cnt/sum/min/max state cannot carry: percentiles. Exact percentiles
  * are not distributive (q37 recomputes from rows each time); a
  * fixed-bin histogram IS — per-(group, bin) counts merge by sum, so
  * per-partition/per-day histogram states roll up to any granularity
  * without rescanning history, and the quantile estimate (linear
  * interpolation inside the covering bin) is a deterministic closed
  * form over ≤ nBins small rows — unlike t-digest/KLL sketches whose
  * merge is implementation-defined, every step here is replayable as
  * plain SQL, which is what makes q81 oracle-gateable. Error bound:
  * one bin width.
  *
  * Scale shape: state building is ONE hash aggregate over the facts
  * (map-side partials); merging unions state frames and re-sums —
  * state is (groups × nBins)-sized, tiny. The estimate's window runs
  * per group over AT MOST nBins rows (bounded by construction — not a
  * corpus-sized window; the q35/q79 objection does not apply).
  */
object BinnedQuantiles {

  /** Histogram state: one row per (groups, bin) with its count. Values
    * outside [lo, lo + nBins·width) clamp into the edge bins. Null AND
    * NaN values are dropped (no bin) — NaN is unordered, so clamping is
    * meaningless, and without the explicit filter Spark's double→long
    * cast would silently bin NaN as the smallest value while DuckDB's
    * equivalent cast ERRORS (cross-engine divergence either way). */
  def binState(df: DataFrame, groups: Seq[String], valueCol: String,
               lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, "width and nBins must be positive")
    df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .groupBy(groups.map(col) :+
        least(greatest(floor((col(valueCol) - lo) / width).cast("long"),
          lit(0L)), lit(nBins - 1L)).as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold state frames (delta batches, per-partition states) into one. */
  def merge(groups: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy((groups :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Stream-maintain a histogram state table: fold one micro-batch's
    * per-bin counts into `name` under the epoch-scoped replay-idempotent
    * protocol of [[IncrementalAgg.foldIntoStore]] (same marker columns,
    * same loud epoch mismatch, same atomic `replace` publish) — per-bin
    * counts merge by sum, so the histogram is exactly as maintainable as
    * the cnt/sum/min/max state. Quantiles then come from
    * [[quantiles]] over the stored state, current at every trigger
    * without rescanning history. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    groups: Seq[String], valueCol: String,
                    lo: Double, width: Double, nBins: Int,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      binState(batch, groups, valueCol, lo, width, nBins),
      (p, d) => merge(groups, p, d), batchId, epoch)

  /** Quantile estimates from state alone: for each (name, q) emit a
    * `<name>` column with the interpolated value, plus `n` (total
    * count). The covering bin is the first whose cumulative count
    * reaches q·total; the estimate interpolates linearly inside it. */
  def quantiles(state: DataFrame, groups: Seq[String],
                qs: Seq[(String, Double)], lo: Double, width: Double,
                scale: Int = 4): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val w = Window.partitionBy(groups.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // total via a whole-partition window on the SAME ≤nBins-row state
    // frame — a separate aggregate + self-join would plan (and execute)
    // the state subtree twice and add a join shuffle for nothing
    val wTot = Window.partitionBy(groups.map(col): _*)
    val joined = state
      .withColumn("cb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("total", sum(col("cnt")).over(wTot))
    val ests = qs.map { case (name, q) =>
      round(min(when(
        col("cb") + col("cnt") >= lit(q) * col("total") &&
          col("cb") < lit(q) * col("total"),
        lit(lo) + (col("bin") + (lit(q) * col("total") - col("cb")) / col("cnt"))
          * width)), scale).as(name)
    }
    joined.groupBy(groups.map(col): _*)
      .agg(ests.head, ests.tail :+ min(col("total")).cast("long").as("n"): _*)
  }
}
