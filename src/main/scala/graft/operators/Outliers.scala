package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection — the distribution-based quality
  * filter of a curation pipeline (flag documents whose length/score sits
  * far from their SOURCE's distribution, not a global one: a 2,000-char
  * doc is normal for web text and an outlier for tweet-like sources).
  *
  * Moments come from [[IncrementalAgg]] STATE (cnt/sum/sumsq), which
  * unifies the two entry points: [[zScores]] builds the state ad hoc
  * (one moments aggregate + one attach join — the ad-hoc floor of two
  * passes over the input), while [[zScoresFromState]] takes a MAINTAINED
  * state table and runs ZERO aggregate scans over the facts — at 100 TB
  * the batch folds its partials into state
  * ([[IncrementalAgg.foldIntoStore]]) and outlier detection joins the
  * derived moments straight back, one fact scan per batch total.
  *
  * Scale shape: the stats frame is group-cardinality-sized, so AQE
  * broadcasts it; the facts never shuffle on anything but the (ad-hoc)
  * aggregate's own key. No window — moments need no per-row ordering.
  */
object Outliers {

  /** Facts + `_z` column: (value − group mean) / group sample-stddev.
    * Groups with stddev 0 or a single row yield null `_z` (no
    * dispersion — nothing is an outlier). */
  def zScores(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    attachZ(df,
      IncrementalAgg.momentsFromState(
        IncrementalAgg.partialState(df, Seq(groupCol), valueCol),
        Seq(groupCol)),
      groupCol, valueCol)

  /** [[zScores]] against a MAINTAINED state table (the
    * [[IncrementalAgg.foldIntoStore]] output, marker columns dropped by
    * the caller): no aggregate pass over `df` at all — the moments are
    * derived from state rows. The state must cover the same grouping
    * column and have been built from the same value column, which the
    * caller owns (state tables are named per rollup). */
  def zScoresFromState(df: DataFrame, state: DataFrame,
                       groupCol: String, valueCol: String): DataFrame =
    attachZ(df, IncrementalAgg.momentsFromState(state, Seq(groupCol)),
      groupCol, valueCol)

  /** The attach is a LEFT join: every fact row survives — an inner
    * equi-join would silently DROP rows whose group key is null (null
    * never equi-matches the null group's stats row), breaking the
    * facts-plus-column contract; such rows keep a null `_z` instead. */
  private def attachZ(df: DataFrame, moments: DataFrame,
                      groupCol: String, valueCol: String): DataFrame =
    df.join(moments, Seq(groupCol), "left")
      .withColumn("_z",
        when(col("_sd") > 0, (col(valueCol) - col("_m")) / col("_sd")))
      .drop("_m", "_sd")

  /** Rows whose |z| exceeds `threshold` within their group. */
  def beyond(df: DataFrame, groupCol: String, valueCol: String,
             threshold: Double): DataFrame =
    zScores(df, groupCol, valueCol).filter(abs(col("_z")) > threshold)
}
