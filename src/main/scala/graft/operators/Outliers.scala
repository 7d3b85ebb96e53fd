package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection — the distribution-based quality
  * filter of a curation pipeline (flag documents whose length/score sits
  * far from their SOURCE's distribution, not a global one: a 2,000-char
  * doc is normal for web text and an outlier for tweet-like sources).
  *
  * Scale shape: one hash aggregate for the per-group moments (avg +
  * sample stddev — both single-pass, map-side partial), then an attach
  * join back to the facts on the group key. The stats frame is
  * group-cardinality-sized, so AQE broadcasts it; the facts never
  * shuffle on anything but the aggregate's own key. No window — the
  * moments don't need per-row ordering.
  */
object Outliers {

  /** Facts + `_z` column: (value − group mean) / group sample-stddev.
    * Groups with stddev 0 or a single row yield null `_z` (no
    * dispersion — nothing is an outlier). The attach is a LEFT join:
    * every fact row survives — an inner equi-join would silently DROP
    * rows whose group key is null (null never equi-matches the null
    * group's stats row), breaking the facts-plus-column contract; such
    * rows keep a null `_z` instead. */
  def zScores(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("_m"), stddev(col(valueCol)).as("_sd"))
    df.join(stats, Seq(groupCol), "left")
      .withColumn("_z",
        when(col("_sd") > 0, (col(valueCol) - col("_m")) / col("_sd")))
      .drop("_m", "_sd")
  }

  /** Rows whose |z| exceeds `threshold` within their group. */
  def beyond(df: DataFrame, groupCol: String, valueCol: String,
             threshold: Double): DataFrame =
    zScores(df, groupCol, valueCol).filter(abs(col("_z")) > threshold)
}
