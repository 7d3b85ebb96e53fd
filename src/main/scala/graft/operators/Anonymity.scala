package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit (Sweeney 2002) over a chosen quasi-identifier set
  * — the privacy gate a dataset clears before release: every row must
  * be indistinguishable from at least k−1 others on the columns an
  * adversary could link externally. Training-data pipelines run this
  * next to PII scrubbing ([[graft.functions.Pii]]): scrubbing removes
  * direct identifiers, k-anonymity measures whether the REMAINING
  * quasi-identifiers still single people out.
  *
  * One hash aggregate over one scan (groupBy the quasi-identifiers),
  * then a 1-row rollup of the group-size frame — nothing else touches
  * the data. Null quasi-identifier values group as values (SQL
  * GROUP BY semantics): null is itself a linkable signal, so a
  * null-keyed group of size < k is still a disclosure risk and is NOT
  * exempted. Generalization (bucketing a numeric column, truncating a
  * zip code) is expressed by passing derived columns through `withQi`
  * frames built by the caller — the audit treats them opaquely. */
object Anonymity {

  /** Per-group sizes on the quasi-identifier set: qi columns + `n`. */
  def groupSizes(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("n"))
  }

  /** The groups violating k — the remediation worklist, smallest
    * (most identifying) first. */
  def riskyGroups(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    groupSizes(df, qiCols).filter(col("n") < k)
      .orderBy(col("n").asc +: qiCols.map(col(_).asc): _*)
  }

  /** 1-row audit verdict: total rows/groups, the smallest equivalence
    * class, how many groups and rows sit below k, the at-risk row
    * share, and the boolean verdict min_group_size ≥ k.
    *
    * Empty input: aggregates over zero groups yield null, and a NULL
    * verdict would read as "not false" to a release gate testing
    * `!= false` — "couldn't measure" must never pass a privacy check
    * (the [[DataChecks]] convention). So the counts coalesce to 0,
    * min_group_size stays null (there IS no smallest class), at_risk_pct
    * coalesces to 0.0, and `k_anonymous` coalesces to a definite FALSE:
    * an unmeasurable dataset is not releasable evidence. */
  def report(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    groupSizes(df, qiCols).agg(
      count(lit(1)).as("n_groups"),
      coalesce(sum(col("n")), lit(0L)).as("n_rows"),
      min(col("n")).as("min_group_size"),
      coalesce(sum(when(col("n") < k, 1L).otherwise(0L)), lit(0L))
        .as("groups_below_k"),
      coalesce(sum(when(col("n") < k, col("n")).otherwise(0L)), lit(0L))
        .as("rows_below_k"))
      .select(col("*"),
        // guarded, not try_divide: n_rows = 0 must read as 0% at risk,
        // and ANSI mode makes the bare division a hard error
        when(col("n_rows") > 0,
          round(col("rows_below_k").cast("double") / col("n_rows"), 4))
          .otherwise(lit(0.0)).as("at_risk_pct"),
        coalesce(col("min_group_size") >= k, lit(false)).as("k_anonymous"))
  }
}
