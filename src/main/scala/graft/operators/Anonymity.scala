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

  /** Per-(class, sensitive-value) counts — the shared collapse for the
    * diversity and closeness audits below. Null sensitive values count
    * as values (the same convention as null quasi-identifiers: "my
    * sensitive attribute is missing" is itself information). */
  private def cells(df: DataFrame, qiCols: Seq[String],
                    sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    df.groupBy(qiCols.map(col) :+ col(sensitiveCol).as("_s"): _*)
      .agg(count(lit(1)).as("_cnt"))
  }

  /** l-diversity audit (Machanavajjhala et al., TKDD 2007) — k-anonymity
    * bounds RE-IDENTIFICATION; l-diversity bounds ATTRIBUTE disclosure:
    * a size-50 class is k-anonymous and still leaks everything if all 50
    * share one diagnosis. Per equivalence class this computes both the
    * distinct count of the sensitive attribute and its Shannon entropy
    * via the shuffle-free closed form entropy = ln(n) − Σc·ln(c)/n, so
    * the whole audit is TWO hash aggregates over one scan. 1-row
    * verdict: distinct l-diversity (min distinct ≥ l) and entropy
    * l-diversity (min entropy ≥ ln l), with the empty-input-is-FALSE
    * convention of [[report]]. */
  def diversityReport(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2: $l")
    val perClass = cells(df, qiCols, sensitiveCol)
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("_cnt")).as("_n"),
        count(lit(1)).as("_distinct"),
        (log(sum(col("_cnt"))) -
          sum(col("_cnt") * log(col("_cnt"))) / sum(col("_cnt")))
          .as("_entropy"))
    perClass.agg(
      count(lit(1)).as("n_groups"),
      min(col("_distinct")).as("min_distinct"),
      round(min(col("_entropy")), 6).as("min_entropy"),
      coalesce(sum(when(col("_distinct") < l, 1L).otherwise(0L)), lit(0L))
        .as("groups_below_l"))
      .select(col("*"),
        coalesce(col("min_distinct") >= l, lit(false)).as("l_diverse"),
        coalesce(col("min_entropy") >= math.log(l.toDouble), lit(false))
          .as("entropy_l_diverse"))
  }

  /** The classes violating distinct-l — the remediation worklist. */
  def riskyByDiversity(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String, l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2: $l")
    cells(df, qiCols, sensitiveCol)
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))
      .filter(col("n_distinct") < l)
      .orderBy(col("n_distinct").asc +: qiCols.map(col(_).asc): _*)
  }

  /** t-closeness audit (Li et al., ICDE 2007) — l-diversity can still
    * leak by SKEW (a class that is 99% one value in a 50/50 population
    * tells an adversary plenty). For a categorical sensitive attribute
    * with uniform ground distance, the earth-mover distance reduces to
    * total variation: TVD(class) = ½·Σ_v |c_v/n − g_v/N|. The per-class
    * distributions come from the same cells collapse; the global
    * distribution is sensitive-cardinality-sized and BROADCAST, so the
    * class × value grid — the only frame beyond the aggregates — is
    * classes × |sensitive values|, never data. 1-row verdict:
    * max TVD ≤ t, empty input FALSE. */
  def closenessReport(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, t: Double): DataFrame = {
    require(t > 0 && t < 1, s"t must be in (0,1): $t")
    // three consumers (global dist, class sizes, the grid join) — cut
    // the lineage once so the data-sized aggregate runs one time, not
    // three; the frame itself is classes × values, tiny
    val cc = Checkpoints.materialize(cells(df, qiCols, sensitiveCol))
    val global = cc.groupBy(col("_s"))
      .agg(sum(col("_cnt")).as("_gq"))
      .crossJoin(cc.agg(sum(col("_cnt")).as("_total")))
    val classes = cc.groupBy(qiCols.map(col): _*)
      .agg(sum(col("_cnt")).as("_n"))
    // full value grid per class: a value ABSENT from a class contributes
    // its full global mass |0 − g/N|. NULL-SAFE join keys: null sensitive
    // values and null quasi-identifiers count as values (the module
    // convention), and a plain USING join would never match them —
    // silently replacing their counts with 0 and inflating the TVD
    val gridKeys = classes.crossJoin(broadcast(global)).as("g")
    val joined = gridKeys.join(cc.as("c"),
      (qiCols :+ "_s").map(k => col(s"g.$k") <=> col(s"c.$k"))
        .reduce(_ && _), "left")
    val grid = joined
      .select(qiCols.map(k => col(s"g.$k").as(k)) :+
        abs(coalesce(col("c._cnt"), lit(0L)).cast("double") / col("g._n") -
          col("g._gq").cast("double") / col("g._total")).as("_term"): _*)
    grid.groupBy(qiCols.map(col): _*)
      .agg((sum(col("_term")) / lit(2.0)).as("_tvd"))
      .agg(count(lit(1)).as("n_groups"),
        round(max(col("_tvd")), 6).as("max_tvd"),
        coalesce(sum(when(col("_tvd") > t, 1L).otherwise(0L)), lit(0L))
          .as("groups_beyond_t"))
      .select(col("*"),
        coalesce(col("max_tvd") <= t, lit(false)).as("t_close"))
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
