package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a reference and a current
  * dataset via the Population Stability Index — the monitoring signal
  * that catches "this week's corpus quietly stopped looking like the
  * corpus the model was trained on" (covariate shift, upstream schema
  * rot, a silently broken extractor) before it reaches training.
  *
  *   PSI(col) = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)
  *
  * over a fixed equi-width binning derived from the REFERENCE min/max
  * (current values outside the reference range clamp into the end
  * bins — out-of-range mass is exactly what should light up). Shares
  * are Laplace-smoothed ((cnt + 0.5) / (n + bins/2)) so empty bins
  * contribute finite terms instead of ±∞; the industry reading
  * (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 major) assumes decile
  *-ish bin counts, which `bins = 10` preserves.
  *
  * Cost shape: ONE scan + one hash aggregate per side for ANY number
  * of monitored columns (per-row explode into (col, bin) pairs, the
  * multi-column-profile pattern; map-side partial aggregation collapses
  * to bins×cols rows per partition before the exchange). Reference
  * stats are a 1-row broadcast frame; everything after the two bin
  * aggregates is (cols × bins)-sized. Equi-width (not quantile) edges
  * keep the bin boundary arithmetic exactly replayable; a production
  * deployment would persist `refStats`' frame and re-use it across
  * batches, never rescanning the reference. */
object Drift {

  private val SmoothNum = 0.5

  /** 1-row frame of per-column min/max over the reference, long-format:
    * (col, mn, mx). Persist/reuse across batches in production. */
  def refStats(ref: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"_mn_$c"),
      max(col(c)).cast("double").as(s"_mx_$c")))
    ref.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col"), col(s"_mn_$c").as("mn"), col(s"_mx_$c").as("mx"))): _*))
        .as("s"))
      .select(col("s.*"))
  }

  /** (col, bin, cnt) over one side: equi-width bins from the reference
    * stats, clamped to [0, bins-1]; nulls excluded (profile them with
    * [[DataChecks]] completeness instead). Degenerate mn = mx puts all
    * mass in bin 0 on both sides, yielding PSI 0 — no spurious alarm
    * from a constant column. */
  private def binCounts(df: DataFrame, cols: Seq[String], stats: DataFrame,
                        bins: Int): DataFrame = {
    val pairs = df
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col"), col(c).cast("double").as("x"))): _*)).as("p"))
      .select(col("p.*")).filter(col("x").isNotNull)
    val w: Column = (col("mx") - col("mn")) / lit(bins.toDouble)
    // mn IS NULL = the reference column had no values at all (the
    // broken-extractor case this operator exists to catch): bin ALL
    // current mass into bin 0 so it alarms against the empty reference
    // instead of producing null bins that vanish in the grid join
    // (silent psi = 0, n_cur = 0)
    pairs.join(broadcast(stats), Seq("col"))
      .select(col("col"),
        when(col("mn").isNull || col("mx") === col("mn"), lit(0L))
          .otherwise(greatest(least(floor((col("x") - col("mn")) / w),
            lit((bins - 1).toLong)), lit(0L))).as("bin"))
      .groupBy(col("col"), col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Drift report: (column_name, psi, n_ref, n_cur), one row per
    * monitored column, psi rounded to 4. */
  def psiReport(ref: DataFrame, cur: DataFrame, cols: Seq[String],
                bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val spark = ref.sparkSession
    import spark.implicits._
    val stats = Checkpoints.materialize(refStats(ref, cols))
    val cr = binCounts(ref, cols, stats, bins)
      .withColumnRenamed("cnt", "cnt_ref")
    val cc = binCounts(cur, cols, stats, bins)
      .withColumnRenamed("cnt", "cnt_cur")
    // full bin grid so empty bins carry their smoothed term
    val grid = cols.flatMap(c => (0 until bins).map(c -> _.toLong))
      .toDF("col", "bin")
    val joined = grid
      .join(cr, Seq("col", "bin"), "left").join(cc, Seq("col", "bin"), "left")
      .na.fill(0L, Seq("cnt_ref", "cnt_cur"))
    val tot = joined.groupBy(col("col"))
      .agg(sum(col("cnt_ref")).as("n_ref"), sum(col("cnt_cur")).as("n_cur"))
    val denom = lit(SmoothNum * bins)
    joined.join(tot, Seq("col"))
      .select(col("col"), col("n_ref"), col("n_cur"),
        ((col("cnt_ref") + SmoothNum) / (col("n_ref") + denom)).as("pr"),
        ((col("cnt_cur") + SmoothNum) / (col("n_cur") + denom)).as("pc"))
      .groupBy(col("col").as("column_name"))
      .agg(round(sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))), 4)
        .as("psi"),
        first(col("n_ref")).as("n_ref"), first(col("n_cur")).as("n_cur"))
  }
}
