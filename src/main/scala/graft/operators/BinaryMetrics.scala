package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-readout metrics over warehouse-sized prediction tables.
  *
  * ROC-AUC is computed as the Mann–Whitney rank statistic (Hanley &
  * McNeil, Radiology 1982) over the GROUPED score distribution: one hash
  * aggregate collapses the data to per-score (positives, negatives)
  * counts, a running sum over that score-cardinality-sized frame derives
  * the rank mass below each score, and ties take the midrank correction —
  *
  *   AUC = Σ_s pos(s) · (negBelow(s) + neg(s)/2) / (nPos · nNeg)
  *
  * Average precision uses the step-interpolated convention (sklearn's
  * `average_precision_score`, tie-safe because thresholds sit at distinct
  * scores): AP = Σ_s ΔR(s)·P(s) over descending scores.
  *
  * The ordered windows run over DISTINCT scores, never rows: at 100 TB
  * the sorted frame is the score vocabulary (bounded for the quantized /
  * integer / bucketed scores a filtering pipeline emits), not the corpus,
  * and the per-group variants partition that window so group cardinality
  * parallelizes it. Every AUC term is exact in double arithmetic
  * (integers and half-integers ≤ 2^52) so its sum is order-insensitive;
  * AP's terms are summed by an ORDERED running window so both engines add
  * in the identical order — the whole readout replays bit-for-bit in SQL
  * (gates q155, q157).
  *
  * The per-score counts are the SUFFICIENT STATISTIC for both metrics and
  * are plain sums — so the readout is mergeable state like the other
  * maintained summaries ([[state]]/[[mergeStates]]/[[foldIntoStore]],
  * gate q161): a readout maintained per micro-batch is the readout of
  * everything.
  *
  * Reference analog: the monitoring guide's alert-on-quality posture
  * (monitoring-guide.md:43-53) — a filter model's readout is a first-class
  * pipeline output, not an offline notebook step.
  */
object BinaryMetrics {

  /** Global ROC-AUC: one row `(n_pos, n_neg, auc)`. Null scores/labels
    * are excluded (a null prediction ranks nowhere). Degenerate inputs
    * (single-class) return a null `auc` rather than 0/0. */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    aucRocPerGroup(df, Seq.empty, scoreCol, labelCol)

  /** Per-group ROC-AUC: one row per group value,
    * `(groupCols..., n_pos, n_neg, auc)`. `labelCol` must be boolean.
    * The ranking window is PARTITIONED by group, so each group sorts its
    * own distinct-score frame independently. */
  def aucRocPerGroup(df: DataFrame, groupCols: Seq[String],
                     scoreCol: String, labelCol: String): DataFrame =
    aucFromState(state(df, groupCols, scoreCol, labelCol), groupCols)

  /** Global average precision (PR-AUC): one row `(n_pos, n_neg, ap)`. */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame =
    averagePrecisionPerGroup(df, Seq.empty, scoreCol, labelCol)

  /** Per-group average precision under the step-interpolated convention
    * (sklearn's `average_precision_score`, tie-safe by construction):
    * thresholds at distinct scores descending,
    * AP = Σ_s ΔR(s)·P(s) with P = tp/(tp+fp), ΔR = pos(s)/nPos. */
  def averagePrecisionPerGroup(df: DataFrame, groupCols: Seq[String],
                               scoreCol: String,
                               labelCol: String): DataFrame =
    apFromState(state(df, groupCols, scoreCol, labelCol), groupCols)

  // ------------------------------------------------- mergeable state

  /** The readout's sufficient statistic: null-complete rows only, one
    * hash aggregate to per-(group, score) class counts
    * `(groupCols..., _s, _pos, _neg)` — everything downstream works over
    * this score-vocabulary-sized frame, and it merges by plain sum. */
  def state(df: DataFrame, groupCols: Seq[String], scoreCol: String,
            labelCol: String): DataFrame = {
    val gs = groupCols.map(col)
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(gs :+ col(scoreCol).as("_s"): _*)
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("_neg"))
  }

  /** Exact merge: class counts add. A score present in one side only
    * passes through (union + re-sum). */
  def mergeStates(groupCols: Seq[String], a: DataFrame,
                  b: DataFrame): DataFrame = {
    val gs = groupCols.map(col)
    a.unionByName(b)
      .groupBy(gs :+ col("_s"): _*)
      .agg(sum(col("_pos")).as("_pos"), sum(col("_neg")).as("_neg"))
  }

  /** AUC read from a state frame — zero data touch. */
  def aucFromState(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    // rank mass strictly below this score; the frame is per-score rows
    val w = Window.partitionBy(gs: _*).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBelow = state.withColumn("_neg_below",
      coalesce(sum(col("_neg")).over(w), lit(0L)))
    val u = sum(col("_pos") *
      (col("_neg_below").cast("double") + col("_neg").cast("double") / lit(2.0)))
    withBelow.groupBy(gs: _*)
      .agg(sum(col("_pos")).as("n_pos"), sum(col("_neg")).as("n_neg"),
        u.as("_u"))
      .select(gs ++ Seq(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("_u") /
            (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc")): _*)
  }

  /** AP read from a state frame. All cumulative counts are integers from
    * a window over the per-score frame, and the terms are summed by an
    * ORDERED running window (score descending) rather than an unordered
    * aggregate — both engines add in the identical order, so the replay
    * (gate q157) is IEEE-identical, not just close. */
  def apFromState(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val cum = Window.partitionBy(gs: _*).orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = state
      .withColumn("_tp", sum(col("_pos")).over(cum))
      .withColumn("_fp", sum(col("_neg")).over(cum))
    val term = col("_pos").cast("double") *
      (col("_tp").cast("double") /
        (col("_tp") + col("_fp")).cast("double"))
    // ordered running sum of the un-normalized terms: deterministic
    // addition order (desc scores), ΔR's 1/nPos factored out of the loop
    val withRun = withCum.withColumn("_ap_run", sum(term).over(cum))
    withRun.groupBy(gs: _*)
      .agg(max(col("_tp")).as("n_pos"), max(col("_fp")).as("n_neg"),
        max(col("_ap_run")).as("_apu"))
      .select(gs ++ Seq(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0,
          round(col("_apu") / col("n_pos").cast("double"), 6))
          .as("ap")): _*)
  }

  /** Stream-maintained readout: fold one micro-batch's state into the
    * store under the shared replay-idempotent epoch protocol
    * ([[IncrementalAgg.foldStateIntoStore]]) — replayed batches no-op,
    * and [[aucFromState]]/[[apFromState]] read the metrics at any point
    * with zero data touch (gate q161: maintained ≡ one-shot). */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    groupCols: Seq[String], scoreCol: String,
                    labelCol: String, batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, groupCols, scoreCol, labelCol),
      (p, d) => mergeStates(groupCols, p, d), batchId, epoch)
}
