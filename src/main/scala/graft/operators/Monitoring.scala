package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-health alert probes over a run-history table — the evaluation
  * side of the reference's monitoring plan (ref monitoring-guide.md:43-53):
  *
  *  - execution-time alert: a run takes >`execOverFrac` longer than the
  *    trailing-window average;
  *  - record-count alert: a run syncs fewer than `recordUnderFrac` of the
  *    trailing-window average row count;
  *  - integrity alert: more than `integrityFrac` of a run's rows violate
  *    validation rules.
  *
  * [[SyncControl]] RECORDS runs; this evaluates them. The input is one row
  * per (runKeys, run) — a run-history table is tiny by construction (one
  * row per pipeline per schedule tick), so the window sort is never the
  * scale concern; still, `runKeys` partitions the window so a deployment
  * with thousands of pipelines keeps one pane per pipeline instead of a
  * single global sort.
  *
  * Trailing baselines use ROWS BETWEEN -trailing AND -1 (never the current
  * row — a degraded run must not drag its own baseline toward itself).
  * Runs with no history yet alert false (no baseline to compare against).
  */
object Monitoring {

  /** Evaluate the three alert probes over `runs`.
    *
    * @param runs       one row per run with `orderCol` + the three metrics
    * @param orderCol   run order within a pane (schedule tick / day)
    * @param execCol    execution-time metric (seconds)
    * @param recordsCol rows synced by the run
    * @param violationsCol rows failing validation in the run
    * @param runKeys    window pane keys (pipeline id, source, …); empty =
    *                   one global pane
    */
  def alerts(runs: DataFrame, orderCol: String,
             execCol: String, recordsCol: String, violationsCol: String,
             runKeys: Seq[String] = Nil,
             execOverFrac: Double = 0.25, recordUnderFrac: Double = 0.5,
             integrityFrac: Double = 0.05, trailing: Int = 7): DataFrame = {
    val base = if (runKeys.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(runKeys.map(col): _*).orderBy(col(orderCol))
    val w = base.rowsBetween(-trailing.toLong, -1L)
    val execBase = avg(col(execCol)).over(w)
    val recBase = avg(col(recordsCol)).over(w)
    def flag(c: Column): Column = coalesce(c, lit(false))
    runs.withColumn("exec_time_alert",
        flag(col(execCol) > (lit(1.0) + execOverFrac) * execBase))
      .withColumn("record_count_alert",
        flag(col(recordsCol) < lit(recordUnderFrac) * recBase))
      .withColumn("integrity_alert",
        flag(col(violationsCol) > lit(integrityFrac) * col(recordsCol)))
  }
}
