package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cutting materialization for multi-referenced intermediates
  * (sketch pipelines reference their signature/candidate frames several
  * times; recomputing them doubles or triples the query).
  *
  * Durability is configurable (VERDICT r2 item 3): with
  * `graft.checkpoint.dir` set on the session, frames checkpoint RELIABLY
  * through Spark's own checkpoint machinery — blocks live on the shared
  * filesystem and survive executor loss, which is routine at 100 TB scale
  * where a near-dup query runs long enough to see churn. Without the
  * setting, `localCheckpoint` (executor-local blocks; cheapest, fine on
  * local mode and short-lived jobs — an executor loss fails the query and
  * the caller reruns).
  */
object Checkpoints {

  /** Session conf key: a reliable checkpoint directory (HDFS/S3A/local
    * URI). Set once per session; consumed lazily on first materialize. */
  val DirKey = "graft.checkpoint.dir"

  /** Eagerly materialize `df`, cutting its lineage. Reliable when
    * [[DirKey]] is configured, executor-local otherwise. */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // idempotent: align the context's checkpoint dir with the conf so
        // runtime changes to graft.checkpoint.dir take effect
        if (!sc.getCheckpointDir.exists(_.startsWith(dir))) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None =>
        df.localCheckpoint()
    }
  }

  /** Release the block storage behind a frame produced by [[materialize]].
    * `Dataset.unpersist` only drops cache-manager entries — it does NOT
    * unpersist the block-backed RDD inside a localCheckpoint'ed frame, so
    * per-round checkpoints in iterative operators would linger until the
    * ContextCleaner eventually GCs them. This walks the analyzed plan for
    * `LogicalRDD` leaves and unpersists their RDDs directly. No-op for
    * reliable checkpoints (file-backed, not block-persisted). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
