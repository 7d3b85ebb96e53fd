package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Schemas

/** Checkpoint/control plane (ref shopify-etl/shopify_etl.py:171-267):
  * an append-only parquet event log of runs, read back as "latest
  * successful sync" (top-1 by timestamp — O1), written once per run with
  * status success/error/partial (T2/T6).
  *
  * Append-only parquet is deliberately the same shape the reference uses
  * (append rows, never update) — safe under concurrent readers and cheap
  * at any scale since the control table grows one row per run.
  */
class SyncControl(spark: SparkSession, path: String) {

  /** Append one run record (ref update_sync_timestamp :207-235; DDL default
    * created_at=CURRENT_TIMESTAMP :262-263). */
  def recordRun(tableName: String, lastSync: Timestamp, records: Long,
                status: String, runId: String, notes: String = ""): Unit = {
    val row = spark.createDataFrame(
      java.util.List.of(Row(tableName, lastSync, records, status, runId, notes,
        new Timestamp(System.currentTimeMillis()))),
      Schemas.syncControl)
    row.write.mode(SaveMode.Append).parquet(path)
  }

  /** Missing control table (first run) → empty frame; any OTHER failure
    * (corrupt footer, permissions) propagates — silently treating it as
    * "no history" would turn every incremental run into a full reload and
    * hide the fault. Existence is checked through Hadoop's FileSystem so
    * hdfs:///s3a:// warehouse paths resolve the same way the parquet
    * reader/writer does (a java.io.File check is always false for URIs). */
  def all(): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(java.util.List.of[Row](), Schemas.syncControl)
    else spark.read.schema(Schemas.syncControl).parquet(path)
  }

  /** Latest successful sync timestamp for a table (ref get_last_sync_timestamp
    * :171-205, SQL top-1 :174-180), minus the intended 1-hour late-data
    * buffer (ref comment :191-194; the reference's timedelta bug makes it
    * always fall back — we implement the *intended* semantics, SURVEY §7.4). */
  def lastSyncWithBuffer(tableName: String): Option[Timestamp] = {
    val rows = all()
      .filter(col("table_name") === tableName && col("status") === "success")
      .orderBy(col("last_sync_timestamp").desc)
      .limit(1)
      .select((col("last_sync_timestamp") - expr("INTERVAL 1 HOUR")).as("ts"))
      .collect()
    rows.headOption.map(_.getTimestamp(0))
  }
}
