package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-directory table store with MERGE-upsert publish via
  * write-to-temp + atomic rename (SURVEY §7.4: the reference's MERGE+
  * TRUNCATE is transactional inside BigQuery; on files we stage and swap).
  * Shared by the batch [[graft.Pipeline]] and the streaming foreachBatch
  * sink. At cluster scale the same call sites would target a transactional
  * table format; only this class changes.
  *
  * All path operations go through Hadoop's [[FileSystem]], resolved from
  * the warehouse URI itself, so `file:///`, `hdfs://` and `s3a://`
  * warehouses behave identically to the parquet reader/writer (a
  * `java.io.File` check is always false for URIs — see SyncControl.all).
  * `FileSystem.rename` is atomic on HDFS and local FS; object stores fall
  * back to copy+delete, which is still correct because the swap direction
  * (old out first, then temp in) never leaves a half-visible table.
  */
class ParquetTableStore(spark: SparkSession, warehouse: String) {

  def path(name: String): String = s"$warehouse/$name"

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def read(name: String): Option[DataFrame] = {
    val p = new Path(path(name))
    if (fs(p).exists(p)) Some(spark.read.parquet(path(name))) else None
  }

  /** Stage `df` as the new content of `name`, then atomically swap it in
    * (write completes fully before the source directory is touched, so a
    * publish reading from the table it replaces is safe). */
  private def publish(name: String, df: DataFrame): Unit = {
    val tmp = new Path(s"$warehouse/_tmp_$name")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dst = new Path(path(name))
    val f = fs(dst)
    if (f.exists(dst)) {
      val old = new Path(s"$warehouse/_old_$name")
      if (f.exists(old)) f.delete(old, true)
      if (!f.rename(dst, old)) sys.error(s"swap failed for $name")
      if (!f.rename(tmp, dst)) { f.rename(old, dst); sys.error(s"swap failed for $name") }
      f.delete(old, true)
    } else if (!f.rename(tmp, dst)) sys.error(s"publish failed for $name")
  }

  /** Upsert `updates` into table `name` keyed by `keys`; returns post-merge
    * row count. */
  def upsert(name: String, updates: DataFrame, keys: Seq[String]): Long = {
    val merged = read(name) match {
      case Some(current) => Upsert.merge(current, updates, keys)
      case None          => Upsert.keyDedup(updates, keys)
    }
    publish(name, merged)
    spark.read.parquet(path(name)).count()
  }

  /** Rewrite `name` as `targetFiles` files and swap — incremental upserts
    * and streaming appends accumulate small files, and scan task counts
    * should track data size, not ingest history. Returns parquet file
    * counts (before, after). */
  def compact(name: String, targetFiles: Int = 1): (Int, Int) = {
    val p = new Path(path(name))
    val f = fs(p)
    require(f.exists(p), s"cannot compact missing table $name")
    def nFiles = f.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    val before = nFiles
    publish(name, spark.read.parquet(path(name)).repartition(targetFiles))
    (before, nFiles)
  }
}
