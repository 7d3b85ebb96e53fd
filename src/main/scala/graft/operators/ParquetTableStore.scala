package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-directory table store with MERGE-upsert publish via
  * write-to-temp + atomic rename (SURVEY §7.4: the reference's MERGE+
  * TRUNCATE is transactional inside BigQuery; on files we stage and swap).
  * Shared by the batch [[graft.Pipeline]] and the streaming foreachBatch
  * sink. At cluster scale the same call sites would target a transactional
  * table format; only this class changes.
  */
class ParquetTableStore(spark: SparkSession, warehouse: String) {

  def path(name: String): String = s"$warehouse/$name"

  def read(name: String): Option[DataFrame] = {
    val p = new java.io.File(path(name))
    if (p.exists()) Some(spark.read.parquet(path(name))) else None
  }

  /** Upsert `updates` into table `name` keyed by `keys`; returns post-merge
    * row count. */
  def upsert(name: String, updates: DataFrame, keys: Seq[String]): Long = {
    val merged = read(name) match {
      case Some(current) => Upsert.merge(current, updates, keys)
      case None          => updates.distinct()
    }
    val tmp = new java.io.File(s"$warehouse/_tmp_$name")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    val dst = new java.io.File(path(name))
    if (dst.exists()) {
      val old = new java.io.File(s"$warehouse/_old_$name")
      if (old.exists()) deleteRec(old)
      if (!dst.renameTo(old)) sys.error(s"swap failed for $name")
      if (!tmp.renameTo(dst)) { old.renameTo(dst); sys.error(s"swap failed for $name") }
      deleteRec(old)
    } else if (!tmp.renameTo(dst)) sys.error(s"publish failed for $name")
    spark.read.parquet(path(name)).count()
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }
}
