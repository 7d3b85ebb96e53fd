package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins: both sides pre-hashed into the same number of
  * buckets on the join key, so the join needs NO shuffle exchange — the
  * strategy for repeatedly-joined 100 TB fact tables (pay the shuffle once
  * at write time, never at read time).
  *
  * Bucketed tables require the session catalog (`saveAsTable`); the bucket
  * metadata lives in the catalog, which is how Spark knows the sides are
  * co-partitioned.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // A previous JVM's in-memory catalog leaves orphan table LOCATIONS
    // behind (metadata died with the session, files did not); saveAsTable
    // refuses to adopt such a location, so drop both metadata and path
    // before writing — otherwise the first run after any restart fails.
    // The path comes from the session catalog's OWN resolution (current
    // database, case normalization), never a hand-built
    // <warehouse>/<table> string that could miss the real orphan — or
    // delete an unrelated same-named directory.
    // Parse FIRST and quote each part: wrapping the raw name in one pair
    // of backticks would drop a qualified `db.tbl` as a single-part
    // identifier in the current database while the deleted path resolved
    // to db.tbl — metadata and files out of sync.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val quoted = (ident.database.toSeq :+ ident.table)
      .map(p => s"`${p.replace("`", "``")}`").mkString(".")
    spark.sql(s"DROP TABLE IF EXISTS $quoted")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
