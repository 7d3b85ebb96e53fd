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

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
