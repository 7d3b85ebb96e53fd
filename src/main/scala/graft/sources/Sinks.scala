package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sink-side operators from SURVEY §2.1:
  *  - S6/U1/U2: chunked NDJSON staging sink (ref write_chunk_to_gcs,
  *    shopify_etl.py:105-123, chunk_records :100-103 — 10k rows/file)
  *  - S7: NDJSON → staging append load (ref load_gcs_file_to_staging
  *    :125-143, explicit schema + tolerant ingest)
  *  - S9: DDL-if-missing (ref :152-169,237-267)
  *  - S10: TRUNCATE (ref :586-590)
  *  - S11: table export to NDJSON (ref monitoring-guide.md:113-117)
  *
  * Chunking maps to `maxRecordsPerFile` — executors write many bounded
  * files in parallel, unlike the reference's single-process chunk loop.
  */
object Sinks {

  /** S6/U2: write NDJSON in bounded chunks (ref chunk_size=10000). */
  def writeNdjsonChunks(df: DataFrame, dir: String, chunkSize: Int = 10000): Unit =
    df.write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", chunkSize.toLong)
      .json(dir)

  /** S7: load NDJSON with a declared schema and append to a staging parquet
    * table. Tolerant ingest: undeclared fields dropped, malformed rows
    * PERMISSIVE-nulled (ref ignore_unknown_values=True :134).
    *
    * Returns the LOADED-BATCH row count (the reference's records_processed,
    * shopify_etl.py:207-235) by re-counting the batch NDJSON — O(batch).
    * Never count the staging table here: staging grows monotonically
    * between truncates, so a full `read.parquet(staging).count()` per chunk
    * load is O(table) and returns the cumulative count, the wrong number
    * AND a scan that grows without bound on a years-deep staging dir. */
  def loadNdjsonToStaging(spark: SparkSession, ndjsonDir: String,
                          schema: StructType, stagingPath: String): Long = {
    val df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(ndjsonDir)
    df.write.mode(SaveMode.Append).parquet(stagingPath)
    df.count()
  }

  /** S9: create an empty parquet table with the declared schema if missing.
    * Existence is checked through Hadoop's FileSystem so hdfs:///s3a://
    * paths resolve identically to the parquet writer (java.io.File would
    * report false for every URI and re-create the table each run). */
  def ensureTable(spark: SparkSession, path: String, schema: StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](), schema)
        .write.mode(SaveMode.ErrorIfExists).parquet(path)
    }
  }

  /** S10: TRUNCATE — overwrite with an empty frame of the same schema. */
  def truncate(spark: SparkSession, path: String): Unit = {
    val schema = spark.read.parquet(path).schema
    spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](), schema)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** S11: export a table as NDJSON (ref bq extract). */
  def exportJson(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(dir)
}
