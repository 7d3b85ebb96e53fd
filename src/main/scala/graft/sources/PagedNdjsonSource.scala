package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch source with the *semantics* of the reference's paginated REST scan
  * (ref shopify-etl/shopify_etl.py:271-461): an ordered sequence of NDJSON
  * pages, an incremental `updated_at >= start` predicate evaluated at the
  * source, an optional record cap (test mode), and first-wins dedup across
  * pages.
  *
  * The HTTP plumbing (cursor pagination via Link headers, 429 Retry-After,
  * exponential backoff — ref :294-331,436-449) is connector-level I/O with
  * no relational analog; here pages are files, which is also how such a
  * connector lands data for Spark at scale (fetcher writes pages, Spark
  * reads them — the scan itself must never be single-threaded through a
  * driver HTTP loop).
  *
  * Scale notes: the page-order column comes from the file name via
  * input_file_name-free metadata (`_metadata.file_name` is stable), the
  * incremental filter is pushed into the JSON scan by Catalyst, and dedup
  * is [[graft.operators.Dedup.firstWins]] — one shuffle on the key.
  */
object PagedNdjsonSource {

  /** Read all pages in a directory with a declared schema; adds
    * `_page_order` (lexicographic file-name rank — page files are written
    * with sortable names, mirroring ascending pagination ref :274) and
    * `_arrival_order` (row position) for deterministic first-wins. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)
      .withColumn("_page_file", col("_metadata.file_name"))
      .withColumn("_arrival_order",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_page_file"), monotonically_increasing_id())).cast("long"))

  /** Incremental read: only records with `tsCol >= startTs` (the reference's
    * updated_at_min pushed predicate, ref :274-276) minus a late-data buffer
    * already applied by the caller. */
  def readIncremental(spark: SparkSession, dir: String, schema: StructType,
                      tsCol: String, startTs: java.sql.Timestamp): DataFrame =
    read(spark, dir, schema).filter(to_timestamp(col(tsCol)) >= lit(startTs))

  /** Test-mode cap (ref :431-433): stop after ~maxRecords. */
  def readCapped(spark: SparkSession, dir: String, schema: StructType,
                 maxRecords: Int): DataFrame =
    read(spark, dir, schema).limit(maxRecords)
}
