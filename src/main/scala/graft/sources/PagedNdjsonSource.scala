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
  * The live HTTP plumbing (cursor pagination via Link headers, 429
  * Retry-After, exponential backoff — ref :294-331,436-449) is the
  * [[graft.sources.http.HttpPagedProvider]] `graft-http` connector; here
  * pages are files, which is how a fetch-then-load deployment lands data
  * for Spark at scale (fetcher writes pages, Spark reads them — the scan
  * itself must never be single-threaded through a driver HTTP loop).
  *
  * Scale notes: the page-order column comes from the file name via
  * input_file_name-free metadata (`_metadata.file_name` is stable), the
  * incremental filter is pushed into the JSON scan by Catalyst, and dedup
  * is [[graft.operators.Dedup.firstWins]] — one shuffle on the key.
  */
object PagedNdjsonSource {

  /** Read all pages in a directory with a declared schema; adds
    * `_page_file` (file name — pages are written with sortable names,
    * mirroring ascending pagination ref :274) and `_arrival_order`, a
    * STRUCT of (file name, within-scan row id) that sorts in arrival order.
    *
    * Deliberately NOT a global row_number window: that would funnel the
    * whole scan through one task and block predicate pushdown. The struct
    * is computed map-side; monotonically_increasing_id's partition-indexed
    * high bits preserve row order within a file's splits, and the file name
    * dominates the ordering across pages. An optional pushed-down filter
    * (see [[readIncremental]]) is applied directly on the scan, below any
    * nondeterministic column. */
  def read(spark: SparkSession, dir: String, schema: StructType,
           scanFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val base = spark.read.schema(schema).json(dir)
    val filtered = scanFilter.map(base.filter).getOrElse(base)
    filtered
      .withColumn("_page_file", col("_metadata.file_name"))
      .withColumn("_arrival_order",
        struct(col("_page_file").as("f"), monotonically_increasing_id().as("r")))
  }

  /** Incremental read: only records with `tsCol >= startTs` (the reference's
    * updated_at_min pushed predicate, ref :274-276) minus a late-data buffer
    * already applied by the caller. The filter goes below the arrival-order
    * projection so Catalyst can push it into the scan. */
  def readIncremental(spark: SparkSession, dir: String, schema: StructType,
                      tsCol: String, startTs: java.sql.Timestamp): DataFrame =
    read(spark, dir, schema, Some(to_timestamp(col(tsCol)) >= lit(startTs)))

  /** Test-mode cap (ref :431-433): stop after ~maxRecords. */
  def readCapped(spark: SparkSession, dir: String, schema: StructType,
                 maxRecords: Int): DataFrame =
    read(spark, dir, schema).limit(maxRecords)
}
