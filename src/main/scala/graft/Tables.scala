package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * parquet lazily so Catalyst can push filters/prune columns into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true (see
    * [[graft.GraftSession]]) so `ts` arrives as nanos-since-epoch LongType
    * and is converted here to a microsecond timestamp (truncation — same as
    * DuckDB's ns→µs cast, so oracle comparisons stay exact). `ts div 1000`
    * is integer division: a double division would lose precision above 2^53. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  /** Parallelism floor for the expression-heavy tables. The driver's test
    * parquet is ONE row group per table, so Spark cannot split the scan —
    * every sketch/regex/vector projection would run on a single core no
    * matter the cluster. A production corpus arrives with scan parallelism
    * (many files / row groups); this round-robin repartition re-establishes
    * it after the scan for the two tables whose downstream work is
    * projection-dominated (documents: fingerprints, MinHash/SimHash/winnow
    * sketches, PII regexes, tokenization; embeddings: LSH sketches, dot
    * products). One narrow shuffle of the raw rows buys full-width
    * execution of everything above it; the agg/join tables (lineitem,
    * orders, events) are NOT floored — their scan projections are cheap
    * casts and their first shuffle arrives immediately anyway, so the
    * extra exchange would only add cost. */
  private def floored(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(parallelism)
  }

  def documents(s: SparkSession, d: String): DataFrame  = floored(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = floored(load(s, d, "embeddings"))
}
