package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession settings for the engine. Centralized so Verify,
  * Bench, and tests run with identical semantics.
  *
  * Scale rationale:
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *    — the knobs that keep a fixed shuffle.partitions setting viable from
  *    sf0.01 locally up to a real cluster.
  *  - nanosAsLong: the driver's events table stores TIMESTAMP(NANOS), which
  *    Spark cannot read natively; see [[Tables.events]] for the conversion.
  *  - UTC session TZ: reference timestamps are ISO-8601 UTC
  *    (ref shopify_etl.py:197).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
}
