package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match point rows to interval rows with NO equi
  * key: `left.point ∈ [right.start, right.end)`. The reference never needs
  * one, but a training-data pipeline does constantly (events ↔ campaign
  * windows, log lines ↔ incident windows, samples ↔ validity intervals).
  *
  * Scale shape: Catalyst plans a bare inequality join as a broadcast
  * nested loop — O(|L|·|R|) comparisons, a scale-killer the moment the
  * interval side outgrows a broadcast. Banding fixes it: each interval is
  * exploded into the fixed-width time buckets it covers, each point
  * computes its own bucket, and the join becomes an EQUI join on bucket
  * plus a residual range predicate — hash-joinable, AQE-skew-splittable,
  * shuffle-partitioned like any other key join. A qualifying (point,
  * interval) pair meets in exactly ONE bucket row (the point's own
  * bucket), so the output needs no dedup.
  *
  * Bucket width trades replication for selectivity: intervals replicate
  * ⌈len/width⌉×, points never replicate. Pick width ≈ the typical
  * interval length so replication stays O(1) per interval.
  */
object RangeJoin {

  /** Floor bucket of a timestamp in `widthSec`-second buckets. Integer
    * arithmetic end-to-end: `us - pmod(us, w)` is an exact multiple of w
    * (pmod keeps floor semantics for pre-epoch timestamps), and a
    * multiple of w below 2^53 µs divides exactly in double — no
    * float-rounding edge at bucket boundaries.
    *
    * TIMESTAMP_NTZ columns (what parquet micros/millis without tz read
    * as) are cast to TIMESTAMP for the epoch-micros extraction: under a
    * UTC session (graft's default) the cast is an exact identity, and
    * under any fixed-offset zone it is a constant shift applied to points
    * and intervals alike — bucket ALIGNMENT only needs monotonicity, and
    * the membership predicate itself always compares the original
    * columns. A REGION zone with DST breaks that monotonicity (a local
    * time inside a spring-forward gap maps past later wall-clock
    * instants, so a gap point can land above its interval-end bucket and
    * miss a genuine match) — [[pointInInterval]] therefore REFUSES to run
    * NTZ columns under a non-fixed-offset session timezone instead of
    * silently dropping matches. */
  private def bucketOf(c: org.apache.spark.sql.Column, widthUs: Long) = {
    val us = unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
    ((us - pmod(us, lit(widthUs))) / lit(widthUs)).cast("long")
  }

  /** Enforce the fixed-offset assumption bucketOf's cast-to-TIMESTAMP
    * relies on. Instant (TIMESTAMP) columns extract epoch micros
    * zone-independently, and so do NUMERIC epoch columns (long/double →
    * timestamp is an instant conversion); the LOCAL types — TIMESTAMP_NTZ,
    * STRING timestamps without an explicit offset, DATE — go through the
    * session-zone local-to-instant mapping and are the ones guarded.
    *
    * STRING is only conditionally local: a string WITH an explicit offset
    * ('2024-03-01T10:00:00+00:00') casts to TIMESTAMP session-zone-
    * independently, so refusing every string column under a region-zone
    * session (Spark's default is the JVM zone) would reject perfectly
    * safe callers. The data type cannot reveal which case holds, so
    * callers whose string values all carry explicit offsets opt out via
    * `assumeInstantStrings`; the guard then skips StringType and any
    * offset-LESS value is on the caller (it would fall back to the
    * session-zone mapping the flag asserts away). NTZ and DATE carry no
    * offset by construction and stay guarded unconditionally. */
  private def requireFixedOffsetForNtz(df: DataFrame, cols: Seq[String],
                                       assumeInstantStrings: Boolean): Unit = {
    import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType}
    val local = cols.filter(c => df.schema(c).dataType match {
      case TimestampNTZType | DateType => true
      case StringType => !assumeInstantStrings
      case _ => false
    })
    if (local.nonEmpty) {
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
      require(java.time.ZoneId.of(tz).getRules.isFixedOffset,
        s"pointInInterval on non-instant column(s) ${local.mkString(", ")} (NTZ/string/" +
          s"date) requires a fixed-offset session timezone (got '$tz'): DST gaps make " +
          "the local-to-instant bucket mapping non-monotonic, which can silently drop " +
          "matches. Set spark.sql.session.timeZone to UTC or a fixed offset, cast " +
          "to TIMESTAMP with an explicit zone upstream, or — if every string value " +
          "carries an explicit offset — pass assumeInstantStrings = true.")
    }
  }

  /** Point-in-interval join: rows of `left` matched to every row of
    * `right` whose [startCol, endCol) contains `pointCol`. Columns of both
    * sides survive on the output (bucket column dropped). Empty or
    * inverted intervals match nothing. */
  def pointInInterval(left: DataFrame, pointCol: String,
                      right: DataFrame, startCol: String, endCol: String,
                      bucketWidthSec: Long = 86400L,
                      assumeInstantStrings: Boolean = false): DataFrame = {
    require(bucketWidthSec > 0, "bucket width must be positive")
    requireFixedOffsetForNtz(left, Seq(pointCol), assumeInstantStrings)
    requireFixedOffsetForNtz(right, Seq(startCol, endCol), assumeInstantStrings)
    val w = bucketWidthSec * 1000000L
    // Comparisons (both the interval-validity filter and the residual
    // membership predicate) run on TIMESTAMP-cast columns when the
    // stored type is STRING: a raw string comparison is lexicographic,
    // which coincides with temporal order only for uniform-offset,
    // fixed-width values — mixed offsets (+00:00 vs -08:00 across a DST
    // boundary under assumeInstantStrings) would order wrongly. For
    // non-string types the cast helper is the identity.
    import org.apache.spark.sql.types.{StringType, TimestampType}
    def cmp(df: DataFrame, c: String): org.apache.spark.sql.Column =
      if (df.schema(c).dataType == StringType) col(c).cast(TimestampType) else col(c)
    val lb = left.withColumn("_rj_bucket", bucketOf(col(pointCol), w))
      .withColumn("_rj_p", cmp(left, pointCol))
    // end is exclusive: an interval ending exactly on a bucket boundary
    // does not cover that bucket, hence the -1 µs on the upper bound
    val rb = right.withColumn("_rj_s", cmp(right, startCol))
      .withColumn("_rj_e", cmp(right, endCol))
      .filter(col("_rj_e") > col("_rj_s"))
      .withColumn("_rj_bucket", explode(sequence(
        bucketOf(col(startCol), w),
        bucketOf(timestamp_micros(
          unix_micros(col(endCol).cast(TimestampType)) - 1), w))))
    lb.join(rb, Seq("_rj_bucket"))
      .filter(col("_rj_p") >= col("_rj_s") && col("_rj_p") < col("_rj_e"))
      .drop("_rj_bucket", "_rj_p", "_rj_s", "_rj_e")
  }
}
