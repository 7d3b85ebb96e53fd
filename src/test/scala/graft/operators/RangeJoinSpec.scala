package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = Seq(
    (1L, ts("2024-03-01 00:00:00")), // exactly on an interval start
    (2L, ts("2024-03-02 12:30:00")),
    (3L, ts("2024-03-05 00:00:00")), // exactly on iv10's exclusive end
    (4L, ts("2024-03-09 23:59:59.999999")), // 1µs before iv11's end
    (5L, ts("2024-02-28 23:59:59"))  // before everything
  ).toDF("pt_id", "pt")

  private def intervals = Seq(
    (10L, ts("2024-03-01 00:00:00"), ts("2024-03-05 00:00:00")), // spans 4 buckets
    (11L, ts("2024-03-02 06:00:00"), ts("2024-03-10 00:00:00")), // spans 8+
    (12L, ts("2024-03-03 00:00:00"), ts("2024-03-03 00:00:00")), // empty
    (13L, ts("2024-03-04 00:00:00"), ts("2024-03-01 00:00:00"))  // inverted
  ).toDF("iv_id", "s", "e")

  private def matches =
    RangeJoin.pointInInterval(points, "pt", intervals, "s", "e")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet

  test("inclusive start, exclusive end, across many buckets") {
    assert(matches == Set(
      (1L, 10L),            // on start — inclusive
      (2L, 10L), (2L, 11L), // mid-interval
      (3L, 11L),            // on iv10's END — excluded there, inside iv11
      (4L, 11L)))           // 1µs before end — included
  }

  test("empty and inverted intervals match nothing") {
    assert(!matches.exists { case (_, iv) => iv == 12L || iv == 13L })
  }

  test("each qualifying pair is emitted exactly once (no bucket dup)") {
    val all = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSeq
    assert(all.size == all.toSet.size)
  }

  test("plan is an equi join on the band bucket, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("_rj_bucket"), plan)
  }

  test("narrow buckets replicate intervals but keep results identical") {
    val wide = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 86400L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val narrow = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 3600L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(wide == narrow)
  }

  test("NTZ columns under a DST session timezone are refused, not silently mis-bucketed") {
    // NTZ bucketing casts local → instant; a region zone's spring-forward
    // gap makes that non-monotonic, so the operator must refuse up front.
    val pNtz = points.select($"pt_id", to_timestamp_ntz(date_format($"pt", "yyyy-MM-dd HH:mm:ss")).as("pt"))
    val iNtz = intervals.select($"iv_id",
      to_timestamp_ntz(date_format($"s", "yyyy-MM-dd HH:mm:ss")).as("s"),
      to_timestamp_ntz(date_format($"e", "yyyy-MM-dd HH:mm:ss")).as("e"))
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/Los_Angeles")
      val e = intercept[IllegalArgumentException] {
        RangeJoin.pointInInterval(pNtz, "pt", iNtz, "s", "e")
      }
      assert(e.getMessage.contains("fixed-offset"))
      // fixed offsets are fine, and instant (TIMESTAMP) columns never care
      spark.conf.set(tzKey, "+02:00")
      assert(RangeJoin.pointInInterval(pNtz, "pt", iNtz, "s", "e").count() >= 1)
      spark.conf.set(tzKey, "America/Los_Angeles")
      assert(RangeJoin.pointInInterval(points, "pt", intervals, "s", "e").count() >= 1)
    } finally spark.conf.set(tzKey, prev)
  }

  test("offset-bearing instant strings run under a region zone via assumeInstantStrings") {
    // A string WITH an explicit offset casts session-zone-independently;
    // the type system can't see that, so the caller asserts it. The
    // result must equal the TIMESTAMP-column run bit for bit. XXX emits
    // the TRUE session-zone offset at each instant (-08:00/-07:00 across
    // a DST boundary) — hard-coding '+00:00' onto a local rendering
    // would mislabel the instants and only pass while the fixture stays
    // inside one DST regime.
    def iso(c: org.apache.spark.sql.Column) =
      date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    val pStr = points.select($"pt_id", iso($"pt").as("pt"))
    val iStr = intervals.select($"iv_id", iso($"s").as("s"), iso($"e").as("e"))
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/Los_Angeles")
      // without the flag: refused (string might be offset-less)
      val e = intercept[IllegalArgumentException] {
        RangeJoin.pointInInterval(pStr, "pt", iStr, "s", "e")
      }
      assert(e.getMessage.contains("assumeInstantStrings"))
      val got = RangeJoin.pointInInterval(pStr, "pt", iStr, "s", "e",
          assumeInstantStrings = true)
        .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got == matches)
    } finally spark.conf.set(tzKey, prev)
  }
}
