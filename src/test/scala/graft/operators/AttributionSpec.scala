package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def df(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("event_id", "user_id", "s")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("s")).as("ts"))

  private lazy val purchases = df(
    (1L, 1L, "2024-01-02 00:00:00"),  // clicks before: latest inside window
    (2L, 2L, "2024-01-10 00:00:00"),  // latest click 8 days before: outside
    (3L, 3L, "2024-01-02 00:00:00"),  // click only AFTER the purchase
    (4L, 4L, "2024-01-02 00:00:00"))  // no clicks at all
  private lazy val clicks = df(
    (91L, 1L, "2024-01-01 00:00:00"), (92L, 1L, "2024-01-01 12:00:00"),
    (93L, 2L, "2024-01-02 00:00:00"),
    (94L, 3L, "2024-01-03 00:00:00"))
    .select(col("user_id"), col("ts"))

  private lazy val out = Attribution.lastTouch(purchases, clicks,
    "user_id", "ts", "ts", windowHours = 72).collect()
    .map(r => r.getLong(0) -> ((r.getAs[Boolean]("attributed"),
      Option(r.getAs[Timestamp]("touch_ts")),
      Option(r.getAs[Any]("lag_minutes"))))).toMap

  test("the LATEST in-window touch gets credit, with the exact lag") {
    val (att, touch, lag) = out(1L)
    assert(att && touch.contains(ts("2024-01-01 12:00:00")))
    assert(lag.contains(720.0), s"12 h = 720 min: $lag")
  }

  test("an out-of-window latest touch attributes nothing (even if older touches exist)") {
    assert(out(2L) == ((false, None, None)))
  }

  test("touches after the conversion never attribute") {
    assert(out(3L) == ((false, None, None)))
  }

  test("users with no touches are unattributed, not dropped") {
    assert(out(4L) == ((false, None, None)))
  }

  test("same-instant duplicate touches collapse to one credit instant") {
    val p = df((1L, 1L, "2024-01-01 01:00:00"))
    val c = df((90L, 1L, "2024-01-01 00:00:00"), (91L, 1L, "2024-01-01 00:00:00"))
      .select(col("user_id"), col("ts"))
    val r = Attribution.lastTouch(p, c, "user_id", "ts", "ts", 72).collect()
    assert(r.length == 1 && r.head.getAs[Boolean]("attributed"))
  }

  test("a touch AT the conversion instant attributes with lag 0") {
    val p = df((1L, 1L, "2024-01-01 00:00:00"))
    val c = df((90L, 1L, "2024-01-01 00:00:00")).select(col("user_id"), col("ts"))
    val r = Attribution.lastTouch(p, c, "user_id", "ts", "ts", 72)
      .collect().head
    assert(r.getAs[Boolean]("attributed") &&
      r.getAs[Double]("lag_minutes") == 0.0)
  }

  test("null-keyed conversions come back attributed=false, never dropped") {
    val convs = Seq(
      (1L, Some(1L), Some("2024-01-02 00:00:00")),
      (5L, None, Some("2024-01-02 00:00:00")),     // null user
      (6L, Some(1L), None))                        // null ts
      .toDF("event_id", "user_id", "s")
      .select(col("event_id"), col("user_id"), to_timestamp(col("s")).as("ts"))
    val got = Attribution.lastTouch(convs, clicks, "user_id", "ts", "ts", 72)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Boolean]("attributed"),
        Option(r.getAs[Timestamp]("touch_ts"))))).toMap
    assert(got.keySet == Set(1L, 5L, 6L), s"conversions dropped: ${got.keySet}")
    assert(got(1L)._1, "the attributable row still attributes")
    assert(got(5L) == (false, None) && got(6L) == (false, None),
      s"null-keyed rows must be (false, null): $got")
  }

  test("invalid window fails loudly") {
    intercept[IllegalArgumentException] {
      Attribution.lastTouch(purchases, clicks, "user_id", "ts", "ts", 0)
    }
  }
}
