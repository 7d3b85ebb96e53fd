package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object StreamJoinSpec {
  case class Click(user_id: Long, click_ts: Timestamp)
  case class Purchase(user_id: Long, purchase_ts: Timestamp, value: Double)
}

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._
  import StreamJoinSpec.{Click, Purchase}

  private def ts(s: String) = Timestamp.valueOf(s)

  private val clicksFx = Seq(
    Click(1L, ts("2024-01-01 10:00:00")),
    Click(2L, ts("2024-01-01 10:00:00")),
    Click(3L, ts("2024-01-01 10:00:00")))
  private val purchasesFx = Seq(
    Purchase(1L, ts("2024-01-01 10:30:00"), 5.0),   // inside 1 h horizon
    Purchase(2L, ts("2024-01-01 12:30:00"), 7.0),   // outside horizon
    Purchase(3L, ts("2024-01-01 09:30:00"), 9.0),   // BEFORE the click
    Purchase(9L, ts("2024-01-01 10:10:00"), 1.0))   // no matching click

  test("streaming interval join attributes inside the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.intervalJoin(
      clicks.toDF().withWatermark("click_ts", "10 minutes"),
      purchases.toDF().withWatermark("purchase_ts", "10 minutes"),
      Seq("user_id"), "click_ts", "purchase_ts", "1 HOUR")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    clicks.addData(clicksFx: _*)
    purchases.addData(purchasesFx: _*)
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, value FROM attr").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    q.stop()
    assert(rows == Set((1L, 5.0)),
      s"only user 1's purchase is inside [click, click+1h]: $rows")
  }

  test("stream result ≡ the same call on static frames") {
    val static = StreamJoin.intervalJoin(clicksFx.toDF(), purchasesFx.toDF(),
      Seq("user_id"), "click_ts", "purchase_ts", "1 HOUR")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(static == Set((1L, 5.0)))
  }

  test("late rows beyond the watermark produce no output (state evicted)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.intervalJoin(
      clicks.toDF().withWatermark("click_ts", "10 minutes"),
      purchases.toDF().withWatermark("purchase_ts", "10 minutes"),
      Seq("user_id"), "click_ts", "purchase_ts", "1 HOUR")
    val q = joined.writeStream.format("memory").queryName("attr_late")
      .outputMode("append").start()
    clicks.addData(Click(1L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // advance BOTH watermarks far past click+horizon+delay
    clicks.addData(Click(99L, ts("2024-01-02 10:00:00")))
    purchases.addData(Purchase(98L, ts("2024-01-02 10:00:00"), 0.0))
    q.processAllAvailable()
    // this purchase would match user 1's click, but arrives after the
    // watermark passed its event time — the click's state is gone
    purchases.addData(Purchase(1L, ts("2024-01-01 10:20:00"), 42.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM attr_late").collect()
    q.stop()
    assert(rows.isEmpty, s"late purchase must not join: ${rows.toSeq}")
  }

  test("overlapping non-key column names fail loudly up front") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 00:00:00", "x")).toDF("k", "lts", "payload")
    val r = Seq((1L, "2024-01-01 00:30:00", "y")).toDF("k", "rts", "payload")
    val e = intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(l, r, Seq("k"), "lts", "rts", "1 HOUR")
    }
    assert(e.getMessage.contains("payload"), e.getMessage)
  }

  test("empty keyCols fails loudly") {
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(clicksFx.toDF(), purchasesFx.toDF(),
        Seq.empty, "click_ts", "purchase_ts", "1 HOUR")
    }
  }
}
