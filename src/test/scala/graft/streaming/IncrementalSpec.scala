package graft.streaming

import java.nio.file.Files
import graft.{Schemas, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pagesDir = getClass.getResource("/orders_pages").getPath

  test("streaming pipeline: file stream -> watermark dedup -> foreachBatch merge (T1-T5)") {
    val wh = Files.createTempDirectory("graft_stream_wh").toString
    val cp = Files.createTempDirectory("graft_stream_cp").toString

    val q = Incremental.run(spark, pagesDir, wh, cp)
    q.awaitTermination(120000)

    val orders = spark.read.parquet(s"$wh/orders")
    assert(orders.count() == 4, "cross-page dup removed by streaming dedup")
    assert(orders.select("order_id").distinct().count() == 4)
    val li = spark.read.parquet(s"$wh/line_items")
    assert(li.join(orders, Seq("order_id"), "left_anti").count() == 0, "no orphans")

    // T5 replay with same checkpoint: no new files -> no changes (exactly-once effect)
    val q2 = Incremental.run(spark, pagesDir, wh, cp)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$wh/orders").count() == 4)
  }

  test("stream-static enrichment join: streaming events pick up static dimension columns") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((13L, "gold"), (12L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val enriched = mem.toDF().toDF("user_id", "value")
      .join(dim, Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData((13L, 1.0), (99L, 2.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, tier FROM enriched")
      .as[(Long, Option[String])].collect().toMap
    q.stop()
    assert(rows(13L).contains("gold"))
    assert(rows(99L).isEmpty, "unmatched stream row keeps NULL dimension")
  }

  test("streaming daily rollup with watermark emits per-day windows (A9 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val out = Incremental.dailyRollup(df)
    val query = out.writeStream.format("memory").queryName("rollup")
      .outputMode("append").start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-03 00:00:01"), "view", 5.0)) // advances watermark past day 1
    query.processAllAvailable()
    mem.addData((java.sql.Timestamp.valueOf("2024-01-05 00:00:01"), "view", 1.0))
    query.processAllAvailable()
    val rows = spark.sql("SELECT day, event_type, n_events, total_value FROM rollup")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    query.stop()
    assert(rows.contains((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "click", 2L, 3.0)))
  }
}
