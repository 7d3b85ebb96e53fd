package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.OffsetDateTime
import java.util.concurrent.atomic.AtomicReference

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's real lifecycle end-to-end: live paginated HTTP fetch
  * with the checkpoint pushed as updated_at_min -> flatten -> key dedup ->
  * merge -> control row. Server = in-process JDK HttpServer serving the
  * same order fixtures as PipelineSpec inside {"orders":[...]} pages. */
class PipelineHttpSpec extends SparkSpec {

  private case class Rec(updatedAt: OffsetDateTime, json: String)
  private val UpdatedAt = """"updated_at"\s*:\s*"([^"]+)"""".r

  private var server: HttpServer = _
  private var url: String = _
  private val records = new AtomicReference[Seq[Rec]](Nil)
  private val lastMinParam = new AtomicReference[Option[String]](None)

  private def fixtureRecords(): Seq[Rec] = {
    val dir = Paths.get(getClass.getResource("/orders_pages").getPath)
    Files.list(dir).iterator().asScala.toSeq.sortBy(_.toString).flatMap { p =>
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n").filter(_.trim.nonEmpty).toSeq
    }.map { line =>
      val ts = UpdatedAt.findFirstMatchIn(line).map(_.group(1))
        .getOrElse(sys.error(s"fixture line without updated_at: $line"))
      Rec(OffsetDateTime.parse(ts), line)
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    records.set(fixtureRecords())
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/admin/orders.json", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.nonEmpty)
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8") }
        .toMap
      val min = q.get("updated_at_min")
      lastMinParam.set(min)
      val minTs = min.map(OffsetDateTime.parse)
      val page = q("page").toInt; val limit = q("limit").toInt
      val eligible = records.get()
        .filter(r => minTs.forall(m => !r.updatedAt.isBefore(m)))
      val slice = eligible.slice((page - 1) * limit, page * limit)
      val body = s"""{"orders":[${slice.map(_.json).mkString(",")}]}"""
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    // /stream/orders.json — independent record set for the streaming test
    server.createContext("/stream/orders.json", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.nonEmpty)
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8") }
        .toMap
      val minTs = q.get("updated_at_min").map(OffsetDateTime.parse)
      val page = q("page").toInt; val limit = q("limit").toInt
      val eligible = streamRecords.get()
        .filter(r => minTs.forall(m => !r.updatedAt.isBefore(m)))
      val slice = eligible.slice((page - 1) * limit, page * limit)
      val body = s"""{"orders":[${slice.map(_.json).mkString(",")}]}"""
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    url = s"http://127.0.0.1:${server.getAddress.getPort}/admin/orders.json"
  }

  private val streamRecords = new AtomicReference[Seq[Rec]](Nil)

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  test("live HTTP sync: full load, then checkpointed incremental pickup") {
    val wh = Files.createTempDirectory("graft_wh_http").toString
    val p = new Pipeline(spark, wh)
    val opts = Map("recordsField" -> "orders", "limit" -> "2", "partitions" -> "2")

    // full load — same corpus, same expected counts as the file pipeline
    val counts = p.executeHttp(url, opts, forceFullLoad = true, runId = "h1")
    assert(lastMinParam.get().isEmpty, "full load must not send updated_at_min")
    assert(counts("orders") == 4)
    assert(counts("line_items") == 4)
    assert(counts("customers") == 3)

    val v = p.verify()
    Schemas.uniqueKeys.keys.foreach { t =>
      val (total, distinct) = v(t)
      assert(total == distinct, s"$t keys not unique")
    }

    // incremental: the checkpoint (max updated_at minus 1 h buffer) is
    // pushed to the server as updated_at_min, like the reference's REST call
    val counts2 = p.executeHttp(url, opts, runId = "h2")
    val sent = lastMinParam.get()
    assert(sent.isDefined, "incremental run must push updated_at_min")
    assert(sent.get.startsWith("2024-03-03T09:00"), s"got $sent")
    assert(counts2 == counts, "re-sync of already-merged rows is idempotent")

    // a record updated after the checkpoint arrives -> picked up and merged
    val bumped = records.get().head.json
      .replaceAll(""""updated_at"\s*:\s*"[^"]+"""", "\"updated_at\": \"2024-03-05T12:00:00+00:00\"")
      .replaceAll(""""financial_status"\s*:\s*"[^"]+"""", "\"financial_status\": \"refunded\"")
    records.set(records.get().tail :+ Rec(OffsetDateTime.parse("2024-03-05T12:00:00+00:00"), bumped))
    val counts3 = p.executeHttp(url, opts, runId = "h3")
    assert(counts3("orders") == 4, "update of an existing order must merge, not append")
    val refunded = p.readFinal("orders").get
      .where(org.apache.spark.sql.functions.col("financial_status") === "refunded").count()
    assert(refunded == 1, "the updated row must have been re-fetched and upserted")
  }

  test("readStream micro-batches with the checkpointed offset as updated_at_min") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    import spark.implicits._
    streamRecords.set(fixtureRecords())
    val root = Files.createTempDirectory("graft_http_stream").toString
    val sUrl = url.replace("/admin/", "/stream/")
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-http")
        .option("url", sUrl).option("recordsField", "orders")
        .option("limit", "2").option("partitions", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val ids1 = spark.read.parquet(s"$root/out")
      .select(get_json_object(col("value"), "$.id").cast("long")).as[Long].collect().toSeq
    // 5 raw records (incl. the cross-page duplicate of id 1001) — the raw
    // source fetches everything; dedup is downstream's job
    assert(ids1.size == 5, s"first run (offset epoch 0) fetches everything, got $ids1")

    // a record updated after the first run's offset arrives; the next run
    // fetches ONLY it (updated_at_min = checkpointed high-water mark)
    val future = java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC).plusHours(1)
    val novel = streamRecords.get().head.json
      .replaceAll(""""id"\s*:\s*\d+""", "\"id\": 9001")
      .replaceAll(""""updated_at"\s*:\s*"[^"]+"""", s""""updated_at": "$future"""")
    streamRecords.set(streamRecords.get() :+ Rec(future, novel))
    runOnce()
    val ids2 = spark.read.parquet(s"$root/out")
      .select(get_json_object(col("value"), "$.id").cast("long")).as[Long].collect().toSeq
    assert(ids2.size == ids1.size + 1 && ids2.contains(9001L),
      s"second run must fetch exactly the newly-updated record, got $ids2")
  }
}
