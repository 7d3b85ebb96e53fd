package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drives the graft-http connector against a real in-process HTTP server:
  * strided page fetches, Link-header cursor walk, 429 + Retry-After
  * recovery, and from_json round-trip into relational form. */
class HttpSourceSpec extends SparkSpec {
  import spark.implicits._

  private val Total = 57 // records; deliberately not a multiple of the page size
  private def record(i: Int) = s"""{"id":$i,"name":"item-$i","price":${i % 10}.50}"""

  private var server: HttpServer = _
  private var base: String = _
  private val hits429 = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String,
                      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8") }
      .toMap

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // /items?page=N&limit=M — page-number pagination, empty beyond the end
    server.createContext("/items", (ex: HttpExchange) => {
      val q = query(ex)
      val page = q("page").toInt; val limit = q("limit").toInt
      val minId = q.get("min_id").map(_.toInt).getOrElse(0)
      val ids = (minId until Total).slice((page - 1) * limit, page * limit)
      respond(ex, 200, s"""{"items":[${ids.map(record).mkString(",")}]}""")
    })
    // /flaky — first TWO requests answer 429 Retry-After: 0, then serve
    // one page of two records (page-aware: page 2+ is empty, ending the scan)
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (hits429.incrementAndGet() <= 2) respond(ex, 429, "", "Retry-After" -> "0")
      else if (query(ex)("page").toInt == 1)
        respond(ex, 200, s"""{"items":[${record(1)},${record(2)}]}""")
      else respond(ex, 200, """{"items":[]}""")
    })
    // /cursor?after=N — Link-header pagination; page 2 is empty but still
    // links onward (the empty-page-mid-walk case)
    server.createContext("/cursor", (ex: HttpExchange) => {
      val after = query(ex).get("after").map(_.toInt).getOrElse(0)
      val url = s"$base/cursor?after=${after + 20}&limit=20"
      val link = s"""<$url>; rel="next""""
      if (after >= Total) respond(ex, 200, """{"items":[]}""") // no Link: done
      else if (after == 20) respond(ex, 200, """{"items":[]}""", "Link" -> link)
      else {
        val ids = (after until math.min(after + 20, Total)).filterNot(i => i >= 20 && i < 40)
        respond(ex, 200, s"""{"items":[${ids.map(record).mkString(",")}]}""", "Link" -> link)
      }
    })
    // /token — OAuth2 client-credentials endpoint: issues tok-1, tok-2, …
    // and records the client_id it saw
    server.createContext("/token", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastTokenForm = form
      val n = tokenIssues.incrementAndGet()
      respond(ex, 200, s"""{"access_token":"tok-$n","token_type":"bearer","expires_in":3600}""")
    })
    // /secure — requires X-Api-Key AND the CURRENTLY issued bearer; each
    // token only survives `tokenUses` requests, then 401s (forced refresh)
    server.createContext("/secure", (ex: HttpExchange) => {
      val h = ex.getRequestHeaders
      val authOk = Option(h.getFirst("Authorization"))
        .contains(s"Bearer tok-${tokenIssues.get()}") &&
        tokenUses.incrementAndGet() <= 2
      if (Option(h.getFirst("X-Api-Key")).isEmpty) respond(ex, 403, "")
      else if (!authOk) { tokenUses.set(0); respond(ex, 401, "") }
      else {
        val q = query(ex)
        val page = q("page").toInt; val limit = q("limit").toInt
        val ids = (0 until Total).slice((page - 1) * limit, page * limit)
        respond(ex, 200, s"""{"items":[${ids.map(record).mkString(",")}]}""")
      }
    })
    // /statictok — accepts exactly one fixed bearer, no token endpoint
    server.createContext("/statictok", (ex: HttpExchange) => {
      if (!Option(ex.getRequestHeaders.getFirst("Authorization")).contains("Bearer fixed-tok"))
        respond(ex, 401, "")
      else {
        val q = query(ex)
        val ids = (0 until 5).slice((q("page").toInt - 1) * q("limit").toInt,
          q("page").toInt * q("limit").toInt)
        respond(ex, 200, s"""{"items":[${ids.map(record).mkString(",")}]}""")
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  private val tokenIssues = new AtomicInteger(0)
  private val tokenUses = new AtomicInteger(0)
  @volatile private var lastTokenForm: String = ""

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  private def read(path: String, mode: String, extra: (String, String)*) = {
    val r = spark.read.format("graft-http")
      .option("url", s"$base$path")
      .option("mode", mode)
      .option("recordsField", "items")
      .option("limit", "10")
      .option("baseDelayMs", "1")
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("pages mode reads every record across strided partitions") {
    val df = read("/items", "pages", "partitions" -> "3")
    assert(df.rdd.getNumPartitions == 3, "one input partition per stride")
    val ids = df.select(get_json_object($"value", "$.id").cast("int")).as[Int].collect()
    assert(ids.sorted.toSeq == (0 until Total), "all pages fetched exactly once")
  }

  test("pass-through param.* becomes the pushed incremental predicate") {
    val df = read("/items", "pages", "param.min_id" -> "50")
    val ids = df.select(get_json_object($"value", "$.id").cast("int")).as[Int].collect()
    assert(ids.sorted.toSeq == (50 until Total))
  }

  test("429 responses are retried per Retry-After and the data still lands") {
    hits429.set(0)
    val df = read("/flaky", "pages", "partitions" -> "1")
    assert(df.count() == 2)
    assert(hits429.get() >= 3, "the two 429s must each have been retried")
  }

  test("cursor mode walks Link headers, surviving an empty mid-walk page") {
    val df = read("/cursor", "cursor")
    assert(df.rdd.getNumPartitions == 1, "cursor pagination is sequential by nature")
    val ids = df.select(get_json_object($"value", "$.id").cast("int")).as[Int].collect()
    assert(ids.sorted.toSeq == ((0 until 20) ++ (40 until Total)),
      "empty page with a next link must not stop the walk")
  }

  test("static bearer token and header.* options reach the request") {
    val df = read("/statictok", "pages", "partitions" -> "1",
      "auth.token" -> "fixed-tok", "header.X-Trace" -> "t1")
    assert(df.count() == 5)
  }

  test("client-credentials flow: token fetched, cached, refreshed on 401") {
    tokenIssues.set(0); tokenUses.set(0)
    val df = read("/secure", "pages", "partitions" -> "1",
      "header.X-Api-Key" -> "k1",
      "auth.tokenUrl" -> s"$base/token",
      "auth.clientId" -> "cid-1", "auth.clientSecret" -> "sec-1")
    val ids = df.select(get_json_object($"value", "$.id").cast("int")).as[Int].collect()
    assert(ids.sorted.toSeq == (0 until Total),
      "every page must land despite periodic token expiry")
    assert(tokenIssues.get() >= 2, "at least one 401-driven token refresh")
    assert(tokenIssues.get() < 10, "token cache must be reused across pages")
    assert(lastTokenForm.contains("grant_type=client_credentials") &&
      lastTokenForm.contains("client_id=cid-1") &&
      lastTokenForm.contains("client_secret=sec-1"))
  }

  test("missing required header fails the scan (no silent empty result)") {
    val df = read("/secure", "pages", "partitions" -> "1", "maxRetries" -> "1",
      "auth.tokenUrl" -> s"$base/token", "auth.clientId" -> "cid-1",
      "auth.clientSecret" -> "sec-1")
    val e = intercept[org.apache.spark.SparkException] { df.count() }
    assert(e.getMessage.contains("403") || e.getCause != null)
  }

  test("from_json round-trip into relational form") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType)))
    val parsed = read("/items", "pages")
      .select(from_json($"value", schema).as("r"), $"_page")
      .select($"r.id", $"r.name", $"r.price", $"_page")
    assert(parsed.where($"id" === 7).select($"name").as[String].head() == "item-7")
    assert(parsed.agg(sum($"price")).as[Double].head() > 0)
  }
}
