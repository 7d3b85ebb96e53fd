package graft.sources.http

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Retry

/** DataSource V2 connector for paginated JSON-over-HTTP APIs — the actual
  * connector plumbing of the reference's REST scan (ref
  * shopify-etl/shopify_etl.py:271-461): live GETs, cursor pagination via the
  * `Link: <...>; rel="next"` header (ref :294-331), HTTP 429 handling with
  * server-directed Retry-After waits and exponential backoff on transport
  * errors (ref :312-327, via [[graft.sources.Retry]]), a per-request rate
  * floor, and pass-through query params (`param.updated_at_min=...` is the
  * reference's pushed incremental predicate, ref :274-276).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-http")
  *     .option("url", "https://host/admin/orders.json")
  *     .option("mode", "pages")            // or "cursor"
  *     .option("recordsField", "orders")   // array field; "" = root array
  *     .option("limit", "250")
  *     .option("partitions", "8")          // pages mode fan-out
  *     .option("param.updated_at_min", "2024-01-01T00:00:00Z")
  *     .option("header.X-Api-Key", "k1")   // static request headers
  *     .option("auth.token", "tok")        // static bearer, or:
  *     .option("auth.tokenUrl", "https://auth.host/token") // OAuth2
  *     .option("auth.clientId", "cid")     //   client-credentials grant,
  *     .option("auth.clientSecret", "sec") //   cached + refreshed on 401
  *     .load()                             // => (value STRING, _page INT)
  * }}}
  *
  * `spark.readStream.format("graft-http")` gives the same source as a
  * micro-batch stream ([[HttpMicroBatchStream]]): offsets are time
  * watermarks and each batch fetches `updated_at_min=<last offset>` — the
  * reference's incremental loop under Structured Streaming checkpointing.
  *
  * Rows surface each record as its compact JSON text (`value`) plus the
  * page it arrived on — parse with `from_json` and a schema, then hand to
  * the Flatten projections. Keeping the connector schema fixed leaves all
  * relational work (casts, pruning, predicates) in Catalyst.
  *
  * Scale shape: `pages` mode assigns page numbers to `partitions` readers
  * by stride (reader i fetches pages i, i+P, i+2P, ... and stops at the
  * first empty page), so fetching fans out across executors with no
  * coordination and no driver HTTP loop. `cursor` mode is inherently
  * sequential — each next-URL is only learned from the previous response —
  * so it runs as ONE input partition; it exists for APIs that offer nothing
  * else, and the strided mode is the scale path. Incremental loads at scale
  * come from the pushed `param.*` predicate (the reference's
  * updated_at_min), checkpointed by the existing pipeline — not from
  * replaying cursors. */
class HttpPagedProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpPagedProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HttpTable(HttpConf(opts), opts)
  }
}

object HttpPagedProvider {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("_page", IntegerType, nullable = false)))
}

/** Authenticated-API configuration, serializable to executors. Either a
  * static `token`, or a client-credentials token endpoint (`tokenUrl` +
  * `clientId`/`clientSecret`) whose responses are cached per executor and
  * refreshed on expiry or 401 — the standard OAuth2-style pattern the
  * reference's authenticated ingester follows (ref
  * youtube-data-ingestion/fetch_youtube_data.py:6-18: installed-app flow
  * with persisted, auto-refreshed credentials; here re-expressed as the
  * generic headless server-to-server grant — no provider-specific client
  * config is copied). */
case class AuthConf(
    token: Option[String], tokenUrl: Option[String],
    clientId: String, clientSecret: String,
    tokenField: String, scheme: String) {
  require(token.isDefined || tokenUrl.isDefined,
    "auth requires either auth.token or auth.tokenUrl")
  /** Cache key: one token per (endpoint, client) per JVM. */
  def cacheKey: String = s"${tokenUrl.getOrElse("")}|$clientId"
}

/** Everything a reader needs, serializable to executors. */
case class HttpConf(
    url: String, mode: String, recordsField: String, limit: Int,
    partitions: Int, maxRetries: Int, baseDelayMs: Long,
    minIntervalMs: Long, params: Seq[(String, String)],
    headers: Seq[(String, String)] = Nil, auth: Option[AuthConf] = None) {
  require(mode == "pages" || mode == "cursor", s"mode must be pages|cursor, got $mode")

  def pageUrl(page: Int): String =
    withParams(params ++ Seq("limit" -> limit.toString, "page" -> page.toString))
  def firstCursorUrl: String =
    withParams(params ++ Seq("limit" -> limit.toString))
  private def withParams(ps: Seq[(String, String)]): String = {
    val sep = if (url.contains("?")) "&" else "?"
    if (ps.isEmpty) url
    else url + sep + ps.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
  }
}

object HttpConf {
  def apply(o: CaseInsensitiveStringMap): HttpConf = HttpConf(
    url = Option(o.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-http requires option 'url'")),
    mode = o.getOrDefault("mode", "pages"),
    recordsField = o.getOrDefault("recordsField", ""),
    limit = o.getInt("limit", 250),
    partitions = o.getInt("partitions", 4),
    maxRetries = o.getInt("maxRetries", 5),
    baseDelayMs = o.getLong("baseDelayMs", 3000L),
    minIntervalMs = o.getLong("minIntervalMs", 0L),
    params = o.asCaseSensitiveMap().asScala.toSeq.collect {
      case (k, v) if k.startsWith("param.") => (k.stripPrefix("param."), v)
    }.sortBy(_._1),
    headers = o.asCaseSensitiveMap().asScala.toSeq.collect {
      case (k, v) if k.startsWith("header.") => (k.stripPrefix("header."), v)
    }.sortBy(_._1),
    auth =
      if (o.containsKey("auth.token") || o.containsKey("auth.tokenUrl"))
        Some(AuthConf(
          token = Option(o.get("auth.token")),
          tokenUrl = Option(o.get("auth.tokenUrl")),
          clientId = o.getOrDefault("auth.clientId", ""),
          clientSecret = o.getOrDefault("auth.clientSecret", ""),
          tokenField = o.getOrDefault("auth.tokenField", "access_token"),
          scheme = o.getOrDefault("auth.scheme", "Bearer")))
      else None)
}

/** Per-JVM bearer-token cache with expiry and 401-driven invalidation.
  * One live token per (tokenUrl, clientId); concurrent readers on an
  * executor share it, so a 1000-partition scan performs ONE token fetch
  * per executor per expiry window instead of one per task — the part of
  * authenticated ingestion that matters at cluster scale. */
object TokenProvider {
  private case class Cached(token: String, expiresAtMs: Long)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Cached]()
  /** Refresh this long before the server-reported expiry — a token that
    * expires mid-request is a 401 and a wasted round-trip. */
  private val SkewMs = 30000L

  def authorization(auth: AuthConf): String =
    s"${auth.scheme} ${token(auth)}"

  private val inflight = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def token(auth: AuthConf): String = auth.token.getOrElse {
    val key = auth.cacheKey
    def live(): Option[String] =
      Option(cache.get(key)).filter(_.expiresAtMs > System.currentTimeMillis()).map(_.token)
    live().getOrElse {
      // SINGLE-FLIGHT per key, on a dedicated mutex (NOT the CHM bin lock,
      // so a hung token endpoint cannot block unrelated keys): at an
      // expiry boundary the winner of the race fetches once and every
      // other concurrent task reuses its result — without this, N running
      // tasks would each POST the token endpoint per expiry window.
      val lock = inflight.computeIfAbsent(key, _ => new Object)
      lock.synchronized {
        live().getOrElse {
          val fresh = fetchToken(auth)
          cache.put(key, fresh)
          fresh.token
        }
      }
    }
  }

  /** Drop the cached token (called on 401 so the retry re-authenticates). */
  def invalidate(auth: AuthConf): Unit = cache.remove(auth.cacheKey)

  /** OAuth2 client-credentials grant (RFC 6749 §4.4): form-POST to the
    * token endpoint, token + optional expires_in in the JSON response. */
  private def fetchToken(auth: AuthConf): Cached = {
    val url = auth.tokenUrl.getOrElse(
      throw new IllegalStateException("no auth.tokenUrl and no static auth.token"))
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    // disconnect on EVERY exit — a reset mid-read or malformed JSON under
    // the retry loop must not leak sockets on long-lived executors
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(60000)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
      val form = Seq(
        "grant_type" -> "client_credentials",
        "client_id" -> auth.clientId,
        "client_secret" -> auth.clientSecret)
        .map { case (k, v) => k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }
        .mkString("&")
      conn.getOutputStream.write(form.getBytes(StandardCharsets.UTF_8))
      val code = conn.getResponseCode
      if (code != 200) throw new RuntimeException(s"token endpoint returned HTTP $code")
      val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      val root = new ObjectMapper().readTree(body)
      val tok = root.path(auth.tokenField)
      if (!tok.isTextual)
        throw new RuntimeException(s"token response lacks text field '${auth.tokenField}'")
      val ttlMs = root.path("expires_in").asLong(3600L) * 1000L
      Cached(tok.asText(), System.currentTimeMillis() + math.max(0L, ttlMs - SkewMs))
    } finally conn.disconnect()
  }
}

class HttpTable(conf: HttpConf, options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"graft-http(${conf.url})"
  override def schema(): StructType = HttpPagedProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HttpPagedProvider.Schema
        override def toBatch: Batch = new HttpBatch(conf)
        override def toMicroBatchStream(checkpointLocation: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
          new HttpMicroBatchStream(conf,
            startAtMs = options.getLong("startAtMs", 0L),
            incrementalParam = options.getOrDefault("incrementalParam", "updated_at_min"),
            lagMs = options.getLong("lagMs", HttpMicroBatchStream.DefaultLagMs))
      }
    }
}

class HttpBatch(conf: HttpConf) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    if (conf.mode == "cursor") Array(CursorPartition())
    else (0 until conf.partitions).map(i => PageStridePartition(i + 1, conf.partitions)).toArray
  override def createReaderFactory(): PartitionReaderFactory = new HttpReaderFactory(conf)
}

case class PageStridePartition(startPage: Int, stride: Int) extends InputPartition
case class CursorPartition() extends InputPartition

class HttpReaderFactory(conf: HttpConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case PageStridePartition(start, stride) => new PagesReader(conf, start, stride)
      case CursorPartition()                  => new CursorReader(conf)
    }
}

/** Shared fetch machinery: one HTTP GET with retry/backoff/429 handling and
  * the rate floor, plus record extraction from the JSON body. */
abstract class HttpReaderBase(conf: HttpConf) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper
  private var lastFetchAt = 0L
  private var buffered: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  /** (body, Link-header next URL if any); null body = exhausted. */
  protected def fetch(url: String): (String, Option[String]) =
    Retry.withRetries(conf.maxRetries, conf.baseDelayMs) { () =>
      val wait = lastFetchAt + conf.minIntervalMs - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      lastFetchAt = System.currentTimeMillis()
      val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(60000)
      conf.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conf.auth.foreach(a =>
        conn.setRequestProperty("Authorization", TokenProvider.authorization(a)))
      val code = conn.getResponseCode
      if (code == 401) {
        conn.disconnect()
        // refreshable ONLY when the bearer actually comes from the token
        // endpoint: with a static auth.token set, the token provider always
        // prefers it, so "invalidate and retry" would re-send the same
        // rejected token with zero backoff — that config fails fast below
        if (conf.auth.exists(a => a.token.isEmpty && a.tokenUrl.isDefined)) {
          // expired/revoked bearer: drop the cached token and retry NOW —
          // the next attempt re-authenticates; transport backoff here would
          // stall every task at each routine token-expiry window
          conf.auth.foreach(TokenProvider.invalidate)
          throw Retry.Immediate(s"HTTP 401 from $url (token invalidated, re-authenticating)")
        }
        // no refresh path (static token or no auth): retrying cannot help
        throw Retry.Fatal(s"HTTP 401 from $url (no token-refresh path; check credentials)")
      }
      if (code == 429) {
        // Retry-After is either delta-seconds or an HTTP-date (RFC 7231);
        // anything unparseable falls back to the reference's 60 s default
        // rather than surfacing a NumberFormatException as a transport
        // error with the wrong backoff.
        val after = Option(conn.getHeaderField("Retry-After")).map(_.trim).map { v =>
          v.toLongOption.getOrElse {
            try {
              val when = java.time.ZonedDateTime.parse(
                v, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
              math.max(0L, java.time.Duration.between(
                java.time.ZonedDateTime.now(when.getZone), when).toSeconds)
            } catch { case _: java.time.format.DateTimeParseException => 60L }
          }
        }.getOrElse(60L)
        conn.disconnect()
        throw Retry.RateLimited(after) // ref :312-316 — server-directed wait
      }
      if (code != 200) {
        conn.disconnect()
        throw new RuntimeException(s"HTTP $code from $url")
      }
      val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      val next = Option(conn.getHeaderField("Link")).flatMap { link =>
        // the reference's Link-header regex (ref :294-302)
        val m = HttpReaderBase.NextLink.matcher(link)
        if (m.find()) Some(m.group(1)) else None
      }
      conn.disconnect()
      (body, next)
    }

  /** Compact JSON text of each record in the body. */
  protected def records(body: String): Seq[String] = {
    val root = mapper.readTree(body)
    val arr = if (conf.recordsField.isEmpty) root else root.path(conf.recordsField)
    if (!arr.isArray)
      throw new IllegalStateException(
        s"expected JSON array${if (conf.recordsField.nonEmpty) s" at field '${conf.recordsField}'" else ""}")
    arr.elements().asScala.map(_.toString).toSeq
  }

  protected def row(json: String, page: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(json), page))

  /** Next chunk of rows; null when the source is exhausted. An EMPTY
    * iterator is not exhaustion — a cursor page may be empty yet still
    * carry a next link. */
  protected def nextChunk(): Iterator[InternalRow]

  override def next(): Boolean = {
    while (!buffered.hasNext) {
      val chunk = nextChunk()
      if (chunk == null) return false
      buffered = chunk
    }
    current = buffered.next()
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object HttpReaderBase {
  private[http] val NextLink = Pattern.compile("""<([^>]+)>\s*;\s*rel="next"""")
}

/** Strided page-number reader: pages start, start+stride, ... until the
  * first empty page (the standard beyond-last-page contract). */
class PagesReader(conf: HttpConf, start: Int, stride: Int)
  extends HttpReaderBase(conf) {
  private var page = start
  private var done = false
  override protected def nextChunk(): Iterator[InternalRow] = {
    if (done) return null
    val (body, _) = fetch(conf.pageUrl(page))
    val recs = records(body)
    if (recs.isEmpty) { done = true; null } // empty page = beyond last page
    else {
      val p = page
      page += stride
      recs.iterator.map(row(_, p))
    }
  }
}

/** Sequential Link-header cursor walk (single partition by construction). */
class CursorReader(conf: HttpConf) extends HttpReaderBase(conf) {
  private var nextUrl: Option[String] = Some(conf.firstCursorUrl)
  private var page = 0
  override protected def nextChunk(): Iterator[InternalRow] = nextUrl match {
    case None => null
    case Some(u) =>
      val (body, next) = fetch(u)
      nextUrl = next
      page += 1
      val p = page
      records(body).iterator.map(row(_, p))
  }
}
