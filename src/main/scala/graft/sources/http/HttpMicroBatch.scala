package graft.sources.http

import java.time.Instant

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}

/** Time-watermark offset: epoch millis of the incremental high-water mark.
  * Serialized as the bare number. */
case class TimeOffset(ms: Long) extends Offset {
  override def json(): String = ms.toString
}

/** Micro-batch stream over the paginated HTTP connector — the reference's
  * hourly incremental pull as a Structured Streaming source. Offsets are
  * TIME watermarks, not cursors: batch (start, end] fetches with the
  * `updated_at_min=<start instant>` query param — exactly the reference's
  * incremental predicate — because a cursor API cannot seek and cannot
  * tell how much data exists without fetching it. Consequences, both
  * matching the reference's loop:
  *
  *  - records updated after `start` but fetched in this batch can be
  *    re-fetched by the NEXT batch (their updated_at also exceeds the new
  *    start) — downstream must be idempotent, which the keyed MERGE sink
  *    is (T4);
  *  - an empty interval fetches one empty page and produces no rows.
  *
  * The param name is configurable (`incrementalParam`, default
  * updated_at_min). Page fan-out within a batch is the same strided
  * plan as the batch source. Supports Trigger.AvailableNow by pinning
  * latestOffset at prepare time.
  *
  * `lagMs` (default 1 h, the reference's late-data buffer, ref
  * shopify_etl.py:191-198): the committed offset is `now - lagMs`, never
  * raw driver wall-clock. A raw-clock offset silently LOSES any record
  * whose server-side updated_at lands before the checkpoint (server/driver
  * clock skew, delayed commit visibility on the server) — with the lag,
  * each batch re-reads the overlap window instead, and the idempotent
  * keyed MERGE sink absorbs the duplicate fetch (T4). Clamped to the
  * configured start so the first offsets never regress below it. */
class HttpMicroBatchStream(conf: HttpConf, startAtMs: Long, incrementalParam: String,
                           lagMs: Long = HttpMicroBatchStream.DefaultLagMs)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  @volatile private var pinnedLatest: Option[Long] = None

  private def lagged(): Long =
    math.max(startAtMs, System.currentTimeMillis() - lagMs)

  override def initialOffset(): Offset = TimeOffset(startAtMs)

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedLatest = Some(lagged())

  override def latestOffset(): Offset =
    TimeOffset(pinnedLatest.getOrElse(lagged()))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset = TimeOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val since = Instant.ofEpochMilli(start.asInstanceOf[TimeOffset].ms).toString
    val batchConf = conf.copy(params =
      (conf.params.filterNot(_._1 == incrementalParam) :+ (incrementalParam -> since))
        .sortBy(_._1))
    if (batchConf.mode == "cursor") Array(CursorBatchPartition(batchConf))
    else (0 until batchConf.partitions)
      .map(i => PageStrideBatchPartition(batchConf, i + 1, batchConf.partitions)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpMicroBatchReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object HttpMicroBatchStream {
  /** Default offset safety lag: the reference's 1-hour incremental buffer. */
  val DefaultLagMs: Long = 60L * 60 * 1000
}

/** Partitions carry their batch's conf (the incremental param differs per
  * micro-batch, so the factory cannot close over a single conf). */
case class PageStrideBatchPartition(conf: HttpConf, startPage: Int, stride: Int)
  extends InputPartition
case class CursorBatchPartition(conf: HttpConf) extends InputPartition

class HttpMicroBatchReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    partition match {
      case PageStrideBatchPartition(c, start, stride) => new PagesReader(c, start, stride)
      case CursorBatchPartition(c)                    => new CursorReader(c)
    }
}
